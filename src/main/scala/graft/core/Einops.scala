package graft.core

import scala.util.parsing.combinator.RegexParsers

import Shape.Shape

/** einops-style rearrange patterns for the batch shape (S3,
  * `array_dataclass.py:351-362`): `"a (b c) -> b a c"` with optional
  * `axesLength` for dims that cannot be inferred.
  *
  * Semantics match einops.rearrange restricted to names and
  * parenthesized groups (no ellipsis — the reference extends patterns
  * with auto-generated inner-dim names before delegating, which our
  * engine does not need: inner dims live inside column values).
  *
  * The plan output is pure index arithmetic: per-name indices are
  * recovered by div/mod from the left structure, then recombined per
  * the right structure — a narrow transformation regardless of how the
  * axes permute.
  */
object Einops {

  final case class Pattern(left: List[List[String]], right: List[List[String]])

  private object P extends RegexParsers {
    private val name: Parser[String] = """[A-Za-z_][A-Za-z0-9_]*""".r
    private val group: Parser[List[String]] = ("(" ~> rep1(name) <~ ")") | (name ^^ (List(_)))
    private val side: Parser[List[List[String]]] = rep1(group)
    val pattern: Parser[Pattern] = (side <~ "->") ~ side ^^ { case l ~ r => Pattern(l, r) }
  }

  def parse(s: String): Pattern = P.parseAll(P.pattern, s) match {
    case P.Success(p, _) => p
    case other => throw new IllegalArgumentException(s"invalid einops pattern '$s': $other")
  }

  /** Resolve the size of every named axis.
    *
    * @return (sizes by name, new shape per right side)
    */
  def resolve(p: Pattern, shape: Shape, axesLength: Map[String, Long]): (Map[String, Long], Shape) = {
    require(p.left.size == shape.size,
      s"pattern left side has ${p.left.size} groups but shape has ${shape.size} dims")
    val leftNames = p.left.flatten
    val rightNames = p.right.flatten
    require(leftNames.distinct == leftNames, s"duplicate names on left: $leftNames")
    require(rightNames.distinct == rightNames, s"duplicate names on right: $rightNames")
    require(leftNames.toSet == rightNames.toSet,
      s"left/right names differ: $leftNames vs $rightNames")
    val sizes = collection.mutable.Map[String, Long](axesLength.toSeq: _*)
    p.left.zip(shape).foreach { case (group, dim) =>
      val unknown = group.filterNot(sizes.contains)
      val known = group.filter(sizes.contains).map(sizes).product
      unknown match {
        case Nil =>
          require(known == dim, s"group $group sizes to $known but dim is $dim")
        case one :: Nil =>
          require(known != 0 && dim % known == 0,
            s"cannot infer '$one': dim $dim not divisible by known $known in $group")
          sizes(one) = dim / known
        case many =>
          throw new IllegalArgumentException(
            s"cannot infer multiple unknown axes $many in group $group; pass axesLength")
      }
    }
    val newShape = p.right.map(g => g.map(sizes).product).toVector
    (sizes.toMap, newShape)
  }
}
