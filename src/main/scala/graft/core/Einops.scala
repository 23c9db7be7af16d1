package graft.core

import scala.util.parsing.combinator.RegexParsers

import Shape.Shape

/** einops-style rearrange patterns for the batch shape (S3,
  * `array_dataclass.py:351-362`): `"a (b c) -> b a c"` with optional
  * `axesLength` for dims that cannot be inferred. `...` is accepted on
  * both sides (top level, not inside groups) and expands to
  * auto-generated axis names against the concrete ndim — the same
  * rewrite as the reference's `to_absolute_einops`
  * (`np_utils.py:178-193`).
  *
  * The plan output is pure index arithmetic: per-name indices are
  * recovered by div/mod from the left structure, then recombined per
  * the right structure — a narrow transformation regardless of how the
  * axes permute.
  */
object Einops {

  final case class Pattern(left: List[List[String]], right: List[List[String]])

  private val EllipsisMark = List("...")

  private object P extends RegexParsers {
    private val name: Parser[String] = """[A-Za-z_][A-Za-z0-9_]*""".r
    private val ell: Parser[List[String]] = "..." ^^ (_ => EllipsisMark)
    private val group: Parser[List[String]] =
      ell | ("(" ~> rep1(name) <~ ")") | (name ^^ (List(_)))
    private val side: Parser[List[List[String]]] = rep1(group)
    val pattern: Parser[Pattern] = (side <~ "->") ~ side ^^ { case l ~ r => Pattern(l, r) }
  }

  def parse(s: String): Pattern = P.parseAll(P.pattern, s) match {
    case P.Success(p, _) => p
    case other => throw new IllegalArgumentException(s"invalid einops pattern '$s': $other")
  }

  /** Expand `...` into explicit auto-generated axis names for a
    * concrete ndim (reference `to_absolute_einops`,
    * `np_utils.py:178-193`). No-op for ellipsis-free patterns.
    */
  def expandEllipsis(p: Pattern, ndim: Int): Pattern = {
    val nl = p.left.count(_ == EllipsisMark)
    val nr = p.right.count(_ == EllipsisMark)
    require(nl <= 1 && nr <= 1, "an einops pattern can only have a single ellipsis per side")
    if (nl == 0 && nr == 0) p
    else {
      require(nl == 1 && nr == 1, "ellipsis must appear on both sides of '->'")
      require(!(p.left ++ p.right).flatten.exists(n => n != "..." && n.startsWith("__ell")),
        "__ell* axis names are reserved for ellipsis expansion")
      val explicit = p.left.size - 1
      require(ndim >= explicit,
        s"pattern has $explicit explicit dims besides '...' but shape has only $ndim")
      val names = (0 until (ndim - explicit)).map(i => s"__ell$i").toList
      def sub(side: List[List[String]]) = side.flatMap {
        case EllipsisMark => names.map(List(_))
        case g => List(g)
      }
      Pattern(sub(p.left), sub(p.right))
    }
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
