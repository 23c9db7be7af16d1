package graft.core

import scala.util.parsing.combinator.RegexParsers

/** One trailing (inner) dimension of an array field. */
sealed trait Dim
object Dim {
  /** Fixed-length dim, enforced per row (e.g. the 3 in `f32['... 3']`). */
  final case class Static(n: Int) extends Dim
  /** Dynamic dim (`_` / None): resolved per instance, unchecked. */
  case object Dynamic extends Dim
  /** Named dim: dynamic; the name is documentation (consistency of a
    * name across fields is NOT checked — matches the reference,
    * `shape_parsing.py:98-101`).
    */
  final case class Named(name: String) extends Dim
}

/** Shape-string DSL parser: `"*batch 3 _"` / `"... h w 3"` → inner dims.
  *
  * Replaces the reference's Lark grammar (`shape_grammar.lark:1-20`,
  * `shape_parsing.py:67-106`) with Scala parser combinators. The first
  * dim must be the batch part (`...` or `*name`); the remaining dims
  * form the per-field inner shape.
  */
object ShapeParser extends RegexParsers {
  private val intDim: Parser[Dim]   = """\d+""".r ^^ (s => Dim.Static(s.toInt))
  private val underDim: Parser[Dim] = "_" ^^ (_ => Dim.Dynamic)
  private val nameDim: Parser[Dim]  = """[A-Za-z][A-Za-z0-9_]*""".r ^^ Dim.Named.apply
  private val dim: Parser[Dim]      = intDim | underDim | nameDim
  private val batch: Parser[Unit]   = ("..." | """\*[A-Za-z_][A-Za-z0-9_]*""".r) ^^ (_ => ())
  private val spec: Parser[List[Dim]] = batch ~> rep(dim)

  /** Parse `'*batch_shape 3 _'` → inner shape `(Static(3), Dynamic)`.
    * Throws IllegalArgumentException on malformed strings (no batch
    * prefix, trailing garbage).
    */
  def innerShape(s: String): Vector[Dim] = parseAll(spec, s) match {
    case Success(dims, _) => dims.toVector
    case NoSuccess(msg, next) =>
      throw new IllegalArgumentException(
        s"invalid shape string '$s' at ${next.pos}: $msg")
    case other =>
      throw new IllegalArgumentException(s"invalid shape string '$s': $other")
  }
}
