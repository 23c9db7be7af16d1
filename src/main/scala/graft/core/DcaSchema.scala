package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-field metadata — the analog of `_ArrayFieldMetadata`
  * (`array_dataclass.py:1051-1083`): scalar dtype + inner (trailing)
  * shape; nested schemas recurse (nested dataclass fields,
  * `array_dataclass.py:1063-1064`).
  *
  * @param inner  trailing dims inside the column value: `Static(3)` is
  *               length-enforced, `Dynamic`/`Named` unchecked.
  */
final case class DcaField(
    name: String,
    dtype: DataType,
    inner: Vector[Dim] = Vector.empty,
    nested: Option[DcaSchema] = None) {

  /** Spark column type: inner dims wrap the scalar dtype in ArrayType. */
  def sparkType: DataType = {
    val base = nested.map(_.structType).getOrElse(dtype)
    inner.foldRight(base)((_, t) => ArrayType(t))
  }

  /** Validation predicate for fixed inner dims: size checks at each
    * nesting level (analog of `assert_shape`,
    * `array_dataclass.py:1183-1188`). True when valid.
    */
  def validExpr(c: Column): Column = {
    def go(cc: Column, dims: List[Dim]): Column = dims match {
      case Nil => lit(true)
      case Dim.Static(n) :: rest =>
        val here = size(cc) === lit(n)
        if (rest.isEmpty) here
        // check the first element's sub-shape (rectangularity is the
        // writer's contract; checking every element would be O(prod))
        else here && go(element_at(cc, 1), rest)
      case _ :: rest =>
        if (rest.isEmpty) lit(true) else go(element_at(cc, 1), rest)
    }
    go(c, inner.toList)
  }
}

/** Class-level schema — the analog of the per-class
  * `_dca_fields_metadata` cache (`array_dataclass.py:252,954-956`),
  * built once and reused. In Scala the "annotation parsing" happens at
  * construction via explicit declarations or shape strings
  * ([[DcaSchema.field]]).
  *
  * Coercion policy mirrors `DataclassParams`
  * (`array_dataclass.py:57-117`): `castDtype` inserts casts,
  * `broadcastScalars` lets scalar (non-array) literals broadcast.
  */
final case class DcaSchema(
    fields: Vector[DcaField],
    staticFields: Vector[String] = Vector.empty,
    castDtype: Boolean = true,
    broadcastScalars: Boolean = true) {

  def structType: StructType =
    StructType(fields.map(f => StructField(f.name, f.sparkType)))

  def fieldNames: Vector[String] = fields.map(_.name)

  /** Conform a raw DataFrame to this schema: project to declared
    * fields, cast scalars (C3 `_cast_xnp_dtype_inplace`,
    * `array_dataclass.py:626-676`), and append a `__valid` check for
    * fixed inner dims. `enforce=true` fails the query on the first
    * invalid row (ANSI-style, via assert expression).
    */
  def conform(df: DataFrame, enforce: Boolean = true): DataFrame = {
    val cols = fields.map { f =>
      val raw = col(f.name)
      val casted =
        if (castDtype && f.inner.isEmpty && f.nested.isEmpty) raw.cast(f.dtype)
        else raw
      casted.as(f.name)
    }
    val projected = df.select(cols: _*)
    if (!enforce) projected
    else {
      val checks = fields.map(f => f.validExpr(col(f.name)))
      val allValid = checks.foldLeft(lit(true))(_ && _)
      // raise_error inside a filter branch: rows all pass or the job fails
      projected.withColumn("__shape_ok",
          when(allValid, lit(true)).otherwise(raise_error(lit("inner shape mismatch"))))
        .filter(col("__shape_ok"))
        .drop("__shape_ok")
    }
  }
}

object DcaSchema {
  /** Declare a field with a shape string, e.g.
    * `field("pos", FloatType, "*batch 3")` — the Scala analog of
    * `pos: f32['*batch 3']`.
    */
  def field(name: String, dtype: DataType, shapeStr: String): DcaField =
    DcaField(name, dtype, ShapeParser.innerShape(shapeStr))

  def field(name: String, dtype: DataType): DcaField =
    DcaField(name, dtype)

  /** Nested dataclass field (`c: Ray`). */
  def nested(name: String, schema: DcaSchema): DcaField =
    DcaField(name, NullType, Vector.empty, Some(schema))
}
