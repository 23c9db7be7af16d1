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
    nested: Option[DcaSchema] = None,
    unsignedBits: Option[Int] = None,
    float16: Boolean = false) {

  /** Spark column type: inner dims wrap the scalar dtype in ArrayType. */
  def sparkType: DataType = {
    val base = nested.map(_.structType).getOrElse(dtype)
    inner.foldRight(base)((_, t) => ArrayType(t))
  }

  /** [[sparkType]] as a StructField, carrying the unsigned-width tag
    * (SURVEY §1.2: unsigned dtypes are stored WIDENED in signed Spark
    * types — the declared width survives in column metadata so a
    * writer/reader can round-trip the logical type).
    */
  def structField: StructField = {
    val mb = new MetadataBuilder()
    unsignedBits.foreach { b =>
      mb.putBoolean("unsigned", true).putLong("unsignedBits", b)
    }
    if (float16) mb.putBoolean("float16", true)
    StructField(name, sparkType, nullable = true, mb.build())
  }

  /** Validation predicate for fixed inner dims, recursing into nested
    * schemas (analog of `assert_shape` + the per-field recursion of
    * `_validate`, `array_dataclass.py:1121-1143,1183-1188`). True when
    * valid.
    */
  def validExpr(c: Column): Column = validExprObs(c, lit(true))

  /** [[validExpr]] with an OBSERVABILITY predicate threaded through the
    * descent: a check only binds where the path to it is observable in
    * that row. Descending through an empty (or unobservably-NULL) array
    * turns observability off — there is no element to check, so deeper
    * dims (including those inside nested schemas, which recurse with
    * the CURRENT observability, not a reset one) are unconstrained.
    * Where the path IS observable, a NULL array is a genuine shape
    * failure — for Named/Dynamic dims too, not only Static ones.
    * Descent uses try_element_at (element_at(empty, 1) throws under
    * strict mode).
    */
  private[core] def validExprObs(c: Column, observed: Column): Column = {
    def leaf(cc: Column, obs: Column): Column = nested match {
      case Some(sub) =>
        sub.fields.map(sf => sf.validExprObs(cc.getField(sf.name), obs))
          .foldLeft(lit(true))(_ && _)
      case None => unsignedBits match {
        // unsigned range check on the widened signed storage (SURVEY
        // §1.2): a value outside [0, 2^bits-1] is a dtype violation,
        // not a representable unsigned. NULL is unconstrained
        // (nullable field), same rule as shape checks. Under inner
        // dims this binds along the first-element path, like Static
        // dims (full-array rectangularity/range is the writer's
        // contract).
        case Some(b) =>
          when(obs, coalesce(
              cc >= lit(0) && cc <= DcaSchema.unsignedMax(b), lit(true)))
            .otherwise(lit(true))
        case None => lit(true)
      }
    }
    def go(cc: Column, dims: List[Dim], obs: Column): Column = dims match {
      case Nil => leaf(cc, obs)
      case d :: rest =>
        // Static checks the first element's sub-shape (rectangularity
        // is the writer's contract; checking every element would be
        // O(prod)); Named/Dynamic only require the array to exist
        val present = d match {
          case Dim.Static(n) => size(cc) === lit(n)
          case _ => cc.isNotNull
        }
        val okHere = when(obs, coalesce(present, lit(false))).otherwise(lit(true))
        val childObs = obs && coalesce(size(cc) > 0, lit(false))
        okHere && go(try_element_at(cc, lit(1)), rest, childObs)
    }
    go(c, inner.toList, observed)
  }

  /** (name, per-row length expression) for every `Named` inner dim of
    * this field, recursing into nested sub-fields — the per-instance
    * shape resolution of the reference (`array_dataclass.py:1121-1143`):
    * each occurrence's length is read along the first-element path at
    * its level. [[DcaSchema.conform]] compares all occurrences of the
    * same name within a row (fixture `array_dataclass_test.py:694-747`).
    */
  def namedSizeExprs(c: Column): Seq[(String, Column)] = {
    def leaf(cc: Column): Seq[(String, Column)] = nested match {
      case Some(sub) =>
        sub.fields.flatMap(sf => sf.namedSizeExprs(cc.getField(sf.name)))
      case None => Nil
    }
    def go(cc: Column, dims: List[Dim]): Seq[(String, Column)] = dims match {
      case Nil => leaf(cc)
      case d :: rest =>
        val here = d match {
          case Dim.Named(n) => Seq(n -> size(cc))
          case _ => Nil
        }
        // try_element_at: an empty array yields NULL (unobservable
        // deeper dims → unconstrained), where element_at would throw
        here ++ go(try_element_at(cc, lit(1)), rest)
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
  * (`array_dataclass.py:57-117`); each switch has a REJECTING negative
  * path matching the reference's error behavior
  * (`array_dataclass_test.py:646-691`):
  *   - `castDtype=false`: a scalar dtype mismatch raises instead of
  *     casting.
  *   - `castList=false`: an array column whose concrete Spark type
  *     differs from the declared one raises instead of element-casting
  *     (the list→tensor ingest analog).
  *   - `broadcastScalars=false`: a scalar value where an array field
  *     is declared raises instead of replicating across the static
  *     inner dims.
  */
final case class DcaSchema(
    fields: Vector[DcaField],
    staticFields: Vector[String] = Vector.empty,
    castDtype: Boolean = true,
    castList: Boolean = true,
    broadcastScalars: Boolean = true) {

  def structType: StructType = StructType(fields.map(_.structField))

  def fieldNames: Vector[String] = fields.map(_.name)

  /** Conform a raw DataFrame to this schema: project to declared
    * fields, cast scalars (C3 `_cast_xnp_dtype_inplace`,
    * `array_dataclass.py:626-676`) RECURSIVELY through array levels
    * and nested struct schemas, and append a `__valid` check for fixed
    * inner dims (also recursive). Policy violations raise eagerly,
    * driver-side, against the input schema — matching the reference's
    * construction-time errors. `enforce=true` fails the query on the
    * first invalid row (ANSI-style, via assert expression).
    */
  def conform(df: DataFrame, enforce: Boolean = true): DataFrame = {
    val inputSchema = df.schema
    // honor the session's analyzer case sensitivity (default false):
    // col("pos") resolves "Pos", so the schema lookup must too
    val cs = df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    val cols = fields.map { f =>
      val idx = DcaSchema.resolveIndex(inputSchema.fieldNames.toIndexedSeq, f.name, cs, "input")
      conformCol(col(inputSchema.fieldNames(idx)),
        inputSchema(idx).dataType, f, f.name, cs).as(f.name)
    }
    val projected = df.select(cols: _*)
    if (!enforce) projected
    else {
      val checks = fields.map(f => f.validExpr(col(f.name)))
      val allValid = checks.foldLeft(lit(true))(_ && _)
      // per-row NAMED dim resolution: every occurrence of the same name
      // (across fields, nesting levels, and repeats within one field)
      // must resolve to the same length in that row — the reference's
      // dynamic-shape-conflict errors (`array_dataclass_test.py:694-747`)
      val named = fields.flatMap(f => f.namedSizeExprs(col(f.name)))
      // a NULL size (NULL column, or a dim below an empty array — no
      // first element to observe) is UNCONSTRAINED, not a conflict:
      // coalesce each pairwise comparison to true so namedOk is never
      // NULL and a (0,0)-shaped row passes
      val namedOk = named.groupBy(_._1).valuesIterator.collect {
        case group if group.size > 1 =>
          group.tail.map(g => coalesce(g._2 === group.head._2, lit(true)))
            .reduce(_ && _)
      }.foldLeft(lit(true))(_ && _)
      // validExprObs never yields NULL (observability handles it), but
      // keep the coalesce as defense so a NULL could never fall through
      // both when() branches and misreport as a named-dim error
      val shapeOk = coalesce(allValid, lit(false))
      // raise_error inside a filter branch: rows all pass or the job fails
      projected.withColumn("__shape_ok",
          when(shapeOk && namedOk, lit(true))
            .when(!shapeOk,
              raise_error(lit("inner shape or unsigned-range mismatch")))
            .otherwise(raise_error(
              lit("named inner dims resolve inconsistently across fields"))))
        .filter(col("__shape_ok"))
        .drop("__shape_ok")
    }
  }

  /** Recursive cast/conform of one column against its field metadata. */
  private def conformCol(c: Column, actual: DataType, f: DcaField, path: String,
                         cs: Boolean): Column = {
    def leafCast(cc: Column, at: DataType, p: String): Column = f.nested match {
      case Some(sub) => at match {
        case st: StructType =>
          struct(sub.fields.map { sf =>
            val i = DcaSchema.resolveIndex(st.fieldNames.toIndexedSeq, sf.name, cs, p)
            sub.conformCol(cc.getField(st.fieldNames(i)), st.fields(i).dataType,
              sf, s"$p.${sf.name}", cs).as(sf.name)
          }: _*)
        case other => throw new IllegalArgumentException(
          s"$p: expected struct, got ${other.catalogString}")
      }
      case None =>
        // sameType, not ==: struct dtypes (complex64/128) may differ
        // only in component nullability flags, which is not a cast
        if (DcaSchema.sameType(at, f.dtype)) cc
        else {
          require(castDtype,
            s"$p: dtype ${at.catalogString} != declared ${f.dtype.catalogString} and castDtype=false")
          cc.cast(f.dtype)
        }
    }
    // expected Spark type below k consumed array levels
    def expectedBelow(k: Int): DataType =
      f.inner.drop(k).foldRight(f.nested.map(_.structType).getOrElse(f.dtype))((_, t) => ArrayType(t))
    def go(cc: Column, at: DataType, dims: List[Dim], level: Int, p: String): Column = dims match {
      case Nil => leafCast(cc, at, p)
      case _ :: rest => at match {
        case _ if DcaSchema.sameType(at, expectedBelow(level)) => cc // already conformant below here
        case ArrayType(ae, _) =>
          require(castList,
            s"$p: array type ${at.catalogString} != declared ${expectedBelow(level).catalogString} and castList=false")
          transform(cc, e => go(e, ae, rest, level + 1, p + "[]"))
        case other =>
          // scalar where an array is declared: replicate across static dims
          require(broadcastScalars,
            s"$p: scalar ${other.catalogString} where ${expectedBelow(level).catalogString} declared and broadcastScalars=false")
          val statics = dims.map {
            case Dim.Static(n) => n
            case d => throw new IllegalArgumentException(
              s"$p: cannot broadcast a scalar into non-static inner dim $d")
          }
          statics.foldRight(leafCast(cc, other, p))((n, acc) => array_repeat(acc, n))
      }
    }
    go(c, actual, f.inner.toList, 0, path)
  }
}

object DcaSchema {
  /** Resolve `want` among `names` with the analyzer's case rules:
    * exact match first; unique case-insensitive match when the session
    * is case-insensitive; clear errors otherwise.
    */
  private[core] def resolveIndex(names: IndexedSeq[String], want: String,
                                 caseSensitive: Boolean, ctx: String): Int = {
    val exact = names.indexOf(want)
    if (exact >= 0) exact
    else if (caseSensitive) throw new IllegalArgumentException(
      s"$ctx: missing column $want (have ${names.mkString(", ")})")
    else names.zipWithIndex.filter(_._1.equalsIgnoreCase(want)) match {
      case IndexedSeq((_, i)) => i
      case IndexedSeq() => throw new IllegalArgumentException(
        s"$ctx: missing column $want (have ${names.mkString(", ")})")
      case many => throw new IllegalArgumentException(
        s"$ctx: ambiguous column $want matches ${many.map(_._1).mkString(", ")}")
    }
  }

  /** Structural type equality ignoring array/struct nullability flags
    * (parquet readers vary containsNull; it is not a semantic
    * difference for conformance).
    */
  private[core] def sameType(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(ae, _), ArrayType(be, _)) => sameType(ae, be)
    case (sa: StructType, sb: StructType) =>
      sa.length == sb.length && sa.fields.zip(sb.fields).forall {
        case (x, y) => x.name == y.name && sameType(x.dataType, y.dataType) }
    case _ => a == b
  }

  /** Declare a field with a shape string, e.g.
    * `field("pos", FloatType, "*batch 3")` — the Scala analog of
    * `pos: f32['*batch 3']`.
    */
  def field(name: String, dtype: DataType, shapeStr: String): DcaField =
    DcaField(name, dtype, ShapeParser.innerShape(shapeStr))

  def field(name: String, dtype: DataType): DcaField =
    DcaField(name, dtype)

  // ---- dtype parity tail (reference typing.py:29-51) ----

  /** complex64/complex128: Spark has no complex scalar — SURVEY §1.2
    * maps them to a struct(re, im) of the matching float width. A
    * plain dtype value: conform's struct cast handles double->float
    * component narrowing, sameType handles equality, and inner dims
    * wrap it in arrays like any scalar.
    */
  val Complex64: StructType = StructType(Seq(
    StructField("re", FloatType), StructField("im", FloatType)))
  val Complex128: StructType = StructType(Seq(
    StructField("re", DoubleType), StructField("im", DoubleType)))

  def complexField(name: String, bits: Int = 64): DcaField =
    DcaField(name, complexType(bits))
  def complexField(name: String, bits: Int, shapeStr: String): DcaField =
    DcaField(name, complexType(bits), ShapeParser.innerShape(shapeStr))
  private def complexType(bits: Int): StructType = bits match {
    case 64  => Complex64
    case 128 => Complex128
    case b => throw new IllegalArgumentException(
      s"complex$b: only complex64/complex128 exist (typing.py:29-51)")
  }

  /** f16 (reference typing.py:29-51): no Spark half-float — stored
    * WIDENED as FloatType with a `float16` metadata tag (SURVEY §1.2),
    * the same widen-plus-tag story as the unsigned ints. Every f32 is
    * exact, so no range check is needed; a writer honoring the tag can
    * downcast on serialization.
    */
  def float16Field(name: String): DcaField =
    DcaField(name, FloatType, float16 = true)
  def float16Field(name: String, shapeStr: String): DcaField =
    DcaField(name, FloatType, ShapeParser.innerShape(shapeStr), float16 = true)

  /** ui8/ui16/ui32/ui64 (reference typing.py:32): stored WIDENED in
    * the next signed Spark type (JVM/Spark have no unsigned scalars),
    * tagged `unsigned`+`unsignedBits` in column metadata, and
    * range-checked [0, 2^bits-1] by conform — out-of-range input is a
    * dtype violation, exactly like a shape violation. ui64 widens to
    * decimal(20,0) (the only exact >=64-bit unsigned container).
    */
  def unsignedField(name: String, bits: Int): DcaField =
    DcaField(name, unsignedType(bits), unsignedBits = Some(bits))
  def unsignedField(name: String, bits: Int, shapeStr: String): DcaField =
    DcaField(name, unsignedType(bits), ShapeParser.innerShape(shapeStr),
      unsignedBits = Some(bits))
  def unsignedType(bits: Int): DataType = bits match {
    case 8  => ShortType
    case 16 => IntegerType
    case 32 => LongType
    case 64 => DecimalType(20, 0)
    case b => throw new IllegalArgumentException(
      s"ui$b: only ui8/ui16/ui32/ui64 exist (typing.py:32)")
  }
  private[core] def unsignedMax(bits: Int): Column = bits match {
    case 64 => lit(new java.math.BigDecimal("18446744073709551615"))
    case b  => lit((1L << b) - 1)
  }

  /** Nested dataclass field (`c: Ray`). */
  def nested(name: String, schema: DcaSchema): DcaField =
    DcaField(name, NullType, Vector.empty, Some(schema))

  /** Nested dataclass field with inner dims (array of sub-records). */
  def nestedArray(name: String, schema: DcaSchema, shapeStr: String): DcaField =
    DcaField(name, NullType, ShapeParser.innerShape(shapeStr), Some(schema))
}
