package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

import Shape.Shape

/** A batch of records with an N-dimensional, order-significant, dense
  * index — the Spark-native analog of the reference's `DataclassArray`
  * (`array_dataclass.py:164-214`).
  *
  * Design (SURVEY §7.1): the batch shape lives as driver-side metadata;
  * the data carries materialized dense index columns
  * `__idx0..__idxN: LongType`, because DataFrames are unordered.
  * Reshape / flatten / slice / newaxis are pure index arithmetic —
  * narrow transformations, no shuffle. Filter (boolean mask) is the one
  * op that needs a global re-index; it uses a per-partition-offset
  * zipWithIndex (two light jobs), never a single-partition window, so
  * it survives 100-TB inputs (SURVEY §7.5.1).
  *
  * Static fields (constant across the batch, untouched by every op —
  * `array_dataclass.py:192-198`) live in [[statics]].
  */
final case class DcaFrame(
    df: DataFrame,
    shape: Shape,
    arrayCols: Vector[String],
    statics: Map[String, Any] = Map.empty,
    staging: Option[DataFrame] = None) {

  def ndim: Int = shape.length
  def size: Long = Shape.size(shape)
  /** len(p): length of the first batch dim (`array_dataclass.py:404-410`). */
  def length: Long = {
    require(ndim > 0, "len() of unsized object (scalar shape)")
    shape.head
  }
  /** bool(p): raises only when the FIRST dim is 0 on a non-scalar shape
    * (len(x) == 0) — e.g. shape (3,0) is truthy — matching the
    * reference's `__bool__` guard exactly (`array_dataclass.py:412-453`).
    */
  def nonEmptyOrThrow(): Boolean = {
    require(ndim == 0 || shape.head != 0,
      "The truth value of an empty array is ambiguous")
    true
  }

  def idxCols: Vector[String] = DcaFrame.idxColNames(ndim)
  private def idx(i: Int): Column = col(s"__idx$i")

  /** Copy for DERIVED views (reshape/slice/gather/mapField/zip/...):
    * the result rides on the parent's staged cache but does NOT own it —
    * its [[unpersist]] must not release a cache the parent and sibling
    * frames still depend on. Only the constructing frame
    * ([[DcaFrame.fromDF]]/[[mask]]) or [[DcaFrame.releaseStaging]]
    * releases staging.
    */
  private def derived(df: DataFrame = df, shape: Shape = shape,
      arrayCols: Vector[String] = arrayCols,
      statics: Map[String, Any] = statics): DcaFrame =
    DcaFrame(df, shape, arrayCols, statics, staging = None)

  /** Linear (row-major) index expression over the current idx columns. */
  def linearIndex: Column =
    if (ndim == 0) lit(0L)
    else {
      val st = Shape.strides(shape)
      (0 until ndim).map(i => idx(i) * lit(st(i))).reduce(_ + _)
    }

  /** Sorted driver-side materialization (small data / tests only). */
  def collectOrdered(): Array[Row] = {
    val ordered = df.orderBy(idxCols.map(col): _*)
    ordered.select(arrayCols.map(col): _*).collect()
  }

  /** Driver-local eager short-circuit (the toy-scale fast path,
    * BASELINE.md's honest-comparison gap): materialize the payload
    * row-major into a [[LocalDca]] and run the same index algebra
    * in-process at numpy-like constants — reshape O(1), slice/gather
    * array walks — then [[LocalDca.toFrame]] back when it outgrows the
    * driver. Guarded: refuses above `maxRows` so a fact-sized frame
    * can never silently collect.
    */
  def collectLocal(maxRows: Long = 4L << 20): LocalDca = {
    require(size <= maxRows,
      s"collectLocal refused: $size rows > maxRows $maxRows — " +
        "the distributed plans are the scale path")
    val payloadSchema = StructType(arrayCols.map(n => df.schema(n)).toArray)
    LocalDca(collectOrdered().toVector, payloadSchema, shape, statics)
  }

  // ---------------------------------------------------------------------
  // Shape algebra (S2-S5): pure index arithmetic, narrow, no shuffle.
  // ---------------------------------------------------------------------

  /** Re-factor the batch shape; `-1` infers one dim. Narrow — recomputes
    * `__idx*` from the linear index (`array_dataclass.py:363-369`).
    */
  def reshape(to: Long*): DcaFrame = reshapeTo(to)

  def reshapeTo(to: Seq[Long]): DcaFrame = {
    val target = Shape.resolveReshape(shape, to)
    if (target == shape) this
    else {
      // integral `div` (not Column./, which is double division and
      // loses exactness above 2^53 — the 100-TB contract needs the
      // full long range); the linear index is materialized under a
      // reserved name so expr() can reference it
      require(!df.columns.contains("__graft_lin"),
        "__graft_lin is a reserved column name")
      val withLin = df.withColumn("__graft_lin", linearIndex)
      val st = Shape.strides(target)
      val newIdx = target.indices.map { i =>
        val q = if (st(i) == 1L) col("__graft_lin") % lit(target(i))
                else if (i == 0) expr(s"__graft_lin div ${st(i)}")
                else expr(s"__graft_lin div ${st(i)}") % lit(target(i))
        q.cast(LongType).as(s"__nidx$i")
      }
      val kept = arrayCols.map(col)
      val renamed = withLin.select(newIdx ++ kept: _*)
      val fin = target.indices.foldLeft(renamed)((d, i) => d.withColumnRenamed(s"__nidx$i", s"__idx$i"))
      derived(df = fin, shape = target)
    }
  }

  /** flatten = reshape((-1,)) (`array_dataclass.py:371-373`). */
  def flatten: DcaFrame = reshapeTo(Seq(-1L))

  /** einops-style reshape (S3, `array_dataclass.py:351-362`):
    * `reshape("a (b c) -> b a c", "c" -> 2)`. Unlike tuple reshape this
    * can PERMUTE axes; still pure index arithmetic — per-name indices
    * recovered by div/mod from the left groups, recombined per the
    * right groups. Narrow, no shuffle.
    */
  def reshapeEinops(pattern: String, axesLength: (String, Long)*): DcaFrame = {
    val p = Einops.expandEllipsis(Einops.parse(pattern), ndim)
    val (sizes, newShape) = Einops.resolve(p, shape, axesLength.toMap)
    // per-name index expression from the left structure
    val nameIdx: Map[String, Column] = p.left.zipWithIndex.flatMap { case (group, gi) =>
      val dims = group.map(sizes)
      val strides = dims.scanRight(1L)(_ * _).tail
      group.zip(strides).zip(dims).map { case ((n, st), d) =>
        // integral div for exactness over the full long range
        val q = if (st == 1L) idx(gi) % lit(d)
                else expr(s"__idx$gi div $st") % lit(d)
        n -> q
      }
    }.toMap
    // new group index = linearization of member indices
    val newIdx = p.right.zipWithIndex.map { case (group, gi) =>
      val dims = group.map(sizes)
      val strides = dims.scanRight(1L)(_ * _).tail
      group.zip(strides).map { case (n, st) => nameIdx(n) * lit(st) }
        .reduce(_ + _).cast(LongType).as(s"__nidx$gi")
    }
    val out = df.select(newIdx ++ arrayCols.map(col): _*)
    val fin = newShape.indices.foldLeft(out)((d, i) => d.withColumnRenamed(s"__nidx$i", s"__idx$i"))
    derived(df = fin, shape = newShape)
  }

  /** Expand the batch shape (dim-1/new-leading axes up), every payload
    * row replicated — `crossJoin(range(n))` per expanded dim
    * (`array_dataclass.py:375-380`).
    */
  def broadcastTo(target: Seq[Long]): DcaFrame = {
    val t = target.toVector
    require(t.length >= ndim, s"broadcast_to target rank ${t.length} < current $ndim")
    val pad = t.length - ndim
    val padded = Vector.fill[Long](pad)(1L) ++ shape
    padded.zip(t).zipWithIndex.foreach { case ((o, n), i) =>
      require(o == n || o == 1L, s"cannot broadcast dim $i: $o -> $n")
    }
    if (t == shape) this
    else {
      val spark = df.sparkSession
      // old axis j (0-based in current shape) becomes target axis j+pad;
      // rename back-to-front to avoid collisions
      var cur = df
      for (j <- (ndim - 1) to 0 by -1)
        cur = cur.withColumnRenamed(s"__idx$j", s"__tidx${j + pad}")
      for (i <- t.indices) {
        val keepOld = i >= pad && padded(i) == t(i)
        if (!keepOld) {
          // old dim-1 constant column is replaced by the replicating range
          if (i >= pad) cur = cur.drop(s"__tidx$i")
          cur =
            if (t(i) == 1L) cur.withColumn(s"__tidx$i", lit(0L))
            else cur.crossJoin(broadcast(spark.range(t(i)).toDF(s"__tidx$i")))
        }
      }
      val finalCols = t.indices.map(i => col(s"__tidx$i").cast(LongType).as(s"__idx$i")) ++
        arrayCols.map(col)
      derived(df = cur.select(finalCols: _*), shape = t)
    }
  }

  // ---------------------------------------------------------------------
  // Indexing (S6-S8)
  // ---------------------------------------------------------------------

  /** numpy indexing on the batch dims: int / slice / ellipsis /
    * newaxis / integer-array (`array_dataclass.py:382-390`,
    * `:1006-1035`). Basic items are narrow (predicates + index remap,
    * no shuffle); an `Ix.A` integer-array item composes as a
    * [[gatherAxis]] on its output axis AFTER the basic items — numpy's
    * single-advanced-index semantics (`p[idx_arr, 2:5]` ==
    * `p[:, 2:5][idx_arr]`).
    */
  def apply(items: Indexing.Ix*): DcaFrame = {
    val resolved = Indexing.resolve(items, shape)
    var cur = df
    var axis = 0          // input axis being consumed
    var outPos = 0        // output axis position
    val outCols = Vector.newBuilder[(String, Column)]
    val gathers = Vector.newBuilder[(Int, Vector[Long])] // (output axis, indices)
    resolved.foreach {
      case (_, Indexing.Resolved.New) =>
        outCols += ((s"__oidx$outPos", lit(0L)))
        outPos += 1
      case (_, Indexing.Resolved.Int(i)) =>
        cur = cur.filter(col(s"__idx$axis") === lit(i))
        axis += 1
      case (_, Indexing.Resolved.Gather(idxs)) =>
        // pass the axis through untouched here; gather applies below
        outCols += ((s"__oidx$outPos", col(s"__idx$axis")))
        gathers += ((outPos, idxs))
        axis += 1
        outPos += 1
      case (_, Indexing.Resolved.Slice(start, step, newLen)) =>
        val c = col(s"__idx$axis")
        // offset along the slice direction; exact-integer-valued
        val off = if (step > 0) c - lit(start) else lit(start) - c
        val stepAbs = math.abs(step)
        cur = cur.filter(off >= 0 && (off % lit(stepAbs) === 0) &&
          off < lit(newLen * stepAbs))
        // integral div (exact over the full long range)
        val offSql = if (step > 0) s"(__idx$axis - $start)" else s"($start - __idx$axis)"
        outCols += ((s"__oidx$outPos", expr(s"$offSql div $stepAbs").cast(LongType)))
        axis += 1
        outPos += 1
    }
    // shape BEFORE the gathers apply: gather axes keep their full dim
    val interShape = Indexing.resultShape(resolved, gatherKeepsDim = true)
    val sel = outCols.result().map { case (n, c) => c.as(n) } ++ arrayCols.map(col)
    val out = cur.select(sel: _*)
    val fin = interShape.indices.foldLeft(out)((d, i) => d.withColumnRenamed(s"__oidx$i", s"__idx$i"))
    val basic = derived(df = fin, shape = interShape)
    val gs = gathers.result()
    // numpy multi-advanced-index semantics: the index arrays broadcast
    // together and are applied DIAGONALLY (p[[a,b],[c,d]] picks
    // (a,c),(b,d) — array_dataclass_test.py:459-494). PLACEMENT follows
    // numpy's two-case rule: when the advanced items — bare ints COUNT
    // as advanced here — are separated by a slice/newaxis, the broadcast
    // result dims move to the FRONT of the result (p[arr, :, arr] and
    // even p[2, :, arr]); when they are all adjacent (an Int between two
    // arrays does not separate), the dims are inserted in place at the
    // first advanced position. An Int participates in the zip as a
    // scalar — already applied as a filter above, it contributes no
    // result dim, exactly numpy's () broadcast.
    if (gs.isEmpty) basic
    else {
      val advancedAt = resolved.zipWithIndex.collect {
        case ((_, Indexing.Resolved.Int(_)), i)    => i
        case ((_, Indexing.Resolved.Gather(_)), i) => i
      }
      val separated = advancedAt.size >= 2 &&
        resolved.slice(advancedAt.head + 1, advancedAt.last).exists {
          case (_, Indexing.Resolved.Slice(_, _, _)) => true
          case (_, Indexing.Resolved.New)            => true
          case _                                     => false
        }
      if (separated) basic.gatherZip(gs.map(_._1), gs.map(_._2), toFront = true)
      else if (gs.size == 1) basic.gatherAxis(gs.head._2, gs.head._1)
      else {
        val positions = gs.map(_._1)
        require(positions.zip(positions.tail).forall { case (a, b) => b == a + 1 },
          s"internal: non-separated advanced indices must be adjacent, got $positions")
        basic.gatherZip(positions, gs.map(_._2))
      }
    }
  }

  /** Diagonal (zipped) multi-axis gather: element k of the result takes
    * input index `lists(a)(k)` on each gathered axis `positions(a)` —
    * numpy's broadcast-and-zip semantics for multiple advanced indices.
    * Executed as ONE broadcast equi-join on the composite key (never a
    * chain of per-axis gathers, which would outer-product). Length-1
    * lists broadcast to the common length.
    *
    * Placement: the zipped result dim replaces the gathered axes IN
    * PLACE (at the first gathered position — requires the positions be
    * adjacent) or, with `toFront`, lands at axis 0 with every
    * non-gathered axis following in order — numpy's rule for advanced
    * indices separated by a slice/newaxis.
    */
  private def gatherZip(positions: Vector[Int], lists: Vector[Vector[Long]],
                        toFront: Boolean = false): DcaFrame = {
    import org.apache.spark.sql.types.StructField
    val m = positions.length
    // numpy broadcast rule per dim: all non-1 lengths must agree (so
    // (0,) broadcasts with (1,) to (0,) — max() would wrongly reject it)
    val non1 = lists.map(_.length).filter(_ != 1).distinct
    require(non1.size <= 1,
      "shape mismatch: indexing arrays could not be broadcast together " +
        s"with lengths ${lists.map(_.length).mkString(", ")}")
    val len = non1.headOption.getOrElse(1)
    // guard the resolved-input precondition (Indexing.resolve validates
    // bounds and folds negatives); an unresolved index reaching the
    // equi-join below would silently DROP rows instead of raising the
    // numpy IndexError contract gatherAxis documents
    positions.zip(lists).foreach { case (ax, l) =>
      l.foreach(i => require(i >= 0 && i < shape(ax),
        s"index $i is out of bounds for axis $ax with size ${shape(ax)} " +
          "(gatherZip requires resolved, in-bounds indices)"))
    }
    val expanded = lists.map(l => if (l.length == len) l else Vector.fill(len)(l.head))
    ((0 until m).map(a => s"__src$a") :+ "__zpos").foreach { r =>
      require(!df.columns.contains(r), s"$r is a reserved column name") }
    val spark = df.sparkSession
    val fields = (0 until m).map(a => StructField(s"__src$a", LongType)) :+
      StructField("__zpos", LongType)
    val rows = (0 until len).map(k => Row.fromSeq(expanded.map(_(k)) :+ k.toLong))
    val idxDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), StructType(fields.toArray))
    val cond = positions.zipWithIndex
      .map { case (ax, a) => col(s"__idx$ax") === col(s"__src$a") }.reduce(_ && _)
    val joined = df.join(broadcast(idxDf), cond)
    val posSet = positions.toSet
    val kept = (0 until ndim).filterNot(posSet).toVector
    // in-place insertion point = number of kept axes before the first
    // gathered axis (with adjacent positions that is exactly
    // positions.head); toFront pins the zipped dim at axis 0
    val insertAt = if (toFront) 0 else {
      require(positions.zip(positions.tail).forall { case (a, b) => b == a + 1 },
        s"in-place gatherZip requires adjacent axes, got $positions")
      kept.count(_ < positions.head)
    }
    val keptBefore = kept.take(insertAt)
    val keptAfter = kept.drop(insertAt)
    val outIdx = keptBefore.zipWithIndex.map { case (ax, i) => col(s"__idx$ax").as(s"__idx$i") } ++
      Seq(col("__zpos").as(s"__idx$insertAt")) ++
      keptAfter.zipWithIndex.map { case (ax, i) => col(s"__idx$ax").as(s"__idx${insertAt + 1 + i}") }
    val newShape = (keptBefore.map(shape) :+ len.toLong) ++ keptAfter.map(shape)
    derived(df = joined.select(outIdx ++ arrayCols.map(col): _*), shape = newShape)
  }

  /** Boolean-mask selection — THE canonical filter (S7,
    * `array_dataclass.py:382-390`, `README.md:53`). The mask predicate
    * is evaluated per row over the full batch; the result is 1-D with a
    * dense re-index. Scale path: zipWithIndex (per-partition offsets),
    * not a global window.
    */
  def mask(pred: Column): DcaFrame = {
    require(!df.columns.contains("__graft_lin"),
      "__graft_lin is a reserved column name")
    val filtered = df.filter(pred)
      .select(linearIndex.as("__graft_lin") +: arrayCols.map(col): _*)
    // the staged (sorted, cached) frame is the SINGLE cached artifact;
    // the re-indexed view is a narrow codegen'd projection over it
    val (indexed, n, staged) = DcaFrame.denseIndex(filtered, Seq(col("__graft_lin")))
    copy(df = indexed.drop("__graft_lin"), shape = Vector(n), staging = Some(staged))
  }

  /** Integer-array gather along axis 0 (S8): `p[int_arr]` — a
    * broadcast join against the (small) index list, preserving the
    * gather order and allowing repeats.
    */
  def gather(indices: Seq[Long]): DcaFrame = gatherAxis(indices, 0)

  /** Driver-side integer-array gather along any axis. */
  def gatherAxis(indices: Seq[Long], axis: Int): DcaFrame = {
    require(ndim >= 1, "gather needs ndim >= 1")
    Seq("__src", "__pos").foreach { r =>
      require(!df.columns.contains(r), s"$r is a reserved column name") }
    val ax = Shape.toAbsoluteAxis(axis, ndim)
    val dim = shape(ax)
    indices.zipWithIndex.foreach { case (i, k) =>
      require(i >= -dim && i < dim, s"gather index $i (pos $k) out of bounds for dim $dim") }
    val spark = df.sparkSession
    val resolvedIdx = indices.map(i => if (i < 0) i + dim else i)
    import spark.implicits._
    val idxDf = resolvedIdx.zipWithIndex.map { case (src, pos) => (src, pos.toLong) }
      .toDF("__src", "__pos")
    val joined = df.join(broadcast(idxDf), col(s"__idx$ax") === col("__src"))
      .drop(s"__idx$ax", "__src")
      .withColumnRenamed("__pos", s"__idx$ax")
    val newShape = shape.updated(ax, indices.length.toLong)
    derived(df = joined.select(idxCols.map(col) ++ arrayCols.map(col): _*), shape = newShape)
  }

  /** DISTRIBUTED integer-array gather along axis 0 (S8 at scale,
    * `array_dataclass_test.py:459-494` with arbitrary-size index
    * arrays): the index array is itself a frame — see [[gatherAxis]].
    */
  def gather(indices: DcaFrame, valueCol: String = null): DcaFrame =
    gatherAxis(indices, 0, valueCol)

  /** DISTRIBUTED integer-array gather along ANY axis: an equi-join of
    * self's `__idx{axis}` against the index frame's values, with the
    * index frame's own batch index becoming the output position(s) on
    * that axis. Repeats allowed, negative indices resolved per row;
    * out-of-bounds or NULL raises when the plan is evaluated (numpy
    * IndexError semantics — an inner join would drop silently). Note
    * the check is lazy: a partially-consumed result (e.g. under a
    * `limit`) may never evaluate the offending index rows.
    *
    * Result shape = `shape[:axis] ++ indices.shape ++ shape[axis+1:]`
    * — numpy's single-advanced-index rule `p[:, ..., arr, ...]`. The
    * join is declarative — Catalyst broadcasts the small side, or
    * sort-merges on the key when both sides are big (the 100-TB plan).
    *
    * @param indices frame whose single payload column (or `valueCol`)
    *                holds the gather indices
    */
  def gatherAxis(indices: DcaFrame, axis: Int, valueCol: String = null): DcaFrame = {
    require(ndim >= 1, "gather needs ndim >= 1")
    val ax = Shape.toAbsoluteAxis(axis, ndim)
    val vcol = Option(valueCol).getOrElse {
      require(indices.arrayCols.size == 1,
        s"index frame must have exactly one payload column (or pass valueCol); got ${indices.arrayCols}")
      indices.arrayCols.head
    }
    // integral index column only — a fractional type would be silently
    // truncated by the cast below
    indices.df.schema(vcol).dataType match {
      case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType | _: LongType => ()
      case other => throw new IllegalArgumentException(
        s"gather index column $vcol must be integral, got ${other.catalogString}")
    }
    val n = shape(ax)
    val m = indices.ndim
    (Seq("__gsrc") ++ (0 until m).map(i => s"__gpos$i")).foreach { r =>
      require(!df.columns.contains(r), s"$r is a reserved column name") }
    // bounds+null check fused INTO the join key (per-row raise_error),
    // not a separate eager job: one evaluation of the index plan, so a
    // nondeterministic upstream (sample/rand) cannot pass a pre-check
    // and then silently DROP rows in the equi-join. A NULL index would
    // otherwise evaluate the join predicate to NULL and vanish,
    // leaving the claimed shape larger than the actual row count.
    val checkedSrc = when(col(vcol).isNull || col(vcol) < -n || col(vcol) >= n,
        raise_error(format_string(
          s"gather index %s null or out of bounds for dim $n", col(vcol).cast("string"))))
      .otherwise(when(col(vcol) < 0, col(vcol) + n).otherwise(col(vcol)))
      .cast(LongType).as("__gsrc")
    val idxSide = indices.df.select(
      (0 until m).map(i => col(s"__idx$i").as(s"__gpos$i")) :+ checkedSrc: _*)
    val joined = df.join(idxSide, col(s"__idx$ax") === col("__gsrc"))
    // axes before ax unchanged; the index frame's m axes land at
    // ax..ax+m-1; self's axes after ax shift by m-1
    val outIdx = (0 until ax).map(j => col(s"__idx$j").as(s"__idx$j")) ++
      (0 until m).map(i => col(s"__gpos$i").as(s"__idx${ax + i}")) ++
      ((ax + 1) until ndim).map(j => col(s"__idx$j").as(s"__idx${j + m - 1}"))
    val newShape = shape.take(ax) ++ indices.shape ++ shape.drop(ax + 1)
    derived(df = joined.select(outIdx ++ arrayCols.map(col): _*), shape = newShape)
  }

  /** Per-first-dim decomposition (S9) — a driver-boundary op. */
  def iterFirstDim(): Iterator[DcaFrame] = {
    require(ndim > 0, "iteration over a 0-d array")
    (0L until shape.head).iterator.map(i => apply(Indexing.Ix.I(i)))
  }

  // ---------------------------------------------------------------------
  // Projection / update (S11-S13)
  // ---------------------------------------------------------------------

  /** Elementwise fn over every array column (S11 `map_field`,
    * `array_dataclass.py:455-463`); pure projection, codegen-friendly.
    */
  def mapField(fn: Column => Column): DcaFrame =
    derived(df = df.select(idxCols.map(col) ++ arrayCols.map(n => fn(col(n)).as(n)): _*))

  /** `map_field` with structural recursion into nested dataclass
    * columns (S12 `_map_field`, `array_dataclass.py:740-770`; "Nested"
    * fixture): `fn` is applied to every LEAF (non-struct) field, struct
    * columns are rebuilt field-by-field — still a single projection, no
    * shuffle, and `withField`-free so the whole struct is rebuilt in
    * one codegen'd expression.
    */
  def mapFieldNested(fn: Column => Column): DcaFrame = {
    import org.apache.spark.sql.types.{StructType => ST}
    def rec(c: Column, dt: org.apache.spark.sql.types.DataType): Column = dt match {
      case st: ST =>
        struct(st.fields.map(f => rec(c.getField(f.name), f.dataType).as(f.name)): _*)
      case _ => fn(c)
    }
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    derived(df = df.select(idxCols.map(col) ++
      arrayCols.map(n => rec(col(n), types(n)).as(n)): _*))
  }

  /** Functional field update (S13 `replace`, `array_dataclass.py:467-494`). */
  def replaceField(name: String, value: Column): DcaFrame = {
    require(arrayCols.contains(name), s"unknown field $name")
    derived(df = df.select(idxCols.map(col) ++ arrayCols.map(n => (if (n == name) value else col(n)).as(n)): _*))
  }

  /** Replace a static field (never touches the data). */
  def replaceStatic(name: String, value: Any): DcaFrame =
    copy(statics = statics + (name -> value))

  /** Arbitrary per-element Scala function over the payload (V1's
    * general path — the analog of the reference's numpy loop,
    * `vectorization.py:333-347`). LAST RESORT by the custom-operator
    * preference order: it leaves whole-stage codegen (row-at-a-time
    * through an opaque closure); prefer Column expressions
    * ([[mapField]]/[[replaceField]]) whenever the body is expressible.
    * Distribution semantics are unchanged — narrow, per-partition.
    *
    * @param fn        payload Row => payload values (idx cols are
    *                  managed by the frame and not passed through fn)
    * @param newSchema schema of fn's output payload
    */
  def mapRows(fn: Row => Seq[Any], newSchema: StructType): DcaFrame = {
    val n = ndim
    val spark = df.sparkSession
    val outSchema = new StructType(
      (df.schema.fields.take(n) ++ newSchema.fields).toArray)
    val rdd = df.rdd.map { r =>
      Row.fromSeq(r.toSeq.take(n) ++ fn(Row.fromSeq(r.toSeq.drop(n))))
    }
    derived(df = spark.createDataFrame(rdd, outSchema),
      arrayCols = newSchema.fieldNames.toVector)
  }

  // ---------------------------------------------------------------------
  // Interop (I-ops): parquet round trip. The materialized index columns
  // ARE the serialized row identity/order (`array_dataclass.py:863-878`
  // pickle analog); shape is re-derived on load from the dense-index
  // invariant (per-axis max + 1).
  // ---------------------------------------------------------------------

  def saveParquet(path: String): Unit =
    df.select((idxCols ++ arrayCols).map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Typed case-class view of the payload (I1-I3/I5: the Encoder is
    * the Spark analog of the reference's pytree/backend conversion
    * boundary). Row ORDER is not defined on the returned Dataset — the
    * batch index is the order; use [[collectTyped]] for an ordered
    * driver-side materialization or keep working through the frame.
    */
  def asDataset[T: org.apache.spark.sql.Encoder]: org.apache.spark.sql.Dataset[T] =
    df.select(arrayCols.map(col): _*).as[T]

  /** Ordered driver-side typed materialization (small data / tests). */
  def collectTyped[T: org.apache.spark.sql.Encoder](): Seq[T] =
    df.orderBy(idxCols.map(col): _*).select(arrayCols.map(col): _*).as[T]
      .collect().toSeq

  /** Storage-placement analog of the reference's `.to(device)` (I6,
    * `array_dataclass.py:565-581`): placement is the cluster's job; the
    * user-controllable knob is the storage level.
    */
  def persist(level: org.apache.spark.storage.StorageLevel =
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DcaFrame =
    copy(df = df.persist(level))

  /** Release this frame's backing caches: the staged dense-index sort
    * (created by [[DcaFrame.fromDF]]/[[mask]] — only those CONSTRUCTING
    * frames carry it; derived views do not own it) plus any explicit
    * [[persist]] of the view itself. Neither this frame NOR any frame
    * derived from it may be used after release — downstream jobs would
    * re-execute the range shuffle with fresh sampled bounds and could
    * silently mis-index. The staged cache is also deregistered from the
    * session registry, so [[DcaFrame.releaseStaging]] won't double-free
    * it.
    */
  def unpersist(): DcaFrame = {
    staging.foreach { st =>
      DcaFrame.deregisterStaging(df.sparkSession, st)
      st.unpersist()
    }
    copy(df = df.unpersist(), staging = None)
  }

  // ---------------------------------------------------------------------
  // Vectorize alignment (V2): join the other frame on the shared batch
  // index after broadcasting both to the joint shape.
  // ---------------------------------------------------------------------

  /** Align `other` against this frame per the reference's vectorize
    * broadcast rules (`vectorization.py:246-300`): front-aligned dims
    * equal-or-1, arg may carry extra trailing dims. Returns the aligned
    * frame pair broadcast to the joint batch shape; caller then joins
    * on `__idx*` (equi-join; the dim-1 side was replicated via
    * broadcast crossJoin, i.e. a broadcast NLJ in Spark terms).
    */
  def alignForVectorize(other: DcaFrame): (DcaFrame, DcaFrame, Shape) = {
    val (joint, extra) = Shape.vectorizeBatch(shape, other.shape)
    val selfB = this.broadcastTo(joint)
    val otherB = other.broadcastTo(joint ++ extra)
    (selfB, otherB, joint)
  }

  /** Zip two same-shape frames on the batch index (inner equi-join on
    * `__idx*`) — the executed form of V2 arg alignment. Column clashes
    * from `other` get `suffix`.
    */
  def zipJoin(other: DcaFrame, suffix: String = "_r"): DcaFrame = {
    require(other.shape == shape, s"zipJoin shapes differ: $shape vs ${other.shape}")
    val rCols = other.arrayCols.map(n => if (arrayCols.contains(n)) n + suffix else n)
    val rdf = other.arrayCols.zip(rCols).foldLeft(other.df) { case (d, (o, n)) =>
      if (o == n) d else d.withColumnRenamed(o, n)
    }
    val joined = df.join(rdf, idxCols)
    derived(df = joined, arrayCols = arrayCols ++ rCols, statics = statics ++ other.statics)
  }

  /** Zip a frame whose shape EXTENDS this one's (`other.shape` =
    * `this.shape ++ extra`) on the shared leading index — the executed
    * form of V2's extra-trailing-dims broadcast
    * (`vectorization.py:246-300`): each self element is replicated
    * across its arg element's `extra` dims. Equi-join on the shared
    * `__idx*` prefix; the result carries other's full index (shape =
    * `other.shape`).
    */
  def zipJoinPrefix(other: DcaFrame, suffix: String = "_r"): DcaFrame = {
    require(other.shape.length >= ndim && other.shape.take(ndim) == shape,
      s"zipJoinPrefix: ${other.shape} does not extend $shape")
    if (other.ndim == ndim) zipJoin(other, suffix)
    else {
      val rCols = other.arrayCols.map(n => if (arrayCols.contains(n)) n + suffix else n)
      val rdf = other.arrayCols.zip(rCols).foldLeft(other.df) { case (d, (o, n)) =>
        if (o == n) d else d.withColumnRenamed(o, n)
      }
      val joined = df.join(rdf, idxCols) // shared prefix; right keeps __idx{ndim..}
      val outCols = DcaFrame.idxColNames(other.ndim).map(col) ++
        (arrayCols ++ rCols).map(col)
      DcaFrame(joined.select(outCols: _*), other.shape,
        arrayCols ++ rCols, statics ++ other.statics)
    }
  }

  /** V2 end-to-end: align `other` per the reference's vectorize
    * broadcast rules (leading dims broadcast, extra trailing dims
    * allowed) and zip on the batch index. Result shape =
    * joint ++ extra.
    */
  def vectorizeZip(other: DcaFrame, suffix: String = "_r"): DcaFrame = {
    val (selfB, otherB, _) = alignForVectorize(other)
    selfB.zipJoinPrefix(otherB, suffix)
  }
}

object DcaFrame {
  def idxColNames(ndim: Int): Vector[String] = (0 until ndim).map(i => s"__idx$i").toVector

  // Session-scoped registry of live dense-index staging caches, so a
  // long-lived session (Bench/Verify) can release everything between
  // rounds instead of accumulating one cache per constructed frame.
  // NOTE this is a bounded-until-release leak, not a weak cache: the
  // registered DataFrames strongly reference their SparkSession (the
  // map key), so entries are reclaimed only by releaseStaging /
  // unpersist — the WeakHashMap merely avoids pinning sessions that
  // never registered anything. Long-lived sessions constructing many
  // frames must call releaseStaging (Bench/Verify do) or unpersist
  // each constructed frame.
  private val liveStaging =
    new java.util.WeakHashMap[SparkSession, java.util.ArrayList[DataFrame]]()

  private def registerStaging(s: SparkSession, d: DataFrame): Unit =
    liveStaging.synchronized {
      var l = liveStaging.get(s)
      if (l == null) { l = new java.util.ArrayList[DataFrame](); liveStaging.put(s, l) }
      l.add(d)
    }

  /** Remove one staged frame from the session registry (identity
    * match) — called by [[DcaFrame.unpersist]] so an individually
    * released cache is not double-freed by [[releaseStaging]] and its
    * plan reference does not accumulate for the session's lifetime.
    */
  private[core] def deregisterStaging(s: SparkSession, d: DataFrame): Unit =
    liveStaging.synchronized {
      val l = liveStaging.get(s)
      if (l != null) {
        var i = 0
        while (i < l.size) { if (l.get(i) eq d) { l.remove(i); i = l.size } else i += 1 }
      }
    }

  /** Unpersist every staging cache created by [[fromDF]]/[[mask]] in
    * this session. Frames constructed before the release must be
    * discarded (their dense indices are only stable against the cached
    * materialization); rebuild them afterwards.
    *
    * @return number of caches released
    */
  def releaseStaging(s: SparkSession): Int = liveStaging.synchronized {
    val l = liveStaging.remove(s)
    if (l == null) 0
    else {
      l.forEach(_.unpersist())
      l.size
    }
  }

  /** Construct from an (already ordered-by sortCols) DataFrame, adding a
    * dense 1-D index. Ordering is established by a range-repartition +
    * partition-local sort, then indices are assigned with per-partition
    * offsets (zipWithIndex): two light jobs, no single-partition stage —
    * scales to arbitrarily large inputs.
    *
    * `sortCols` MUST be a unique key: ties would make the assigned row
    * identity depend on partitioning, breaking the deterministic-order
    * contract every downstream op relies on (SURVEY §1.1 row identity).
    */
  def fromDF(df: DataFrame, sortCols: Seq[Column], arrayCols: Seq[String] = Nil,
             statics: Map[String, Any] = Map.empty): DcaFrame = {
    val cols = if (arrayCols.nonEmpty) arrayCols.toVector else df.columns.toVector
    // ONE cached artifact (the staged sort, already materialized by the
    // offsets job inside denseIndex), ONE job total. The indexed frame is
    // a narrow codegen'd projection over that cache — re-deriving the
    // dense index per downstream job is a literal-array lookup, far
    // cheaper than a second persist + count of the projection was.
    val (indexed, n, staged) = denseIndex(df.select(cols.map(col): _*), sortCols)
    DcaFrame(indexed, Vector(n), cols, statics, staging = Some(staged))
  }

  /** Build a 1-D frame from a typed Dataset; row identity comes from
    * `sortCols` (must be a unique key — see [[fromDF]]).
    */
  def fromDataset[T](ds: org.apache.spark.sql.Dataset[T], sortCols: Seq[Column]): DcaFrame =
    fromDF(ds.toDF(), sortCols)

  /** Statics-only frame — the analog of a dataclass with ONLY static
    * fields (`array_dataclass.py:939-952`, which injects a dummy array
    * field so `.shape` works): an index-only lattice of the requested
    * shape carrying no payload columns. All shape algebra (reshape,
    * broadcast, slice, stack, concat) works; `mapField` is a no-op.
    */
  def staticOnly(spark: SparkSession, shape: Shape,
                 statics: Map[String, Any] = Map.empty): DcaFrame = {
    val n = Shape.size(shape)
    val flat = spark.range(n).select(col("id").cast(LongType).as("__idx0"))
    DcaFrame(flat, Vector(n), Vector.empty, statics).reshapeTo(shape)
  }

  /** Local construction (tests / small data): rows in given order. */
  def fromLocal(spark: SparkSession, rows: Seq[Row], schema: StructType,
                shape: Shape = null): DcaFrame = {
    val withIdx = rows.zipWithIndex.map { case (r, i) => Row.fromSeq(i.toLong +: r.toSeq) }
    val st = new StructType((new StructType().add("__idx0", LongType) ++ schema).toArray)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(withIdx, math.max(1, withIdx.size / 1000 + 1)), st)
    val base = DcaFrame(df, Vector(rows.size.toLong), schema.fieldNames.toVector)
    if (shape == null) base else base.reshapeTo(shape)
  }

  /** Load a frame saved with [[DcaFrame.saveParquet]]: shape comes from
    * the dense-index invariant (max+1 per `__idx*` column; one agg job).
    */
  def loadParquet(spark: SparkSession, path: String): DcaFrame = {
    val df = spark.read.parquet(path)
    val idxNames = df.columns.filter(_.startsWith("__idx"))
      .sortBy(_.stripPrefix("__idx").toInt).toVector
    val payload = df.columns.filterNot(idxNames.contains).toVector
    val shape: Shape =
      if (idxNames.isEmpty) Vector.empty
      else {
        val maxes = df.agg(
          max(col(idxNames.head)).as("m0"),
          idxNames.tail.zipWithIndex.map { case (n, i) => max(col(n)).as(s"m${i + 1}") }: _*).head()
        idxNames.indices.map(i =>
          if (maxes.isNullAt(i)) 0L else maxes.getLong(i) + 1L).toVector
      }
    DcaFrame(df, shape, payload)
  }

  /** Dense 0..n-1 index via range-partitioned sort + per-partition
    * offsets — the scalable replacement for `row_number()` over a
    * global window (SURVEY §7.5.1), kept entirely inside Tungsten:
    * `monotonically_increasing_id()` encodes (partitionId << 33 |
    * position-in-partition); a tiny per-partition count job turns that
    * into dense indices via a literal offset array. No per-row Row
    * ser/deser (the old `rdd.zipWithIndex` exit), no codegen break.
    *
    * The sorted input is persisted so the offsets job and every
    * downstream job see ONE materialization (a re-executed range
    * shuffle could re-sample different partition bounds and silently
    * mis-index). This staged cache is the frame's ONLY cache — it is
    * returned as a handle, carried on [[DcaFrame.staging]], registered
    * per session, and released via [[DcaFrame.unpersist]] or
    * [[DcaFrame.releaseStaging]].
    *
    * @return (indexed frame with `__idx0` prepended, total row count,
    *         staged Dataset backing the indexed view)
    */
  private[core] def denseIndex(df: DataFrame, sortCols: Seq[Column]): (DataFrame, Long, DataFrame) = {
    require(!df.columns.contains("__graft_mid"), "__graft_mid is a reserved column name")
    val sorted =
      if (sortCols.isEmpty) df
      else df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val staged = sorted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    registerStaging(df.sparkSession, staged)
    val withMid = staged.select(
      monotonically_increasing_id().as("__graft_mid") +: df.columns.map(col).toSeq: _*)
    val counts = withMid
      .select(shiftright(col("__graft_mid"), 33).cast("int").as("__pid"))
      .groupBy("__pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nPart = if (counts.isEmpty) 0 else counts.keys.max + 1
    val offsets = new Array[Long](nPart)
    var acc = 0L
    for (p <- 0 until nPart) { offsets(p) = acc; acc += counts.getOrElse(p, 0L) }
    val offCol =
      if (nPart == 0) lit(0L)
      else element_at(typedlit(offsets.toSeq), shiftright(col("__graft_mid"), 33).cast("int") + 1)
    val indexed = withMid.select(
      (offCol + col("__graft_mid").bitwiseAND(lit((1L << 33) - 1))).cast(LongType).as("__idx0")
        +: df.columns.map(col).toSeq: _*)
    (indexed, acc, staged)
  }

  /** Stack k same-shape frames along a NEW axis (M1, `ops.py:90-106`):
    * `unionByName` of the inputs, each tagged with its position on the
    * new axis — narrow, no shuffle. Static fields come from the first
    * element (matching the reference).
    */
  def stack(frames: Seq[DcaFrame], axis: Int = 0): DcaFrame = {
    require(frames.nonEmpty, "stack of empty sequence")
    val s0 = frames.head.shape
    require(frames.forall(_.shape == s0), s"stack shape mismatch: ${frames.map(_.shape)}")
    require(frames.forall(_.arrayCols == frames.head.arrayCols),
      "stack field mismatch (schema equality check, ops.py:63-71)")
    val ax = Shape.toAbsoluteAxisInsert(axis, s0.length)
    val ndimNew = s0.length + 1
    val tagged = frames.zipWithIndex.map { case (f, k) =>
      // old axis j -> new axis (j < ax ? j : j+1); new axis ax = k
      var d = f.df
      for (j <- (s0.length - 1) to 0 by -1)
        d = d.withColumnRenamed(s"__idx$j", s"__nidx${if (j < ax) j else j + 1}")
      d.withColumn(s"__nidx$ax", lit(k.toLong))
    }
    val unioned = tagged.reduce(_ unionByName _)
    val newShape = (s0.take(ax) :+ frames.size.toLong) ++ s0.drop(ax)
    val fin = (0 until ndimNew).foldLeft(unioned)((d, i) => d.withColumnRenamed(s"__nidx$i", s"__idx$i"))
    DcaFrame(
      fin.select(idxColNames(ndimNew).map(col) ++ frames.head.arrayCols.map(col): _*),
      newShape, frames.head.arrayCols, frames.head.statics)
  }

  /** Concatenate along an EXISTING axis (M2, `ops.py:109-121`):
    * `unionByName` with a cumulative offset on that axis — narrow.
    */
  def concat(frames: Seq[DcaFrame], axis: Int = 0): DcaFrame = {
    require(frames.nonEmpty, "concat of empty sequence")
    val h = frames.head
    val ax = Shape.toAbsoluteAxis(axis, h.shape.length)
    frames.foreach { f =>
      require(f.shape.length == h.shape.length &&
        f.shape.zipWithIndex.forall { case (d, i) => i == ax || d == h.shape(i) },
        s"concat shape mismatch on non-concat axis: ${frames.map(_.shape)}")
      require(f.arrayCols == h.arrayCols, "concat field mismatch")
    }
    val offsets = frames.map(_.shape(ax)).scanLeft(0L)(_ + _)
    val shifted = frames.zip(offsets).map { case (f, off) =>
      if (off == 0L) f.df
      else f.df.withColumn(s"__idx$ax", col(s"__idx$ax") + lit(off))
    }
    val newShape = h.shape.updated(ax, frames.map(_.shape(ax)).sum)
    DcaFrame(shifted.reduce(_ unionByName _), newShape, h.arrayCols, h.statics)
  }
}
