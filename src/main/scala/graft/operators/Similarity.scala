package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, mirroring what a 100 TB pipeline needs:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness
  *     baseline; broadcast the (small) query set, scan the corpus once.
  *   - [[lshTopK]]: sign-random-projection LSH bucketing — the scale
  *     path: corpus hashed once, candidates only within matching
  *     buckets (multi-probe via bands), exact re-rank on candidates.
  *
  * Arithmetic notes: floats are cast to double BEFORE multiplication and
  * the dot product is a left-to-right `aggregate` fold, so results are
  * bit-reproducible across engines (the DuckDB oracle mirrors the fold).
  */
object Similarity {

  /** Left-fold dot product of two array<float> columns in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Same accumulation via the native codegen'd expression
    * [[graft.functions.DotF32]] (register it first:
    * `VectorExpressions.register(spark)`). Bit-identical result, no
    * per-row intermediate array.
    */
  def dotNative(a: Column, b: Column): Column = call_function("dot_f32", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  def cosineNative(a: Column, b: Column): Column =
    dotNative(a, b) / (sqrt(dotNative(a, a)) * sqrt(dotNative(b, b)))

  /** Exact top-k neighbors for each query vector.
    *
    * @param corpus  (id, vec) — the full embedding table
    * @param queries (qid, qvec) — SMALL; broadcast
    * @return (qid, rank, id, cos_micro) — rank 1..k by cosine desc,
    *         ties broken by id; cosine as floor(1e6 * cos) BIGINT
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     qidCol: String = "qid", qvecCol: String = "qvec",
                     native: Boolean = false): DataFrame = {
    val cos: (Column, Column) => Column = if (native) cosineNative else cosine
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("__cos", cos(col(vecCol), col(qvecCol)))
    val w = Window.partitionBy(qidCol).orderBy(col("__cos").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank").cast("long").as("rank"), col(idCol),
        floor(col("__cos") * 1e6).cast("long").as("cos_micro"))
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nCells` cells
    * by nearest centroid, probe only the `nProbe` cells nearest each
    * query, exact re-rank within the probed cells.
    *
    * Centroids here are sampled deterministically from the corpus (the
    * classic bootstrap; a k-means refinement would reuse the same
    * assignment machinery). Scale shape: the cell assignment is one
    * broadcast-join pass over the corpus (and would be persisted/
    * bucketed BY cell in a real deployment so queries touch only
    * nProbe/nCells of the data).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4, refineIters: Int = 0,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    // deterministic centroid sample by id stride: no global sort of the
    // corpus (TakeOrdered gathers only nCells rows)
    val total = corpus.count()
    val stride = math.max(1L, total / nCells)
    val bootstrap = corpus.filter(pmod(col(idCol), lit(stride)) === 0)
      .orderBy(idCol).limit(nCells)
      .select(col(idCol).as("__cell"), col(vecCol).as("__cvec"))
    val centroids = refineCentroids(corpus, bootstrap, refineIters, idCol, vecCol)

    val cells = corpus.crossJoin(broadcast(centroids))
      .withColumn("__csim", cosine(col(vecCol), col("__cvec")))
      .withColumn("__crank", row_number().over(
        Window.partitionBy(idCol).orderBy(col("__csim").desc, col("__cell").asc)))
      .filter(col("__crank") === 1)
      .select(col(idCol), col(vecCol), col("__cell"))

    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("__csim", cosine(col(qvecCol), col("__cvec")))
      .withColumn("__crank", row_number().over(
        Window.partitionBy(qidCol).orderBy(col("__csim").desc, col("__cell").asc)))
      .filter(col("__crank") <= nProbe)
      .select(col(qidCol), col(qvecCol), col("__cell"))

    val cands = cells.join(broadcast(probes), "__cell")
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("__cos", cosine(col(vecCol), col(qvecCol)))
    val rw = Window.partitionBy(qidCol).orderBy(col("__cos").desc, col(idCol).asc)
    cands.withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank").cast("long").as("rank"), col(idCol),
        floor(col("__cos") * 1e6).cast("long").as("cos_micro"))
  }

  /** Lloyd (k-means) refinement of IVF centroids: assign every vector
    * to its nearest centroid, replace each centroid by its cell's mean.
    * Fully distributed: the mean is a posexplode → (cell, dim) avg →
    * array reassembly; per iteration one broadcast-assign pass plus one
    * small shuffle keyed on (cell, dim). Cells that lose all members
    * keep their previous centroid.
    */
  def refineCentroids(corpus: DataFrame, centroids0: DataFrame, iters: Int,
                      idCol: String, vecCol: String): DataFrame = {
    var cents = centroids0
    for (_ <- 0 until iters) {
      val assigned = corpus.crossJoin(broadcast(cents))
        .withColumn("__csim", cosine(col(vecCol), col("__cvec")))
        .withColumn("__crank", row_number().over(
          Window.partitionBy(idCol).orderBy(col("__csim").desc, col("__cell").asc)))
        .filter(col("__crank") === 1)
        .select(col("__cell"), col(vecCol))
      val means = assigned
        .select(col("__cell"), posexplode(col(vecCol)).as(Seq("__pos", "__x")))
        .groupBy("__cell", "__pos")
        .agg(avg(col("__x").cast("double")).as("__m"))
        .groupBy("__cell")
        .agg(transform(
          array_sort(collect_list(struct(col("__pos"), col("__m")))),
          e => e.getField("__m").cast("float")).as("__newvec"))
      // keep old centroid for cells with no members this round
      cents = cents.join(means, Seq("__cell"), "left")
        .select(col("__cell"), coalesce(col("__newvec"), col("__cvec")).as("__cvec"))
    }
    cents
  }

  /** Deterministic pseudo-random hyperplane weight for (dim i, plane j):
    * a fixed integer mix folded to [-0.5, 0.5). Public-constant mixing,
    * reproducible everywhere, no RNG state.
    */
  private def weight(i: Int, j: Int): Double = {
    var x = i.toLong * 1315423911L ^ j.toLong * 2654435761L
    x ^= (x >>> 13); x *= 1274126177L; x ^= (x >>> 16)
    ((((x % 100000L) + 100000L) % 100000L).toDouble / 100000.0) - 0.5
  }

  /** `planes`-bit sign code of a vector under the fixed hyperplanes,
    * as a bit string (engine-portable, substring-bandable).
    */
  def signCode(vec: Column, dims: Int, planes: Int): Column =
    concat_ws("", (0 until planes).map { j =>
      val proj = aggregate(
        zip_with(vec, array((0 until dims).map(i => lit(weight(i, j))): _*),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, "1").otherwise("0")
    }: _*)

  /** LSH ANN: band the sign code (bands of `rowsPerBand` bits); query
    * and corpus rows sharing any band bucket become candidates; exact
    * cosine re-rank keeps top-k. Recall < 1 by construction; raise
    * `planes`/lower `rowsPerBand` to trade cost for recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dims: Int,
              planes: Int = 24, rowsPerBand: Int = 3,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val bands = planes / rowsPerBand
    def banded(df: DataFrame, id: String, vec: String, codeName: String) = {
      val coded = df.withColumn(codeName, signCode(col(vec), dims, planes))
      coded.select(col(id), col(vec),
        explode(transform(sequence(lit(0), lit(bands - 1)), j =>
          struct(j.as("band"), col(codeName).substr(j * rowsPerBand + 1, lit(rowsPerBand)).as("bits")))).as("b"))
        .select(col(id), col(vec), col("b.band"), col("b.bits"))
    }
    val c = banded(corpus, idCol, vecCol, "__code")
    val q = banded(queries, qidCol, qvecCol, "__qcode")
    val cands = c.join(broadcast(q), Seq("band", "bits"))
      .filter(col(idCol) =!= col(qidCol))
      .select(col(qidCol), col(qvecCol), col(idCol), col(vecCol))
      .distinct()
    val scored = cands.withColumn("__cos", cosine(col(vecCol), col(qvecCol)))
    // re-rank with the single-pass bounded top-k aggregator (O(k) state
    // per query) instead of a window sort over all candidates — at
    // corpus scale the window's per-key sort is the bottleneck
    import graft.functions.{ScoredId, TopKAgg}
    val spark = scored.sparkSession
    import spark.implicits._
    scored.select(col(qidCol).cast("long"), col(idCol).cast("long"), col("__cos"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, id, cos) => ScoredId(id, cos) }
      .agg(new TopKAgg(k).toColumn.name("topk"))
      .flatMap { case (qid, top) =>
        top.zipWithIndex.map { case (s, r) =>
          (qid, (r + 1).toLong, s.id, math.floor(s.score * 1e6).toLong)
        }
      }
      .toDF(qidCol, "rank", idCol, "cos_micro")
  }
}
