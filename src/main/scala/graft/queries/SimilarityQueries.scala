package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import QueryDef.table

/** Similarity search over the `embeddings` table (array<float>[64]).
  * Brute-force cosine top-k carries a full DuckDB oracle (the fold
  * order and double-casts are mirrored exactly, so scores are
  * bit-identical); the LSH ANN variant is the scale path, recall-tested
  * in SimilaritySpec against the brute-force baseline.
  */
object SimilarityQueries {

  private val K = 10
  private val QueryIds = Seq(0L, 1L, 2L)

  val defs: Map[String, QueryDef] = Map(

    "sim1_cosine_topk" -> QueryDef(
      (s, dir) => {
        graft.functions.VectorExpressions.register(s)
        val emb = table(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id").isInCollection(QueryIds))
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        // native codegen'd dot product; bit-identical to the HOF path
        // (same accumulation order), so the DuckDB oracle is unchanged
        Similarity.bruteForceTopK(emb, queries, K, native = true)
          .orderBy("qid", "rank")
      },
      Some(s"""WITH q AS (
             |  SELECT vec_id AS qid, embedding AS qvec FROM embeddings
             |  WHERE vec_id IN (0, 1, 2)),
             |scored AS (
             |  SELECT q.qid, e.vec_id,
             |    list_reduce(list_prepend(0.0, list_transform(range(1, 65),
             |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE))),
             |      (a, b) -> a + b)
             |    / (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, 65),
             |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))),
             |      (a, b) -> a + b))
             |      * sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, 65),
             |        i -> CAST(q.qvec[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE))),
             |      (a, b) -> a + b))) AS cos
             |  FROM embeddings e, q WHERE e.vec_id <> q.qid)
             |SELECT qid, CAST(row_number() OVER
             |    (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
             |  vec_id, CAST(floor(cos * 1e6) AS BIGINT) AS cos_micro
             |FROM scored
             |QUALIFY rank <= $K
             |ORDER BY qid, rank""".stripMargin)),

    // IVF ANN: nearest-centroid cells, nProbe probing, exact re-rank
    // within probed cells. Approximate — rows-only check; recall vs
    // brute force covered in SimilaritySpec.
    "sim3_ivf_ann" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id").isInCollection(QueryIds))
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfTopK(emb, queries, K, nCells = 16, nProbe = 6, refineIters = 2)
          .orderBy("qid", "rank")
      },
      None),

    // LSH-bucketed ANN (sign-random-projection): the 100-TB path — the
    // corpus is hashed once and probed per band; approximate by design,
    // so no equality oracle (recall vs brute force covered in
    // SimilaritySpec). Driver records the rows-only check.
    "sim2_lsh_ann" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id").isInCollection(QueryIds))
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.lshTopK(emb, queries, K, dims = 64)
          .orderBy("qid", "rank")
      },
      None)
  )
}
