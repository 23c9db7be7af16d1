package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import QueryDef.table

/** Deduplication operators over the `documents` table. The MinHash-LSH
  * query's oracle is the EXACT pairwise-jaccard computation: the LSH
  * path must find every pair above threshold (recall tuned so the miss
  * probability is ~1e-5 per pair at j=0.4, ~0 at the planted j≈0.99),
  * and the exact verification step makes false positives impossible —
  * so LSH output == exact output.
  */
object DedupQueries {

  val defs: Map[String, QueryDef] = Map(

    // exact dedup: survivors = min doc_id per identical text
    "d1_exact_dedup" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        // concat the table with itself so there ARE duplicates to drop
        val doubled = docs.unionByName(docs)
        Dedup.exactSurvivors(doubled, "text", "doc_id").orderBy("doc_id")
      },
      Some("""WITH doubled AS (
             |  SELECT * FROM documents UNION ALL SELECT * FROM documents)
             |SELECT min(doc_id) AS doc_id FROM doubled GROUP BY text ORDER BY 1""".stripMargin)),

    // MinHash + LSH near-dup pairs, exact-verified at jaccard >= 0.4
    "d2_minhash_lsh" -> QueryDef(
      (s, dir) => Dedup.nearDupPairsFromShingles(Staged.docShingles(s, dir), "doc_id", "__sh",
          hashed = Some(Staged.docShingleHashes(s, dir)))
        .orderBy("doc_a", "doc_b"),
      Some("""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
             |       FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)),
             |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
             |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |          GROUP BY 1, 2)
             |SELECT da AS doc_a, db AS doc_b,
             |  CAST(floor(100.0 * inter / (sa.n + sb.n - inter)) AS BIGINT) AS jacc_pct
             |FROM pairs JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
             |WHERE inter * 5 >= (sa.n + sb.n - inter) * 2
             |ORDER BY 1, 2""".stripMargin)),

    // SimHash near-dup pairs (hamming <= 3 over 60 bits, banded by
    // 15-bit chunks; pigeonhole recall 1.0, exact hamming verify).
    // Uses the engine-portable 60-bit polynomial shingle hash so the
    // DuckDB oracle recomputes the sketches bit-for-bit and checks the
    // full result (the banding itself needs no oracle mirror: recall
    // is exactly 1 within the budget, so banded == all-pairs).
    "d3_simhash" -> QueryDef(
      (s, dir) => Dedup.simhashPairsFromShingles(Staged.docShingles(s, dir), "doc_id", "__sh",
          hashed = Some(Staged.docShingleHashesPortable(s, dir)), bits = 60)
        .orderBy("doc_a", "doc_b"),
      Some("""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
             |       FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)),
             |h AS (SELECT doc_id,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(s) + 1),
             |      i -> CAST(ascii(substr(s, CAST(i AS INTEGER), 1)) AS BIGINT))),
             |    (acc, c) -> (acc * 31 + c) % 1000000007)
             |  + list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(s) + 1),
             |      i -> CAST(ascii(substr(s, CAST(i AS INTEGER), 1)) AS BIGINT))),
             |    (acc, c) -> (acc * 37 + c) % 1073741789) * 1073741824 AS hv
             |  FROM sh),
             |votes AS (SELECT doc_id, j,
             |    CASE WHEN sum(CASE WHEN (hv >> CAST(j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) > 0
             |      THEN CAST(1 AS BIGINT) << CAST(j AS INTEGER) ELSE 0 END AS bitval
             |  FROM h, UNNEST(range(0, 60)) AS t(j) GROUP BY 1, 2),
             |sims AS (SELECT doc_id, sum(bitval) AS sim FROM votes GROUP BY 1)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
             |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.sim, b.sim)) <= 3
             |ORDER BY 1, 2""".stripMargin))
  )
}
