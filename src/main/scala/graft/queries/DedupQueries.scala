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

    // SimHash near-dup pairs (hamming <= 3 over 64 bits, banded by
    // 16-bit chunks). xxhash64 is not reproducible in DuckDB → the
    // driver records the weaker rows-only check; semantics are covered
    // by DedupSpec against planted near-dups.
    "d3_simhash" -> QueryDef(
      (s, dir) => Dedup.simhashPairsFromShingles(Staged.docShingles(s, dir), "doc_id", "__sh",
          hashed = Some(Staged.docShingleHashes(s, dir)))
        .orderBy("doc_a", "doc_b"),
      None)
  )
}
