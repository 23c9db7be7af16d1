package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance similarity join via the deletion-neighborhood
  * (FastSS) method — Bocek, Hunt, Stiller, "Fast Similarity Search in
  * Large Dictionaries" (U. Zurich TR ifi-2007.02, public) — entity matching over names/titles where token-set
  * similarity (d5's jaccard) is blind to single-character edits.
  *
  * The naive plan is all-pairs levenshtein — O(n²) string DP, the worst
  * kind of scale-killer. Deletion neighborhoods turn it into an
  * equi-join: every string emits itself plus each single-character
  * deletion (len+1 variants); two strings within edit distance 1 MUST
  * share a variant (substitution at i ⇒ both i-deletions equal;
  * insert/delete ⇒ one's deletion equals the other's full string), so
  * candidates are exactly the variant-hash buckets and the final
  * `levenshtein ≤ 1` verify runs on candidates only. Shuffle volume is
  * (len+1)·n 8-byte hashes — strings join on their 64-bit variant hash,
  * full text rides only to the verify.
  *
  * Identical-string groups of size m produce m² lev-0 pairs — inherent
  * output, not blow-up. Only maxDist = 1 is supported (depth-k deletion
  * neighborhoods grow C(len,k); k=1 is the entity-matching sweet spot).
  */
object EditDistance {

  /** All single-character deletions of `s`, plus `s` itself. */
  private def deletionVariants(s: Column): Column =
    array_union(
      array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))

  /** Pairs (ka, kb, dist) with `levenshtein(strCol_a, strCol_b) <= 1`
    * and `ka < kb` — exact join, each pair once.
    */
  def editDistanceJoin(df: DataFrame, keyCol: String, strCol: String,
                       maxDist: Int = 1): DataFrame = {
    require(maxDist == 1, s"only maxDist=1 is supported, got $maxDist")
    val va = df
      .select(col(keyCol).as("k"), col(strCol).as("s"))
      .withColumn("h", explode(transform(deletionVariants(col("s")), xxhash64(_))))
    val a = va.select(col("k").as("ka"), col("s").as("sa"), col("h"))
    val b = va.select(col("k").as("kb"), col("s").as("sb"), col("h"))
    a.join(b, Seq("h"))
      .filter(col("ka") < col("kb"))
      .select("ka", "kb", "sa", "sb").distinct()
      .filter(levenshtein(col("sa"), col("sb")) <= 1)
      .select(col("ka"), col("kb"),
        levenshtein(col("sa"), col("sb")).cast("long").as("dist"))
  }
}
