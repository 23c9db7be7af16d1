package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** One registered operator: a Spark query over a scale-factor dir plus
  * (when SQL-expressible) the equivalent DuckDB oracle SQL.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {

  /** (doc_id, n_chars) decode MANIFEST, hash-repartitioned to the
    * session's parallelism. The multimodal fixtures GENERATE their
    * blobs inside the decode pass, so the distributable unit is this
    * 16-byte-per-row manifest — exactly how a production pipeline
    * parallelizes decode over a file listing: shuffle the paths, never
    * the bytes. Without the repartition the single-row-group
    * documents file pins every decode task count to the file's
    * row-group count (1 at every local SF) and the whole family runs
    * single-threaded regardless of cores.
    */
  def docManifest(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    import s.implicits._
    table(s, dir, "documents")
      .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .as[(Long, Long)]
  }

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Exact money/quantity encoding: cents as BIGINT on both engines —
    * avoids float-sum nondeterminism in the driver's hash compare.
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** DuckDB SQL for the polynomial rolling hash of string expression
    * `e` — the ONE rendering of [[graft.functions.PolyHash]]'s fold
    * (default base 31 mod 1e9+7) shared by every oracle that mirrors
    * it.
    */
  def polyHashSql(e: String, base: Int = 31, mod: Long = 1000000007L): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length($e) + 1),
       |        i -> CAST(ascii(substr($e, CAST(i AS INTEGER), 1)) AS BIGINT))),
       |      (acc, c) -> (acc * $base + c) % $mod)""".stripMargin

  /** DuckDB rendering of [[graft.operators.TextOps.knuthMix]] — the
    * ONE SQL mirror of the id scrambler (id reduced mod p before the
    * multiply: see the Scala side for the overflow bound).
    */
  def knuthMixSql(e: String): String =
    s"(($e % 1000000007) * 2654435761) % 1000000007"

  /** DuckDB CTE pair (`words`, `sh`) rendering the documents word
    * n-gram shingle set — the ONE SQL mirror of
    * [[graft.operators.TextOps.shingles]] shared by every dedup oracle
    * (distinct n-grams; docs shorter than n words yield no rows).
    */
  def shingleCtes(n: Int = 3, src: String = "documents"): String =
    s"""words AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
       |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+${n - 1}], ' ') AS s
       |       FROM words, UNNEST(range(1, len(w) - ${n - 2})) AS t(i))""".stripMargin

  /** DuckDB CTE chain (`sizes`, `prs`, `qp`) computing the exact
    * qualifying jaccard pairs over the `sh` shingle CTE at threshold
    * num/den — the ONE rendering of the pair-graph derivation shared
    * by the d2/d5 pair oracles and the d6 closure oracle (so a
    * threshold change cannot desynchronize them). `qp` carries
    * (da, db, jacc_pct).
    */
  def jaccardPairCtes(num: Int, den: Int): String =
    s"""sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |prs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
       |        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |        GROUP BY 1, 2),
       |qp AS (SELECT da, db,
       |    CAST(floor(100.0 * inter / (sa.n + sb.n - inter)) AS BIGINT) AS jacc_pct
       |  FROM prs JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
       |  WHERE inter * $den >= (sa.n + sb.n - inter) * $num)""".stripMargin

  /** DuckDB CTE chain computing `hv` = [[graft.functions.KMinAgg.scramble]]
    * of the poly hash of `keyExpr`, carrying `carried` columns from
    * `source` — the ONE SQL rendering of the scramble constants.
    * `dedupFinal` applies DISTINCT on (carried, hv) AFTER the scramble
    * (the mix is not injective; dedup must happen post-scramble on
    * both engines).
    */
  def scrambledHashCtes(source: String, carried: Seq[String], keyExpr: String,
                        dedupFinal: Boolean = false): String = {
    val keep = if (carried.isEmpty) "" else carried.mkString(", ") + ", "
    val dedup = if (dedupFinal) "DISTINCT " else ""
    s"""h0 AS (
       |  SELECT $keep${polyHashSql(keyExpr)} AS p0
       |  FROM $source),
       |h1 AS (SELECT $keep(p0 * 2654435761) % 1000000007 AS x1 FROM h0),
       |h2 AS (SELECT ${keep}xor(x1, x1 >> 15) AS x2 FROM h1),
       |h3 AS (SELECT $keep(x2 * 48271) % 1000000007 AS x3 FROM h2),
       |h AS (SELECT $dedup${keep}xor(x3, x3 >> 13) AS hv FROM h3)""".stripMargin
  }
}
