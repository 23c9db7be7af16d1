package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * north-star LLM-pipeline operator) expressed Spark-first over the
  * driver-generated parquet tables; [[oracleSql]] carries the equivalent
  * DuckDB SQL for the driver's hash-compare.
  */
object SparkEntry {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** Full operator registry: relational + DcaFrame structural ops +
    * LLM-pipeline extensions. A lazy val — the map (and everything the
    * defs construct eagerly) is built once, not per access.
    */
  private lazy val registry: Map[String, graft.queries.QueryDef] =
    graft.queries.Relational.defs ++ graft.queries.DcaQueries.defs ++
      graft.queries.EventQueries.defs ++ graft.queries.TextQueries.defs ++
      graft.queries.DedupQueries.defs ++ graft.queries.SimilarityQueries.defs ++
      graft.queries.MultimodalQueries.defs ++ Map(
      // TPC-H Q1-style full-scan aggregation: map-side partial agg, 2-col
      // groupBy — shuffles only the tiny partial-agg state at 100 TB.
      "q1_agg" -> graft.queries.QueryDef(
        (s, dir) => {
          t(s, dir, "lineitem")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
              sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"),
              sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_c"),
              count(lit(1)).as("n_rows"))
            .orderBy("l_returnflag", "l_linestatus")
        },
        Some("""SELECT l_returnflag, l_linestatus,
          |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
          |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
          |  count(*) AS n_rows
          |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, v) => k -> v.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, v) if v.oracle.isDefined => k -> v.oracle.get }
}
