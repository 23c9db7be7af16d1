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
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Exact money/quantity encoding: cents as BIGINT on both engines —
    * avoids float-sum nondeterminism in the driver's hash compare.
    */
  def cents(c: Column): Column = round(c * 100).cast("long")
}
