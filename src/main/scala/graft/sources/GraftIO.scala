package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources & sinks (SURVEY §2.6 scans row — absent in the reference,
  * first-class here): parquet / csv / json readers and writers with the
  * options a pipeline actually needs. Thin by design — the point is
  * that every format goes through the same DataFrame boundary, so every
  * operator upstream is format-agnostic.
  */
object GraftIO {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Schema-explicit CSV read (never infer at scale: inference is a
    * full extra pass over 100 TB).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "FAILFAST")
      .schema(schema)
      .csv(path)

  /** Schema-explicit JSON-lines read. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("mode", "FAILFAST").schema(schema).json(path)

  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC read/write — the other columnar format Spark ships natively;
    * same pushdown/pruning machinery as parquet (predicate pushdown
    * via ORC search arguments, column pruning, partition pruning).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
               partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }
}
