package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._
import graft.core.SparkTestBase

class GraftIOSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("v", DoubleType)))

  test("csv and json round-trip with explicit schema; partitioned parquet prunes") {
    val base = Files.createTempDirectory("graft_io").toFile.getAbsolutePath
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)).toDF("id", "name", "v")

    GraftIO.writeCsv(df, s"$base/csv")
    val csv = GraftIO.readCsv(spark, s"$base/csv", schema)
    assert(csv.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)))

    GraftIO.writeJson(df, s"$base/json")
    val json = GraftIO.readJson(spark, s"$base/json", schema)
    assert(json.count() == 3)

    GraftIO.writeParquet(df, s"$base/pq", partitionBy = Seq("name"))
    val pruned = GraftIO.readParquet(spark, s"$base/pq").filter($"name" === "a")
    assert(pruned.count() == 2)
    // partition pruning visible in the scan (PartitionFilters on name)
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("name"), plan.take(500))
  }

  test("orc round-trips with partition pruning, like parquet") {
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graft_io_orc").toFile.getAbsolutePath
    val df = spark.range(100).selectExpr("id", "CAST(id % 4 AS INT) AS part")
    GraftIO.writeOrc(df, s"$base/t", partitionBy = Seq("part"))
    val back = GraftIO.readOrc(spark, s"$base/t")
    assert(back.count() == 100)
    val pruned = back.filter(col("part") === 2)
    assert(pruned.count() == 25)
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("part"), plan.take(500))
  }

  test("FAILFAST surfaces malformed csv rows instead of silent nulls") {
    val base = Files.createTempDirectory("graft_io_bad").toFile.getAbsolutePath
    Files.writeString(java.nio.file.Paths.get(s"$base/bad.csv"), "id,name,v\nnot_a_long,a,1.5\n")
    intercept[Exception] {
      GraftIO.readCsv(spark, s"$base/bad.csv", schema).collect()
    }
  }
}
