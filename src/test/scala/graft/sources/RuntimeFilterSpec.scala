package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.SparkTestBase

/** Runtime bloom-filter injection: at 100 TB the probe side of a
  * shuffle join must be pre-filtered by a bloom filter built from the
  * selective build side BEFORE the shuffle, or the exchange moves the
  * whole fact table. Spark injects this automatically (AQE runtime
  * filters); this spec pins the conditions under which our join shapes
  * actually get it, so a conf regression (or a join rewritten into a
  * non-qualifying shape) is caught.
  */
class RuntimeFilterSpec extends SparkTestBase {
  import spark.implicits._

  test("selective dim filter injects a bloom filter on the fact scan") {
    val dir = Files.createTempDirectory("rtf").toString
    (0L until 200L).map(k => (k, s"cat${k % 10}")).toDF("d_key", "d_cat")
      .write.mode("overwrite").parquet(s"$dir/dim")
    (0L until 20000L).map(i => (i % 200L, i)).toDF("f_key", "f_val")
      .write.mode("overwrite").parquet(s"$dir/fact")

    val before = Map(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      // tiny test tables: drop the 10GB application-side bar and force a
      // shuffle join (probe-side pruning is pointless under broadcast)
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("d_cat") === "cat3")
      val fact = spark.read.parquet(s"$dir/fact")
      val joined = fact.join(dim, col("f_key") === col("d_key"))
        .groupBy("d_cat").agg(sum("f_val").as("s"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a runtime bloom filter on the fact side:\n$optimized")
      assert(joined.collect().map(_.getLong(1)).sum > 0L)
    } finally before.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
