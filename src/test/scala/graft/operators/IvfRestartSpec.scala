package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.SparkTestBase

/** Checkpoint-restart contract of the PERSISTED IVF index (the sim18
  * append + sim19/sim3 probe path), mirroring the EventStream restart
  * specs: every maintenance step — append, probe — must work in a
  * SESSION that did not perform the build, reading only the on-disk
  * artifacts (centroids + cell-partitioned vectors). `newSession()`
  * gives a fresh session state (empty temp catalog, fresh SQL conf,
  * no cached plans) over the shared test SparkContext — anything the
  * warm path left in session state (temp views, cached relations,
  * registered functions) would make the cold replay diverge or throw.
  * A JVM-level restart additionally clears executor/block-manager
  * state, which parquet round-trips by construction.
  */
class IvfRestartSpec extends SparkTestBase {

  private val dims = 32

  private def vec(id: Int): Seq[Float] = {
    val cluster = id % 5
    (0 until dims).map { i =>
      math.sin(cluster * 17.0 + i).toFloat +
        0.05f * math.sin(id * 31.0 + i * 7.0).toFloat
    }
  }

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Build the fixture IN a given session — frames are session-bound,
    * so the cold-session steps must construct their inputs there.
    */
  private def frame(s: SparkSession, ids: Range) =
    s.createDataFrame(
      s.sparkContext.parallelize(ids.map(i => Row(i.toLong, vec(i))), 4),
      embSchema)

  test("IVF index built warm, appended and probed across session restarts, matches the all-warm result") {
    val oldIds = 0 until 80
    val deltaIds = 80 until 100
    val qIds = 0 until 3

    def queriesIn(s: SparkSession) = frame(s, qIds)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def probe(s: SparkSession, dir: String) =
      Similarity.ivfIndexTopK(s, dir, queriesIn(s), 10, nProbe = 3)
        .select("qid", "rank", "vec_id", "cos_micro")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq

    // ALL-WARM reference: build + append + probe in the shared session
    val warmDir = java.nio.file.Files.createTempDirectory("graft_ivf_warm").toString
    Similarity.buildIvfIndex(frame(spark, oldIds), warmDir, nCells = 8, refineIters = 1)
    Similarity.appendToIvfIndex(spark, frame(spark, deltaIds), warmDir)
    val expected = probe(spark, warmDir)
    assert(expected.nonEmpty, "fixture must return neighbors")

    // COLD path: same build, then a session restart before EACH
    // maintenance step
    val coldDir = java.nio.file.Files.createTempDirectory("graft_ivf_cold").toString
    Similarity.buildIvfIndex(frame(spark, oldIds), coldDir, nCells = 8, refineIters = 1)
    val afterBuildRestart = spark.newSession()
    Similarity.appendToIvfIndex(afterBuildRestart,
      frame(afterBuildRestart, deltaIds), coldDir)
    val afterAppendRestart = spark.newSession()
    val got = probe(afterAppendRestart, coldDir)
    assert(got == expected,
      s"cold-session probe diverged from all-warm:\n cold=$got\n warm=$expected")

    // the appended delta must actually be visible cold: a delta-id
    // query's own vector neighborhood includes delta rows
    val deltaQ = frame(afterAppendRestart, 80 until 81)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val deltaNbrs = Similarity.ivfIndexTopK(afterAppendRestart, coldDir, deltaQ, 10, nProbe = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(deltaNbrs.exists(_ >= 80L),
      s"append lost across restart: neighbors $deltaNbrs contain no delta ids")
  }
}
