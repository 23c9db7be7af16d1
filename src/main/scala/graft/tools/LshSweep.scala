package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Recall/cost sweep for the sign-LSH ANN parameters against the
  * brute-force baseline on the real embeddings table.
  *   sbt "runMain graft.tools.LshSweep /root/testdata/sf0.01"
  */
object LshSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, q, 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val n = emb.count()

    for ((planes, rows) <- Seq((16, 4), (24, 3), (32, 4), (24, 2), (48, 4))) {
      val t0 = System.nanoTime()
      val approx = Similarity.lshTopK(emb, q, 10, 64, planes, rows)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = (exact & approx).size.toDouble / exact.size
      println(f"[lsh] planes=$planes%-3d rows=$rows  recall=$recall%.2f  ${secs}%5.1fs (corpus $n)")
    }
    for (refine <- Seq(0, 1, 2); nProbe <- Seq(4, 6)) {
      val t0 = System.nanoTime()
      val approx = Similarity.ivfTopK(emb, q, 10, nCells = 16, nProbe = nProbe,
          refineIters = refine)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = (exact & approx).size.toDouble / exact.size
      println(f"[ivf] refine=$refine nProbe=$nProbe  recall=$recall%.2f  ${secs}%5.1fs")
    }
    for (nProbe <- Seq(4, 6, 8)) {
      val t0 = System.nanoTime()
      val approx = graft.operators.ProductQuant.ivfPqTopK(emb, q, 10, dims = 64,
          nCells = 16, nProbe = nProbe, m = 8, ks = 8, iters = 1, candC = 100)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = (exact & approx).size.toDouble / exact.size
      println(f"[ivfpq] nProbe=$nProbe  recall=$recall%.2f  ${secs}%5.1fs")
    }
    spark.stop()
  }
}
