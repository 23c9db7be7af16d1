package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.queries.Staged

/** One-off sizing probe for the prefix-filter jaccard join: how many
  * prefix rows / candidate pairs / verified pairs at each stage, and
  * where the time goes. Not part of the library surface.
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sh = Staged.docShingles(spark, dir)
    val toks = sh.select(col("doc_id").as("__id"), explode(col("__sh")).as("__t"))
      .select(col("__id"), xxhash64(col("__t")).as("__th"))
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val nTok = timed("tokens")(toks.count())
    val freq = toks.groupBy("__th").agg(count(lit(1)).as("__cnt"))
    val (num, den) = (1, 2)
    val prefLen = (col("__n") - ceil(col("__n") * num / den) + 1).cast("int")
    val prefix = toks.join(freq, "__th")
      .groupBy("__id")
      .agg(array_sort(collect_list(struct(col("__cnt"), col("__th")))).as("__st"),
        count(lit(1)).as("__n"))
      .select(col("__id"), col("__n"),
        posexplode(slice(col("__st"), lit(1), greatest(prefLen, lit(1)))))
      .select(col("__id"), col("__n"), (col("pos") + 1).as("__pos"), col("col.__th").as("__th"))
      .persist()
    val nPref = timed("prefix rows")(prefix.count())
    val byTok = timed("max bucket") {
      prefix.groupBy("__th").agg(count(lit(1)).as("c")).agg(max("c"), sum(col("c") * col("c"))).head()
    }
    val (ln, rn) = (col("l.__n"), col("r.__n"))
    val alpha = ceil((ln + rn) * num / (num + den))
    val cands = prefix.as("l").join(prefix.as("r"),
        col("l.__th") === col("r.__th") && col("l.__id") < col("r.__id") &&
          greatest(ln, rn) * num <= least(ln, rn) * den &&
          least(ln - col("l.__pos"), rn - col("r.__pos")) + 1 >= alpha)
      .select(col("l.__id").as("doc_a"), col("r.__id").as("doc_b"))
    val nCandRaw = timed("raw cand pairs")(cands.count())
    val nCand = timed("distinct cand")(cands.distinct().count())
    println(s"[probe] tokens=$nTok prefix=$nPref maxBucket=${byTok.get(0)} sumSq=${byTok.get(1)} rawCands=$nCandRaw cands=$nCand")
    prefix.unpersist()
    spark.stop()
  }
}
