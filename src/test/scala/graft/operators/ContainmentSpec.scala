package graft.operators

import org.apache.spark.sql.functions._
import graft.core.SparkTestBase

/** Semantics of the r7 additions: the directed containment join
  * (d22's operator), the list-output KMV sketch aggregator (q69's),
  * and the winnowing fingerprint query (t36) — each checked against an
  * independent driver-side model, not the engine's own arithmetic.
  */
class ContainmentSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("containment join pairs a quote with its source at tiny Jaccard") {
    val article = (1 to 60).map(i => s"word$i").mkString(" ")
    val quote = (1 to 10).map(i => s"word$i").mkString(" ") // first 10 words
    val unrelated = (100 to 140).map(i => s"other$i").mkString(" ")
    val d = docs(1L -> article, 2L -> quote, 3L -> unrelated)
    val shingled = d.select(col("doc_id"), TextOps.shingles(col("text"), 3).as("__sh"))
    val got = Dedup.containmentPairs(shingled, "doc_id", "__sh", num = 9, den = 10)
      .select("doc_a", "doc_b", "containment_pct")
      .as[(Long, Long, Long)].collect().toSet
    // quote ⊂ article: containment(2→1) = 100; the reverse direction is
    // 8/58 shingles — far below threshold; unrelated pairs with nobody.
    assert(got == Set((2L, 1L, 100L)))
  }

  test("containment join equals a driver-side brute-force model across thresholds") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a1", "b2", "c3", "d4", "e5", "f6", "g7", "h8")
    // bases + prefixes of bases (true containments) + chaff + short docs
    val corpus = (0 until 6).flatMap { i =>
      val n = 8 + rnd.nextInt(20)
      val base = Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
      Seq((i * 10).toLong -> base.mkString(" "),
        (i * 10 + 1).toLong -> base.take(4 + rnd.nextInt(n - 4)).mkString(" "))
    } ++ (0 until 7).map { i =>
      val n = 1 + rnd.nextInt(25)
      (100 + i).toLong -> Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    for ((num, den) <- Seq((9, 10), (3, 4), (1, 2))) {
      val model: Set[(Long, Long, Long)] = {
        def shingleSet(text: String): Set[String] = {
          val w = text.split(" ")
          if (w.length < 3) Set.empty
          else (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
        }
        val sets = corpus.map { case (id, t) => id -> shingleSet(t) }.toMap
        (for {
          (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
          if a != b && sa.nonEmpty
          inter = (sa & sb).size.toLong
          if inter * den >= sa.size.toLong * num
        } yield (a, b, math.floor(100.0 * inter / sa.size).toLong)).toSet
      }
      val d = docs(corpus: _*)
      val shingled = d.select(col("doc_id"), TextOps.shingles(col("text"), 3).as("__sh"))
      val got = Dedup.containmentPairs(shingled, "doc_id", "__sh", num, den)
        .select("doc_a", "doc_b", "containment_pct")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == model, s"threshold $num/$den")
      assert(model.nonEmpty, s"degenerate trial at $num/$den — tighten the generator")
    }
  }

  test("a built (persisted) containment index probes identically to the inline join") {
    val article = (1 to 40).map(i => s"w$i").mkString(" ")
    val quote = (1 to 10).map(i => s"w$i").mkString(" ")
    val half = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> article, 2L -> quote, 3L -> half)
    val shingled = d.select(col("doc_id"), TextOps.shingles(col("text"), 3).as("__sh"))
    val ix0 = Dedup.buildContainmentIndex(shingled, "doc_id", "__sh")
    val ix = Dedup.ContainmentIndex(
      ix0.sets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      ix0.sorted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    try {
      // the index is threshold-independent: one build, two probes,
      // each equal to the inline single-call operator
      for ((num, den) <- Seq((9, 10), (1, 2))) {
        val fromIx = Dedup.containmentPairsFromIndex(ix, num, den)
          .as[(Long, Long, Long)].collect().toSet
        val inline = Dedup.containmentPairs(shingled, "doc_id", "__sh", num, den)
          .as[(Long, Long, Long)].collect().toSet
        assert(fromIx == inline, s"threshold $num/$den")
        assert(fromIx.nonEmpty, s"degenerate fixture at $num/$den")
      }
    } finally { ix.sets.unpersist(); ix.sorted.unpersist(); () }
  }

  test("KMinListAgg keeps the k smallest distinct values across partition merges") {
    import graft.functions.KMinListAgg
    val values = (1 to 500).map(i => ((i * 7919L) % 1000L) + 1L) // dups by design
    val ds = spark.createDataset(values).repartition(7)
    val got = ds.groupByKey(_ => 1).mapValues(identity)
      .agg(new KMinListAgg(16).toColumn.name("mins"))
      .collect().head._2.toSeq
    val expect = values.distinct.sorted.take(16)
    assert(got == expect)
  }

  test("KMV set-op estimates are exact when both sketches are unsaturated") {
    import graft.functions.KMinListAgg
    // two overlapping sets, both under k=64 distinct values: the merged
    // sketch IS the union and the intersection count is exact
    val a = (1L to 40L).toSet
    val b = (30L to 55L).toSet
    val ds = (a.toSeq.map(("A", _)) ++ b.toSeq.map(("B", _))).toDS().repartition(5)
    val sk = ds.groupByKey(_._1).mapValues(_._2)
      .agg(new KMinListAgg(64).toColumn.name("mins"))
      .collect().toMap
    val minsA = sk("A").toSet
    val minsB = sk("B").toSet
    assert(minsA == a && minsB == b)
    val merged = (minsA ++ minsB).toSeq.sorted.take(64)
    assert(merged.size == (a ++ b).size) // unsaturated ⇒ union exact
    val nBoth = merged.count(v => minsA(v) && minsB(v))
    assert(nBoth == (a & b).size)
  }

  test("persisted near-dup index emits the same survivors as the inline path") {
    val corpus = docs(
      1L -> ("alpha beta gamma delta epsilon zeta eta theta " * 4).trim,
      2L -> ("completely different corpus article about mountains and rivers " * 4).trim)
    val incoming = docs(
      10L -> (("alpha beta gamma delta epsilon zeta eta theta " * 4).trim
        + " appended re-crawl banner"), // near-dup of corpus 1 -> dropped
      11L -> ("a genuinely new piece of writing about telemetry " * 4).trim,
      12L -> (("a genuinely new piece of writing about telemetry " * 4).trim
        + " trailing edit"), // near-dup of 11 -> dropped
      13L -> ("unrelated content with no overlap whatsoever at all " * 4).trim)
    val dir = java.nio.file.Files.createTempDirectory("graft_ndidx").toString
    Dedup.buildNearDupIndex(corpus, dir, "text", "doc_id")
    assert(new java.io.File(s"$dir/buckets").exists &&
      new java.io.File(s"$dir/hashes").exists)
    val fromIndex = Dedup.indexedNearDupSurvivors(spark, dir, incoming,
      "text", "doc_id").as[Long].collect().sorted.toSeq
    val inline = Dedup.incrementalNearDupSurvivors(corpus, incoming,
      "text", "doc_id").as[Long].collect().sorted.toSeq
    assert(fromIndex == inline && inline == Seq(11L, 13L),
      s"index=$fromIndex inline=$inline")
  }

  test("merged index probes identically to an index built over the union") {
    // the mergeNearDupIndex contract: merge(build(A), delta) == build(A ∪ delta)
    // as observed through every probe — including an incoming near-dup
    // of a DELTA doc, which only the delta's carried bands can catch
    val baseCorpus = docs(
      1L -> ("alpha beta gamma delta epsilon zeta eta theta " * 4).trim,
      2L -> ("completely different corpus article about mountains and rivers " * 4).trim)
    val delta = docs(
      5L -> ("fresh delta document about distributed index maintenance " * 4).trim)
    val incoming = docs(
      10L -> (("alpha beta gamma delta epsilon zeta eta theta " * 4).trim
        + " appended banner"), // near-dup of BASE 1 -> dropped
      11L -> (("fresh delta document about distributed index maintenance " * 4).trim
        + " trailing edit"), // near-dup of DELTA 5 -> dropped iff merge carried it
      12L -> ("unrelated content with no overlap whatsoever at all " * 4).trim)
    val baseDir = java.nio.file.Files.createTempDirectory("graft_ndm_base").toString
    val mergedDir = java.nio.file.Files.createTempDirectory("graft_ndm_m").toString
    val unionDir = java.nio.file.Files.createTempDirectory("graft_ndm_u").toString
    Dedup.buildNearDupIndex(baseCorpus, baseDir, "text", "doc_id")
    Dedup.mergeNearDupIndex(spark, baseDir, delta, mergedDir, "text", "doc_id")
    Dedup.buildNearDupIndex(baseCorpus.unionByName(delta), unionDir, "text", "doc_id")
    val viaMerged = Dedup.indexedNearDupSurvivors(spark, mergedDir, incoming,
      "text", "doc_id").as[Long].collect().sorted.toSeq
    val viaUnion = Dedup.indexedNearDupSurvivors(spark, unionDir, incoming,
      "text", "doc_id").as[Long].collect().sorted.toSeq
    assert(viaMerged == viaUnion && viaMerged == Seq(12L),
      s"merged=$viaMerged union=$viaUnion")
    intercept[IllegalArgumentException](
      Dedup.mergeNearDupIndex(spark, mergedDir, delta, mergedDir, "text", "doc_id"))
    // quiet ingest day: merging an EMPTY delta must produce an index
    // that probes identically to the base (schemas union cleanly, no
    // crash on the empty band/hash tables)
    val emptyDelta = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    val quietDir = java.nio.file.Files.createTempDirectory("graft_ndm_q").toString
    Dedup.mergeNearDupIndex(spark, baseDir, emptyDelta, quietDir, "text", "doc_id")
    val viaQuiet = Dedup.indexedNearDupSurvivors(spark, quietDir, incoming,
      "text", "doc_id").as[Long].collect().sorted.toSeq
    val viaBase = Dedup.indexedNearDupSurvivors(spark, baseDir, incoming,
      "text", "doc_id").as[Long].collect().sorted.toSeq
    assert(viaQuiet == viaBase, s"quiet=$viaQuiet base=$viaBase")
  }

  test("re-admitted delta id REPLACES its base index rows (delta wins)") {
    // round-8 ADVICE: a doc_id present in BOTH base and delta (a
    // re-crawl) must not yield two (id, hash-set) rows — the contract
    // is merge(build(A), Δ) == build((A \ ids(Δ)) ∪ Δ). Probe with a
    // near-dup of the OLD text (must now SURVIVE: the old version was
    // evicted) and a near-dup of the NEW text (dropped).
    val oldText = ("alpha beta gamma delta epsilon zeta eta theta " * 4).trim
    val newText = ("entirely rewritten article about glacier movement patterns " * 4).trim
    val other = ("completely different corpus article about mountains and rivers " * 4).trim
    val baseCorpus = docs(1L -> oldText, 2L -> other)
    val delta = docs(1L -> newText) // re-crawl of id 1, new content
    val baseDir = java.nio.file.Files.createTempDirectory("graft_ndr_base").toString
    val mergedDir = java.nio.file.Files.createTempDirectory("graft_ndr_m").toString
    val expectDir = java.nio.file.Files.createTempDirectory("graft_ndr_e").toString
    Dedup.buildNearDupIndex(baseCorpus, baseDir, "text", "doc_id")
    Dedup.mergeNearDupIndex(spark, baseDir, delta, mergedDir, "text", "doc_id")
    Dedup.buildNearDupIndex(docs(1L -> newText, 2L -> other), expectDir, "text", "doc_id")
    val incoming = docs(
      10L -> (oldText + " appended banner"),  // old v1 evicted -> survives
      11L -> (newText + " trailing edit"),    // near-dup of NEW v1 -> dropped
      12L -> ("unrelated content with no overlap whatsoever at all " * 4).trim)
    val viaMerged = Dedup.indexedNearDupSurvivors(spark, mergedDir, incoming,
      "text", "doc_id").as[Long].collect().sorted.toSeq
    val viaExpect = Dedup.indexedNearDupSurvivors(spark, expectDir, incoming,
      "text", "doc_id").as[Long].collect().sorted.toSeq
    assert(viaMerged == viaExpect && viaMerged == Seq(10L, 12L),
      s"merged=$viaMerged expected=$viaExpect")
    // structural pin: exactly ONE hash-set row per id after the merge
    val perId = spark.read.parquet(s"$mergedDir/hashes")
      .groupBy("__id").count().agg(max("count")).as[Long].collect().head
    assert(perId == 1L, s"duplicate (id, hash-set) rows survived merge: max=$perId")
  }

  test("round-7 operators tolerate empty and degenerate inputs") {
    val emptyDocs = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    val shingled = emptyDocs.select(col("doc_id"),
      TextOps.shingles(col("text"), 3).as("__sh"))
    assert(Dedup.containmentPairs(shingled, "doc_id", "__sh", 9, 10).count() == 0L)
    // a corpus of only sub-shingle docs: no tokens, no candidates, no crash
    val tiny = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.shingles(col("text"), 3).as("__sh"))
    assert(Dedup.containmentPairs(tiny, "doc_id", "__sh", 9, 10).count() == 0L)
    // KMinListAgg over an empty group domain yields no rows
    val noVals = spark.emptyDataset[Long]
    import graft.functions.KMinListAgg
    assert(noVals.groupByKey(_ => 1).mapValues(identity)
      .agg(new KMinListAgg(8).toColumn.name("m")).count() == 0L)
    // rand-proj ANN with an empty query set returns an empty frame
    val corpus = Seq((1L, Seq.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val noQueries = spark.emptyDataset[(Long, Seq[Float])].toDF("qid", "qvec")
    assert(Similarity.randProjTopK(corpus, noQueries, 3, dims = 8,
      projDims = 4, candC = 5).count() == 0L)
  }

  test("t36 winnowing matches a driver-side model of the MOSS algorithm") {
    // Hand corpus: a repeated phrase so windows share minima, plus a
    // doc below the w+n-1 lower bound (no complete window -> no row).
    val rows = Seq(
      (1L, ("alpha beta gamma delta " * 6).trim),
      (2L, (1 to 30).map(i => s"tok${i % 11}").mkString(" ")),
      (3L, "too short for any window"))
    val dir = java.nio.file.Files.createTempDirectory("graft_winnow").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("t36_winnowing")(spark, dir)
      .select("doc_id", "n_grams", "n_fp", "fp_checksum", "density_permille")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, ng, nfp, ck, dp) => id -> ((ng, nfp, ck, dp)) }.toMap
    val P = 1048576L
    def polyHash(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val model = rows.flatMap { case (id, text) =>
      val w = text.split(" ")
      if (w.length < 5) None
      else {
        val grams = (0 to w.length - 5).map(i => w.slice(i, i + 5).mkString(" "))
        if (grams.length < 4) None
        else {
          val keys = grams.zipWithIndex.map { case (g, p) =>
            polyHash(g) * P + (P - 1 - p)
          }
          val picks = (0 to keys.length - 4).map(t => keys.slice(t, t + 4).min).distinct
          val hashes = picks.map(_ / P)
          Some(id -> ((grams.length.toLong, picks.length.toLong,
            hashes.sum, picks.length.toLong * 1000 / (grams.length - 3))))
        }
      }
    }.toMap
    assert(got == model)
    assert(model(1L)._2 < model(1L)._1 - 3, "repetition must compress fingerprints")
  }
}
