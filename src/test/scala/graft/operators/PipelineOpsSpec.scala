package graft.operators

import graft.core.SparkTestBase
import org.apache.spark.sql.functions._

/** Specs for the round-7 pipeline additions: mm11 luma statistics,
  * q60 last-touch attribution, q61 rate anomaly, t24 RAG chunking,
  * t26 PPS sampling, t27 deletion propagation — each pinned against a
  * driver-side Scala model on a purpose-built fixture (the registry
  * oracles check the same semantics against DuckDB at sf0.01).
  */
class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def mix(id: Long): Long = ((id % 1000000007L) * 2654435761L) % 1000000007L
  private def polyHash(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)

  private def fixtureDir(): String =
    java.nio.file.Files.createTempDirectory("graft-pipeops-").toString

  test("lumaStats: flat raster flagged, addrPixel raster matches the formula replay") {
    // flat: one solid color -> single occupied bin, min == max, isFlat
    val img = new java.awt.image.BufferedImage(
      7, 5, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(200, 100, 50))
    g.fillRect(0, 0, 7, 5)
    g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val Some((w, h, nPx, lo, hi, dom, nDom, flat)) =
      Multimodal.lumaStats(out.toByteArray)
    val l = 299L * 200 + 587L * 100 + 114L * 50
    assert((w, h, nPx) == ((7, 5, 35L)))
    assert(lo == l && hi == l && flat)
    assert(dom == math.min(15L, l * 16 / 255000).toInt && nDom == 35L)

    // addrPixel raster: PNG decode must reproduce the arithmetic model
    val (aw, ah, id) = (9, 8, 42L)
    val Some((gw, gh, gn, glo, ghi, gdom, gnDom, gflat)) =
      Multimodal.lumaStats(Multimodal.encodePngAddr(aw, ah, id))
    val lumas = (0 until aw * ah).map { pos =>
      val p = Multimodal.addrPixel(id, pos.toLong)
      299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
    }
    val histo = lumas.groupBy(l => math.min(15L, l * 16 / 255000)).view.mapValues(_.size)
    val (mdom, mn) = histo.toSeq.sortBy { case (b, n) => (-n, b) }.head
    assert((gw, gh, gn) == ((aw, ah, aw.toLong * ah)))
    assert(glo == lumas.min && ghi == lumas.max)
    assert(gdom == mdom.toInt && gnDom == mn.toLong)
    assert(gflat == (lumas.max - lumas.min < 10000L))
    // corrupt bytes fall through, never throw
    assert(Multimodal.lumaStats(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("q60: purchases credit the latest preceding non-purchase touch; first is direct") {
    val dir = fixtureDir()
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // user 1: view, click, purchase(->click), purchase(->click), error,
    // purchase(->error); user 2: purchase with no prior touch (->direct)
    Seq(
      (1L, ts(1), 1L, "view", 1.0, "{}"),
      (2L, ts(2), 1L, "click", 2.0, "{}"),
      (3L, ts(3), 1L, "purchase", 10.0, "{}"),
      (4L, ts(4), 1L, "purchase", 20.0, "{}"),
      (5L, ts(5), 1L, "error", 0.0, "{}"),
      (6L, ts(6), 1L, "purchase", 30.0, "{}"),
      (7L, ts(1), 2L, "purchase", 40.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("q60_attribution")(spark, dir)
      .as[(String, Long, Long)].collect().toList
    assert(got == List(("click", 2L, 3000L), ("direct", 1L, 4000L),
      ("error", 1L, 3000L)))
  }

  test("q61: a 4x spike over a quiet trailing day is flagged; warmup hours are not") {
    val dir = fixtureDir()
    // 30 quiet hours of 4 events, then one hour with 16 (4x trailing avg)
    val rows = (0 until 30).flatMap { hr =>
      (0 until 4).map(i => (hr.toLong * 100 + i,
        new java.sql.Timestamp(hr * 3600000L + i * 1000L), 1L, "view", 1.0, "{}"))
    } ++ (0 until 16).map(i => (9900L + i,
      new java.sql.Timestamp(30 * 3600000L + i * 1000L), 1L, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("q61_rate_anomaly")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toList
    // only the spike hour: trailing 24h of the quiet rate, n=16 > 1.5*4
    assert(got == List(("view", 30L, 16L, 24L, 96L)))
  }

  test("t24: chunk rows equal the stride-24/width-32 model, tail included") {
    val dir = fixtureDir()
    def doc(id: Long, n: Int): (Long, String, String, String, Long) = {
      val text = (0 until n).map(i => s"w$i").mkString(" ")
      (id, text, "en", "s", text.length.toLong)
    }
    // sizes around the window/stride boundaries: 1, 24, 25, 32, 80
    Seq(doc(1, 1), doc(2, 24), doc(3, 25), doc(4, 32), doc(5, 80))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // sorted here: the query dropped its trailing presentation sort
    // (fact-sized output; the gate compare is order-insensitive)
    val got = graft.SparkEntry.queries("t24_rag_chunk")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toList.sorted
    val want = Seq((1L, 1), (2L, 24), (3L, 25), (4L, 32), (5L, 80)).flatMap {
      case (id, n) =>
        val toks = (0 until n).map(i => s"w$i")
        (0 to (n - 1) / 24).map { k =>
          val chunk = toks.slice(k * 24, k * 24 + 32)
          (id, k.toLong, k.toLong * 24, chunk.size.toLong,
            polyHash(chunk.mkString(" ")))
        }
    }.toList
    assert(got == want)
    // coverage: consecutive chunks overlap by exactly 32-24=8 tokens
    // (or the tail is shorter), and every token index is covered
    want.groupBy(_._1).foreach { case (_, cs) =>
      val covered = cs.flatMap(c => c._3 until (c._3 + c._4)).toSet
      val n = cs.map(c => c._3 + c._4).max
      assert(covered == (0L until n).toSet)
    }
  }

  test("t26: keep rule and Horvitz-Thompson rescale match the integer model") {
    val dir = fixtureDir()
    val docs = (0L until 200L).map { id =>
      val n = 20 + (id * 37 % 600) // spans under- and over-cap weights
      (id, "x", "en", s"s${id % 3}", n)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("t26_pps_sample")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    val want = docs.groupBy(_._4).toSeq.sortBy(_._1).map { case (src, ds) =>
      val rates = ds.map { case (id, _, _, _, n) =>
        (n, math.min(1000000L, n * 1000000L / 400), mix(id) % 1000000L)
      }
      val kept = rates.filter { case (_, r, h) => h < r }
      val exact = rates.map(_._1).sum
      val est = kept.map { case (n, r, _) => n * 1000000L / r }.sum
      (src, ds.size.toLong, exact, kept.size.toLong, est,
        math.abs(est - exact) * 1000 / exact)
    }.toList
    assert(got == want)
    // PPS must beat nothing-kept and keep large docs at full rate
    assert(got.forall(_._4 > 0))
  }

  test("d18: every URL decoration variant canonicalizes to the shared base") {
    val dir = fixtureDir()
    // doc ids 0..3 are the four variants of ONE base (id%25, id%9 equal
    // would need same mods — use ids 0,1,2,3 with distinct bases, then
    // ids 100..103 ≡ 0..3 mod 4 but different bases; instead check that
    // ids sharing (id%25, id%9) collapse: 0 and 900 (900%25=0, 900%9=0,
    // 900%4=0) — decorations differ only via id%4, so pick 0, 225, 450,
    // 675: all ≡ 0 mod 25 and mod 9, and mod 4 = 0,1,2,3 — all four
    // decorations of the same canonical URL.
    val ids = Seq(0L, 225L, 450L, 675L, 7L)
    ids.map(id => (id, "t", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("d18_url_dedup")(spark, dir)
      .as[(String, Long, Long)].collect().toList
    assert(got == List(("site0.org/page0", 4L, 0L), ("site7.org/page7", 1L, 7L)))
  }

  test("t30: rarer query terms outrank common ones; non-hits absent; length norm applies") {
    val dir = fixtureDir()
    // 'join' in every doc (df=4 of N=4 -> tiny idf); 'window' only in
    // doc 3 (df=1 -> large idf). Doc 3 must outrank the join-only docs.
    Seq(
      (1L, "join a b c", "en", "s", 1L),
      (2L, "join a b c", "en", "s", 1L),
      (3L, "window a b c", "en", "s", 1L),
      (4L, "join join a b c d e f", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("t30_keyword_search")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got.map(_._1).head == 3L, s"rare-term doc must rank first: $got")
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 4L), "every hit doc present")
    // docs 1 and 2 are identical; the tie must break by doc_id
    val d12 = got.filter(r => r._1 == 1L || r._1 == 2L).map(_._1)
    assert(d12 == List(1L, 2L))
  }

  test("t31: permille profiles bound dot and n2 by 1e6; identical sources score ~1e6") {
    val dir = fixtureDir()
    // sources A and B identical distributions; C disjoint vocabulary
    val docs = (0L until 30L).map { i =>
      val (src, text) =
        if (i % 3 == 0) ("A", "x y z x")
        else if (i % 3 == 1) ("B", "x y z x")
        else ("C", "p q r")
      (i, text, "en", src, 1L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("t31_source_similarity")(spark, dir)
      .as[(String, String, Long, Long)].collect().toList
    val ab = got.find(r => r._1 == "A" && r._2 == "B").get
    assert(ab._4 > 990000L, s"identical profiles must score ~1e6 ppm: $ab")
    got.filter(r => r._2 == "C" || r._1 == "C").foreach { r =>
      assert(r._3 == 0L && r._4 == 0L, s"disjoint vocab must score 0: $r")
    }
    // overflow bound: dot and therefore dot²·1e6 stay in range
    got.foreach(r => assert(r._3 <= 1000000L))
  }

  test("q63: the delta-join IVM plan equals a plain full recompute") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q63_ivm_join")(spark, dir)
      .as[(Long, Long, Long)].collect().toList
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val want = ord.join(li, ord("o_orderkey") === li("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("rev_c"), count(lit(1)).as("n_items"))
      .orderBy("o_custkey").as[(Long, Long, Long)].collect().toList
    assert(got == want)
    // the delta split must be non-trivial (all four terms contribute)
    assert(ord.filter(col("o_orderkey") % 10 === 0).count() > 0)
    assert(li.filter(col("l_partkey") % 7 === 0).count() > 0)
  }

  test("sim7: planted exact duplicates are mutual rank-1; no self pairs; ranks contiguous") {
    val vecs = (0L until 24L).map { i =>
      val v = (0 until 64).map(d =>
        (((i * 31 + d) * 2654435761L % 1000L) / 500.0f - 1.0f))
      (i, v)
    }
    // vector 23 duplicates vector 0 exactly
    val rows = vecs.dropRight(1) :+ (23L, vecs.head._2)
    val df = rows.toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.knnJoin(df, k = 3, dims = 64)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.forall(r => r._1 != r._3), "no self neighbors")
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toList == (1 to rs.size).toList)
    }
    val m = got.filter(r => r._2 == 1L).map(r => r._1 -> (r._3, r._4)).toMap
    assert(m(0L)._1 == 23L && m(23L)._1 == 0L, s"dup pair must be mutual rank-1: $m")
    assert(m(0L)._2 >= 999999L, "identical vectors score cos ~ 1")
  }

  test("q64: linear credit splits by preceding touch counts; direct gets full value") {
    val dir = fixtureDir()
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // user 1: view, view, click, purchase(30.00) -> view 2/3, click 1/3;
    // user 2: purchase(10.00) with no touches -> direct in full
    Seq(
      (1L, ts(1), 1L, "view", 0.0, "{}"),
      (2L, ts(2), 1L, "view", 0.0, "{}"),
      (3L, ts(3), 1L, "click", 0.0, "{}"),
      (4L, ts(4), 1L, "purchase", 30.0, "{}"),
      (5L, ts(1), 2L, "purchase", 10.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("q64_multitouch_attribution")(spark, dir)
      .as[(String, Long, Long)].collect().toList
    assert(got == List(
      ("click", 1L, 1000L),    // 3000 * 1 DIV 3
      ("direct", 1L, 1000L),
      ("error", 0L, 0L),
      ("signup", 0L, 0L),
      ("view", 1L, 2000L)))    // 3000 * 2 DIV 3
  }

  test("q65: except/intersect ALL keep multiplicities that DISTINCT ops drop") {
    val dir = fixtureDir()
    // part 7 returned 3x, accepted 1x -> 2 excess + 1 intersect;
    // part 9 only returned -> 2 excess; part 5 only accepted
    val rows = Seq(
      (7L, "R"), (7L, "R"), (7L, "R"), (7L, "A"),
      (9L, "R"), (9L, "R"), (5L, "A"))
    rows.zipWithIndex.map { case ((pk, fl), i) =>
      (i.toLong, pk, 1L, i, 1.0, 1.0, 0.0, 0.0, fl, "O",
        new java.sql.Timestamp(0L))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = graft.SparkEntry.queries("q65_multiset_ops")(spark, dir)
      .as[(String, Long, Long, Long)].collect().toList
    // except_all: {7: 2 excess, 9: 2} -> 4 rows, 2 keys, keysum 7*2+9*2=32
    // intersect_all: {7: 1} -> 1 row, 1 key, keysum 7
    assert(got == List(("except_all", 4L, 2L, 32L),
      ("intersect_all", 1L, 1L, 7L)))
  }

  test("d19: a planted dup triangle plus a lone pair census correctly") {
    val dir = fixtureDir()
    // docs 1,2,3 identical (triangle); 10,11 identical (edge); 20 unique
    val txt = "alpha beta gamma delta epsilon"
    val other = "zeta eta theta iota kappa"
    Seq((1L, txt), (2L, txt), (3L, txt), (10L, other), (11L, other),
      (20L, "lone words only here now"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("d19_dup_triangles")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    // nodes {1,2,3,10,11}; edges 4; wedges: three deg-2 nodes -> 3;
    // one triangle closes all of them pairwise -> closure 1000
    assert(got == List((5L, 4L, 3L, 1L, 1000L)))
  }

  test("q66: RFM thresholds segment a hand-built customer set") {
    val dir = fixtureDir()
    def ts(day: Int) = new java.sql.Timestamp(day * 86400000L)
    // cust 1: recent(<=90d), frequent(15), rich (>=3e8 total)
    // cust 2: stale (400d old), 1 order, poor
    val rows = (0 until 15).map(i =>
      (i.toLong, 1L, "O", 200000.00, ts(400 + i), "1-URGENT")) :+
      (100L, 2L, "O", 10.00, ts(50), "5-LOW")
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val got = graft.SparkEntry.queries("q66_rfm_segments")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    // corpus max date = day 414 (cust 1's last). cust 1: rec 0 -> r3,
    // f15 -> f3, 15*2e7 = 3e8 -> m3. cust 2: rec 364 -> r2, f1, m1.
    assert(got == List((3L, 3L, 3L, 1L, 300000000L), (2L, 1L, 1L, 1L, 1000L)))
  }

  test("mm12: every planted twin clusters with its base under one representative") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("mm12_image_dup_clusters")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    got.foreach { case (id, rep) => assert(rep <= id) }
    // base ids < 1e6; its twin is id + 1e6 and must share the rep
    got.keys.filter(_ < 1000000L).foreach { id =>
      assert(got.get(id + 1000000L).contains(got(id)),
        s"twin of $id not in the same cluster")
    }
  }

  test("d20: every planted eval copy is flagged at cos ~ 1 with its source eval id") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("d20_semantic_contamination")(spark, dir)
      .as[(Long, Long, Long)].collect().toList
    val planted = got.filter(_._1 >= 10000000L)
    assert(planted.nonEmpty, "fixture must plant contamination")
    planted.foreach { case (tid, eid, cm) =>
      assert(eid == tid - 10000000L, s"planted copy $tid must match its source")
      assert(cm >= 999999L, s"scaled copy must score cos ~ 1: $cm")
    }
  }

  test("d21: boilerplate chunks vanish from every doc; unique chunks survive") {
    val dir = fixtureDir()
    val banner = "nav home about contact terms privacy login search"
    val docs = (0L until 5L).map { id =>
      val body = (0 until 8).map(i => s"u${id}w$i").mkString(" ")
      (id, if (id < 4) s"$banner $body" else body, "en", "s", 1L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("d21_boilerplate_removal")(spark, dir)
      .as[(Long, String, Long, Long)].collect().toList
    // docs 0-3 carry the 8-word banner chunk (df=4 >= 3) -> dropped 1,
    // kept 1 (their unique body); doc 4 keeps its only chunk
    got.foreach { case (id, clean, kept, dropped) =>
      assert(!clean.contains("nav home"), s"banner must vanish from doc $id")
      if (id < 4) assert(kept == 1L && dropped == 1L, s"doc $id: $kept/$dropped")
      else assert(kept == 1L && dropped == 0L)
      assert(clean.contains(s"u${id}w0"), "unique body survives")
    }
  }

  test("t35: exactly the injected docs classify as code") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("t35_code_detection")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, _, kw, isCode) =>
      assert(isCode == (if (id % 5 == 0) 1L else 0L),
        s"doc $id: kw=$kw is_code=$isCode")
    }
  }

  test("t27: purge counts and survivor checksums propagate to every derived table") {
    val dir = fixtureDir()
    val docs = (0L until 100L).map { id =>
      val text = (0 until (1 + id % 20).toInt).map(i => s"t$i").mkString(" ")
      (id, text, "en", "s", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    (0L until 60L).map(v => (v, Seq(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val del = (0L until 100L).filter(id => mix(id) % 17 == 0).toSet
    val got = graft.SparkEntry.queries("t27_deletion_propagation")(spark, dir)
      .as[(String, Long, Long, Long)].collect().toList
    def sumMix(ids: Seq[Long]) = ids.map(mix).sum
    val chunkIds = docs.flatMap { case (id, text, _, _, _) =>
      val w = text.split(" ", -1)
      (0 until math.ceil(w.length / 8.0).toInt).map(_ => id)
    }
    val want = List(
      ("doc_chunks", chunkIds.count(del), chunkIds.filterNot(del).size.toLong,
        sumMix(chunkIds.filterNot(del))),
      ("documents", del.size.toLong, (100L - del.size),
        sumMix((0L until 100L).filterNot(del))),
      ("embeddings", (0L until 60L).count(del).toLong,
        (0L until 60L).filterNot(del).size.toLong,
        sumMix((0L until 60L).filterNot(del))))
      .map { case (t, a, b, c) => (t, a.toString.toLong, b, c) }
    assert(got == want)
    assert(del.nonEmpty, "fixture must exercise actual deletions")
  }
}
