package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH near-dup, SimHash near-dup. All distributed-first:
  * shuffles are on short keys (hashes / band buckets), never on full
  * document text; candidate generation is LSH (linear), with the exact
  * verification join only over candidates.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest id.
    * At scale: the shuffle key is the 64-bit content hash, not the
    * document body; collisions across different texts are impossible to
    * matter here because the aggregation key includes nothing else and
    * survivors are re-derived by id.
    */
  def exactSurvivors(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(xxhash64(col(textCol)).as("__h"), col(idCol))
      .groupBy("__h").agg(min(idCol).as(idCol))
      .select(idCol)

  /** Incremental-ingest dedup: keep an incoming row iff its text is
    * new against the EXISTING corpus (hash anti-join) and it is the
    * first occurrence within the incoming batch (min-id per hash).
    * The daily-crawl shape: both the anti-join and the in-batch
    * first-occurrence shuffle 64-bit hashes only — text never moves,
    * and the existing corpus is never re-deduplicated.
    */
  def incrementalSurvivors(existing: DataFrame, incoming: DataFrame,
                           textCol: String, idCol: String): DataFrame = {
    val exH = existing.select(xxhash64(col(textCol)).as("__h")).distinct()
    incoming.select(xxhash64(col(textCol)).as("__h"), col(idCol))
      .join(exH, Seq("__h"), "left_anti")
      .groupBy("__h").agg(min(idCol).as(idCol))
      .select(idCol)
  }

  // ---- MinHash + LSH ----------------------------------------------------

  /** Prime modulus for the permutation hashes: fits 32 bits so
    * a*h+b stays within Long.
    */
  private val P = 2147483647L
  /** Deterministic permutation parameters (public LCG constants). */
  private def aParam(i: Int): Long = 1L + 2L * ((1103515245L * i + 12345L) % (P / 4))
  private def bParam(i: Int): Long = (6364136223846793005L * i + 1442695040888963407L) % P match {
    case x if x < 0 => x + P
    case x => x
  }

  /** Permutation i's (a, b) and the modulus, read-only — the
    * d29 estimator oracle embeds them as SQL literals so the DuckDB
    * replay uses the EXACT permutation family.
    */
  private[graft] def permParams(i: Int): (Long, Long) = (aParam(i), bParam(i))
  private[graft] def permModulus: Long = P

  /** Engine-portable 60-bit shingle hash: two independent polynomial
    * hashes packed as bits 0..29 (base 31 mod 1e9+7) and 30..59
    * (base 37 mod 1073741789) — reproducible in any SQL engine with
    * 64-bit integer arithmetic (the DuckDB oracle recomputes it
    * exactly), unlike xxhash64. Mixing is weaker than xxhash64; prefer
    * [[shingleHashTable]]'s default in production and this one when
    * cross-engine verification matters. Requires
    * [[graft.functions.VectorExpressions.register]].
    */
  def portableHash60(c: Column): Column =
    call_function("poly_hash", c) +
      call_function("poly_hash", c, lit(37L), lit(1073741789L)) * lit(1073741824L)

  /** Per-(doc, shingle) rows with the RAW hash of each shingle
    * (default xxhash64). Hash each shingle string EXACTLY ONCE — the
    * array-lambda formulation re-evaluated the hash under every
    * permutation (k× work) because Catalyst does not CSE across lambda
    * bodies. The same table feeds both MinHash and SimHash
    * (stage/persist it when running both).
    */
  def shingleHashTable(docs: DataFrame, idCol: String, shinglesCol: String,
                       hashFn: Column => Column = xxhash64(_)): DataFrame =
    docs.select(col(idCol).as("__id"), explode(col(shinglesCol)).as("__s"))
      .select(col("__id"), hashFn(col("__s")).as("__h"))

  /** MinHash signatures as k flat columns `__m0..__m{k-1}`: explode →
    * hash once → single hash-aggregate with k codegen'd min()s. One
    * shuffle on the doc id; columnar the whole way — the plan that
    * survives 100 TB (the shingle table is the only wide thing and it
    * is never shuffled by text).
    */
  def signatureCols(docs: DataFrame, idCol: String, shinglesCol: String, k: Int): DataFrame =
    signatureColsFromHashes(shingleHashTable(docs, idCol, shinglesCol), k)

  /** Signatures from a pre-staged (__id, __h raw-hash) table. */
  def signatureColsFromHashes(hashed: DataFrame, k: Int): DataFrame = {
    val folded = pmod(col("__h"), lit(P))
    val aggs = (0 until k).map { i =>
      min(pmod(lit(aParam(i)) * folded + lit(bParam(i)), lit(P))).as(s"__m$i")
    }
    hashed.groupBy("__id").agg(aggs.head, aggs.tail: _*)
  }

  /** Scala-side mirror of the Column signature path ([[signatureColsFromHashes]]
    * over xxhash64 shingle hashes): the SAME seed-42 xxhash64 and the
    * same (aParam, bParam, P) permutations, evaluated per row — for
    * streaming operators that need a signature before any groupBy
    * exists ([[graft.streaming.EventStream.nearDupCandidates]]).
    * Returns None for docs with no shingles (the batch path drops them
    * too: explode of an empty array yields no group). Spec-pinned
    * equal to the Column path.
    */
  /** Scala-side xxhash64 (seed 42) of one shingle — the SAME hash the
    * Column path ([[shingleHashTable]]'s default) computes, for
    * streaming rows that need a doc's hash SET before any groupBy
    * exists ([[graft.streaming.EventStream.indexedNearDupAlerts]]).
    */
  def shingleHashLocal(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType, 42L)

  def minhashSignatureLocal(shingles: Iterable[String], k: Int): Option[Array[Long]] = {
    if (shingles.isEmpty) return None
    val sig = Array.fill(k)(Long.MaxValue)
    shingles.foreach { s =>
      val h0 = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType, 42L)
      val f = java.lang.Math.floorMod(h0, P)
      var i = 0
      while (i < k) {
        val v = java.lang.Math.floorMod(aParam(i) * f + bParam(i), P)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    Some(sig)
  }

  /** LSH candidate pairs from signatures: split into `bands` bands of
    * `rows` values, hash each band, bucket-join within (band, hash).
    *
    * For threshold t, miss probability per true pair is
    * (1 - t^rows)^bands — with rows=2, bands=64 a j=0.4 pair is missed
    * w.p. ~1.4e-5. Candidates are verified exactly downstream, so FPs
    * are free (just extra verify work) and recall is the only tunable.
    *
    * @param docs (id, shingles) — shingles as array<string>
    */
  def lshCandidates(docs: DataFrame, idCol: String, shinglesCol: String,
                    bands: Int, rows: Int): DataFrame =
    lshCandidatesFromHashes(shingleHashTable(docs, idCol, shinglesCol), bands, rows)

  /** Candidates from a pre-staged (__id, __h) shingle-hash table. */
  /** Band-bucket table (__id, band, bh) of a shingle-hash table — the
    * LSH index rows themselves. At scale this is the PERSISTED artifact
    * an incremental pipeline maintains: append the new batch's rows,
    * probe with an equi-join on the short (band, bh) key — see
    * [[incrementalNearDupSurvivors]].
    */
  def bandBuckets(hashed: DataFrame, bands: Int, rows: Int): DataFrame =
    bandsFromSignatures(signatureColsFromHashes(hashed, bands * rows), bands, rows)

  /** The band-explode half of [[bandBuckets]], over an already-built
    * signature-columns table — so a caller that materializes signatures
    * once (e.g. the fused probe table of [[indexedNearDupSurvivors]])
    * can re-derive band rows per consumer with a cheap columnar explode
    * instead of a second signature aggregation.
    */
  def bandsFromSignatures(sig: DataFrame, bands: Int, rows: Int): DataFrame = {
    val bandStructs = (0 until bands).map { j =>
      val bandCols = (0 until rows).map(r => col(s"__m${j * rows + r}"))
      struct(lit(j).as("band"), hash(bandCols: _*).as("bh"))
    }
    sig.select(col("__id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("__id"), col("b.band").as("band"), col("b.bh").as("bh"))
  }

  /** [[signatureColsFromHashes]] PLUS the per-doc verify hash set
    * (`__hs`, the distinct shingle hashes) in the SAME aggregation —
    * one exchange and one pass over the exploded hash table where the
    * signature and set consumers would otherwise each re-aggregate it.
    * Set order is nondeterministic; every consumer uses order-free set
    * arithmetic (array_intersect/size in [[verifyJaccard]]).
    */
  def signatureAndSetCols(hashed: DataFrame, k: Int): DataFrame = {
    val folded = pmod(col("__h"), lit(P))
    val aggs = (0 until k).map { i =>
      min(pmod(lit(aParam(i)) * folded + lit(bParam(i)), lit(P))).as(s"__m$i")
    } :+ collect_set(col("__h")).as("__hs")
    hashed.groupBy("__id").agg(aggs.head, aggs.tail: _*)
  }

  /** Candidate pairs from a band-bucket table: self-join on (band, bh)
    * — the shuffle key is the short bucket id, and the join explodes
    * only within buckets.
    */
  def pairsFromBuckets(buckets: DataFrame): DataFrame = {
    val l = buckets.as("l")
    val r = buckets.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
        col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("doc_a"), col("r.__id").as("doc_b"))
      .distinct()
  }

  def lshCandidatesFromHashes(hashed: DataFrame, bands: Int, rows: Int): DataFrame = {
    // the band table feeds BOTH self-join sides; localCheckpoint, not
    // persist (r14): each side would also re-ANALYZE the k-column
    // signature aggregation lineage — the leaf hands both a bounded
    // (id×bands × three longs) table. Tracked for session release.
    pairsFromBuckets(CacheTracker.track(bandBuckets(hashed, bands, rows)
      .localCheckpoint()))
  }

  // ---- LSH banding auto-tuner ------------------------------------------

  /** One banding geometry with its MEASURED candidate volume on the
    * tuning corpus plus the analytic recall at the similarity the
    * caller cares about and the background similarity j₀ the volume
    * implies (inverting p = 1−(1−j₀^rows)^bands at the observed
    * collision rate — the corpus statistic PROBES.md sizes from).
    */
  final case class BandingChoice(
      bands: Int, rows: Int, candidates: Long,
      recall: Double, impliedJ0: Double,
      recallOk: Boolean, withinBudget: Boolean)

  /** Deterministic 1-in-`den` document sample of a (__id, __h)
    * shingle-hash table: keeps a doc iff xxhash64(__id) mod den == 0 —
    * stable across runs and partitionings, no RNG. Tune on the sample
    * at production scale; candidate volume extrapolates as den²
    * (collision RATE p is scale-free, pair count is n²·p/2).
    */
  def deterministicDocSample(hashed: DataFrame, den: Int): DataFrame =
    hashed.filter(pmod(xxhash64(col("__id")), lit(den.toLong)) === 0)

  /** j₀-driven banding auto-tuner — MEASUREMENT-based, not model-based:
    * for each candidate geometry (all splitting the same ~64-hash
    * signature budget by default), run the shipped candidate pipeline
    * on `hashed` and count distinct candidates (count only — pairs are
    * never materialized to the driver). At 100 TB run it on a
    * [[deterministicDocSample]]; the measured collision rate transfers
    * and expected full-corpus candidates = sample candidates × den².
    *
    * Returns every geometry, best first. Ordering: meets-recall
    * strictly dominates (an LSH that drops true near-dups is wrong, not
    * cheap), then fits-candidate-budget, then fewest candidates
    * (candidate volume IS the verify-join cost). `head` is the
    * recommendation.
    *
    * @param recallAt similarity at which recall must hold — the planted
    *        / expected true-dup similarity (e.g. 0.9), or the threshold
    *        itself for worst-case guarantees
    * @param candidateBudget max acceptable candidate pairs on THIS
    *        corpus (divide the production budget by den² when tuning on
    *        a sample)
    */
  def tuneBanding(hashed: DataFrame, candidateBudget: Long, recallAt: Double,
                  targetRecall: Double = 0.98,
                  geometries: Seq[(Int, Int)] = Seq((32, 2), (21, 3), (16, 4)))
      : Seq[BandingChoice] = {
    // stage the hash table across the per-geometry measurements — but
    // only own (and later release) the cache if the CALLER had not
    // already persisted it: unpersisting a caller-staged frame would
    // evict shared session state (same ownership rule as release())
    val callerOwned =
      hashed.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val staged = if (callerOwned) hashed
      else hashed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = staged.select("__id").distinct().count()
    val allPairs = nDocs.toDouble * (nDocs - 1) / 2
    val choices = geometries.map { case (b, r) =>
      val cand = lshCandidatesFromHashes(staged, b, r).count()
      val recall = 1 - math.pow(1 - math.pow(recallAt, r), b)
      val p = if (allPairs > 0) cand / allPairs else 0.0
      val j0 = math.pow(1 - math.pow(1 - p, 1.0 / b), 1.0 / r)
      BandingChoice(b, r, cand, recall, j0,
        recallOk = recall >= targetRecall, withinBudget = cand <= candidateBudget)
    }
    if (!callerOwned) staged.unpersist()
    choices.sortBy(c => (!c.recallOk, !c.withinBudget, c.candidates))
  }

  /** Exact jaccard verification of candidate pairs against the shingle
    * table, with a rational (float-free) threshold test:
    * inter/union >= num/den  ⇔  den*inter >= num*union.
    * Returns (doc_a, doc_b, jacc_pct) for qualifying pairs.
    */
  def verifyJaccard(candidates: DataFrame, docs: DataFrame, idCol: String,
                    shinglesCol: String, num: Int, den: Int): DataFrame = {
    val sa = docs.select(col(idCol).as("doc_a"), col(shinglesCol).as("__sa"))
    val sb = docs.select(col(idCol).as("doc_b"), col(shinglesCol).as("__sb"))
    candidates.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("__inter", size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("__union",
        size(col("__sa")).cast("long") + size(col("__sb")) - col("__inter"))
      .filter(col("__inter") * den >= col("__union") * num)
      .select(col("doc_a"), col("doc_b"),
        floor(lit(100.0) * col("__inter") / col("__union")).cast("long").as("jacc_pct"))
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band →
    * bucket-join → exact-verify.
    */
  /** Default bands=32 x rows=2 (k=64): a j=0.4 pair is missed w.p.
    * (1-0.16)^32 ≈ 0.4%, a j=0.9 near-dup w.p. ~3e-12; signature cost
    * is linear in k, so doubling bands only buys the last 0.4% at the
    * borderline — raise bands when the threshold or corpus demands it.
    */
  def nearDupPairs(docs: DataFrame, textCol: String, idCol: String,
                   shingleN: Int = 3, bands: Int = 32, rows: Int = 2,
                   thresholdNum: Int = 2, thresholdDen: Int = 5): DataFrame = {
    // The shingle table feeds signature generation once and the verify
    // join twice: stage it. Locally a memory/disk cache; at 100 TB the
    // same role is played by writing the shingle table to parquet once.
    val shingled = CacheTracker.track(
      docs.select(col(idCol), TextOps.shingles(col(textCol), shingleN).as("__sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    nearDupPairsFromShingles(shingled, idCol, "__sh", bands, rows, thresholdNum, thresholdDen)
  }

  /** Pipeline over a pre-staged (id, shingles) table; pass the staged
    * shingle-HASH table too when SimHash shares the session (avoids
    * re-exploding).
    *
    * Sizing at scale (measured, PROBES.md): candidate volume is
    * n²·p with p = 1−(1−j₀^rows)^bands fixed by the background
    * similarity j₀ of unrelated documents — pick (bands, rows) with
    * [[tuneBanding]] over a [[deterministicDocSample]] (it measures
    * each geometry's volume and holds recall first; e.g. rows=3 cut
    * candidates 5× on the probe corpus at unchanged recall for true
    * near-dups).
    */
  def nearDupPairsFromShingles(shingled: DataFrame, idCol: String, shinglesCol: String,
                               bands: Int = 32, rows: Int = 2,
                               thresholdNum: Int = 2, thresholdDen: Int = 5,
                               hashed: Option[DataFrame] = None): DataFrame = {
    val h = hashed.getOrElse(shingleHashTable(shingled, idCol, shinglesCol))
    val cands = lshCandidatesFromHashes(h, bands, rows)
    verifyJaccard(cands, shingled, idCol, shinglesCol, thresholdNum, thresholdDen)
  }

  /** Incremental NEAR-dup admission — the LSH twin of
    * [[incrementalSurvivors]] (which only catches byte-identical
    * re-crawls): survivors of `incoming` after near-duplicate checks
    * against the EXISTING corpus and within the batch, at jaccard ≥
    * num/den. The corpus is never re-deduplicated — its
    * [[bandBuckets]] table is the persisted index of an incremental
    * pipeline (append new rows per batch; here it is rebuilt because
    * the local fixture has no cross-run storage), the incoming batch
    * probes it with ONE equi-join on the short (band, bh) key, and
    * only candidate pairs are exactly verified against the shingle
    * sets.
    *
    * Drop rule (deterministic, one-shot): an incoming doc is dropped
    * iff a verified pair links it to ANY corpus doc or to a
    * smaller-id incoming doc. One-shot like [[SemDedup.semDedup]] —
    * a chain a~b~c with a≁c keeps a and can drop both b and c;
    * transitive grouping is [[connectedComponents]]' job over the
    * pair output. CONTRACT: corpus and incoming id spaces are
    * disjoint, with corpus ids below incoming ids (the natural
    * monotone-ingest numbering; d10's fixture shape).
    */
  def incrementalNearDupSurvivors(corpus: DataFrame, incoming: DataFrame,
                                  textCol: String, idCol: String,
                                  shingleN: Int = 3, bands: Int = 32, rows: Int = 2,
                                  thresholdNum: Int = 2, thresholdDen: Int = 5,
                                  stagedShingles: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    // each shingle frame has 2-3 consumers (banding, union for verify,
    // final anti-join) — callers that can manage lifecycle should pass
    // session-staged frames (Staged.cached) so the blocks are RELEASED
    // with the session; the self-contained default persists with no
    // release path (bounded: two frames per invocation)
    val (cSh, iSh) = stagedShingles.getOrElse {
      (CacheTracker.track(corpus.select(col(idCol), TextOps.shingles(col(textCol), shingleN).as("__sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)),
       CacheTracker.track(incoming.select(col(idCol), TextOps.shingles(col(textCol), shingleN).as("__sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))
    }
    val cB = bandBuckets(shingleHashTable(cSh, idCol, "__sh"), bands, rows)
    // three join-side consumers (corpus probe + in-batch self-join):
    // localCheckpoint so the explode + signature aggregation runs AND
    // plans once (a persist still re-analyzes the lineage per side)
    val iB = CacheTracker.track(bandBuckets(shingleHashTable(iSh, idCol, "__sh"), bands, rows)
      .localCheckpoint())
    // probe the corpus index: equi-join on (band, bh), corpus id on the
    // doc_a side (always the smaller id under the contract)
    val crossCand = iB.as("i")
      .join(cB.as("c"), col("i.band") === col("c.band") && col("i.bh") === col("c.bh"))
      .select(col("c.__id").as("doc_a"), col("i.__id").as("doc_b"))
      .distinct()
    val inBatchCand = pairsFromBuckets(iB)
    val allSh = cSh.unionByName(iSh)
    val dropped = verifyJaccard(crossCand, allSh, idCol, "__sh", thresholdNum, thresholdDen)
      .select(col("doc_b").as(idCol))
      .unionByName(verifyJaccard(inBatchCand, iSh, idCol, "__sh", thresholdNum, thresholdDen)
        .select(col("doc_b").as(idCol)))
      .distinct()
    iSh.select(col(idCol)).join(dropped, Seq(idCol), "left_anti")
  }

  /** Build the PERSISTED near-dup index — the artifact an incremental
    * crawl pipeline maintains between runs (sim3's materialized-index
    * pattern, text flavor): the corpus's band-bucket table (parquet,
    * PARTITIONED BY band — band-aligned file layout; a full probe
    * reads every band, a per-band maintenance job only its own)
    * plus its shingle-HASH table for candidate verification. Corpus
    * TEXT is never written and, after the build, never rescanned.
    */
  def buildNearDupIndex(corpus: DataFrame, path: String,
                        textCol: String, idCol: String,
                        shingleN: Int = 3, bands: Int = 32, rows: Int = 2): Unit = {
    val sh = corpus.select(col(idCol).as("__id"),
      TextOps.shingles(col(textCol), shingleN).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hashed = shingleHashTable(sh, "__id", "__sh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bandBuckets(hashed, bands, rows)
      .write.mode("overwrite").partitionBy("band").parquet(s"$path/buckets")
    // sets are PRE-GROUPED at build time: the probe's verify step reads
    // (id, hash-set) rows directly instead of re-aggregating the whole
    // corpus hash table on every batch
    hashed.groupBy("__id").agg(collect_set("__h").as("__hs"))
      .write.mode("overwrite").parquet(s"$path/hashes")
    hashed.unpersist()
    sh.unpersist()
  }

  /** Incremental index MAINTENANCE: merge a persisted
    * [[buildNearDupIndex]] index with a newly-admitted delta batch into
    * a compacted index at `outPath` — the lakehouse compaction shape
    * for the near-dup index. The base index's parquet band/hash tables
    * are UNIONED with the delta's freshly-computed ones and rewritten
    * under the same layout (buckets partitioned by band, hash sets
    * pre-grouped), so the corpus text behind the base index is NEVER
    * rescanned and maintenance cost is ∝ |delta| + |index|, never
    * ∝ corpus text — at 100 TB the index tables are the only thing
    * rewritten, and band-partitioned writes compact each band's
    * fragments in the same pass (the small-files story of daily
    * appends). Contract (spec-pinned): probing merge(build(A), Δ)
    * equals probing build((A \ ids(Δ)) ∪ Δ) — DELTA WINS on id
    * collision. A re-admitted (re-crawled) id's base rows are
    * anti-joined out before the union, so the merged index carries
    * exactly one (id, hash-set) row and one band set per id; without
    * the guard a collision would duplicate verifyJaccard's per-id
    * join candidates (round-8 ADVICE). When ids are disjoint this
    * reduces to build(A ∪ Δ). The anti join's build side is the
    * delta's id set — small, broadcast by AQE.
    * `outPath` must differ from `basePath` (parquet cannot overwrite
    * its own input mid-scan).
    */
  def mergeNearDupIndex(spark: org.apache.spark.sql.SparkSession,
                        basePath: String, delta: DataFrame, outPath: String,
                        textCol: String, idCol: String,
                        shingleN: Int = 3, bands: Int = 32, rows: Int = 2): Unit = {
    require(basePath != outPath,
      "mergeNearDupIndex: outPath must differ from basePath (cannot " +
        "overwrite the parquet being read)")
    val sh = delta.select(col(idCol).as("__id"),
      TextOps.shingles(col(textCol), shingleN).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hashed = shingleHashTable(sh, "__id", "__sh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deltaIds = hashed.select("__id").distinct()
    spark.read.parquet(s"$basePath/buckets")
      .join(deltaIds, Seq("__id"), "left_anti")
      .unionByName(bandBuckets(hashed, bands, rows))
      .write.mode("overwrite").partitionBy("band").parquet(s"$outPath/buckets")
    spark.read.parquet(s"$basePath/hashes")
      .join(deltaIds, Seq("__id"), "left_anti")
      .unionByName(hashed.groupBy("__id").agg(collect_set("__h").as("__hs")))
      .write.mode("overwrite").parquet(s"$outPath/hashes")
    hashed.unpersist()
    sh.unpersist()
  }

  /** [[incrementalNearDupSurvivors]] against a PERSISTED index: the
    * corpus side comes from [[buildNearDupIndex]]'s parquet (one
    * equi-join probe on (band, bh), one hash-set verify), the corpus
    * text never rescanned. Verification intersects 64-bit xxhash64
    * shingle-HASH sets instead of shingle strings — identical output
    * unless two distinct shingles collide (≤ n²/2⁶⁴, the d5-documented
    * hash-join assumption); the spec pins index-path ≡ inline-path
    * equality.
    */
  def indexedNearDupSurvivors(spark: org.apache.spark.sql.SparkSession,
                              path: String, incoming: DataFrame,
                              textCol: String, idCol: String,
                              shingleN: Int = 3, bands: Int = 32, rows: Int = 2,
                              thresholdNum: Int = 2, thresholdDen: Int = 5): DataFrame = {
    val cB = spark.read.parquet(s"$path/buckets")
    val cH = spark.read.parquet(s"$path/hashes")
    // batch-shingle frame has two consumers (banding, survivor list);
    // self-contained persist with no release path, same bounded-per-
    // invocation convention as incrementalNearDupSurvivors' default
    val iSh = CacheTracker.track(incoming.select(col(idCol).as("__id"),
      TextOps.shingles(col(textCol), shingleN).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // ONE aggregation pass over the exploded shingle hashes yields BOTH
    // the band signatures and the verify hash set per doc (r15 —
    // before, the band table and the set table each re-exploded and
    // re-aggregated the cached shingles AND each took its own eager
    // checkpoint: two signature-class aggregations and two
    // materialization barriers on the probe path instead of one).
    // Bounded per invocation: id × (bands·rows longs + hash set) —
    // the same rows the two previous checkpoints pinned combined.
    val sigSet = CacheTracker.track(
      signatureAndSetCols(shingleHashTable(iSh, "__id", "__sh"), bands * rows)
        .localCheckpoint())
    // band rows re-derive from the leaf per consumer (three join
    // sides): a cheap columnar explode, no aggregation behind it
    val iB = bandsFromSignatures(sigSet, bands, rows)
    val crossCand = iB.as("i")
      .join(cB.as("c"), col("i.band") === col("c.band") && col("i.bh") === col("c.bh"))
      .select(col("c.__id").as("doc_a"), col("i.__id").as("doc_b"))
      .distinct()
    val inBatchCand = pairsFromBuckets(iB)
    // verify sets: corpus half straight off the index parquet (~KBs),
    // incoming half a projection of the leaf — lazy union per consumer
    // replaces the third aggregation + second checkpoint of the old
    // shape
    val allSets = cH.unionByName(sigSet.select(col("__id"), col("__hs")))
    val dropped = verifyJaccard(crossCand, allSets, "__id", "__hs",
        thresholdNum, thresholdDen)
      .select(col("doc_b").as("__id"))
      .unionByName(verifyJaccard(inBatchCand, allSets, "__id", "__hs",
          thresholdNum, thresholdDen)
        .select(col("doc_b").as("__id")))
      .distinct()
    iSh.select(col("__id").as(idCol))
      .join(dropped.select(col("__id").as(idCol)), Seq(idCol), "left_anti")
  }

  // ---- Exact n-gram Jaccard join (prefix filtering / AllPairs) ---------

  /** EXACT n-gram Jaccard similarity join via prefix filtering — the
    * deterministic complement to [[nearDupPairsFromShingles]]: no LSH
    * miss probability, the output IS the all-pairs result at the
    * threshold (which is why its oracle needs no recall caveat).
    *
    * Prefix-filtering principle (Chaudhuri/Bayardo AllPairs): order
    * every token set by one global total order; if J(A,B) >= t then
    * |A∩B| >= ceil(t·|A|), so among the first |A| - ceil(t·|A|) + 1
    * tokens of A (and likewise B) at least one common token appears —
    * candidate generation only needs to join on PREFIX tokens.
    *
    * Scale shape: the global order is frequency-ascending (rarest
    * first), so prefix tokens are the RARE ones and bucket fan-out in
    * the candidate self-join stays small; the join key is the 64-bit
    * token hash, never the token text (hash collisions only add false
    * candidates, which the exact verify discards). Shuffles: one
    * groupBy on token hash (freq count), one on doc id (prefix
    * assembly), one short-key candidate join — all narrow-payload.
    * Per-doc work is a sort of the doc's own token list (bounded by
    * doc length).
    *
    * The shingles column must be a duplicate-free SET per row: prefix
    * lengths count exploded rows and the verify uses size()-based set
    * arithmetic, so duplicate elements would skew both. The operator
    * enforces it below with array_distinct (a no-op on already-distinct
    * input, e.g. [[TextOps.shingles]] output).
    *
    * Scale limit (measured, PROBES.md): prefix pruning relies on token
    * RARITY. On a vocabulary-bounded corpus every token's frequency
    * grows linearly with corpus size, prefix buckets grow with it, and
    * candidate volume grows quadratically — inherent to any EXACT
    * similarity join over data whose similar-pair mass is quadratic.
    * Where vocabulary is bounded, prefer [[nearDupPairsFromShingles]]
    * (tunable candidate budget, identical verified output contract).
    *
    * @param num/den rational threshold t = num/den (float-free test)
    */
  def ngramJaccardPairs(shingled: DataFrame, idCol: String, shinglesCol: String,
                        num: Int, den: Int): DataFrame = {
    // the set table feeds the prefix build AND both verify sides; a
    // lazy reference would re-execute the (often wide) shingle lineage
    // three times. persist, NOT localCheckpoint (r15, ADVICE): this
    // table is CORPUS-SIZED — a checkpoint would pin its rows in
    // executor storage and forfeit recomputation on block loss, which
    // the checkpoint discipline reserves for bounded intermediates.
    // The re-analysis the checkpoint saved is bounded (~57 KB for
    // mm10's 24-hash projection) and the contracted prefix table below
    // keeps its leaf. Tracked for session release.
    val asSet = CacheTracker.track(
      shingled.withColumn(shinglesCol, array_distinct(col(shinglesCol)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    verifyJaccard(ngramJaccardCandidates(asSet, idCol, shinglesCol, num, den),
      asSet, idCol, shinglesCol, num, den)
  }

  /** Candidate-pair stage of [[ngramJaccardPairs]], exposed so sizing
    * tools measure the SHIPPED pipeline rather than a copy.
    */
  def ngramJaccardCandidates(shingled: DataFrame, idCol: String, shinglesCol: String,
                             num: Int, den: Int): DataFrame =
    // persist here, NOT inside jaccardCandidatesFromPrefix: staged
    // callers (d5) pass an already-cached prefix and double-caching a
    // cached frame would waste executor memory
    jaccardCandidatesFromPrefix(
      CacheTracker.track(buildJaccardPrefix(shingled, idCol, shinglesCol, num, den)
        .localCheckpoint()),
      num, den)

  /** The rarest-first PREFIX table of [[ngramJaccardCandidates]]
    * (__id, __n, __pos, __th) — the expensive corpus-linear stage
    * (token explode, frequency shuffle, per-doc sort, prefix slice),
    * factored out so a consumer can stage it: the candidate self-join
    * consumes it on BOTH sides, so an unstaged prefix builds twice
    * (exchange reuse dedupes the shuffle but not the cache scans).
    * Same build/probe split as [[buildContainmentIndex]]; unlike the
    * containment index the prefix is threshold-DEPENDENT (prefix
    * length embeds num/den).
    */
  def buildJaccardPrefix(shingled: DataFrame, idCol: String, shinglesCol: String,
                         num: Int, den: Int): DataFrame = {
    val toks = shingled
      .select(col(idCol).as("__id"), explode(col(shinglesCol)).as("__t"))
      .select(col("__id"), xxhash64(col("__t")).as("__th"))
    // global token frequency — ascending = rarest-first prefix order;
    // ties broken by the hash so the order is total and deterministic
    val freq = toks.groupBy("__th").agg(count(lit(1)).as("__cnt"))
    // per doc: sort own tokens by (cnt, hash), keep the prefix WITH
    // each token's 1-based position in the full sorted list (the
    // prefix is the head, so positions are global). n·num/den stays
    // exact in double for any realistic doc size (integers < 2^53),
    // so the ceil is not fp-fragile.
    val prefLen = (col("__n") - ceil(col("__n") * num / den) + 1).cast("int")
    toks.join(freq, "__th")
      .groupBy("__id")
      .agg(array_sort(collect_list(struct(col("__cnt"), col("__th")))).as("__st"),
        count(lit(1)).as("__n"))
      .select(col("__id"), col("__n"),
        posexplode(slice(col("__st"), lit(1), greatest(prefLen, lit(1)))))
      .select(col("__id"), col("__n"), (col("pos") + 1).as("__pos"), col("col.__th").as("__th"))
  }

  /** Prefix self-join of [[ngramJaccardCandidates]] over a (possibly
    * staged) [[buildJaccardPrefix]] table. `num`/`den` MUST match the
    * threshold the prefix was built with (the prefix length is derived
    * from it).
    */
  def jaccardCandidatesFromPrefix(prefix: DataFrame, num: Int, den: Int): DataFrame = {
    // candidate join with the two PPJoin prunes — both safe
    // relaxations, so completeness is preserved:
    //  * length filter: J >= t ⇒ t·max(|A|,|B|) <= min(|A|,|B|)
    //  * positional filter: the overlap needed is
    //    α = ceil(t/(1+t)·(|A|+|B|)); a match at positions (pA, pB)
    //    can certify at most 1 + min(|A|-pA, |B|-pB) overlap even if
    //    every earlier token matched, so later matches cannot qualify
    //    the pair. (ceil on double is exact here: the operand is at
    //    least 1/(num+den) from any integer unless exactly integral.)
    val (ln, rn) = (col("l.__n"), col("r.__n"))
    val alpha = ceil((ln + rn) * num / (num + den))
    val cands = prefix.as("l").join(prefix.as("r"),
        col("l.__th") === col("r.__th") && col("l.__id") < col("r.__id") &&
          greatest(ln, rn) * num <= least(ln, rn) * den &&
          least(ln - col("l.__pos"), rn - col("r.__pos")) + 1 >= alpha)
      .select(col("l.__id").as("doc_a"), col("r.__id").as("doc_b"))
      .distinct()
    cands
  }

  /** EXACT directed containment-similarity join: pairs (a → b), a ≠ b,
    * with |A ∩ B| / |A| ≥ num/den over the doc shingle sets — the
    * ASYMMETRIC relative Jaccard's symmetric-overlap join
    * ([[ngramJaccardPairs]]) cannot express: a 10-word quote inside a
    * 10,000-word article has Jaccard ≈ 0.1% but containment 100%.
    * The quote/subset-detection primitive (eval-answer snippets inside
    * train docs, boilerplate inclusions, syndicated excerpts).
    *
    * Scale shape = AllPairs prefix filtering adapted to the asymmetric
    * threshold: only the CONTAINED side carries a prefix (size
    * |A| − ceil(τ|A|) + 1 in global rarest-first token order — a
    * qualifying pair must share a prefix token of A with SOME token of
    * B), probed against the full inverted index of the container side
    * with two safe prunes:
    *  - container length: inter ≥ τ|A| and inter ≤ |B| ⇒ |B|·den ≥ |A|·num;
    *  - positional: a match at sorted positions (pA, pB) certifies at
    *    most 1 + min(|A|−pA, |B|−pB) overlap, which must reach
    *    α = ceil(τ|A|).
    * Candidates are exactly verified (array_intersect over the staged
    * shingle arrays), so the join is COMPLETE — no recall caveat. The
    * container side indexes ALL its tokens (no B-prefix exists for an
    * asymmetric threshold), so hot boilerplate shingles drive the
    * candidate volume — d5's bounded-vocab caveat applies doubly;
    * route corpora with heavy shared boilerplate through
    * [[d21-style boilerplate removal|TextOps]] first.
    *
    * Returns (doc_a, doc_b, containment_pct): doc_a's shingles are
    * ≥ num/den contained in doc_b's.
    */
  def containmentPairs(shingled: DataFrame, idCol: String, shinglesCol: String,
                       num: Int, den: Int): DataFrame = {
    // persist the inline index here (the probe consumes sorted twice
    // and sets twice); staged callers (d22) persist their own copies
    val ix0 = buildContainmentIndex(shingled, idCol, shinglesCol)
    containmentPairsFromIndex(ContainmentIndex(
      CacheTracker.track(ix0.sets.localCheckpoint()),
      CacheTracker.track(ix0.sorted.localCheckpoint())),
      num, den)
  }

  /** The threshold-INDEPENDENT half of [[containmentPairs]]: the
    * deduplicated shingle-set table (`sets`: __id, __set — the exact
    * verify's operand) and the rarest-first sorted token index with
    * doc sizes (`sorted`: __id, __st, __n — what prefix and probe
    * positions slice from). Building `sorted` is the expensive part
    * (full token explode, frequency shuffle, per-doc sort) and the
    * probe plan consumes it TWICE (prefix side + full side) plus
    * `sets` twice (both verify operands) — so persist both and reuse:
    * at 100 TB this index is materialized once per corpus snapshot and
    * probed at whatever thresholds the decontamination queries need,
    * exactly like the IVF build/probe split.
    */
  final case class ContainmentIndex(sets: DataFrame, sorted: DataFrame)

  def buildContainmentIndex(shingled: DataFrame, idCol: String,
                            shinglesCol: String): ContainmentIndex = {
    val sets = shingled.select(col(idCol).as("__id"),
      array_distinct(col(shinglesCol)).as("__set"))
    val toks = sets
      .select(col("__id"), explode(col("__set")).as("__t"))
      .select(col("__id"), xxhash64(col("__t")).as("__th"))
    val freq = toks.groupBy("__th").agg(count(lit(1)).as("__cnt"))
    val sorted = toks.join(freq, "__th")
      .groupBy("__id")
      .agg(array_sort(collect_list(struct(col("__cnt"), col("__th")))).as("__st"),
        count(lit(1)).as("__n"))
    ContainmentIndex(sets, sorted)
  }

  /** Probe a [[ContainmentIndex]] at threshold num/den — the prefix
    * slice, candidate join, prunes, and exact verify of
    * [[containmentPairs]], with the corpus-linear index build factored
    * out.
    */
  def containmentPairsFromIndex(index: ContainmentIndex,
                                num: Int, den: Int): DataFrame = {
    def positional(src: DataFrame, sliceLen: Option[Column]): DataFrame =
      src.select(col("__id"), col("__n"),
          posexplode(sliceLen.map(l => slice(col("__st"), lit(1), greatest(l, lit(1))))
            .getOrElse(col("__st"))))
        .select(col("__id"), col("__n"), (col("pos") + 1).as("__pos"),
          col("col.__th").as("__th"))
    val prefLen = (col("__n") - ceil(col("__n") * num / den) + 1).cast("int")
    val prefix = positional(index.sorted, Some(prefLen))
    val full = positional(index.sorted, None)
    val (an, bn) = (col("a.__n"), col("b.__n"))
    val alpha = ceil(an * num / den)
    val cands = prefix.as("a").join(full.as("b"),
        col("a.__th") === col("b.__th") && col("a.__id") =!= col("b.__id") &&
          bn * den >= an * num &&
          least(an - col("a.__pos"), bn - col("b.__pos")) + 1 >= alpha)
      .select(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
      .distinct()
    val sa = index.sets.select(col("__id").as("doc_a"), col("__set").as("__sa"))
    val sb = index.sets.select(col("__id").as("doc_b"), col("__set").as("__sb"))
    cands.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("__inter", size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .filter(col("__inter") * den >= size(col("__sa")).cast("long") * num)
      .select(col("doc_a"), col("doc_b"),
        floor(lit(100L) * col("__inter") / size(col("__sa"))).cast("long")
          .as("containment_pct"))
  }

  // ---- Transitive dedup clusters ---------------------------------------

  /** Lineage-truncation strategy for the iterative operators: reliable
    * cluster-storage `checkpoint()` when a `checkpointDir` is given
    * (production — survives executor loss, lineage-free restart from
    * storage), `localCheckpoint()` otherwise (executor-memory blocks,
    * no replay on executor loss — the measured-fastest local/bench
    * trade; PROBES.md).
    */
  private def truncator(like: DataFrame, checkpointDir: Option[String])
      : DataFrame => DataFrame = checkpointDir match {
    case Some(dir) =>
      val sc = like.sparkSession.sparkContext
      // `setCheckpointDir` is PROCESS-GLOBAL session state (and every
      // call appends a fresh UUID subdir). Set it only when unset; if
      // the session already points somewhere ELSE, refuse instead of
      // silently clobbering the other caller's setting — two operators
      // racing with different dirs would interleave their file-sets
      // and outlive the operator that set them. One dir per session.
      val want = {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(sc.hadoopConfiguration).makeQualified(p)
      }
      sc.getCheckpointDir match {
        case None => sc.setCheckpointDir(dir)
        case Some(cur) =>
          // current value is want/<uuid> (setCheckpointDir appends one)
          val curBase = new org.apache.hadoop.fs.Path(cur).getParent
          require(curBase == want,
            s"session checkpoint dir is already $curBase; refusing to " +
              s"clobber it with $want — use one checkpointDir per session")
      }
      df => df.checkpoint(eager = true)
    case None =>
      df => df.localCheckpoint(eager = true)
  }

  /** Release the storage behind a frame produced by the iterative
    * operators. `Dataset.unpersist` alone is NOT enough: it only
    * uncaches CacheManager entries, while a checkpoint frame's blocks
    * are owned by its underlying RDD — so this also unpersists the RDD
    * when the frame IS a checkpoint leaf (root plan is the
    * `LogicalRDD`; deliberately root-only, so a frame whose plan merely
    * READS other checkpoint leaves can never free blocks it does not
    * own). No-op on plain frames.
    *
    * Reliable `checkpoint()` file-sets are DELETED here too:
    * `ContextCleaner` only removes them when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default
    * false), so a long production run would otherwise accumulate one
    * file-set per round, unbounded, under the checkpoint dir.
    *
    * DESTROY semantics — this is permanent: a checkpoint leaf has no
    * lineage to replay, so after release the frame's ONLY copy is gone
    * and any in-flight query over it fails with block-/file-not-found
    * rather than recomputing. Call it only on owned, end-of-life
    * frames (superseded rounds, the returned result at teardown) —
    * never on a frame another query may still read.
    */
  def release(df: DataFrame): Unit = {
    df.unpersist()
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
        lr.rdd.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          try p.getFileSystem(
            df.sparkSession.sparkContext.hadoopConfiguration).delete(p, true)
          catch { case _: java.io.IOException => () } // best-effort cleanup
        }
      case _ => ()
    }
  }

  /** Connected components over a near-dup pair graph: every document
    * labeled with the MINIMUM doc id reachable through pair edges —
    * the step that turns pairwise matches into actual dedup decisions
    * (keep the representative, drop the rest), which pairwise output
    * alone cannot express when dups chain (A~B, B~C, A!~C).
    *
    * Algorithm: distributed min-label propagation. Each round costs a
    * bounded handful of exchanges (the labels-edges join, the
    * union+min-aggregate, and the convergence-check join) over the
    * LABEL table — always (id, rep) pairs, never document payloads —
    * and the driver loop only checks convergence (a count per round —
    * control flow, not data movement). Rounds needed = graph diameter,
    * which for
    * near-dup graphs (cliques and short chains) is small; for
    * adversarial long-path graphs switch to alternating star
    * contraction (O(log n) rounds) — same join/agg building blocks.
    * Labels/edges are persisted per round and released on the next.
    *
    * @param pairs (doc_a, doc_b) — one row per undirected edge
    * @param checkpointDir when set, every per-round lineage truncation
    *        uses reliable `checkpoint()` to this cluster-storage path
    *        instead of `localCheckpoint()` — the production mode that
    *        survives executor loss
    * @return (id, rep) for every vertex that appears in `pairs`;
    *         rep = min id of its component. The returned frame is a
    *         MATERIALIZED checkpoint leaf (its iterative lineage is
    *         already released) — the caller owns it and must free it
    *         with [[release]] when done (plain `unpersist()` does not
    *         touch checkpoint blocks; the query path stages it under
    *         the session lifecycle).
    * @throws IllegalStateException if maxIter rounds don't converge
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
                          checkpointDir: Option[String] = None): DataFrame = {
    val trunc = truncator(pairs, checkpointDir)
    val fwd = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    // checkpoint (not just persist) the edge table: a persisted frame
    // still CARRIES its full logical plan (here: the whole upstream
    // candidate pipeline), and every round's plan embeds it — the
    // driver re-analyzes it each round even on cache hits. Truncating
    // to a leaf makes per-round planning O(round plan), not
    // O(pipeline plan). Measured on the star variant: 33.7 s -> 2.7 s.
    val edges = trunc(fwd.union(fwd.select(col("dst"), col("src"))))
    var labels = trunc(edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("rep")))
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // rep'(v) = min(rep(v), min over neighbors u of rep(u))
      val viaEdges = labels.join(edges, labels("id") === edges("src"))
        .select(col("dst").as("id"), col("rep"))
      // truncate lineage EVERY round: the plan otherwise deepens
      // linearly with rounds and the driver re-analyzes the whole chain
      // each round (the measured bottleneck — PROBES.md). Truncation
      // materializes what the convergence count below pays anyway, and
      // makes every round's frame a self-contained leaf, so the
      // superseded round can be released eagerly (below) instead of
      // waiting on driver GC + ContextCleaner.
      val next = trunc(labels.select(col("id"), col("rep")).union(viaEdges)
        .groupBy("id").agg(min("rep").as("rep")))
      val changed = next.as("n").join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.rep") =!= col("o.rep")).count()
      release(labels) // next is materialized + compared; prev round's blocks die now
      labels = next
      converged = changed == 0
      it += 1
    }
    release(edges)
    if (!converged) {
      release(labels) // don't leak the last round's blocks on the throw path
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIter rounds " +
          "(diameter exceeds budget — use connectedComponentsStar, whose " +
          "round count is logarithmic in component size)")
    }
    // NOTE the fault-tolerance trade of the default local mode, here
    // and in the loop above: localCheckpoint blocks live in executor
    // storage only — lose an executor and the frame is gone (a query
    // over it throws; the operator must be re-run), there is NO lineage
    // replay. That is the right local/bench trade (driver-side plan
    // analysis was the measured bottleneck — PROBES.md); a long-lived
    // production job passes `checkpointDir` to switch every truncation
    // in this operator to reliable cluster-storage checkpoint().
    labels
  }

  /** Connected components via ALTERNATING STAR CONTRACTION — same
    * contract as [[connectedComponents]] (same input/output schema,
    * materialized checkpoint-leaf result freed via [[release]], same
    * `checkpointDir` reliable mode, min-id representative) but with round count
    * logarithmic in component size instead of linear in diameter, so it
    * is the variant to use when the pair graph can contain long chains
    * (adversarial near-dup graphs; transitive key-collision chains).
    *
    * Algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SOCC'14 — public literature):
    *   large-star: every node u links each STRICTLY LARGER neighbor to
    *     m(u) = min(N(u) ∪ {u});
    *   small-star: with edges canonicalized (larger → smaller), every
    *     node u links each smaller neighbor and itself to m(u).
    * Both preserve connectivity; alternating them converges to the
    * fixpoint where every component is a star centered on its min id.
    *
    * Scale shape per round: one groupBy + one join over the EDGE table
    * (id pairs only, payload-free), map-side combinable; lineage is
    * localCheckpoint-truncated every few rounds like the label loop.
    * Self-loops are dropped each round so the edge table shrinks as
    * components contract.
    */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 50,
                              checkpointDir: Option[String] = None): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val trunc = truncator(pairs, checkpointDir)
    // initial checkpoint: same reason as in [[connectedComponents]] —
    // and here it is CRITICAL, because each star round references the
    // previous round's frame ~6 times (bidir union + two star joins +
    // convergence anti-joins), so an uncheckpointed plan grows
    // MULTIPLICATIVELY and driver analysis dominated the wall clock
    // (measured at sf0.1: 33.7 s with %3 checkpointing -> 2.7 s with
    // initial + per-round truncation, on a 256-edge graph).
    var edges = trunc(pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .filter(col("src") =!= col("dst")).distinct())
    // all vertices, captured from the UNFILTERED pairs (a vertex whose
    // only edge is a self-loop must still be labeled — the min-label
    // variant labels it, and the two variants share one contract) and
    // BEFORE contraction erases degree-1 chains
    val vertices = pairs.select(col("doc_a").as("id"))
      .union(pairs.select(col("doc_b").as("id"))).distinct()
      .persist(MEMORY_AND_DISK)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // ---- large-star ----
      val bidir = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      val lmins = bidir.groupBy("src")
        .agg(min("dst").as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("mn"))
      val large = bidir.join(lmins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("mn").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      // ---- small-star (on canonical larger→smaller edges) ----
      val canon = large.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      val smins = canon.groupBy("src").agg(min("dst").as("mn"))
      val small = canon.join(smins, "src")
        .select(col("dst").as("src"), col("mn").as("dst"))
        .union(smins.select(col("src"), col("mn").as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
      // per-round checkpoint (not every-3rd): each round's plan embeds
      // ~6 copies of the previous round's, so anything short of full
      // truncation lets driver-side analysis grow multiplicatively.
      val next = trunc(small)
      // fixpoint test: the edge set is unchanged (both anti-join counts
      // zero over the two checkpointed leaves)
      val grew = next.join(edges, Seq("src", "dst"), "left_anti").count()
      converged = grew == 0 &&
        edges.join(next, Seq("src", "dst"), "left_anti").count() == 0
      // `next` is a materialized leaf and the anti-joins are counted:
      // nothing references the superseded round — release its blocks
      // NOW rather than waiting on driver GC to trigger ContextCleaner
      // (under slow/absent GC the transient residency could otherwise
      // exceed the few-copies-of-the-initial-edge-set bound).
      release(edges)
      edges = next
      it += 1
    }
    if (!converged) {
      release(edges)
      vertices.unpersist()
      throw new IllegalStateException(
        s"connectedComponentsStar: no fixpoint after $maxIter rounds")
    }
    // at the fixpoint every component is a star (v → min). Labels = the
    // star edges plus a self-label for every vertex not covered (roots,
    // and any vertex whose edges contracted away entirely).
    val labels = trunc(vertices
      .join(edges.select(col("src").as("id"), col("dst").as("rep")), Seq("id"), "left")
      .select(col("id"), coalesce(col("rep"), col("id")).as("rep")))
    release(edges)
    vertices.unpersist()
    labels
  }

  // ---- Embedding-cosine near-dup ---------------------------------------

  /** Embedding-cosine near-duplicate pairs: sign-LSH banding over the
    * vectors (corpus hashed once; candidates only within matching
    * (band, bits) buckets — same shape as the MinHash path), then an
    * exact cosine verification join over candidates only. The bucket
    * self-join shuffles SHORT keys (band id + bit string + doc ids),
    * never vectors; vectors are re-joined only for the candidate pairs.
    *
    * Recall: a pair at cosine c collides per band w.p.
    * (1 - acos(c)/π)^rowsPerBand; at the defaults (24 planes, 8 bands
    * of 3) a c=0.98 pair is missed w.p. ~1e-6, and EXACT duplicates
    * (c=1, identical sign codes — scaling a vector never flips a sign
    * projection) have recall exactly 1. False candidates cost only
    * verify work.
    */
  def embedNearDupPairs(vecs: DataFrame, idCol: String, vecCol: String, dims: Int,
                        minCosine: Double, planes: Int = 24,
                        rowsPerBand: Int = 3): DataFrame = {
    require(planes % rowsPerBand == 0,
      s"planes ($planes) must be divisible by rowsPerBand ($rowsPerBand): " +
        "trailing code bits would silently never be banded")
    val bands = planes / rowsPerBand
    // both self-join sides consume the banded table and signCode is
    // the planes×dims fold per row — localCheckpoint: persist alone
    // left each side re-analyzing the fold's expression tree (d4
    // planned ~110 KB, measured r14)
    val banded = CacheTracker.track(Similarity.bandExplode(
      vecs.withColumn("__code", Similarity.signCode(col(vecCol), dims, planes)),
      "__code", bands, rowsPerBand, Seq(idCol))
      .localCheckpoint())
    val cands = banded.select(col(idCol).as("doc_a"), col("band"), col("bits"))
      .join(banded.select(col(idCol).as("doc_b"), col("band"), col("bits")), Seq("band", "bits"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val va = vecs.select(col(idCol).as("doc_a"), col(vecCol).as("__va"))
    val vb = vecs.select(col(idCol).as("doc_b"), col(vecCol).as("__vb"))
    cands.join(va, "doc_a").join(vb, "doc_b")
      .withColumn("__cos", Similarity.cosine(col("__va"), col("__vb")))
      .filter(col("__cos") >= minCosine)
      .select(col("doc_a"), col("doc_b"),
        floor(col("__cos") * 1e6).cast("long").as("cos_micro"))
  }

  // ---- SimHash ----------------------------------------------------------

  /** 64-bit SimHash over shingle hashes, materialized as a 64-char
    * '0'/'1' string (bit j of each shingle's xxhash64 votes +1/-1;
    * sign of the sum is bit j). String form keeps it engine-portable
    * and makes hamming distance a cheap zip_with.
    *
    * Array-column form (small inputs / per-row use). The pipeline path
    * ([[simhashPairs]]) uses the explode+aggregate plan instead — same
    * math, hash computed once, codegen'd bit counting.
    */
  def simhashBits(shinglesCol: Column): Column = {
    val hashes = transform(shinglesCol, s => xxhash64(s))
    concat_ws("", (0 until 64).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(bitSetLit(h, j), 1L).otherwise(-1L))
      when(vote > 0, "1").otherwise("0")
    }: _*)
  }

  /** Test literal bit j (0..63) of long h. */
  private def bitSetLit(h: Column, j: Int): Column =
    if (j == 63) h < 0 else h.bitwiseAND(lit(1L << j)) =!= 0

  /** SimHash per doc via explode → hash once → `bits` codegen'd sums. */
  def simhashCols(docs: DataFrame, idCol: String, shinglesCol: String,
                  bits: Int = 64): DataFrame =
    simhashColsFromHashes(shingleHashTable(docs, idCol, shinglesCol), bits)

  /** SimHash from a pre-staged (__id, __h) shingle-hash table.
    * `bits` is the sketch width — 64 for xxhash64 input; 60 when the
    * hashes come from [[portableHash60]].
    */
  def simhashColsFromHashes(hashed: DataFrame, bits: Int = 64): DataFrame = {
    val aggs = (0 until bits).map { j =>
      sum(when(bitSetLit(col("__h"), j), 1L).otherwise(-1L)).as(s"__v$j")
    }
    hashed.groupBy("__id").agg(aggs.head, aggs.tail: _*)
      .select(col("__id"), concat((0 until bits).map(j =>
        when(col(s"__v$j") > 0, "1").otherwise("0")): _*).as("__sim"))
  }

  /** Hamming distance between two equal-length bit strings. */
  def hammingDist(a: Column, b: Column): Column =
    size(filter(zip_with(split(a, ""), split(b, ""), (x, y) => x =!= y),
      (x => x))).cast("long")

  /** SimHash near-dup pairs: bucket by bit chunks — with
    * `maxHamming + 1` chunks, a pair within the hamming budget shares
    * at least one exact chunk (pigeonhole), so banding recall is 1.0;
    * exact hamming verification then drops false candidates.
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   shingleN: Int = 3, maxHamming: Int = 3): DataFrame =
    simhashPairsFromShingles(
      docs.select(col(idCol), TextOps.shingles(col(textCol), shingleN).as("__sh")),
      idCol, "__sh", maxHamming)

  /** Pipeline over a pre-staged (id, shingles) table; pass `hashed` to
    * share the staged shingle-hash table with MinHash, or `sketches`
    * (a (__id, __sim) table) to reuse a MATERIALIZED sketch table
    * (`shingled`/`hashed` are then ignored). The sketch plan feeds FOUR
    * consumers (both band-join sides and both post-distinct sketch
    * re-joins), so without `sketches` the sketch aggregation re-runs
    * per consumer — fine for one-shot/small calls; at scale build the
    * sketch table once, persist or write it under YOUR lifecycle, and
    * pass it here (the query path stages it via `Staged.docSimhash60`).
    * This function deliberately persists nothing: a cache created at
    * this layer would have no owner to release it.
    */
  def simhashPairsFromShingles(shingled: DataFrame, idCol: String, shinglesCol: String,
                               maxHamming: Int = 3,
                               hashed: Option[DataFrame] = None,
                               bits: Int = 64,
                               sketches: Option[DataFrame] = None): DataFrame = {
    val nChunks = maxHamming + 1
    val width = (bits + nChunks - 1) / nChunks
    // guard supplied sketches against a width/bits mismatch (wrong-width
    // sketches would band silently wrong): narrow per-row check, no job
    val sh = sketches.map(_.select(col("__id"),
        when(length(col("__sim")) === bits, col("__sim"))
          .otherwise(raise_error(format_string(
            s"sketch width %s != bits $bits", length(col("__sim")).cast("string"))))
          .as("__sim")))
      .getOrElse(hashed.map(simhashColsFromHashes(_, bits)).getOrElse(
        simhashCols(shingled.select(col(idCol), col(shinglesCol).as("__sh")), idCol, "__sh", bits)))
    // the candidate distinct() shuffles ONLY the (doc_a, doc_b) id pair
    // — the 64-char sketch strings are re-joined afterwards (same shape
    // as embedNearDupPairs), keeping the pair-dedup exchange narrow
    val chunks = Similarity.bandExplode(sh, "__sim", nChunks, width, Seq("__id"))
    val l = chunks.as("l")
    val r = chunks.as("r")
    val cand = l.join(r, col("l.band") === col("r.band") &&
        col("l.bits") === col("r.bits") && col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("doc_a"), col("r.__id").as("doc_b"))
      .distinct()
    cand
      .join(sh.select(col("__id").as("doc_a"), col("__sim").as("__sima")), "doc_a")
      .join(sh.select(col("__id").as("doc_b"), col("__sim").as("__simb")), "doc_b")
      .withColumn("hamming", hammingDist(col("__sima"), col("__simb")))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  // ---- corpus-level chunk (paragraph) dedup -------------------------

  /** CCNet-style corpus-level duplicate-paragraph removal, adapted to
    * newline-free text: segment each document into consecutive k-word
    * chunks, keep only the globally FIRST occurrence of every distinct
    * chunk (ordered by (id, chunk position) — deterministic), and
    * reassemble the surviving chunks in document order.
    *
    * Scale shape: the first occurrence per chunk is `min(struct(id,
    * pos))` under a groupBy on the chunk — a map-side-combining
    * aggregation, so a boilerplate chunk repeated a billion times
    * collapses to one row per partition BEFORE the exchange (a window
    * `row_number() = 1` formulation would instead sort the full hot
    * group on one reducer). Reassembly shuffles survivors by id only.
    * Two exchanges total, both skew-tolerant.
    *
    * Output: (idCol, clean_text, kept, dropped), one row per input
    * document ([[graft.operators.TextOps.wordChunks]] is total, so
    * fully-duplicated docs survive with clean_text = "").
    *
    * Reference scope: corpus dedup is north-star pipeline work; the
    * reference library itself has no text ops (SURVEY.md §2.6).
    */
  def chunkDedup(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    // NULL text reads as empty text: without the coalesce the explode
    // branch drops the row (posexplode of NULL) while the totals branch
    // yields size(NULL) = NULL, emitting (id, '', 0, NULL) — a torn row
    // that breaks downstream arithmetic on `dropped`
    val text = coalesce(col(textCol), lit(""))
    // Hoist the tokenization into its own projection: `__w` reaches the
    // chunking lambda as an attribute, so the interpreted HOF slices a
    // ready array instead of re-splitting the document once per chunk
    // (CollapseProject keeps the barrier — the alias is non-cheap and
    // referenced more than once, so Catalyst does not inline it back).
    val docsW = docs.select(col(idCol).as("__id"), TextOps.words(text).as("__w"))
    val ch = docsW.select(col("__id"),
      posexplode(TextOps.wordChunksFromWords(col("__w"), k)).as(Seq("__cidx", "__chunk")))
    val firsts = ch.groupBy("__chunk")
      .agg(min(struct(col("__id"), col("__cidx"))).as("__f"))
      .select(col("__f.__id").as("__id"), col("__f.__cidx").as("__cidx"),
        col("__chunk"))
    val rebuilt = firsts.groupBy("__id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__cidx"), col("__chunk")))),
          c => c.getField("__chunk")), " ").as("clean_text"),
        count(lit(1)).as("kept"))
    // per-doc chunk totals as a NARROW scan-side projection (size of
    // the chunk array) — no explode, no exchange on this branch
    val totals = docsW.select(col("__id"),
      size(TextOps.wordChunksFromWords(col("__w"), k)).cast("long").as("__total"))
    totals.join(rebuilt, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept"), lit(0L)).as("kept"),
        (col("__total") - coalesce(col("kept"), lit(0L))).as("dropped"))
  }

  /** Boilerplate-chunk removal — [[chunkDedup]]'s companion rule:
    * chunks whose text appears in at least `minDocs` DISTINCT
    * documents are boilerplate (headers, footers, navigation) and are
    * removed from EVERY document, not deduplicated to one copy. Same
    * hoisted-tokenization + narrow-totals shape as chunkDedup; the
    * doc-frequency aggregate is two-level — (chunk, doc) distinct,
    * then per-chunk count — both map-side-combining, no
    * count-distinct EXPAND; the boiler set anti-joins back keyed on
    * the chunk (the high-frequency tail, broadcast-sized in practice).
    */
  def boilerplateRemoval(docs: DataFrame, idCol: String, textCol: String,
                         k: Int, minDocs: Int): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val docsW = docs.select(col(idCol).as("__id"), TextOps.words(text).as("__w"))
    val ch = docsW.select(col("__id"),
      posexplode(TextOps.wordChunksFromWords(col("__w"), k)).as(Seq("__cidx", "__chunk")))
    val boiler = ch.select(col("__chunk"), col("__id")).distinct()
      .groupBy("__chunk").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("__chunk"))
    val kept = ch.join(boiler, Seq("__chunk"), "left_anti")
    val rebuilt = kept.groupBy("__id").agg(
      array_join(transform(
        array_sort(collect_list(struct(col("__cidx"), col("__chunk")))),
        c => c.getField("__chunk")), " ").as("clean_text"),
      count(lit(1)).as("kept"))
    val totals = docsW.select(col("__id"),
      size(TextOps.wordChunksFromWords(col("__w"), k)).cast("long").as("__total"))
    totals.join(rebuilt, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept"), lit(0L)).as("kept"),
        (col("__total") - coalesce(col("kept"), lit(0L))).as("dropped"))
  }

  // ---- benchmark-contamination report --------------------------------

  /** Substring-level exact dedup (the ExactSubstr policy of Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499 — re-expressed relationally instead of
    * via their single-node suffix array): every word position covered
    * by a non-FIRST occurrence of any duplicated k-word window is
    * removed; first occurrences keep their text, so exactly one copy
    * of every duplicated passage survives corpus-wide. Overlapping
    * windows (stride 1) catch duplicated passages at ANY alignment —
    * the property [[chunkDedup]]'s non-overlapping chunks give up.
    *
    * Scale shape: windows are keyed by their engine-portable 60-bit
    * hash, so the global first-occurrence pass is a map-side-combining
    * `min(struct)+count` agg over (hash) — gram TEXT never enters an
    * exchange anywhere. Duplicate occurrences expand to covered (doc,
    * pos) pairs (×k rows on the duplicated fraction only), and the
    * rebuild is one anti-join plus a per-doc agg on integer keys.
    * Hash collisions (2^-60-scale) would merge distinct grams; the
    * oracle replays the same hash, so the contract is exact w.r.t.
    * the keyed windows.
    *
    * Output: (idCol, clean_text, n_words, n_removed), one row per
    * input document.
    */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame =
    substringDedupFromGrams(docs, windowHashTable(docs, idCol, textCol, k),
      idCol, textCol, k)

  /** (__id, __i, __h): every overlapping k-word window keyed by its
    * engine-portable 60-bit hash — the input [[substringDedupFromGrams]]
    * consumes TWICE (global first-occurrence agg + per-occurrence
    * probe). Stage/persist it when running the full dedup so the
    * ngram+hash pipeline runs once, not once per consumer (the local
    * analog of materializing the window table to parquet in a 100 TB
    * pipeline).
    */
  def windowHashTable(docs: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    docs.select(col(idCol).as("__id"), TextOps.words(text).as("__w"))
      // ngrams is ordered by start position, so posexplode yields the
      // window's word offset directly
      .select(col("__id"),
        posexplode(TextOps.ngramsFromWords(col("__w"), k)).as(Seq("__i", "__g")))
      .select(col("__id"), col("__i"), portableHash60(col("__g")).as("__h"))
  }

  /** [[substringDedup]] from a pre-built (possibly persisted) window
    * hash table — see [[windowHashTable]].
    */
  def substringDedupFromGrams(docs: DataFrame, grams: DataFrame,
                              idCol: String, textCol: String, k: Int): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val docsW = docs.select(col(idCol).as("__id"), TextOps.words(text).as("__w"))
    val firsts = grams.groupBy("__h")
      .agg(min(struct(col("__id"), col("__i"))).as("__f"), count(lit(1)).as("__cnt"))
    // non-first occurrences of duplicated windows
    val dups = grams.join(firsts.filter(col("__cnt") > 1), "__h")
      .filter(!(col("__id") === col("__f.__id") && col("__i") === col("__f.__i")))
      .select(col("__id"), col("__i"))
    // covered word positions (distinct: overlapping dup windows merge)
    val covered = dups
      .select(col("__id"), explode(sequence(col("__i"), col("__i") + lit(k - 1))).as("__p"))
      .distinct()
    val wordsPos = docsW.select(col("__id"),
      posexplode(col("__w")).as(Seq("__p", "__word")))
    val survivors = wordsPos.join(covered, Seq("__id", "__p"), "left_anti")
      .groupBy("__id")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("__p"), col("__word")))),
          c => c.getField("__word")), " ").as("clean_text"),
        count(lit(1)).as("__kept"))
    val totals = docsW.select(col("__id"), size(col("__w")).cast("long").as("__total"))
    totals.join(survivors, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("__total").as("n_words"),
        (col("__total") - coalesce(col("__kept"), lit(0L))).as("n_removed"))
  }

  /** Train/eval n-gram contamination: for every training document,
    * count its distinct word n-grams that also appear anywhere in the
    * eval split. The production shape for "did benchmark text leak
    * into the training corpus": the eval side (a benchmark suite) is
    * tiny relative to the corpus, so its distinct gram set broadcasts
    * and the training side never shuffles its grams at all — the only
    * exchanges are the eval-side distinct and the per-doc count
    * aggregations (both map-side combining, keyed by doc id).
    *
    * `evalPred` selects the eval split. Output: (idCol, n_overlap,
    * n_grams, permille) for contaminated training docs only.
    */
  def contaminationReport(docs: DataFrame, idCol: String, textCol: String,
                          n: Int, evalPred: Column => Column): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"),
      explode(TextOps.shingles(col(textCol), n)).as("__s"))
    val ev = sh.filter(evalPred(col("__id"))).select("__s").distinct()
    val tr = sh.filter(!evalPred(col("__id")))
    // per-doc gram totals as a NARROW scan-side projection (shingles
    // is a distinct set, so its size == the exploded row count) — no
    // explode, no exchange on this branch
    val totals = docs.filter(!evalPred(col(idCol)))
      .select(col(idCol).as("__id"),
        size(TextOps.shingles(col(textCol), n)).cast("long").as("n_grams"))
    val overlap = tr.join(broadcast(ev), "__s")
      .groupBy("__id").agg(count(lit(1)).as("n_overlap"))
    overlap.join(totals, "__id")
      .select(col("__id").as(idCol), col("n_overlap"), col("n_grams"),
        expr("CAST((1000 * n_overlap) DIV n_grams AS BIGINT)").as("permille"))
  }

  /** Span-level benchmark decontamination: WHERE the contamination sits,
    * not just which documents carry it. For every training document,
    * every overlapping word n-gram POSITION whose gram appears in the
    * eval set is a hit; the report aggregates hits per document
    * (count, first/last position, distinct grams matched) — the
    * surgical-removal shape (cut the spans, keep the document) versus
    * [[contaminationReport]]'s drop-the-document shape.
    *
    * Same scale contract as d8: the eval gram set is deduplicated and
    * BROADCAST (eval suites are bounded — thousands of docs — while
    * the train side is the 100 TB one); train grams are generated and
    * filtered scan-side by the broadcast hash join, so the only
    * exchange carries matched (doc, pos, gram) hit rows into the
    * per-doc aggregate. Positions are 0-based gram start offsets in
    * words. Uses positional [[TextOps.ngramsFromWords]] (duplicates
    * kept — a gram repeated in a document is multiple spans to cut),
    * with the words array let-bound once per row.
    */
  def spanContamination(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, evalPred: Column => Column): DataFrame = {
    val grams = docs
      .select(col(idCol).as("__id"), TextOps.words(col(textCol)).as("__w"))
      .select(col("__id"),
        posexplode(TextOps.ngramsFromWords(col("__w"), n)).as(Seq("__pos", "__s")))
    val ev = grams.filter(evalPred(col("__id"))).select("__s").distinct()
    val hits = grams.filter(!evalPred(col("__id"))).join(broadcast(ev), "__s")
    hits.groupBy("__id").agg(
        count(lit(1)).as("n_spans"),
        min("__pos").cast("long").as("first_pos"),
        max("__pos").cast("long").as("last_pos"),
        countDistinct("__s").as("n_grams_hit"))
      .select(col("__id").as(idCol), col("n_spans"), col("first_pos"),
        col("last_pos"), col("n_grams_hit"))
  }

  /** Near-dup pairs among 64-bit LONG sketches at Hamming distance <=
    * `maxDist`, entirely in native codegen'd expressions: pigeonhole
    * banding over `maxDist + 1` bit chunks extracted with shift/mask
    * (even split, remainder bits on the last chunk — a pair within the
    * budget shares at least one exact chunk, so banding recall is 1.0),
    * then exact popcount verify `bit_count(a ^ b)` over candidates
    * only. Sketch longs ride through the band join as 8-byte columns —
    * cheaper than the string path's re-join, and nothing here falls
    * out of whole-stage codegen (the bit-STRING path
    * [[simhashPairsFromShingles]] stays for the 60-bit portable
    * simhash, whose DuckDB oracle needs cross-engine bit strings).
    */
  def hammingPairsFromLongs(sketches: DataFrame, idCol: String, hashCol: String,
                            maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 31, s"maxDist=$maxDist out of range")
    val nChunks = maxDist + 1
    val width = 64 / nChunks
    val chunks = sketches
      .select(col(idCol).as("__id"), col(hashCol).as("__h"))
      .select(col("__id"), col("__h"),
        explode(array((0 until nChunks).map { j =>
          val lo = j * width
          val w = if (j == nChunks - 1) 64 - lo else width
          val bits =
            if (w == 64) col("__h")
            else shiftrightunsigned(col("__h"), lo).bitwiseAND(lit((1L << w) - 1L))
          struct(lit(j).as("band"), bits.as("bits"))
        }: _*)).as("__b"))
      .select(col("__id"), col("__h"),
        col("__b.band").as("band"), col("__b.bits").as("bits"))
    val l = chunks.as("l")
    val r = chunks.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bits") === col("r.bits")
        && col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("doc_a"), col("r.__id").as("doc_b"),
        col("l.__h").as("__ha"), col("r.__h").as("__hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(__ha ^ __hb)").cast("long"))
      .filter(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Canonical-document selection per duplicate cluster: given CC
    * labels ((id, rep) — [[connectedComponents]] output) and a score
    * column, keep the argmax-score member of every cluster with a
    * deterministic smallest-id tie-break. One equi-join to attach
    * scores + one map-side-combining `max(struct(score, -id))` agg —
    * the skew-safe shape (a 10M-member boilerplate cluster folds to
    * one struct per map task; the window-row_number formulation would
    * sort the whole cluster on one reducer).
    *
    * Returns (cluster_rep, keep_id, keep_score, n_members).
    */
  def clusterCanonical(labels: DataFrame, docs: DataFrame,
                       idCol: String, scoreCol: String): DataFrame =
    labels.join(
        docs.select(col(idCol).as("id"), col(scoreCol).cast("long").as("__score")),
        "id")
      .groupBy("rep").agg(
        count(lit(1)).as("n_members"),
        max(struct(col("__score"), (-col("id")).as("__nid"))).as("__m"))
      .select(col("rep").as("cluster_rep"),
        (-col("__m.__nid")).as("keep_id"),
        col("__m.__score").as("keep_score"),
        col("n_members"))

  // ---- Bloom-prefiltered incremental membership ------------------------

  /** Bloom-prefiltered incremental dedup admission (the daily-crawl
    * membership test at 100 TB): build a Bloom filter over the EXISTING
    * corpus content hashes (one tree-aggregated pass; the sketch is
    * kilobytes-to-MBs and ships to every executor), probe it SCAN-SIDE
    * on the incoming batch, and run the exact semi-join verification
    * only over probe survivors — true dups plus the `fpp` share of
    * false positives. The verdict is EXACT: the bloom never decides,
    * it only prunes the verify join's probe side (a false positive is
    * dropped by the join; a false negative cannot occur — the no-FN
    * guarantee is what makes the prefilter sound). Contrast with
    * [[incrementalSurvivors]], which ships the WHOLE incoming batch
    * into the anti-join.
    *
    * Returns (idCol, is_dup: 0/1 long) for every incoming row. NULL
    * text hashes as empty (the d7 contract). The `mightContainLong`
    * probe is a JVM lambda over the broadcast sketch — off the codegen
    * path by necessity (the sketch is driver-built state, not an
    * expression), and the cheapest possible row test: two multiplies
    * and `numHashFunctions` bit loads.
    */
  def bloomMembership(existing: DataFrame, incoming: DataFrame,
                      textCol: String, idCol: String,
                      fpp: Double = 0.01): DataFrame = {
    val h = xxhash64(coalesce(col(textCol), lit("")))
    val exH = existing.select(h.as("__h"))
    val expected = math.max(1L, exH.count())
    val bf = exH.stat.bloomFilter("__h", expected, fpp)
    val spark = incoming.sparkSession
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((hv: Long) => bfB.value.mightContainLong(hv))
    val inc = incoming.select(col(idCol), h.as("__h"))
    val confirmed = inc.filter(mightContain(col("__h")))
      .join(exH.distinct(), Seq("__h"), "left_semi")
      .select(col(idCol), lit(1L).as("__dup"))
    inc.select(idCol).join(confirmed, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__dup"), lit(0L)).as("is_dup"))
  }
}
