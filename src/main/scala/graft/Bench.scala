package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Passes over the FULL suite; per-query time is the min across passes.
    // A single-shot run is one sample per query — one background compile /
    // GC pause / page-cache miss lands on some query and records a phantom
    // regression (the r4 artifact had 7 of them, up to 9× the quiet time).
    // Min-of-passes discards per-query load spikes. Spark-level staged
    // caches are RELEASED between passes (below) so every pass re-pays
    // staging first-touch; OS page cache and JIT warmth DO carry across
    // passes, so the min runs mildly warmer than a literal single-pass
    // protocol — compare rounds run under the same multi-pass protocol,
    // not against pre-r5 single-pass artifacts.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Deterministic work metrics (r14 VERDICT item 1): wall-clock on this
    // host drifts ±40% with load, so seconds alone cannot adjudicate a
    // round. Task counts and shuffle/scan bytes are functions of the
    // physical plan only — emitted per query into the FULL artifact
    // (additions-only; the one-line stdout contract is unchanged).
    val wm = WorkMetricsListener.install(spark)
    // warm the JVM once so the first measured query is not billed for
    // one-time init: codegen, parquet reader, broadcast + shuffle
    // machinery (worth ~3-8 s on whichever query runs first otherwise)
    locally {
      import org.apache.spark.sql.functions.{broadcast, col, upper}
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      r.join(broadcast(r.limit(1)), r.columns.headOption.toSeq)
        .groupBy(r.columns.head).count()
        .write.format("noop").mode("overwrite").save()
      // first upper()/lower() call loads the ICU case-mapping tables
      // (collation-aware string functions) — a one-time ~14 s JVM cost
      // that would otherwise bill whichever query touches upper first
      // (measured: q14 5.5 s first run, 0.3 s after; bare upper() 14 s
      // first call, 0.09 s after)
      r.select(upper(col(r.columns(1)))).write.format("noop").mode("overwrite").save()
    }
    // sorted iteration: stable query order across rounds AND across passes,
    // so staged first-touch costs land on the same query every time
    val names = SparkEntry.queries.keys.toSeq.sorted
    // per-query best NET time across passes (staged-build wall time
    // billed separately below); NaN = never succeeded
    val best = scala.collection.mutable.Map[String, Double]()
    // per-staged-key best build seconds across passes — each pass
    // rebuilds every staged artifact (release() below), so min-of-passes
    // applies to staging exactly like it does to queries
    val bestStage = scala.collection.mutable.Map[String, Double]()
    val everFailed = scala.collection.mutable.Set[String]()
    // staged-key -> queries that ACCESSED it (hit or build), split by
    // whether the consuming execution succeeded. Per-query rows are NET
    // of staged first-touch, so a key consumed by exactly one query
    // means that query's row understates its intrinsic cost by the
    // key's build time — the consumer map makes that explicit in the
    // artifact instead of leaving "sub-linear" claims resting on a
    // hidden single-consumer split.
    val consumersOk = scala.collection.mutable.Map[String, scala.collection.mutable.SortedSet[String]]()
    val consumersFailed = scala.collection.mutable.Map[String, scala.collection.mutable.SortedSet[String]]()
    def drainAccessLog(name: String, failed: Boolean): Unit = {
      val into = if (failed) consumersFailed else consumersOk
      var k = graft.queries.Staged.accessLog.poll()
      while (k != null) {
        into.getOrElseUpdate(k, scala.collection.mutable.SortedSet.empty[String]) += name
        k = graft.queries.Staged.accessLog.poll()
      }
    }
    graft.queries.Staged.accessLog.clear() // warm-up touches are nobody's
    // per-query work metrics, one map per pass. Identical code + data ⇒
    // identical plan-shape fields in every pass (staged artifacts are
    // released between passes, so each pass re-pays staged builds the
    // same way; first-touch consumers include their staged key's work,
    // mirroring how pre-r12 TIMING billed it — the staging_consumers map
    // says which rows those are). Pass-to-pass disagreement on the
    // deterministic fields is itself reported (metrics_unstable).
    val passMetrics = Array.fill(runs)(scala.collection.mutable.Map[String, WorkSnap]())
    for (pass <- 1 to runs) {
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val snap0 = wm.snapshotAfterDrain(spark) // untimed: bus drain sits outside t0
        val st0 = graft.queries.Staged.stagingNanos.get()
        val t0 = System.nanoTime()
        // noop sink: materializes EVERY output column (count() would let
        // Catalyst prune payload expressions and under-measure)
        val failed = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); false }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED (pass $pass): ${e.getMessage}"); true }
        // staged first-touch (Staged.staged forces materialization at
        // build time) is billed to the `staging` map, NOT to whichever
        // query alphabetically touches the shared artifact first — the
        // round-11 sim6/t51 adjudication problem, now explicit per row
        val staging = (graft.queries.Staged.stagingNanos.get() - st0) / 1e9
        val elapsed = (System.nanoTime() - t0) / 1e9 - staging
        passMetrics(pass - 1)(name) = wm.snapshotAfterDrain(spark) - snap0
        drainAccessLog(name, failed)
        if (failed) everFailed += name
        else best(name) = math.min(best.getOrElse(name, Double.MaxValue), elapsed)
      }
      graft.queries.Staged.stagingByKey.foreach { case (k, v) =>
        bestStage(k) = math.min(bestStage.getOrElse(k, Double.MaxValue), v)
      }
      graft.queries.Staged.stagingByKey.clear()
      // steady-state protocol: release every staged/dense-index cache so the
      // next pass (or a repeated in-JVM run) starts from a clean
      // executor-memory state instead of inheriting this pass's caches
      graft.queries.Staged.release(spark)
    }
    // a query that never succeeded records NEGATIVE elapsed (clamped away
    // from -0.0 so a fast crash cannot read as a 0.0s success) plus an
    // explicit errors entry — the sentinel is redundant on purpose. A query
    // that failed on some pass but succeeded on another reports its best
    // successful time (the failure was load/transient; stderr has the log).
    val qs = names.map { k =>
      val t = best.getOrElse(k, Double.NaN)
      s"\"" + k + "\":" + (if (t.isNaN) -0.001 else t)
    }.mkString("{", ",", "}")
    val errs = names.filter(k => !best.contains(k)).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    // grand total = query nets + staged-build seconds, so `value` stays
    // comparable with pre-r12 artifacts (which billed staging inside
    // whichever query touched each artifact first)
    val stagingTotal = bestStage.values.sum
    val total = best.values.sum + stagingTotal
    val stg = bestStage.toSeq.sortBy(-_._2).map { case (k, v) =>
      "\"" + k + "\":" + f"$v%.3f"
    }.mkString("{", ",", "}")
    // adjudication metadata: which queries consumed each staged key
    // (successful executions), and keys whose ONLY consumers failed —
    // their build cost sits in staging_total with no surviving query
    // row, so flag them rather than silently skewing the grand total
    val stgConsumers = bestStage.keys.toSeq.sorted.map { k =>
      val ok = consumersOk.getOrElse(k, scala.collection.mutable.SortedSet.empty[String])
      "\"" + k + "\":[" + ok.map("\"" + _ + "\"").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val orphaned = bestStage.keys.toSeq.sorted
      .filter(k => consumersOk.getOrElse(k, scala.collection.mutable.SortedSet.empty[String]).isEmpty)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // failed consumers, recorded so an orphaned key is adjudicable
    // (its build cost sits in staging_total with no surviving query
    // row — this map says which failed query put it there); r13 ADVICE
    val stgConsumersFailed = consumersFailed.keys.toSeq.sorted.map { k =>
      "\"" + k + "\":[" +
        consumersFailed(k).map("\"" + _ + "\"").mkString(",") + "]"
    }.mkString("{", ",", "}")
    // deterministic work metrics from the LAST pass (passes agree on the
    // plan-shape fields; metrics_unstable lists any query where they did
    // not — identical code should report [] there, making plan changes
    // adjudicable under host drift where seconds are not)
    val lastM = passMetrics(runs - 1)
    val metricsJson = names.filter(lastM.contains).map { k =>
      "\"" + k + "\":" + lastM(k).json
    }.mkString("{", ",", "}")
    val unstable = names.filter { k =>
      passMetrics.forall(_.contains(k)) &&
        passMetrics.exists(m => !m(k).closeTo(passMetrics(0)(k)))
    }.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"staging":$stg,"staging_total":$stagingTotal,"staging_consumers":$stgConsumers,"staging_consumers_failed":$stgConsumersFailed,"staging_orphaned":$orphaned,"metrics":$metricsJson,"metrics_unstable":$unstable,"errors":$errs,"runs":$runs,"sf":"$sfDir"}"""
    println(line)
    // Self-contained artifact: the stdout line is captured by the driver
    // as a LOG TAIL, which truncated the first ~28 queries out of two
    // rounds' BENCH artifacts. Persist the complete per-query JSON to a
    // repo file so the record never depends on log capture. Protocol
    // note: since r12, staged-artifact build time (Staged.staged forces
    // materialization at build) rides the `staging` map — `queries`
    // rows are NET of shared first-touch, directly comparable to
    // standalone re-measures; pre-r12 artifacts billed staging to the
    // alphabetically first consumer.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")),
      line + "\n")
    catch { case e: Exception =>
      System.err.println(s"[bench] artifact write failed: ${e.getMessage}") }
    // The driver's tail capture is 2000 chars — the full line above has
    // never fit (every BENCH_r{N}.json through round 10 records
    // parsed:null). Print a COMPACT summary as the LAST stdout line so
    // a tail-parse sees one complete JSON object: same shape, but
    // `queries` carries only the slowest entries that fit the budget,
    // with the full per-query map in the artifact file.
    val slowest = names.filter(best.contains).sortBy(-best(_))
    val budget = 1500
    val kept = new scala.collection.mutable.ListBuffer[String]()
    var used = 150 + errs.length // envelope overhead + error list
    slowest.foreach { k =>
      val ent = "\"" + k + "\":" + f"${best(k)}%.3f"
      if (used + ent.length + 1 <= budget) { kept += ent; used += ent.length + 1 }
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":{${kept.mkString(",")}},"queries_total":${names.size},"staging_total":$stagingTotal,"queries_in_full_artifact":"BENCH_FULL.json or SPARK_GRAFT_BENCH_OUT","errors":$errs,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
