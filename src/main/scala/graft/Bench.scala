package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness (BASELINE.md protocol, scaled to the suite size):
  * per query 1 warmup + 3 timed runs, median reported. The action is a
  * noop-format write so projections/expressions are fully computed —
  * `count()` would let Catalyst drop unreferenced columns (md5s, ranks…)
  * and fake the numbers.
  *
  * Prints ONE JSON line: {"metric","value","unit","queries","sf"}.
  */
object Bench {

  /** Headline set: one per operator family (full inventory runs in the
    * correctness gate; benching all 45 would just time parquet re-reads).
    */
  val headline: Seq[String] = Seq(
    "q_monthly_mean", "q_rolling_mean", "q_clim_percentiles",
    "q_anomaly", "q_zscore_severity", "q_percentile_rank",
    "q_linear_trend", "q_mann_kendall",
    "q_region_revenue", "q_top_suppliers",
    "q_event_windows", "q_sessions", "q_sliding_windows",
    "q_asof_join", "q_range_join", "q_salted_agg",
    "q_token_stats", "q_fingerprint",
    "q_ngram_jaccard", "q_minhash_dedup",
    "q_ann_topk", "q_scan_pushdown")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // driver contract: bench runs at local[32] unless overridden
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    val results = headline.filter(SparkEntry.queries.contains).map { name =>
      try {
        runOnce(name) // warmup: parquet footer cache, codegen, JIT
        val times = (1 to 3).map(_ => runOnce(name)).sorted
        name -> times(times.length / 2)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
