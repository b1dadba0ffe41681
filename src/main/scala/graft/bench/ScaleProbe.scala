package graft.bench

import graft.metrics._
import graft.model.SeriesSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: runs the core metric operators over a reference benchmark
  * grid (small 100×90×180, medium 365×180×360 ≈ 23.6M rows, large
  * 730×360×720 ≈ 189M rows — `benchmark_suite.py:280-284` — generated
  * in-flight, no scan cost) and prints per-operator wall times. Evidence
  * that the plans hold well past the driver test scale (results recorded
  * in SCALE.md); run manually, not part of the driver contract.
  *
  * Usage: runMain graft.bench.ScaleProbe [small|medium|large]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val size = args.headOption.getOrElse("medium")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val grid = DataGen.benchGrid(spark, size)
    val spec = SeriesSpec("ts", Seq("lat", "lon"), "temperature")
    println(s"size=$size rows=${grid.count()}")

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def run(tag: String, df: => org.apache.spark.sql.DataFrame): Unit =
      time(tag)(df.write.format("noop").mode("overwrite").save())

    run("monthly_mean", Temporal.monthlyMean(grid, spec))
    run("climatology", Temporal.climatology(grid, spec))
    run("zscore", Anomalies.standardizedAnomaly(grid, spec))
    run("zscore_windowed", Anomalies.standardizedAnomalyWindowed(grid, spec))
    run("clim_percentiles", Percentiles.climatologicalPercentiles(grid, spec))
    run("approx_percentiles", Percentiles.approxClimatologicalPercentiles(grid, spec))
    run("linear_trend", Trends.linearTrend(grid, spec))
    run("mann_kendall_monthly", {
      val m = Temporal.monthlyMean(grid, spec)
        .select(col("month").as("ts"), col("lat"), col("lon"), col("mean_value"))
      Trends.mannKendall(m, SeriesSpec("ts", Seq("lat", "lon"), "mean_value"))
    })
    spark.stop()
  }
}
