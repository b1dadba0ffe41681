package graft

import graft.bench.DataGen
import graft.ingest.{BBox, GridSink, LayoutPlanner}
import graft.metrics._
import graft.model.SeriesSpec
import graft.pipeline.LazyPipeline
import graft.serve.{Api, Cache}
import org.apache.spark.sql.functions._

/** End-to-end pipeline mirroring the reference's integration demo
  * (`src/arco_demo.py:301-387`): generate → plan layout → convert/write →
  * read back → metrics → point-access latency probe, with the serving
  * cache in front. The closest thing the reference has to an integration
  * test, ported whole.
  */
class IntegrationSpec extends SparkSpec {

  test("generate -> layout -> write -> metrics -> point access, end to end") {
    // 1. generate (arco_demo: synthetic climate field)
    val grid = DataGen.sampleGrid(spark, days = 365)
    val spec = SeriesSpec("ts", Seq("lat", "lon"), "temperature")

    // 2. layout plan + write (timeseries access pattern, zstd)
    val store = tmpDir() + "/arco"
    val layout = LayoutPlanner.plan(grid.schema, LayoutPlanner.Timeseries,
      Seq("lat", "lon"), "ts")
    assert(layout.compression == "zstd")
    GridSink.writeGrid(grid, store, layout)

    // 3. read back + verification (arco_demo reads the store back)
    val back = GridSink.openStore(spark, store)
    assert(back.count() == grid.count())
    val si = GridSink.storeInfo(spark, store)
    assert(si.nRows == grid.count() && si.totalBytes > 0)

    // 4. metrics over the store through a lazy pipeline with persist
    val monthly = LazyPipeline(back)
      .apply("monthly")(d => Temporal.monthlyMean(d, spec))
      .persist()
    assert(monthly.dataFrame.select("month").distinct().count() == 12)
    val anomalies = Anomalies.standardizedAnomaly(back, spec)
    assert(math.abs(anomalies.agg(avg("zscore")).head.getDouble(0)) < 0.1)
    monthly.dataFrame.unpersist()

    // 5. point access latency probe behind the response cache
    val cache = new Cache.LruCache[Array[org.apache.spark.sql.Row]]()
    val key = Cache.cacheKey("point", Map("lat" -> "10", "lon" -> "20"))
    def fetch() = cache.getOrCompute(key) {
      Api.pointSeries(back, spec, lat = 10, lon = 20).collect()
    }
    val t0 = System.nanoTime(); val cold = fetch()
    val coldMs = (System.nanoTime() - t0) / 1e6
    val t1 = System.nanoTime(); val warm = fetch()
    val warmMs = (System.nanoTime() - t1) / 1e6
    assert(cold.length == 365) // full daily series at the snapped cell
    assert(warm.length == cold.length)
    assert(cache.stats.hits == 1)
    // The < 2000 ms reference latency target (BASELINE.md) is ENFORCED in
    // the bench harness, where the box is quiet: Bench exits nonzero when
    // any headline query's 20-iteration max breaches 2 s (strict unless
    // SPARK_GRAFT_STRICT_GATE=0). Here suites run concurrently and tight
    // wall-clock assertions flake under load, so this spec only reports —
    // plus a very generous 100× bound that catches gross regressions
    // (a cached point lookup taking minutes) without load-flaking.
    info(f"point access: cold $coldMs%.1f ms, warm $warmMs%.3f ms (reference envelope: 2000 ms)")
    assert(warmMs < 200000, f"cached point access took $warmMs%.0f ms — something is pathological")

    // 6. region stats on the store (the /stats endpoint shape)
    val stats = Api.regionStats(back, spec, BBox(-90, -45, 90, 45)).head()
    assert(stats.getAs[Long]("n") > 0)
    assert(stats.getAs[Double]("p10") < stats.getAs[Double]("p90"))
  }
}
