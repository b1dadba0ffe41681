package graft.serve

import graft.SparkSpec
import graft.bench.DataGen
import graft.model.SeriesSpec

class RoutesSpec extends SparkSpec {

  private lazy val grid = DataGen.sampleGrid(spark, days = 120)
  private val spec = SeriesSpec("ts", Seq("lat", "lon"), "temperature")
  private lazy val registry = Map("era5_sample" -> (grid, spec))

  test("valid metric request dispatches and scopes to the nearest cell") {
    val out = Routes.metricRoute(spark, registry,
      Routes.MetricRequest("era5_sample", "monthly", lat = Some(12.0), lon = Some(33.0)))
    assert(out.isRight)
    val df = out.toOption.get
    assert(df.count() == 4) // 120 days → 4 months at one cell
    assert(df.select("lat").distinct().count() == 1)
  }

  test("unknown dataset is a NotFound, like the reference 404") {
    val out = Routes.metricRoute(spark, registry,
      Routes.MetricRequest("nope", "monthly"))
    assert(out == Left(Routes.NotFound("Dataset not found: nope")))
  }

  test("invalid metric and out-of-bounds coordinates are InvalidParam") {
    val badMetric = Routes.metricRoute(spark, registry,
      Routes.MetricRequest("era5_sample", "hourly"))
    assert(badMetric.swap.toOption.get.isInstanceOf[Routes.InvalidParam])
    assert(badMetric.swap.toOption.get.message.contains("hourly"))
    val badLat = Routes.metricRoute(spark, registry,
      Routes.MetricRequest("era5_sample", "monthly", lat = Some(95), lon = Some(0)))
    assert(badLat.swap.toOption.get.message.contains("95"))
  }

  test("global metric without coordinates runs over the full grid") {
    val out = Routes.metricRoute(spark, registry,
      Routes.MetricRequest("era5_sample", "climatology"))
    assert(out.toOption.get.select("lat").distinct().count() == 19)
  }
}
