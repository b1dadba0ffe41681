package graft.metrics

import graft.SparkSpec
import graft.model.{SeriesSpec, Tables}

/** Error-path parity with the reference (its pytest suites assert
  * ValueError on missing dims / bad params, e.g.
  * `tests/test_metrics/test_temporal.py` error cases): operators fail fast
  * with messages naming the missing column and what exists.
  */
class ValidationSpec extends SparkSpec {

  private lazy val li = Tables.lineitem(spark, sfDir)
  private val badSpec = SeriesSpec("no_time", Seq("l_returnflag"), "l_quantity")

  test("metric operators reject a missing time column with a clear message") {
    Seq[(String, () => Any)](
      "monthly" -> (() => Temporal.monthlyMean(li, badSpec)),
      "seasonal" -> (() => Temporal.seasonalMean(li, badSpec)),
      "annual" -> (() => Temporal.annualMean(li, badSpec)),
      "climatology" -> (() => Temporal.climatology(li, badSpec)),
      "rolling" -> (() => Temporal.rollingMean(li, badSpec, 5)),
      "percentiles" -> (() => Percentiles.climatologicalPercentiles(li, badSpec)),
      "return_periods" -> (() => Percentiles.returnPeriods(li, badSpec)),
      "anomaly" -> (() => Anomalies.anomaly(li, badSpec)),
      "trend" -> (() => Trends.linearTrend(li, badSpec)),
      "mann_kendall" -> (() => Trends.mannKendall(li, badSpec))
    ).foreach { case (tag, f) =>
      val e = intercept[IllegalArgumentException](f())
      assert(e.getMessage.contains("no_time"), s"$tag should name the missing column")
      assert(e.getMessage.contains("l_shipdate"), s"$tag should list available columns")
    }
  }

  test("percentile vectors must be ascending; reduceOverTime needs aggs") {
    import org.apache.spark.sql.functions._
    val df = graft.bench.DataGen.sampleGrid(spark, days = 40)
    val spec = graft.model.SeriesSpec("ts", Seq("lat", "lon"), "temperature")
    // unsorted percentiles would silently clamp/mis-interpolate every
    // rank downstream (the kernel assumes a sorted threshold vector)
    val e = intercept[IllegalArgumentException] {
      Percentiles.climatologicalPercentiles(df, spec,
        percentiles = Seq(90, 10, 50))
    }
    assert(e.getMessage.contains("ascending"))
    val e2 = intercept[IllegalArgumentException] {
      Percentiles.approxClimatologicalPercentiles(df, spec,
        percentiles = Seq(90, 10))
    }
    assert(e2.getMessage.contains("ascending"))
    val e3 = intercept[IllegalArgumentException] {
      Temporal.reduceOverTime(df, spec)
    }
    assert(e3.getMessage.contains("at least one aggregate"))
  }

  test("parameter validation mirrors the reference's bounds") {
    val spec = graft.queries.TemporalQ.liSeries
    assert(intercept[IllegalArgumentException](
      Percentiles.climatologicalPercentiles(li, spec, percentiles = Seq(120)))
      .getMessage.contains("120"))
    assert(intercept[IllegalArgumentException](
      Percentiles.returnPeriods(li, spec, periods = Seq(1)))
      .getMessage.contains("1"))
    assert(intercept[IllegalArgumentException](
      Temporal.rollingMean(li, spec, window = 0))
      .getMessage.contains("0"))
  }
}
