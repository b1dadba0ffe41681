package graft.metrics

import graft.SparkSpec
import graft.bench.DataGen
import graft.model.SeriesSpec
import org.apache.spark.sql.functions._

/** Reference-parity property tests on the true climate-shaped grid — the
  * same statistical assertions as the reference pytest suite
  * (SURVEY.md §5.2; reference tests under tests/test_metrics), ported to
  * the Spark fixture from `DataGen.sampleGrid` (≅ `conftest.py:8-66`:
  * 731 days × 19 lats × 36 lons, gradient + seasonal cycle + noise).
  */
class ClimateParitySpec extends SparkSpec {

  private lazy val grid = DataGen.sampleGrid(spark).cache()
  private val spec = SeriesSpec("ts", Seq("lat", "lon"), "temperature")

  test("monthly mean: 24 months, spatial dims preserved, variance reduced") {
    val m = Temporal.monthlyMean(grid, spec).cache()
    assert(m.select("month").distinct().count() == 24)
    assert(m.select("lat").distinct().count() == 19)
    assert(m.select("lon").distinct().count() == 36)
    val dailyStd = grid.agg(stddev_pop(col("temperature"))).head.getDouble(0)
    val monthlyStd = m.agg(stddev_pop(col("mean_value"))).head.getDouble(0)
    assert(monthlyStd < dailyStd)
    m.unpersist()
  }

  test("seasonal mean: 9 season bins over 2 years (7 full + 2 partial DJF)") {
    val s = Temporal.seasonalMean(grid, spec)
    assert(s.select("season_year", "season").distinct().count() == 9)
    assert(s.select("season").distinct().count() == 4)
  }

  test("annual mean: 2 years, global mean in the physical range 260-300 K") {
    val a = Temporal.annualMean(grid, spec)
    assert(a.select("year").distinct().count() == 2)
    val mean = a.agg(avg("mean_value")).head.getDouble(0)
    assert(mean > 260 && mean < 300)
  }

  test("climatology: 12 months / 4 seasons; reference period keeps 12") {
    assert(Temporal.climatology(grid, spec, Temporal.ByMonth)
      .select("month").distinct().count() == 12)
    assert(Temporal.climatology(grid, spec, Temporal.BySeason)
      .select("season").distinct().count() == 4)
    assert(Temporal.climatology(grid, spec, Temporal.ByMonth,
      Some(("2020-01-01", "2020-12-31"))).select("month").distinct().count() == 12)
  }

  test("rolling mean preserves length and smooths") {
    val small = DataGen.smallGrid(spark)
    val sSpec = SeriesSpec("ts", Seq("lat", "lon"), "temperature")
    val r = Temporal.rollingMean(small, sSpec, window = 3).cache()
    assert(r.count() == small.count())
    val origStd = small.agg(stddev_pop(col("temperature"))).head.getDouble(0)
    val smoothStd = r.agg(stddev_pop(col("rolling_mean"))).head.getDouble(0)
    assert(smoothStd <= origStd)
    r.unpersist()
  }

  test("percentile thresholds are ordered p10<p50<p90 per cell") {
    val p = Percentiles.climatologicalPercentiles(grid, spec,
      percentiles = Seq(10, 50, 90), group = None)
    val wide = p.groupBy("lat", "lon")
      .pivot("percentile", Seq(10, 50, 90)).agg(first("value"))
    val bad = wide.where(!(col("10") < col("50") && col("50") < col("90")))
    assert(bad.count() == 0)
  }

  test("exceedance frequency above p90 is ≈10% and within [0,1]") {
    val f = Percentiles.exceedanceFrequency(grid, spec, percentile = 90)
      .agg(min("exceedance_freq"), max("exceedance_freq"), avg("exceedance_freq")).head
    assert(f.getDouble(0) >= 0.0 && f.getDouble(1) <= 1.0)
    assert(math.abs(f.getDouble(2) - 0.10) < 0.02) // ≈10% by construction
  }

  test("return-period levels are monotone in T") {
    val rp = Percentiles.returnPeriods(grid, spec, Seq(2, 10, 100))
    val wide = rp.groupBy("lat", "lon")
      .pivot("return_period", Seq(2, 10, 100)).agg(first("level"))
    assert(wide.where(col("2") > col("10") || col("10") > col("100")).count() == 0)
  }

  test("anomalies: mean ≈ 0; z-score mean ≈ 0 with std in (0.5, 1.5)") {
    val a = Anomalies.anomaly(grid, spec)
    assert(math.abs(a.agg(avg("anomaly")).head.getDouble(0)) < 1.0) // within 1 K
    val z = Anomalies.standardizedAnomaly(grid, spec).cache()
    assert(math.abs(z.agg(avg("zscore")).head.getDouble(0)) < 0.1)
    val zStd = z.agg(stddev_pop(col("zscore"))).head.getDouble(0)
    assert(zStd > 0.5 && zStd < 1.5)
    z.unpersist()
  }

  test("zero-variance climatology: 0/0 → NaN, x/0 → ±inf (numpy semantics)") {
    import spark.implicits._
    // reference period has one constant value per (month, cell): std = 0.
    // Rows OUTSIDE the window then divide a NONZERO anomaly by zero —
    // numpy yields ±inf there and NaN only for 0/0.
    val df = Seq(
      ("2000-01-05", 5.0), ("2000-01-15", 5.0), // in-window, anomaly 0 → NaN
      ("2001-01-10", 7.0), // +2 / 0 → +inf
      ("2001-01-20", 3.0), // −2 / 0 → −inf
      ("2001-01-25", 5.0)  //  0 / 0 → NaN
    ).toDF("d", "temperature")
      .withColumn("ts", col("d").cast("timestamp"))
      .withColumn("lat", lit(10.0)).withColumn("lon", lit(20.0)).drop("d")
    val z = Anomalies.standardizedAnomaly(df, spec,
        referencePeriod = Some(("2000-01-01", "2000-12-31")))
      .orderBy("ts").select("zscore").as[Double].collect()
    assert(z(0).isNaN && z(1).isNaN && z(4).isNaN)
    assert(z(2).isPosInfinity, s"expected +inf, got ${z(2)}")
    assert(z(3).isNegInfinity, s"expected -inf, got ${z(3)}")
  }

  test("windowed z-score == joined z-score (dense regime, single shuffle)") {
    val joined = Anomalies.standardizedAnomaly(grid, spec)
      .select(col("ts"), col("lat"), col("lon"), col("zscore"))
    val windowed = Anomalies.standardizedAnomalyWindowed(grid, spec)
      .select(col("ts"), col("lat"), col("lon"), col("zscore").as("zw"))
    val d = joined.join(windowed, Seq("ts", "lat", "lon"))
      .agg(max(abs(col("zscore") - col("zw")))).head.getDouble(0)
    assert(d < 1e-9, s"windowed and joined z-scores diverge: max |diff| = $d")
    // plan shape: one exchange, a window, and NO join operator (look only
    // above the cached-input boundary — the test grid's own cached plan
    // carries its generation exchanges)
    val p = windowed.queryExecution.executedPlan.toString
      .split("InMemoryTableScan").head
    assert(!p.contains("Join"), "dense-regime form must not join")
    assert("Exchange".r.findAllIn(p).size == 1, s"expected exactly 1 shuffle:\n$p")
  }

  test("severity classes bounded in [-3,3] and two-sided on symmetric noise") {
    val z = Anomalies.standardizedAnomaly(grid, spec)
    val sev = Anomalies.classifySeverity(z).cache()
    val mm = sev.agg(min("severity"), max("severity")).head
    assert(mm.getByte(0) >= -3 && mm.getByte(1) <= 3)
    assert(sev.where(col("severity") > 0).count() > 0)
    assert(sev.where(col("severity") < 0).count() > 0)
    // near-normal dominates for N(0,1)-ish scores
    val frac0 = sev.where(col("severity") === 0).count().toDouble / sev.count()
    assert(frac0 > 0.5)
    sev.unpersist()
  }

  test("linear trend recovers an injected +1 K/yr exactly (shift over base)") {
    // the seasonal sinusoid over ~2.003 periods carries its own OLS
    // artifact (≈ −0.96 K/yr), so measure the injected trend as the
    // difference from the base field's slope
    val base = Trends.linearTrend(grid, spec).agg(avg("trend")).head.getDouble(0)
    val trended = grid.withColumn("temperature",
      col("temperature") + graft.functions.TimeFns.fractionalYears(col("ts")))
    val slope = Trends.linearTrend(trended, spec).agg(avg("trend")).head.getDouble(0)
    assert(math.abs((slope - base) - 1.0) < 1e-9,
      s"injected 1 K/yr over base $base, recovered ${slope - base}")
  }

  test("Mann-Kendall flags an injected monotone trend as significant") {
    val cell = grid.where(col("lat") === 0.0 && col("lon") === 0.0)
    val monthly = Temporal.monthlyMean(cell, spec)
      .select(col("month").as("ts"), col("lat"), col("lon"), col("mean_value"))
    val mSpec = SeriesSpec("ts", Seq("lat", "lon"), "mean_value")
    // seasonal cycle alone: strong up-down pattern, S near 0
    val base = Trends.mannKendall(monthly, mSpec).head()
    // steep injected trend dominates the cycle
    val trended = monthly.withColumn("mean_value",
      col("mean_value") + graft.functions.TimeFns.fractionalYears(col("ts")) * 40.0)
    val mk = Trends.mannKendall(trended, mSpec).head()
    assert(mk.getAs[Boolean]("significant"))
    assert(mk.getAs[Double]("sen_slope") > 0)
    assert(mk.getAs[Long]("s") > base.getAs[Long]("s"))
  }

  test("metric outputs carry CF provenance attrs in StructField.metadata " +
    "(reference stamps cell_methods/units on every result)") {
    def meta(df: org.apache.spark.sql.DataFrame, c: String) =
      df.schema(c).metadata
    // temporal resamples: cell_methods (reference temporal.py:42,86,115)
    assert(meta(Temporal.monthlyMean(grid, spec), "mean_value")
      .getString("cell_methods") == "ts: mean (monthly)")
    assert(meta(Temporal.seasonalMean(grid, spec), "mean_value")
      .getString("cell_methods") == "ts: mean (seasonal)")
    assert(meta(Temporal.annualMean(grid, spec), "mean_value")
      .getString("cell_methods") == "ts: mean (annual)")
    val clim = Temporal.climatology(grid, spec, Temporal.BySeason)
    assert(meta(clim, "clim_mean").getString("cell_methods")
      == "ts: mean over years")
    assert(meta(clim, "clim_mean").getString("climatology_groupby") == "season")
    assert(meta(clim, "clim_std").getString("climatology_groupby") == "season")
    assert(meta(Temporal.rollingMean(grid, spec, 7), "rolling_mean")
      .getString("cell_methods") == "ts: mean (rolling window=7)")
    // anomaly copies input attrs, overrides names (anomalies.py:56-63)
    val attributed = graft.model.GridSchema.withAttrs(grid, "temperature",
      graft.model.VarAttrs(units = Some("K"), longName = Some("2m Temperature")))
    val an = Anomalies.anomaly(attributed, spec,
      referencePeriod = Some(("2020-01-01", "2020-12-31")))
    assert(meta(an, "anomaly").getString("units") == "K")
    assert(meta(an, "anomaly").getString("long_name") == "2m Temperature anomaly")
    assert(meta(an, "anomaly").getString("standard_name") == "temperature_anomaly")
    assert(meta(an, "anomaly").getString("reference_period")
      == "2020-01-01 to 2020-12-31")
    // z-score: dimensionless, same attrs on ALL THREE forms (parity
    // extends to provenance)
    Seq(Anomalies.standardizedAnomaly(grid, spec),
        Anomalies.standardizedAnomalyWindowed(grid, spec),
        Anomalies.standardizedAnomalyAuto(grid, spec)).foreach { z =>
      assert(meta(z, "zscore").getString("units") == "1")
      assert(meta(z, "zscore").getString("standard_name")
        == "temperature_standardized_anomaly")
    }
    // severity flags (anomalies.py:240-244)
    val sev = Anomalies.classifySeverity(
      Anomalies.standardizedAnomaly(grid, spec))
    assert(meta(sev, "severity").getLongArray("flag_values").toSeq
      == Seq(-3L, -2L, -1L, 0L, 1L, 2L, 3L))
    assert(meta(sev, "severity").getString("flag_meanings")
      .startsWith("extremely_below"))
    // percentile rank / thresholds / exceedance / bins / return periods
    assert(meta(Anomalies.percentileRank(grid, spec), "percentile_rank")
      .getString("units") == "%")
    val cp = Percentiles.climatologicalPercentiles(grid, spec)
    assert(meta(cp, "value").getLongArray("percentiles").toSeq
      == Percentiles.DefaultPercentiles.map(_.toLong))
    assert(meta(cp, "value").getString("groupby") == "month")
    assert(meta(Percentiles.exceedanceFrequency(grid, spec), "exceedance_freq")
      .getString("units") == "1")
    assert(meta(Percentiles.classifyByPercentile(grid, spec), "percentile_bin")
      .getLongArray("percentile_bins").nonEmpty)
    assert(meta(Percentiles.returnPeriods(grid, spec), "level")
      .getString("long_name") == "Return period values")
    // trends: "<units> per year" slope provenance (trends.py:55-62,230-243)
    // — with the input's units attr when present, the literal "units" when
    // absent (the reference's attrs.get('units', 'units') fallback)
    val lt = Trends.linearTrend(attributed, spec)
    assert(meta(lt, "trend").getString("units") == "K per year")
    assert(meta(lt, "trend").getString("long_name") == "Linear trend of temperature")
    assert(meta(lt, "trend").getString("trend_method") == "ordinary least squares")
    assert(meta(Trends.linearTrend(grid, spec), "trend")
      .getString("units") == "units per year")
    val ltp = Trends.linearTrend(grid, spec,
      referencePeriod = Some(("2020-01-01", "2020-12-31")))
    assert(meta(ltp, "trend").getString("trend_period")
      == "2020-01-01 to 2020-12-31")
    val ci = Trends.trendWithConfidence(attributed, spec, confidence = 0.95)
    assert(meta(ci, "trend").getString("units") == "K per year")
    assert(meta(ci, "trend").getDouble("confidence_level") == 0.95)
    assert(meta(ci, "trend_lower").getString("long_name") == "Trend lower bound (95%)")
    assert(meta(ci, "trend_upper").getString("long_name") == "Trend upper bound (95%)")
    assert(meta(ci, "trend_upper").getString("units") == "K per year")
    val mkOut = Trends.mannKendall(grid, spec)
    assert(meta(mkOut, "sen_slope").getString("long_name")
      == "Sen's slope of temperature")
    assert(meta(mkOut, "sen_slope").getString("test") == "Mann-Kendall")
    assert(meta(mkOut, "sen_slope").getDouble("alpha") == 0.05)
    assert(meta(mkOut, "p_value").getString("long_name") == "Mann-Kendall p-value")
    assert(meta(mkOut, "significant").getString("long_name")
      == "Significant trend at alpha=0.05")
    // attrs survive a parquet roundtrip (Spark persists field metadata
    // in the footer schema) — the provenance is durable, not session-local
    val out = graft.util.Tmp.root("graft_cfattrs").toString + "/m.parquet"
    Temporal.monthlyMean(grid, spec).limit(10).write.mode("overwrite").parquet(out)
    assert(spark.read.parquet(out).schema("mean_value").metadata
      .getString("cell_methods") == "ts: mean (monthly)")
  }
}
