package graft.metrics

import graft.SparkSpec
import graft.model.SeriesSpec
import org.apache.spark.sql.functions._

/** Null/NaN propagation: the reference works on float arrays where gaps
  * are NaN and every kernel either skips or propagates them
  * (`trends.py:97-101` NaN filtering, `anomalies.py:166` NaN passthrough).
  * The Spark analog is null handling — pinned here so a future operator
  * change can't silently turn gaps into zeros.
  */
class NullHandlingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val gappy = Seq(
    (ts("2020-01-01 00:00:00"), "k", Some(10.0)),
    (ts("2020-01-02 00:00:00"), "k", None),
    (ts("2020-01-03 00:00:00"), "k", Some(20.0)),
    (ts("2020-02-01 00:00:00"), "k", Some(30.0))
  ).toDF("ts", "key", "v")

  private val spec = SeriesSpec("ts", Seq("key"), "v")

  test("aggregating operators skip nulls like the reference skips NaN") {
    val m = Temporal.monthlyMean(gappy, spec).orderBy("month").collect()
    assert(m(0).getAs[Double]("mean_value") == 15.0) // (10+20)/2, null skipped
    val clim = Temporal.climatology(gappy, spec).where(col("month") === 1).head()
    assert(clim.getAs[Double]("clim_mean") == 15.0)
  }

  test("row-level operators propagate null values as null results") {
    val a = Anomalies.anomaly(gappy, spec)
      .orderBy("ts").select("anomaly").collect()
    assert(a(1).isNullAt(0)) // null value → null anomaly, not 0
    assert(!a(0).isNullAt(0))
  }

  test("rolling mean counts only non-null values against min_periods") {
    val r = Temporal.rollingMean(gappy.where(col("key") === "k"), spec,
      window = 3, minPeriods = Some(2), center = true)
      .orderBy("ts").select("rolling_mean").collect()
    // at the null row the frame still has 2 non-null values → defined
    assert(!r(1).isNullAt(0))
    assert(r(1).getDouble(0) == 15.0)
  }

  test("Mann-Kendall ignores NaN points like the reference kernel") {
    val withNaN = Seq(
      (1.0, 1.0), (2.0, Double.NaN), (3.0, 2.0), (4.0, 3.0), (5.0, 4.0), (6.0, 5.0)
    ).toDF("t", "v").withColumn("ts", timestamp_seconds(col("t"))).withColumn("key", lit("k"))
    val mk = Trends.mannKendall(withNaN, SeriesSpec("ts", Seq("key"), "v")).head()
    // 5 valid monotone points: S = 10 pairs, all positive
    assert(mk.getAs[Long]("s") == 10L)
  }

  test("Mann-Kendall skips NULL gaps instead of crashing the typed encoder") {
    // pre-fix: a null value/timestamp hit MKInput's primitive-field
    // encoder ("Null value appeared in non-nullable field") at runtime.
    // 4 valid monotone points + one null gap (the kernel needs n >= 4)
    val g = Seq(
      (ts("2020-01-01 00:00:00"), "k", Some(1.0)),
      (ts("2020-01-02 00:00:00"), "k", None),
      (ts("2020-01-03 00:00:00"), "k", Some(2.0)),
      (ts("2020-01-04 00:00:00"), "k", Some(3.0)),
      (ts("2020-01-05 00:00:00"), "k", Some(4.0))
    ).toDF("ts", "key", "v")
    val mk = Trends.mannKendall(g, spec).head()
    assert(mk.getAs[Long]("s") == 6L, s"S over 4 monotone points = 6: $mk")
  }

  test("severity and percentile bins propagate null/NaN as NULL, " +
    "never as a real class") {
    // severity: a gap (null z) or a 0/0 zero-variance NaN must NOT read
    // as +3 "extremely above normal"
    val z = Seq(Option(2.5), Option(0.0), None, Option(Double.NaN))
      .toDF("zscore")
    val sev = Anomalies.classifySeverity(z).select("severity").collect()
    assert(sev(0).getByte(0) == 3 && sev(1).getByte(0) == 0)
    assert(sev(2).isNullAt(0), "null z → null severity")
    assert(sev(3).isNullAt(0), "NaN z → null severity")
    // percentile bin: a null observation is a gap, not "below all
    // thresholds" (bin 0)
    val bins = Percentiles.classifyByPercentile(gappy, spec,
        percentiles = Seq(50))
      .orderBy("ts").select("percentile_bin").collect()
    assert(bins(1).isNullAt(0), "null value → null bin")
    assert(!bins(0).isNullAt(0))
  }
}
