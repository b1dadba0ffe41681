package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{SeriesSpec, Tables}
import graft.metrics._
import graft.functions.TimeFns

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] binds one operator of the engine
  * (SURVEY.md §2 inventory) to the driver test tables; [[oracleSql]] holds
  * the equivalent DuckDB SQL. Column names and rounding are kept identical
  * on both sides because the driver hash-compares values after sorting
  * columns by name.
  */
object SparkEntry {

  /** lineitem as a long time series: ts=l_shipdate (1995..2001, daily),
    * cell=l_returnflag, value=l_quantity — the climate-grid analog used by
    * the temporal/percentile/trend operators.
    */
  private val liSeries = SeriesSpec("l_shipdate", Seq("l_returnflag"), "l_quantity")

  private def round6(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, round(col(c), 6)))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship "monthly mean at a point"
    * (`README.md:54`, `api/routes/metrics.py:11-46`) re-expressed over the
    * lineitem series.
    */
  def entry(spark: SparkSession): DataFrame = {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    Temporal.monthlyMean(li, liSeries).orderBy("month", "l_returnflag")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- A1-A4: temporal resample aggregations (metrics/Temporal.scala)
    "q_monthly_mean" -> ((s, dir) => {
      val out = Temporal.monthlyMean(Tables.lineitem(s, dir), liSeries)
        .withColumn("month", col("month").cast("date"))
        .withColumn("month_end", col("month_end").cast("date"))
      round6(out, "mean_value")
    }),
    "q_seasonal_mean" -> ((s, dir) =>
      round6(Temporal.seasonalMean(Tables.lineitem(s, dir), liSeries), "mean_value")),
    "q_annual_mean" -> ((s, dir) =>
      round6(Temporal.annualMean(Tables.lineitem(s, dir), liSeries), "mean_value")),
    "q_climatology_month" -> ((s, dir) =>
      round6(Temporal.climatology(Tables.lineitem(s, dir), liSeries, Temporal.ByMonth,
        referencePeriod = Some(("1995-01-01", "1998-12-31"))), "clim_mean", "clim_std")),
    "q_climatology_doy" -> ((s, dir) =>
      round6(Temporal.climatology(Tables.lineitem(s, dir), liSeries, Temporal.ByDayOfYear),
        "clim_mean", "clim_std")),
    "q_climatology_season" -> ((s, dir) =>
      round6(Temporal.climatology(Tables.lineitem(s, dir), liSeries, Temporal.BySeason),
        "clim_mean", "clim_std")),
    // W1: centered rolling mean with min_periods over the events stream table
    "q_rolling_mean" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("event_type") === "purchase")
      val spec = SeriesSpec("ts", Seq("event_type"), "value")
      round6(
        Temporal.rollingMean(ev, spec, window = 7, minPeriods = Some(3),
          center = true, orderCols = Seq("event_id"))
          .select(col("event_id"), col("rolling_mean")),
        "rolling_mean")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_monthly_mean" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
        |       l_returnflag,
        |       round(avg(l_quantity), 6) AS mean_value,
        |       last_day(CAST(date_trunc('month', l_shipdate) AS DATE)) AS month_end
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_seasonal_mean" ->
      """SELECT year(l_shipdate + INTERVAL 1 MONTH) AS season_year,
        |       CASE WHEN month(l_shipdate) IN (12,1,2) THEN 'DJF'
        |            WHEN month(l_shipdate) IN (3,4,5) THEN 'MAM'
        |            WHEN month(l_shipdate) IN (6,7,8) THEN 'JJA'
        |            ELSE 'SON' END AS season,
        |       l_returnflag,
        |       round(avg(l_quantity), 6) AS mean_value
        |FROM lineitem GROUP BY 1, 2, 3""".stripMargin,
    "q_annual_mean" ->
      """SELECT year(l_shipdate) AS year, l_returnflag,
        |       round(avg(l_quantity), 6) AS mean_value
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_climatology_month" ->
      """SELECT month(l_shipdate) AS month, l_returnflag,
        |       round(avg(l_quantity), 6) AS clim_mean,
        |       round(stddev_pop(l_quantity), 6) AS clim_std
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1998-12-31'
        |GROUP BY 1, 2""".stripMargin,
    "q_climatology_doy" ->
      """SELECT dayofyear(l_shipdate) AS dayofyear, l_returnflag,
        |       round(avg(l_quantity), 6) AS clim_mean,
        |       round(stddev_pop(l_quantity), 6) AS clim_std
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_climatology_season" ->
      """SELECT CASE WHEN month(l_shipdate) IN (12,1,2) THEN 'DJF'
        |            WHEN month(l_shipdate) IN (3,4,5) THEN 'MAM'
        |            WHEN month(l_shipdate) IN (6,7,8) THEN 'JJA'
        |            ELSE 'SON' END AS season,
        |       l_returnflag,
        |       round(avg(l_quantity), 6) AS clim_mean,
        |       round(stddev_pop(l_quantity), 6) AS clim_std
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_rolling_mean" ->
      """SELECT event_id,
        |       round(CASE WHEN count(value) OVER w >= 3
        |                  THEN avg(value) OVER w END, 6) AS rolling_mean
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)""".stripMargin
  )
}
