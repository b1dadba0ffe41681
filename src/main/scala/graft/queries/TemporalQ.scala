package graft.queries

import graft.model.{SeriesSpec, Tables}
import graft.metrics.Temporal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A1-A4 + W1 bound to the driver tables: lineitem as the long time series
  * (ts=l_shipdate, cell=l_returnflag, value=l_quantity), events for the
  * rolling window.
  */
object TemporalQ extends QueryPack {

  val liSeries = SeriesSpec("l_shipdate", Seq("l_returnflag"), "l_quantity")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_monthly_mean" -> ((s, dir) => {
      val out = Temporal.monthlyMean(Tables.lineitem(s, dir), liSeries)
        .withColumn("month", col("month").cast("date"))
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
    // A13 — generic reduce along time: caller-supplied aggregate columns
    // over the cell key (the reference's dask `reduction(dim='time')`).
    "q_reduce_time" -> ((s, dir) =>
      round6(
        Temporal.reduceOverTime(Tables.lineitem(s, dir), liSeries,
          count(lit(1)).as("n"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          avg(col("l_quantity")).as("avg_qty"),
          stddev_pop(col("l_quantity")).as("std_qty")),
        "avg_qty", "std_qty")),
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

  def oracles: Map[String, String] = Map(
    "q_monthly_mean" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
        |       l_returnflag,
        |       round(avg(l_quantity), 6) AS mean_value,
        |       last_day(CAST(date_trunc('month', l_shipdate) AS DATE)) AS month_end
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_seasonal_mean" ->
      """SELECT CAST(year(l_shipdate + INTERVAL 1 MONTH) AS INTEGER) AS season_year,
        |       CASE WHEN month(l_shipdate) IN (12,1,2) THEN 'DJF'
        |            WHEN month(l_shipdate) IN (3,4,5) THEN 'MAM'
        |            WHEN month(l_shipdate) IN (6,7,8) THEN 'JJA'
        |            ELSE 'SON' END AS season,
        |       l_returnflag,
        |       round(avg(l_quantity), 6) AS mean_value
        |FROM lineitem GROUP BY 1, 2, 3""".stripMargin,
    "q_annual_mean" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS year, l_returnflag,
        |       round(avg(l_quantity), 6) AS mean_value
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_climatology_month" ->
      """SELECT CAST(month(l_shipdate) AS INTEGER) AS month, l_returnflag,
        |       round(avg(l_quantity), 6) AS clim_mean,
        |       round(stddev_pop(l_quantity), 6) AS clim_std
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1998-12-31'
        |GROUP BY 1, 2""".stripMargin,
    "q_climatology_doy" ->
      """SELECT CAST(dayofyear(l_shipdate) AS INTEGER) AS dayofyear, l_returnflag,
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
    "q_reduce_time" ->
      """SELECT l_returnflag, count(*) AS n,
        |       min(l_quantity) AS min_qty,
        |       max(l_quantity) AS max_qty,
        |       round(avg(l_quantity), 6) AS avg_qty,
        |       round(stddev_pop(l_quantity), 6) AS std_qty
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_rolling_mean" ->
      """SELECT event_id,
        |       round(CASE WHEN count(value) OVER w >= 3
        |                  THEN avg(value) OVER w END, 6) AS rolling_mean
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)""".stripMargin
  )
}
