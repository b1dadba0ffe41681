package graft.queries

import graft.model.{SeriesSpec, Tables}
import graft.metrics.Percentiles
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A5-A7 + J2 + percentile bins bound to lineitem. */
object PercentileQ extends QueryPack {

  import TemporalQ.liSeries
  private val priceSeries = SeriesSpec("l_shipdate", Seq("l_returnflag"), "l_extendedprice")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_clim_percentiles" -> ((s, dir) =>
      round6(Percentiles.climatologicalPercentiles(Tables.lineitem(s, dir), liSeries),
        "value")),
    "q_exceedance_freq" -> ((s, dir) =>
      round6(Percentiles.exceedanceFrequency(Tables.lineitem(s, dir), liSeries,
        percentile = 90, referencePeriod = Some(("1995-01-01", "1998-12-31"))),
        "exceedance_freq")),
    "q_percentile_bins" -> ((s, dir) =>
      Percentiles.classifyByPercentile(Tables.lineitem(s, dir), liSeries)
        .groupBy("l_returnflag", "percentile_bin").agg(count(lit(1)).as("n"))),
    "q_return_periods" -> ((s, dir) =>
      round6(Percentiles.returnPeriods(Tables.lineitem(s, dir), priceSeries), "level"))
  )

  private val probs7 = "[0.10, 0.25, 0.50, 0.75, 0.90, 0.95, 0.99]"
  private val pcts7 = "[10, 25, 50, 75, 90, 95, 99]"

  def oracles: Map[String, String] = Map(
    "q_clim_percentiles" ->
      s"""SELECT CAST(month(l_shipdate) AS INTEGER) AS month, l_returnflag,
         |       round(unnest(quantile_cont(l_quantity, $probs7)), 6) AS value,
         |       unnest($pcts7) AS percentile
         |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_exceedance_freq" ->
      """WITH thr AS (
        |  SELECT CAST(month(l_shipdate) AS INTEGER) AS month, l_returnflag,
        |         quantile_cont(l_quantity, 0.90) AS thr
        |  FROM lineitem
        |  WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1998-12-31'
        |  GROUP BY 1, 2)
        |SELECT l.l_returnflag,
        |       round(avg(CASE WHEN l.l_quantity > t.thr THEN 1.0 ELSE 0.0 END), 6)
        |         AS exceedance_freq
        |FROM lineitem l
        |JOIN thr t ON CAST(month(l.l_shipdate) AS INTEGER) = t.month
        |          AND l.l_returnflag = t.l_returnflag
        |GROUP BY 1""".stripMargin,
    "q_percentile_bins" ->
      s"""WITH thr AS (
         |  SELECT CAST(month(l_shipdate) AS INTEGER) AS month, l_returnflag,
         |         quantile_cont(l_quantity, $probs7) AS q
         |  FROM lineitem GROUP BY 1, 2)
         |SELECT l.l_returnflag,
         |       CAST(GREATEST(
         |         CASE WHEN l.l_quantity >= t.q[1] THEN 10 ELSE 0 END,
         |         CASE WHEN l.l_quantity >= t.q[2] THEN 25 ELSE 0 END,
         |         CASE WHEN l.l_quantity >= t.q[3] THEN 50 ELSE 0 END,
         |         CASE WHEN l.l_quantity >= t.q[4] THEN 75 ELSE 0 END,
         |         CASE WHEN l.l_quantity >= t.q[5] THEN 90 ELSE 0 END,
         |         CASE WHEN l.l_quantity >= t.q[6] THEN 95 ELSE 0 END,
         |         CASE WHEN l.l_quantity >= t.q[7] THEN 99 ELSE 0 END) AS TINYINT)
         |         AS percentile_bin,
         |       count(*) AS n
         |FROM lineitem l
         |JOIN thr t ON CAST(month(l.l_shipdate) AS INTEGER) = t.month
         |          AND l.l_returnflag = t.l_returnflag
         |GROUP BY 1, 2""".stripMargin,
    "q_return_periods" ->
      """WITH am AS (
        |  SELECT CAST(year(l_shipdate) AS INTEGER) AS y, l_returnflag,
        |         max(l_extendedprice) AS annual_max
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag,
        |       round(unnest(quantile_cont(annual_max,
        |         [0.5, 0.8, 0.9, 0.96, 0.98, 0.99])), 6) AS level,
        |       unnest([2, 5, 10, 25, 50, 100]) AS return_period
        |FROM am GROUP BY 1""".stripMargin
  )
}
