package graft.queries

import graft.model.{SeriesSpec, Tables}
import graft.metrics.{Temporal, Trends}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A8-A10 bound to lineitem. The Mann-Kendall query runs on the monthly
  * mean series per cell (~82 points), the reference's intended granularity
  * for the O(n²) kernel; the OLS queries run on the raw 60k rows to
  * exercise partial aggregation.
  */
object TrendQ extends QueryPack {

  import TemporalQ.liSeries

  private def monthlySeries(s: SparkSession, dir: String): DataFrame =
    Temporal.monthlyMean(Tables.lineitem(s, dir), liSeries)
      .select(col("month").as("ts"), col("l_returnflag"), col("mean_value"))

  private val monthlySpec = SeriesSpec("ts", Seq("l_returnflag"), "mean_value")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_linear_trend" -> ((s, dir) =>
      round6(Trends.linearTrend(Tables.lineitem(s, dir), liSeries), "trend")),
    "q_trend_stderr" -> ((s, dir) =>
      round6(
        Trends.trendWithConfidence(Tables.lineitem(s, dir), liSeries)
          .select(col("l_returnflag"), col("trend"), col("std_err"), col("n")),
        "trend", "std_err")),
    // CI bounds need a t-quantile DuckDB lacks → the oracle DERIVES
    // t_{0.975,ν} in SQL via the Cornish-Fisher expansion (accurate past
    // the round-6 grid for ν ≥ 100, asserted in the SQL itself); nothing
    // is pinned from the engine. Slope/stderr stay independently computed
    // by DuckDB regr_* (cross-checked in q_trend_stderr).
    "q_trend_ci" -> ((s, dir) =>
      round6(
        Trends.trendWithConfidence(Tables.lineitem(s, dir), liSeries)
          .select(col("l_returnflag"), col("trend"), col("trend_lower"), col("trend_upper")),
        "trend", "trend_lower", "trend_upper")),
    "q_mann_kendall" -> ((s, dir) =>
      round6(
        Trends.mannKendall(monthlySeries(s, dir), monthlySpec)
          .select(col("l_returnflag"), col("s"), col("var_s"), col("z"),
            col("sen_slope"), col("significant")),
        "var_s", "z", "sen_slope"))
  )

  private val yearsX = "epoch(l_shipdate) / (365.25 * 86400)"

  def oracles: Map[String, String] = Map(
    "q_linear_trend" ->
      s"""SELECT l_returnflag,
         |       round(regr_slope(l_quantity, $yearsX), 6) AS trend
         |FROM lineitem GROUP BY 1""".stripMargin,
    "q_trend_stderr" ->
      s"""SELECT l_returnflag,
         |  round(regr_slope(l_quantity, $yearsX), 6) AS trend,
         |  round(sqrt(greatest(regr_syy(l_quantity, $yearsX)
         |        - regr_slope(l_quantity, $yearsX) * regr_slope(l_quantity, $yearsX)
         |          * regr_sxx(l_quantity, $yearsX), 0)
         |      / (regr_count(l_quantity, $yearsX) - 2)
         |      / regr_sxx(l_quantity, $yearsX)), 6) AS std_err,
         |  CAST(regr_count(l_quantity, $yearsX) AS BIGINT) AS n
         |FROM lineitem GROUP BY 1""".stripMargin,
    // t-quantile derived IN SQL for any group size: the Cornish-Fisher /
    // Peiser expansion of t_{0.975,ν} around the normal quantile z,
    //   t = z + (z³+z)/4ν + (5z⁵+16z³+3z)/96ν² + (3z⁷+19z⁵+17z³−15z)/384ν³,
    // whose truncation error is O(ν⁻⁴) — ~1e-13 at this query's ν≈2·10⁴
    // and <1e-7 for any ν ≥ 100, orders below the round(·,6) grid after
    // multiplying by std_err. z = Φ⁻¹(0.975) is the same universal
    // constant q_mann_kendall already uses; no data-dependent literals.
    "q_trend_ci" ->
      s"""WITH base AS (
         |  SELECT l_returnflag,
         |    regr_slope(l_quantity, $yearsX) AS trend,
         |    sqrt(greatest(regr_syy(l_quantity, $yearsX)
         |          - regr_slope(l_quantity, $yearsX) * regr_slope(l_quantity, $yearsX)
         |            * regr_sxx(l_quantity, $yearsX), 0)
         |        / (regr_count(l_quantity, $yearsX) - 2)
         |        / regr_sxx(l_quantity, $yearsX)) AS std_err,
         |    regr_count(l_quantity, $yearsX) AS n
         |  FROM lineitem GROUP BY 1),
         |tq AS (
         |  SELECT l_returnflag, trend, std_err,
         |    1.9599639845400545 AS z, CAST(n - 2 AS DOUBLE) AS df
         |  FROM base),
         |tt AS (
         |  SELECT l_returnflag, trend, std_err,
         |    CASE WHEN df < 100 THEN CAST(error('q_trend_ci oracle: Cornish-Fisher '
         |        || 't-quantile truncation is only sub-round-6 for df >= 100; '
         |        || 'got df=' || df || ' — use an exact quantile at this scale') AS DOUBLE)
         |    ELSE 0 END +
         |    z + (pow(z, 3) + z) / (4 * df)
         |      + (5 * pow(z, 5) + 16 * pow(z, 3) + 3 * z) / (96 * df * df)
         |      + (3 * pow(z, 7) + 19 * pow(z, 5) + 17 * pow(z, 3) - 15 * z)
         |        / (384 * df * df * df) AS t975
         |  FROM tq)
         |SELECT l_returnflag,
         |  round(trend, 6) AS trend,
         |  round(trend - t975 * std_err, 6) AS trend_lower,
         |  round(trend + t975 * std_err, 6) AS trend_upper
         |FROM tt""".stripMargin,
    "q_mann_kendall" ->
      """WITH ser AS (
        |  SELECT l_returnflag AS k, date_trunc('month', l_shipdate) AS t,
        |         avg(l_quantity) AS v
        |  FROM lineitem GROUP BY 1, 2),
        |idx AS (
        |  SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY t) - 1 AS i
        |  FROM ser),
        |pairs AS (
        |  SELECT a.k, sign(b.v - a.v) AS sg, (b.v - a.v) / (b.i - a.i) AS sl
        |  FROM idx a JOIN idx b ON a.k = b.k AND b.i > a.i),
        |agg AS (
        |  SELECT k, CAST(sum(sg) AS BIGINT) AS s,
        |         quantile_cont(sl, 0.5) AS sen_slope
        |  FROM pairs GROUP BY 1),
        |nn AS (SELECT k, count(*) AS n FROM idx GROUP BY 1),
        |ties AS (
        |  SELECT k, coalesce(sum(c * (c - 1.0) * (2 * c + 5) / 18.0), 0) AS corr
        |  FROM (SELECT k, v, count(*) AS c FROM idx GROUP BY 1, 2) GROUP BY 1),
        |vs AS (
        |  SELECT nn.k, nn.n * (nn.n - 1) * (2 * nn.n + 5) / 18.0 - ties.corr AS var_s
        |  FROM nn JOIN ties ON nn.k = ties.k),
        |fin AS (
        |  SELECT agg.k, agg.s, vs.var_s, agg.sen_slope,
        |         CASE WHEN agg.s > 0 THEN (agg.s - 1) / sqrt(vs.var_s)
        |              WHEN agg.s < 0 THEN (agg.s + 1) / sqrt(vs.var_s)
        |              ELSE 0.0 END AS z
        |  FROM agg JOIN vs ON agg.k = vs.k)
        |SELECT k AS l_returnflag, s, round(var_s, 6) AS var_s,
        |       round(z, 6) AS z, round(sen_slope, 6) AS sen_slope,
        |       (abs(z) > 1.9599639845400545) AS significant
        |FROM fin""".stripMargin
  )
}
