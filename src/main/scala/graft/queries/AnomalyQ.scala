package graft.queries

import graft.model.Tables
import graft.metrics.Anomalies
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** J1/J3, P6, F-UDF1 bound to lineitem (row-level outputs keyed by
  * (l_orderkey, l_linenumber)).
  */
object AnomalyQ extends QueryPack {

  import TemporalQ.liSeries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_anomaly" -> ((s, dir) =>
      round6(
        Anomalies.anomaly(Tables.lineitem(s, dir), liSeries)
          .select(col("l_orderkey"), col("l_linenumber"), col("anomaly")),
        "anomaly")),
    "q_zscore_severity" -> ((s, dir) => {
      val z = Anomalies.standardizedAnomaly(Tables.lineitem(s, dir), liSeries)
      round6(
        Anomalies.classifySeverity(z)
          .select(col("l_orderkey"), col("l_linenumber"), col("zscore"), col("severity")),
        "zscore")
    }),
    "q_percentile_rank" -> ((s, dir) =>
      round6(
        Anomalies.percentileRank(Tables.lineitem(s, dir), liSeries,
          percentiles = Seq(10, 25, 50, 75, 90))
          .select(col("l_orderkey"), col("l_linenumber"), col("percentile_rank")),
        "percentile_rank")),
    // The dense-regime z-score (single window shuffle, no climatology join)
    // must produce the SAME numbers as the broadcast-join path when the
    // climatology is the full series — this query proves the two plans are
    // semantically interchangeable, so choosing by data shape is safe.
    "q_zscore_windowed" -> ((s, dir) =>
      round6(
        Anomalies.standardizedAnomalyWindowed(Tables.lineitem(s, dir), liSeries)
          .select(col("l_orderkey"), col("l_linenumber"), col("anomaly"), col("zscore")),
        "anomaly", "zscore")),
    // Stats-driven regime selection: the selector only changes the physical
    // form (broadcast join here — monthly × 3 flags is tiny; PlanSpec pins
    // that doy past the broadcast threshold flips to the windowed plan),
    // never the numbers — the oracle is the same SQL as q_zscore_windowed.
    "q_zscore_auto" -> ((s, dir) =>
      round6(
        Anomalies.standardizedAnomalyAuto(Tables.lineitem(s, dir), liSeries)
          .select(col("l_orderkey"), col("l_linenumber"), col("anomaly"), col("zscore")),
        "anomaly", "zscore"))
  )

  def oracles: Map[String, String] = Map(
    "q_anomaly" ->
      """WITH clim AS (
        |  SELECT CAST(month(l_shipdate) AS INTEGER) AS m, l_returnflag,
        |         avg(l_quantity) AS cm
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l.l_orderkey, l.l_linenumber,
        |       round(l.l_quantity - c.cm, 6) AS anomaly
        |FROM lineitem l
        |JOIN clim c ON CAST(month(l.l_shipdate) AS INTEGER) = c.m
        |           AND l.l_returnflag = c.l_returnflag""".stripMargin,
    "q_zscore_severity" ->
      """WITH clim AS (
        |  SELECT CAST(month(l_shipdate) AS INTEGER) AS m, l_returnflag,
        |         avg(l_quantity) AS cm, stddev_pop(l_quantity) AS cs
        |  FROM lineitem GROUP BY 1, 2),
        |z AS (
        |  SELECT l.l_orderkey, l.l_linenumber,
        |         (l.l_quantity - c.cm) / c.cs AS zraw
        |  FROM lineitem l
        |  JOIN clim c ON CAST(month(l.l_shipdate) AS INTEGER) = c.m
        |             AND l.l_returnflag = c.l_returnflag)
        |SELECT l_orderkey, l_linenumber, round(zraw, 6) AS zscore,
        |       CAST(CASE WHEN zraw IS NULL OR isnan(zraw) THEN NULL
        |                 WHEN zraw < -2 THEN -3
        |                 WHEN zraw < -1.5 THEN -2
        |                 WHEN zraw < -1 THEN -1
        |                 WHEN zraw <= 1 THEN 0
        |                 WHEN zraw <= 1.5 THEN 1
        |                 WHEN zraw <= 2 THEN 2
        |                 ELSE 3 END AS TINYINT) AS severity
        |FROM z""".stripMargin,
    "q_percentile_rank" ->
      """WITH thr AS (
        |  SELECT CAST(month(l_shipdate) AS INTEGER) AS m, l_returnflag,
        |         quantile_cont(l_quantity, [0.10, 0.25, 0.50, 0.75, 0.90]) AS q
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l.l_orderkey, l.l_linenumber,
        |       round(CASE
        |         WHEN l.l_quantity <= t.q[1] THEN 10.0
        |         WHEN l.l_quantity >= t.q[5] THEN 90.0
        |         WHEN l.l_quantity <= t.q[2]
        |           THEN 10 + 15 * (l.l_quantity - t.q[1]) / (t.q[2] - t.q[1])
        |         WHEN l.l_quantity <= t.q[3]
        |           THEN 25 + 25 * (l.l_quantity - t.q[2]) / (t.q[3] - t.q[2])
        |         WHEN l.l_quantity <= t.q[4]
        |           THEN 50 + 25 * (l.l_quantity - t.q[3]) / (t.q[4] - t.q[3])
        |         ELSE 75 + 15 * (l.l_quantity - t.q[4]) / (t.q[5] - t.q[4])
        |       END, 6) AS percentile_rank
        |FROM lineitem l
        |JOIN thr t ON CAST(month(l.l_shipdate) AS INTEGER) = t.m
        |          AND l.l_returnflag = t.l_returnflag""".stripMargin,
    "q_zscore_windowed" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(l_quantity - avg(l_quantity) OVER w, 6) AS anomaly,
        |       round((l_quantity - avg(l_quantity) OVER w)
        |             / stddev_pop(l_quantity) OVER w, 6) AS zscore
        |FROM lineitem
        |WINDOW w AS (PARTITION BY month(l_shipdate), l_returnflag)""".stripMargin,
    "q_zscore_auto" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(l_quantity - avg(l_quantity) OVER w, 6) AS anomaly,
        |       round((l_quantity - avg(l_quantity) OVER w)
        |             / stddev_pop(l_quantity) OVER w, 6) AS zscore
        |FROM lineitem
        |WINDOW w AS (PARTITION BY month(l_shipdate), l_returnflag)""".stripMargin
  )
}
