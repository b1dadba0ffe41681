package graft.queries

import graft.model.Tables
import graft.operators.AsOfJoin
import graft.plans.AsOfMerge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** As-of join bound to the events table: for every click, the user's most
  * recent purchase at or before the click. Oracle = DuckDB's native
  * ASOF LEFT JOIN. Two implementations go through the same gate: the
  * union+window composition ([[AsOfJoin]]) and the native sort-merge exec
  * ([[AsOfMerge]]) — both must land on the identical DuckDB answer.
  */
object AsOfQ extends QueryPack {

  private def sides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    (clicks, purchases)
  }

  private val asofOracle =
    """WITH clicks AS (
      |  SELECT event_id, user_id, ts, value FROM events
      |  WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id, p.purchase_id, p.purchase_value,
      |       CAST(p.ts AS TIMESTAMP) AS asof_ts
      |FROM clicks c
      |ASOF LEFT JOIN purchases p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> ((s, dir) => {
      val (clicks, purchases) = sides(s, dir)
      AsOfJoin.asofJoin(
        left = clicks, right = purchases,
        on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        rightVals = Seq("purchase_id", "purchase_value"))
        .select(col("event_id"), col("user_id"),
          col("purchase_id"), col("purchase_value"), col("asof_ts"))
    }),
    "q_asof_merge" -> ((s, dir) => {
      val (clicks, purchases) = sides(s, dir)
      AsOfMerge.asofMergeJoin(
        left = clicks, right = purchases.withColumnRenamed("ts", "pts"),
        on = Seq("user_id"), leftTs = "ts", rightTs = "pts",
        rightVals = Seq("purchase_id", "purchase_value"),
        broadcast = Some(false)) // pin the shuffled sort-merge form
        .select(col("event_id"), col("user_id"),
          col("purchase_id"), col("purchase_value"), col("asof_ts"))
    }),
    "q_asof_broadcast" -> ((s, dir) => {
      val (clicks, purchases) = sides(s, dir)
      AsOfMerge.asofMergeJoin(
        left = clicks, right = purchases.withColumnRenamed("ts", "pts"),
        on = Seq("user_id"), leftTs = "ts", rightTs = "pts",
        rightVals = Seq("purchase_id", "purchase_value"),
        broadcast = Some(true)) // pin the zero-shuffle broadcast form
        .select(col("event_id"), col("user_id"),
          col("purchase_id"), col("purchase_value"), col("asof_ts"))
    }),
    // Tolerance-bounded as-of (max 1-day staleness): the match is still
    // the LATEST purchase at or before the click — tolerance only gates
    // emission — mirrored in the oracle as a CASE over the unbounded ASOF.
    // broadcast=None also drives the stats-based physical selection
    // through the driver gate.
    "q_asof_tolerance" -> ((s, dir) => {
      val (clicks, purchases) = sides(s, dir)
      AsOfMerge.asofMergeJoin(
        left = clicks, right = purchases.withColumnRenamed("ts", "pts"),
        on = Seq("user_id"), leftTs = "ts", rightTs = "pts",
        rightVals = Seq("purchase_id", "purchase_value"),
        tolerance = Some(86400L))
        .select(col("event_id"), col("user_id"),
          col("purchase_id"), col("purchase_value"), col("asof_ts"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_asof_join" -> asofOracle,
    "q_asof_merge" -> asofOracle,
    "q_asof_broadcast" -> asofOracle,
    "q_asof_tolerance" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id,
        |  CASE WHEN epoch(c.ts) - epoch(p.ts) <= 86400
        |       THEN p.purchase_id END AS purchase_id,
        |  CASE WHEN epoch(c.ts) - epoch(p.ts) <= 86400
        |       THEN p.purchase_value END AS purchase_value,
        |  CASE WHEN epoch(c.ts) - epoch(p.ts) <= 86400
        |       THEN CAST(p.ts AS TIMESTAMP) END AS asof_ts
        |FROM clicks c
        |ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin
  )
}
