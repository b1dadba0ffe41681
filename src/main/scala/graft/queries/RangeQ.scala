package graft.queries

import graft.model.Tables
import graft.operators.RangeJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval join bound to events: every (click, error) pair from the same
  * user within ±5 minutes — the banded implementation against DuckDB's
  * direct non-equi join.
  */
object RangeQ extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          col("ts").as("error_ts"))
      RangeJoin.timeRangeJoin(clicks, errors, Seq("user_id"),
          "ts", "error_ts", toleranceSec = 300)
        .select(col("click_id"), col("user_id"), col("error_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_range_join" ->
      """SELECT c.event_id AS click_id, c.user_id, e.event_id AS error_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id
        | AND abs(epoch(CAST(c.ts AS TIMESTAMP)) - epoch(CAST(e.ts AS TIMESTAMP)))
        |     <= 300""".stripMargin
  )
}
