package graft

import graft.model.{SeriesSpec, Tables}
import graft.metrics.{Anomalies, Temporal}
import graft.queries.TemporalQ
import org.apache.spark.sql.functions._

/** Physical-plan hygiene: these assertions pin the properties that make the
  * operators scale — broadcast joins for small sides, pushdown into scans,
  * whole-stage codegen coverage, partial aggregation. A regression here is
  * a 100 TB performance bug even when results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("anomaly join broadcasts the climatology side") {
    val p = plan(Anomalies.anomaly(Tables.lineitem(spark, sfDir), TemporalQ.liSeries))
    assert(p.contains("BroadcastHashJoin"), "climatology must broadcast, not shuffle")
    assert(!p.contains("SortMergeJoin"))
  }

  test("star join broadcasts dimension tables") {
    val p = plan(graft.queries.JoinQ.queries("q_region_revenue")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("monthly mean is a single partial+final hash aggregate inside codegen") {
    val df = Temporal.monthlyMean(Tables.lineitem(spark, sfDir), TemporalQ.liSeries)
    val p = plan(df)
    assert(p.contains("HashAggregate"), "avg must hash-aggregate")
    assert(p.contains("partial_avg"), "needs partial+final (map-side combine)")
    df.collect() // AQE finalizes the plan (with codegen stages) on execution
    val finalPlan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in the final plan
    assert(finalPlan.contains("*("), "plan must run inside whole-stage codegen")
    // exactly one shuffle: the group-key exchange
    assert("Exchange".r.findAllIn(p).size == 1, s"expected 1 shuffle:\n$p")
  }

  test("time filters and projections reach the parquet scan") {
    val df = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .select("l_quantity", "l_shipdate")
    val p = plan(df)
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
    assert(p.contains("ReadSchema") && !p.contains("l_extendedprice"))
  }

  test("rolling window plans one shuffle + one sort, no recompute loop") {
    val ev = Tables.events(spark, sfDir)
    val df = Temporal.rollingMean(ev, SeriesSpec("ts", Seq("event_type"), "value"),
      window = 7, orderCols = Seq("event_id"))
    val p = plan(df)
    assert(p.contains("Window"))
    assert("Exchange".r.findAllIn(p).size == 1)
  }

  test("exceedance threshold side broadcasts") {
    val p = plan(graft.metrics.Percentiles.exceedanceFrequency(
      Tables.lineitem(spark, sfDir), TemporalQ.liSeries))
    assert(p.contains("BroadcastHashJoin"))
  }
}
