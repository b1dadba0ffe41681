package graft.queries

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join/window/top-k capabilities over the star schema. The reference only
  * needs broadcast equi-joins (SURVEY.md §2.3), but the engine exposes the
  * full Spark join surface; these queries pin down the semantics and the
  * physical strategy (small dims broadcast — verified in PlanSpec).
  */
object JoinQ extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Multi-way star join: revenue per region per order year. nation/region
    // are tiny → broadcast; lineitem never shuffles until the final groupBy.
    // NOT fanned out (r18 opt): the 4 dim joins broadcast and the probe
    // would parallelize, but round(sum(price*(1-disc)), 2) lands within
    // 1e-9 of a cent boundary for one (region, year) group at sf0.01 —
    // the reordered partial sums flip it against the DuckDB oracle. The
    // serial scan stage is the price of bit-stable cents here.
    "q_region_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      round6(
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), year(col("o_orderdate")).as("order_year"))
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
               count(lit(1)).as("n_lines"))
          .withColumn("revenue", round(col("revenue"), 2)),
        )
    }),
    // Broadcast dim join + agg by brand.
    "q_brand_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      round6(
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
               avg(col("l_quantity")).as("avg_qty"))
          .withColumn("revenue", round(col("revenue"), 2)),
        "avg_qty")
    }),
    // Semi/anti joins: customers with and without orders.
    "q_semi_anti" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n"), lit("with_orders").as("cls"))
      val withoutO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n"), lit("without_orders").as("cls"))
      withO.unionByName(withoutO).select(col("cls"), col("n"))
    }),
    // Bloom-filter join pruning: fact rows are dropped by a broadcast
    // bloom filter BEFORE the semi join's shuffle — the runtime-filter
    // pattern that cuts shuffle volume at scale. The exact semi join
    // behind it absorbs bloom false positives, so the result equals the
    // plain semi join and a plain IN-subquery oracle checks it.
    "q_bloom_prune" -> ((s, dir) => {
      val urgent = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
      round6(
        graft.operators.BloomPrune.prunedSemiJoin(
            Tables.lineitem(s, dir), urgent, "l_orderkey", "o_orderkey")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), avg(col("l_quantity")).as("avg_qty")),
        "avg_qty")
    }),
    // Ranking window: top-3 suppliers by revenue within each nation.
    "q_top_suppliers" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      val rev = li.groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .join(broadcast(sup), col("l_suppkey") === sup("s_suppkey"))
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("revenue").desc, col("s_suppkey"))
      (
        rev.withColumn("rank", row_number().over(w))
          .where(col("rank") <= 3)
          .select(col("s_nationkey"), col("rank"), col("s_suppkey"),
            round(col("revenue"), 2).as("revenue")))
    }),
    // Pivot: wide-by-category aggregation (the xarray variables-as-columns
    // shape); oracle via conditional aggregation.
    "q_pivot" -> ((s, dir) =>
      round6(
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(avg(col("l_quantity")))
          .withColumnsRenamed(Map("F" -> "avg_f", "O" -> "avg_o")),
        "avg_f", "avg_o")),
    // Salted two-stage aggregation: 3 group keys over N cores is the
    // canonical skew case; results provably identical to the direct agg.
    "q_salted_agg" -> ((s, dir) =>
      round6(
        graft.operators.Salting.saltedStats(Tables.lineitem(s, dir),
          keys = Seq("l_returnflag"), valueCol = "l_quantity",
          tieBreaker = "l_orderkey", saltBuckets = 16),
        "sum_value", "avg_value")),
    // Salted JOIN: the fact side salted on a high-cardinality column, the
    // build side replicated per salt bucket — a hot orderkey spreads over
    // 4 reducers. Must be row-identical to the plain join (checked via
    // the aggregate the oracle recomputes directly).
    "q_salted_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.Salting.saltedJoin(li, o, key = "l_orderkey",
          tieBreaker = "l_partkey", saltBuckets = 4)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
    }),
    // Running cumulative sum per customer over order dates.
    "q_running_total" -> ((s, dir) => {
      val o = Tables.orders(s, dir).where(col("o_custkey") % 50 === 0)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      round6(
        o.withColumn("running_total", sum(col("o_totalprice")).over(w))
          .select(col("o_orderkey"), col("o_custkey"), col("running_total")),
        "running_total")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_region_revenue" ->
      """SELECT r.r_name, CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1, 2""".stripMargin,
    "q_brand_revenue" ->
      """SELECT p.p_brand,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |       round(avg(l.l_quantity), 6) AS avg_qty
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1""".stripMargin,
    "q_semi_anti" ->
      """SELECT 'with_orders' AS cls, count(*) AS n FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT 'without_orders' AS cls, count(*) AS n FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "q_bloom_prune" ->
      """SELECT l_returnflag, count(*) AS n,
        |       round(avg(l_quantity), 6) AS avg_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,
    "q_top_suppliers" ->
      """WITH rev AS (
        |  SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS revenue
        |  FROM lineitem GROUP BY 1),
        |ranked AS (
        |  SELECT s.s_nationkey, s.s_suppkey, rev.revenue,
        |         CAST(row_number() OVER (PARTITION BY s.s_nationkey
        |           ORDER BY rev.revenue DESC, s.s_suppkey) AS INTEGER) AS rank
        |  FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey)
        |SELECT s_nationkey, rank, s_suppkey, round(revenue, 2) AS revenue
        |FROM ranked WHERE rank <= 3""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        |       round(avg(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 6)
        |         AS avg_f,
        |       round(avg(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 6)
        |         AS avg_o
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag,
        |       round(sum(l_quantity), 6) AS sum_value,
        |       count(l_quantity) AS n,
        |       min(l_quantity) AS min_value,
        |       max(l_quantity) AS max_value,
        |       round(sum(l_quantity) / count(l_quantity), 6) AS avg_value
        |FROM lineitem GROUP BY 1""".stripMargin,
    // the salted join must reproduce the plain join exactly (money to cents)
    "q_salted_join" ->
      """SELECT o.o_orderpriority, count(*) AS n,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,
    "q_running_total" ->
      """SELECT o_orderkey, o_custkey,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |         AS running_total
        |FROM orders WHERE o_custkey % 50 = 0""".stripMargin
  )
}
