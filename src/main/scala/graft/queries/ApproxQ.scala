package graft.queries

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate scale-path operators (SURVEY.md §7.4-8): HLL distinct
  * counts and t-digest percentiles. Sketch values are engine-specific, so
  * the oracle checks the EXACT companion columns plus a boolean asserting
  * the sketch landed within tolerance — the gate still catches a sketch
  * going wrong without demanding cross-engine sketch equality.
  */
object ApproxQ extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_approx_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_distinct"),
          approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx"))
        .withColumn("within_tolerance",
          abs(col("approx") - col("exact_distinct")).cast("double")
            / col("exact_distinct") <= 0.05)
        .drop("approx")),
    "q_approx_percentile" -> ((s, dir) =>
      round6(
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            percentile(col("l_extendedprice"), lit(0.5)).as("exact_p50"),
            approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx"))
          .withColumn("within_tolerance",
            abs(col("approx") - col("exact_p50")) / col("exact_p50") <= 0.01)
          .drop("approx"),
        "exact_p50"))
  )

  def oracles: Map[String, String] = Map(
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS exact_distinct,
        |       TRUE AS within_tolerance
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_approx_percentile" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
        |       TRUE AS within_tolerance
        |FROM lineitem GROUP BY 1""".stripMargin
  )
}
