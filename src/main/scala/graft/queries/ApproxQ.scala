package graft.queries

import graft.model.Tables
import graft.text.TextMetrics
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
        "exact_p50")),
    // Count-min-sketch heavy hitters: ONE mergeable fixed-size sketch per
    // partition instead of a full-width token groupBy — the 100 TB path
    // for frequency estimates over an unbounded keyspace. The gate checks
    // the exact top-20 (same as q_top_tokens' shape) plus the CMS bound.
    // The one-sided eps·N guarantee only holds per-query with the
    // sketch's confidence, so the oracle-facing check uses confidence
    // 0.999 AND a doubled envelope (est ≤ true + 2·eps·N): across 20
    // head tokens a regenerated corpus stays comfortably inside it,
    // while a genuinely broken sketch (wrong hashing, lost merges,
    // est < true) still fails the hash gate.
    "q_approx_topk" -> ((s, dir) => {
      import s.implicits._
      val toks = Tables.documents(s, dir)
        .select(explode(TextMetrics.tokens(lower(col("text")))).as("token"))
      val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20)
        .as[(String, Long)].collect()
      val agg = toks.agg(
        count_min_sketch(col("token"), lit(0.001d), lit(0.999d), lit(42)),
        count(lit(1)))
        .head()
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(agg.getAs[Array[Byte]](0)))
      val total = agg.getLong(1)
      exact.toSeq.map { case (t, n) =>
        val est = cms.estimateCount(t)
        (t, n, est >= n && est <= n + 2L * math.ceil(0.001 * total).toLong)
      }.toDF("token", "n", "within_tolerance")
    })
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
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_approx_topk" ->
      """SELECT token, count(*) AS n, TRUE AS within_tolerance
        |FROM (SELECT unnest(regexp_extract_all(lower(text), '[^ \t\n\x0b\f\r]+')) AS token
        |      FROM documents)
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 20""".stripMargin
  )
}
