package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE upscale-table recipe — single source of truth for the bench's
  * drift probe (`graft.Bench`) and the standalone adjudicator
  * ([[UpscaleAdjudicate]]): an adjudication is only evidence if both
  * instruments measure the SAME workload.
  *
  * `factor`× fact tables built by unioning key-shifted copies (matched
  * l_orderkey/o_orderkey shifts keep the join graph), dimension tables
  * copied as-is (broadcast/SMJ shapes preserved). Documents get a
  * per-copy letter substitution so dedup measures a BIGGER corpus —
  * copy 26 would rotate by 26 % 26 = 0, an exact duplicate of copy 0,
  * quadratically inflating the dedup candidate set and silently
  * measuring a different workload; hence the hard cap.
  */
object UpscaleTables {

  def build(spark: SparkSession, sfDir: String, upDir: String, factor: Int): Unit = {
    require(factor >= 1 && factor <= 26,
      s"upscale factor $factor out of [1, 26]: copy 26 would repeat copy 0's " +
        "text verbatim and quadratically inflate the dedup candidate set")
    def copyDim(t: String): Unit =
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$upDir/$t.parquet")
    Seq("region", "nation", "customer", "supplier", "part").foreach(copyDim)
    def shifted(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$sfDir/$t.parquet")
      (0 until factor).map(k => f(base, k)).reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$upDir/$t.parquet")
    }
    shifted("lineitem")((d, k) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(k.toLong * 10000000L)))
    shifted("orders")((d, k) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(k.toLong * 10000000L)))
    shifted("events")((d, k) => d
      .withColumn("event_id", col("event_id") + lit(k.toLong * 100000000L))
      .withColumn("user_id", col("user_id") + lit(k.toLong * 10000000L)))
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    shifted("documents")((d, k) => d
      .withColumn("doc_id", col("doc_id") + lit(k.toLong * 100000000L))
      .withColumn("text", translate(col("text"),
        alpha + alpha.toUpperCase,
        alpha.drop(k % 26) + alpha.take(k % 26) +
          (alpha.drop(k % 26) + alpha.take(k % 26)).toUpperCase)))
    shifted("embeddings")((d, k) =>
      d.withColumn("vec_id", col("vec_id") + lit(k.toLong * 1000000L)))
  }
}
