package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling for corpus curation: holdout
  * splits and down-sampling that are reproducible across runs, engines and
  * cluster sizes — `rand()`-based sampling is none of those. The bucket of
  * a row depends only on (salt, id), so adding data never reshuffles
  * existing rows between splits (the property training/eval splits need).
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the md5 of (salt:id) — md5 so any
    * engine can reproduce it (oracle parity; xxhash64 is Spark-only).
    */
  def hashBucket(id: Column, buckets: Int, salt: String): Column =
    pmod(conv(substring(md5(concat_ws(":", lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("long"), lit(buckets.toLong))

  /** Keep ~numerator/buckets of rows, deterministically. */
  def hashSample(df: DataFrame, idCol: String, buckets: Int, keep: Int,
                 salt: String = "graft"): DataFrame = {
    require(keep > 0 && keep <= buckets, s"keep must be in (0, $buckets], got $keep")
    df.where(hashBucket(col(idCol), buckets, salt) < keep)
  }

  /** (train, eval) split with ~evalPct% in eval, disjoint and exhaustive. */
  def trainEvalSplit(df: DataFrame, idCol: String, evalPct: Int,
                     salt: String = "graft"): (DataFrame, DataFrame) = {
    require(evalPct > 0 && evalPct < 100, s"evalPct must be in (0,100), got $evalPct")
    val b = hashBucket(col(idCol), 100, salt)
    (df.where(b >= evalPct), df.where(b < evalPct))
  }
}
