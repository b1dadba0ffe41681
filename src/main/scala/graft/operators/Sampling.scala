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

  /** Weighted multi-source mixing — the training-data composition step
    * ("60% web, 30% books, 10% code"): each source contributes a
    * deterministic content-hash sample of ~keep/buckets of its rows, the
    * union carries a `source` provenance column. Per-source salts
    * decorrelate keep decisions, so the same id in two sources is sampled
    * independently, and adding/reweighting one source never changes which
    * rows of another survive (the reproducibility property corpus
    * curation needs; `rand()` has none of this). Each source is ONE
    * scan-local filter — no shuffle, no driver round-trip — and the union
    * is plan-level (no materialization), so the mix scales as a pure map
    * over every source.
    *
    * @param sources (name, frame, keep) — keep of `buckets` rows survive;
    *                keep=buckets passes a source through whole
    */
  def weightedMix(sources: Seq[(String, DataFrame, Int)], idCol: String,
                  buckets: Int = 100, salt: String = "graft",
                  sourceCol: String = "mix_source"): DataFrame = {
    require(sources.nonEmpty, "weightedMix: at least one source")
    val names = sources.map(_._1)
    require(names.distinct.size == names.size,
      s"weightedMix: duplicate source names in ${names.mkString(", ")}")
    sources.map { case (name, df, keep) =>
      require(keep > 0 && keep <= buckets,
        s"weightedMix: keep for '$name' must be in (0, $buckets], got $keep")
      require(!df.columns.contains(sourceCol),
        s"weightedMix: source '$name' already has a '$sourceCol' column")
      df.where(hashBucket(col(idCol), buckets, s"$salt:$name") < keep)
        .withColumn(sourceCol, lit(name))
    }.reduce(_.unionByName(_))
  }
}
