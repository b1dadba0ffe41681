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
    hashBucket(id, buckets, lit(salt))

  /** Column-salt overload for per-row salts (e.g. per-source keys). */
  def hashBucket(id: Column, buckets: Int, salt: Column): Column =
    pmod(conv(substring(md5(concat_ws(":", salt, id.cast("string"))), 1, 8), 16, 10)
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

  /** Temperature-weighted source rebalancing — the multilingual-corpus
    * `(n_s/N)^α` sampling step (α < 1 upsamples the share of small
    * sources, α = 1 keeps natural proportions): source s is kept at a
    * deterministic fraction `f_s = min(1, targetFraction·N·q_s / n_s)`
    * where `q_s = (n_s/N)^α / Σ_t (n_t/N)^α`, so the kept corpus is
    * ~targetFraction·N rows distributed by the tempered shares (a source
    * too small to fill its share contributes everything it has).
    *
    * Determinism contract: `α` must be `2^-k` (1, 0.5, 0.25, …) because
    * the power is computed as a chain of IEEE-correctly-rounded `sqrt`s —
    * the one form of x^α any engine reproduces bit-for-bit (`pow` is only
    * ~1 ulp, which can flip an integer keep-threshold at a boundary).
    * Per-source counts collect to the driver (bounded by the number of
    * sources, the same size class as a broadcast dim) and the weight sum
    * runs in sorted-source order, so an external checker replays the
    * exact thresholds with an ordered list sum. Row selection is the same
    * scan-local md5 bucket arithmetic as [[weightedMix]] (per-source
    * salt), on a fixed 1e6-bucket grid.
    */
  def temperatureMix(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      alpha: Double,
      targetFraction: Double,
      salt: String = "graft"
  ): DataFrame = {
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0, 1], got $targetFraction")
    val sqrts = (math.log(alpha) / math.log(0.5)).round.toInt
    require(sqrts >= 0 && math.pow(0.5, sqrts) == alpha,
      s"alpha must be 2^-k (1, 0.5, 0.25, ...) for engine-replayable " +
        s"sqrt-chain powers, got $alpha")
    def powDyadic(x: Double): Double =
      (1 to sqrts).foldLeft(x)((v, _) => math.sqrt(v))
    // bounded driver collect: one row per SOURCE (the corpus never moves)
    val counts = df.groupBy(col(sourceCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    require(counts.nonEmpty, "temperatureMix: empty input")
    val n = counts.map(_._2).sum
    val weights = counts.map { case (s, ns) => s -> powDyadic(ns * 1.0 / n) }
    val sumW = weights.map(_._2).sum // sorted-source order (replayable)
    val buckets = 1000000
    val thresholds = counts.zip(weights).map { case ((s, ns), (_, w)) =>
      s -> math.floor(
        math.min(1.0, (targetFraction * n) * (w / sumW) / ns) * buckets).toLong
    }
    val thresh = thresholds.foldLeft(lit(-1L)) { case (acc, (s, t)) =>
      when(col(sourceCol) === s, lit(t)).otherwise(acc)
    }
    df.where(hashBucket(col(idCol), buckets,
      concat_ws(":", lit(salt), col(sourceCol))) < thresh)
  }
}
