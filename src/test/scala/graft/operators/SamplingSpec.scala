package graft.operators

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("train/eval split is disjoint, exhaustive and ≈ the requested fraction") {
    val (train, eval_) = Sampling.trainEvalSplit(docs, "doc_id", evalPct = 20)
    val n = docs.count()
    assert(train.count() + eval_.count() == n)
    assert(train.join(eval_, Seq("doc_id"), "inner").count() == 0)
    val frac = eval_.count().toDouble / n
    assert(frac > 0.1 && frac < 0.3, s"eval fraction $frac far from 20%")
  }

  test("membership is stable: a row's split never depends on the rest of the data") {
    val (_, evalFull) = Sampling.trainEvalSplit(docs, "doc_id", 20)
    val (_, evalHalf) = Sampling.trainEvalSplit(docs.where(col("doc_id") < 250), "doc_id", 20)
    val fullIds = evalFull.select("doc_id").collect().map(_.getLong(0)).toSet
    val halfIds = evalHalf.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(halfIds == fullIds.filter(_ < 250)) // adding data never reshuffles splits
  }

  test("different salts give different (but valid) samples") {
    val a = Sampling.hashSample(docs, "doc_id", 10, 3, salt = "a").count()
    val b = Sampling.hashSample(docs, "doc_id", 10, 3, salt = "b").count()
    assert(a > 0 && b > 0)
    val aIds = Sampling.hashSample(docs, "doc_id", 10, 3, "a")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bIds = Sampling.hashSample(docs, "doc_id", 10, 3, "b")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(aIds != bIds)
    intercept[IllegalArgumentException](Sampling.hashSample(docs, "doc_id", 10, 0))
  }

  test("weightedMix: proportions, provenance, and per-source stability") {
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 =!= 0)
    val mixed = Sampling.weightedMix(
      Seq(("even", a, 80), ("odd", b, 20)), idCol = "doc_id")
    val counts = mixed.groupBy("mix_source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~80% of evens, ~20% of odds (loose bands; 250 rows per side)
    val nA = a.count().toDouble; val nB = b.count().toDouble
    assert(counts("even") / nA > 0.7 && counts("even") / nA < 0.9, counts.toString)
    assert(counts("odd") / nB > 0.1 && counts("odd") / nB < 0.3, counts.toString)
    // reweighting one source never changes WHICH rows of another survive
    val remixed = Sampling.weightedMix(
      Seq(("even", a, 80), ("odd", b, 90)), idCol = "doc_id")
    def ids(df: org.apache.spark.sql.DataFrame, src: String) =
      df.where(col("mix_source") === src).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    assert(ids(mixed, "even") == ids(remixed, "even"))
    // a keep=buckets source passes through whole
    val whole = Sampling.weightedMix(Seq(("all", docs, 100)), "doc_id")
    assert(whole.count() == docs.count())
    // duplicate names and provenance-column clashes fail loudly
    intercept[IllegalArgumentException](
      Sampling.weightedMix(Seq(("x", a, 10), ("x", b, 10)), "doc_id"))
    intercept[IllegalArgumentException](
      Sampling.weightedMix(Seq(("x", whole, 10)), "doc_id")) // has mix_source
  }

  test("temperatureMix: alpha < 1 upsamples the small source's SHARE; deterministic") {
    import org.apache.spark.sql.functions._
    // 90/10 imbalance: alpha = 0.5 tempers the shares to 75/25
    val df = spark.range(2000).select(col("id").as("doc_id"),
      when(col("id") % 10 < 9, "big").otherwise("small").as("src"))
    val kept = Sampling.temperatureMix(df, "src", "doc_id",
      alpha = 0.5, targetFraction = 0.5)
    val counts = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    // tempered shares: w = sqrt(0.9), sqrt(0.1) → q_big = 0.75, q_small = 0.25
    val smallShare = counts("small").toDouble / total
    assert(smallShare > 0.18 && smallShare < 0.32,
      s"alpha=0.5 should temper the 10% source to ~25%, got $smallShare")
    assert(total > 800 && total < 1200, s"target ~1000 rows, got $total")
    // alpha = 1 keeps natural proportions (plain targetFraction sampling)
    val nat = Sampling.temperatureMix(df, "src", "doc_id",
      alpha = 1.0, targetFraction = 0.5)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val natSmall = nat("small").toDouble / nat.values.sum
    assert(natSmall > 0.05 && natSmall < 0.16,
      s"alpha=1 should keep the natural ~10% share, got $natSmall")
    // determinism under different partitioning
    val again = Sampling.temperatureMix(df.repartition(17), "src", "doc_id",
      alpha = 0.5, targetFraction = 0.5)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // non-dyadic alpha is an engine-replayability error, not silent pow
    intercept[IllegalArgumentException](
      Sampling.temperatureMix(df, "src", "doc_id", 0.3, 0.5))
  }
}
