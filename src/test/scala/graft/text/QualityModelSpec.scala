package graft.text

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {

  private def fixture = {
    val docs = Tables.documents(spark, sfDir)
    val ltoks = TextMetrics.tokens(lower(col("text")))
    val boiler = docs.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + lit(100000L)).as("doc_id"),
        repeat(concat(concat_ws(" ", slice(ltoks, 1, 4)), lit(" ")), 12).as("text"),
        lit(1).as("label"))
    docs.select(col("doc_id"), col("text"), lit(0).as("label"))
      .unionByName(boiler)
  }

  test("integer-grid GD is partitioning-invariant (the determinism claim)") {
    val fcols = QualityModel.features(col("text"))
    val names = fcols.map(_._1)
    def fit(parts: Int) = {
      val f = fixture.repartition(parts)
        .select((Seq(col("label")) ++ fcols.map { case (n, c) => c.as(n) }): _*)
        .cache()
      try QualityModel.fitLogistic(f, names, "label", iters = 5, lr = 10.0)
      finally { f.unpersist(); () }
    }
    // identical weight trajectories regardless of layout — integer sums
    // are exact and commutative, so this is equality, not tolerance
    assert(fit(1).toSeq == fit(7).toSeq)
  }

  test("trained model separates planted boilerplate; the heuristic cannot") {
    val fcols = QualityModel.features(col("text"))
    val names = fcols.map(_._1)
    val feats = fixture.select(
      (Seq(col("doc_id"), col("label"), col("text")) ++
        fcols.map { case (n, c) => c.as(n) }): _*).cache()
    val w = QualityModel.fitLogistic(feats, names, "label", iters = 25, lr = 10.0)
    val scored = feats.select(col("label"),
      QualityModel.score(names, w.toSeq).as("m"),
      TextMetrics.qualityScore(col("text")).as("h")).collect()
    val (pos, neg) = scored.partition(_.getInt(0) == 1)
    def auc(f: org.apache.spark.sql.Row => Double): Double = {
      val hits = for (p <- pos; n <- neg) yield if (f(p) > f(n)) 1.0 else 0.0
      hits.sum / (pos.length.toDouble * neg.length)
    }
    val modelAuc = auc(_.getDouble(1))
    // heuristic "badness" = 1 - quality, so higher should mean boilerplate
    val heurAuc = auc(1.0 - _.getDouble(2))
    assert(modelAuc > 0.99, s"model AUC $modelAuc")
    assert(modelAuc > heurAuc + 0.2,
      s"model $modelAuc should clearly beat heuristic $heurAuc")
    feats.unpersist()
  }

  test("fit rejects empty input and bad hyperparameters") {
    val f = fixture.limit(0)
      .select(col("label"), lit(1.0).as("f_bias"))
    intercept[IllegalArgumentException] {
      QualityModel.fitLogistic(f, Seq("f_bias"), "label", iters = 1)
    }
    intercept[IllegalArgumentException] {
      QualityModel.fitLogistic(f, Seq("f_bias"), "label", iters = 0)
    }
  }
}
