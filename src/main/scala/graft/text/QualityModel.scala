package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier: logistic regression over the
  * [[TextMetrics]] feature columns, fit by DETERMINISTIC distributed
  * gradient descent — the upgrade from the hand-weighted
  * [[TextMetrics.qualityScore]] heuristic to a model that learns its
  * weights from labeled examples (boilerplate vs clean), while staying
  * engine-replayable end to end.
  *
  * == Why the fit is bit-reproducible, distributed, at any scale ==
  *
  * Plain float gradient sums depend on partition/summation order, which
  * would make the fit nondeterministic across cluster layouts and
  * unverifiable across engines. Here every per-row gradient
  * contribution is floored onto a fixed 10⁻⁹ grid and summed as a
  * 64-bit INTEGER (`⌊(σ(w·x) − y)·xⱼ·10⁹ + ½⌋`): integer addition is
  * exact and commutative, so the gradient — and therefore the whole
  * weight trajectory — is identical for any partitioning, any executor
  * count, and any engine that computes the same doubles. (The remaining
  * cross-engine wiggle is the ≤1-ulp libm difference in `exp`/`log10`,
  * which only matters in the astronomically unlikely event it flips a
  * floor boundary.) Each iteration is ONE partial-aggregated scan of
  * the feature table — at 100 TB the fit is `iters` cheap map-side
  * aggregates over a cached projection, no shuffle of anything but the
  * 6-long partial sums, no driver-side data beyond the weight vector.
  *
  * The quantization perturbs each gradient component by < 10⁻⁹·n/n =
  * 10⁻⁹ — far below the GD step noise; it changes nothing about
  * convergence.
  */
object QualityModel {

  /** The model's feature columns over a text column — every one a
    * scan-local [[TextMetrics]] expression with an existing SQL oracle
    * twin (length, punctuation, stopword density, keyword stuffing,
    * repetition), plus the bias.
    */
  def features(text: Column): Seq[(String, Column)] = Seq(
    "f_bias" -> lit(1.0),
    "f_len" -> least(log10(TextMetrics.tokenCount(text).cast("double") + 1) / 3.0, lit(1.0)),
    "f_punct" -> TextMetrics.punctRatio(text),
    "f_stop" -> TextMetrics.stopwordRatio(text),
    "f_top" -> TextMetrics.topWordFrac(text),
    "f_dup" -> TextMetrics.dupWordFrac(text)
  )

  /** Fixed-iteration full-batch GD from zero init (seedless — the init
    * is deterministic by construction). Returns the weight vector in
    * `featureCols` order. `df` should be cached: the fit runs `iters`
    * aggregate jobs over it.
    */
  def fitLogistic(df: DataFrame, featureCols: Seq[String], labelCol: String,
                  iters: Int = 25, lr: Double = 10.0): Array[Double] = {
    require(iters >= 1 && lr > 0, s"iters=$iters, lr=$lr")
    val n = df.count().toDouble
    require(n > 0, "cannot fit on an empty DataFrame")
    var w = Array.fill(featureCols.size)(0.0)
    var it = 0
    while (it < iters) {
      val z = featureCols.zip(w).map { case (c, wi) => col(c) * lit(wi) }
        .reduce(_ + _)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      // DECIMAL(38,0) accumulator: each row contributes up to ~1e9 after
      // the quantization, so a LongType sum wraps past ~9e18 — i.e. at
      // the ~1e10-row corpora this module documents — silently flipping
      // the gradient. (DuckDB's replay promotes BIGINT sums to HUGEINT;
      // the decimal sum is the same exact integer.)
      val gs = featureCols.zipWithIndex.map { case (c, j) =>
        sum(floor((p - col(labelCol).cast("double")) * col(c) * lit(1e9)
          + lit(0.5)).cast("decimal(38,0)")).as(s"g$j")
      }
      val row = df.agg(gs.head, gs.tail: _*).head()
      w = w.zipWithIndex.map { case (wi, j) =>
        wi - lr * (BigDecimal(row.getDecimal(j)).toDouble / 1e9) / n
      }
      it += 1
    }
    w
  }

  /** σ(w·x) over the feature columns — the trained quality score. */
  def score(featureCols: Seq[String], w: Seq[Double]): Column = {
    val z = featureCols.zip(w).map { case (c, wi) => col(c) * lit(wi) }
      .reduce(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
