package graft.functions

import org.apache.commons.math3.distribution.TDistribution
import org.apache.commons.math3.special.Erf
import org.apache.spark.sql.functions.udf

/** Statistical scalar kernels the reference pulls from scipy
  * (SURVEY.md §2.7 F4/F5, F-UDF1). All are driver-light: they run either
  * per-row inside codegen'd plans (UDF) or on already-aggregated rows
  * (one row per cell), so none is a scale hazard.
  */
object StatsFns {

  /** Standard normal CDF via erfc — replaces `scipy.stats.norm.cdf`
    * (reference `metrics/trends.py:126`).
    */
  def normalCdf(z: Double): Double = 0.5 * Erf.erfc(-z / math.sqrt(2.0))

  /** Two-tailed p-value for a standard-normal test statistic. */
  def twoTailedP(z: Double): Double = Erf.erfc(math.abs(z) / math.sqrt(2.0))

  /** Student-t quantile — replaces `scipy.stats.t.ppf`
    * (reference `metrics/trends.py:206`). Runs on aggregated rows only
    * (one per cell), so per-call object construction is irrelevant.
    */
  def tQuantile(p: Double, degreesOfFreedom: Double): Double =
    if (degreesOfFreedom <= 0) Double.NaN
    else new TDistribution(null, degreesOfFreedom).inverseCumulativeProbability(p)

  val tQuantileUdf = udf((p: Double, df: Double) => tQuantile(p, df))

  /** F-UDF1 — percentile rank by clamped piecewise-linear interpolation of a
    * value against a sorted threshold vector (reference
    * `metrics/anomalies.py:162-170`, `np.interp` semantics). NaN value or
    * missing thresholds → None. This is the REFERENCE kernel used by the
    * property tests; the production column surface is the codegen'd
    * [[graft.plans.Expressions.percentile_rank]] (identical semantics).
    */
  def percentileRankKernel(value: Double, thresholds: Seq[Double], pcts: Seq[Double]): Option[Double] = {
    // the pcts vector is validated like thresholds: a null or shorter
    // pcts would index out of bounds mid-walk (the production surface —
    // Percentiles.thresholdVectors — always builds them in lockstep, so
    // this is crash-proofing the reference kernel, not a reachable path)
    if (value.isNaN || thresholds == null || thresholds.isEmpty ||
        pcts == null || pcts.length < thresholds.length) None
    else if (value <= thresholds.head) Some(pcts.head)
    else if (value >= thresholds.last) Some(pcts.last)
    else {
      var i = 0
      while (i < thresholds.length - 1 && value > thresholds(i + 1)) i += 1
      val (t0, t1) = (thresholds(i), thresholds(i + 1))
      val (p0, p1) = (pcts(i), pcts(i + 1))
      Some(if (t1 == t0) p0 else p0 + (p1 - p0) * (value - t0) / (t1 - t0))
    }
  }

}
