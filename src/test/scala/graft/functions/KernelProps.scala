package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Generator-driven properties for the pure kernels (ScalaCheck runs these
  * under sbt alongside ScalaTest).
  */
object KernelProps extends Properties("kernels") {

  private val sortedThresholds: Gen[List[Double]] =
    Gen.chooseNum(2, 9).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3)).map(_.sorted))

  property("percentileRank is clamped to [p_first, p_last]") =
    forAll(sortedThresholds, Gen.chooseNum(-2e3, 2e3)) { (thr, v) =>
      val pcts = thr.indices.map(i => 100.0 * (i + 1) / thr.length)
      StatsFns.percentileRankKernel(v, thr, pcts).forall(r =>
        r >= pcts.head && r <= pcts.last)
    }

  property("percentileRank is monotone in the value") =
    forAll(sortedThresholds, Gen.chooseNum(-1e3, 1e3), Gen.chooseNum(0.0, 100.0)) {
      (thr, v, delta) =>
        val pcts = thr.indices.map(i => 100.0 * (i + 1) / thr.length)
        val a = StatsFns.percentileRankKernel(v, thr, pcts)
        val b = StatsFns.percentileRankKernel(v + delta, thr, pcts)
        (a, b) match { case (Some(x), Some(y)) => x <= y; case _ => false }
    }

  property("percentileRank hits the exact level at each distinct threshold") =
    forAll(sortedThresholds.suchThat(t => t.distinct.length == t.length)) { thr =>
      val pcts = thr.indices.map(i => 100.0 * (i + 1) / thr.length)
      // at a threshold the rank equals that threshold's level (np.interp)
      thr.zip(pcts).forall { case (t, p) =>
        StatsFns.percentileRankKernel(t, thr, pcts).exists(r => math.abs(r - p) < 1e-9)
      }
    }

  property("normalCdf is a CDF: bounded, monotone, symmetric") =
    forAll(Gen.chooseNum(-8.0, 8.0), Gen.chooseNum(0.0, 4.0)) { (z, d) =>
      val a = StatsFns.normalCdf(z)
      val b = StatsFns.normalCdf(z + d)
      a >= 0 && b <= 1 && a <= b + 1e-15 &&
        math.abs(StatsFns.normalCdf(-z) - (1 - a)) < 1e-12
    }

  property("tQuantile brackets the normal quantile and converges to it") =
    forAll(Gen.chooseNum(0.55, 0.995)) { p =>
      val tSmall = StatsFns.tQuantile(p, 3)
      val tBig = StatsFns.tQuantile(p, 1e6)
      // heavier tails → larger quantile; huge df ≈ normal
      val normApprox = math.sqrt(2.0) * org.apache.commons.math3.special.Erf.erfInv(2 * p - 1)
      tSmall >= tBig - 1e-12 && math.abs(tBig - normApprox) < 1e-3
    }

  property("twoTailedP(z) = 2*(1 - cdf(|z|))") =
    forAll(Gen.chooseNum(-6.0, 6.0)) { z =>
      math.abs(StatsFns.twoTailedP(z) - 2 * (1 - StatsFns.normalCdf(math.abs(z)))) < 1e-12
    }
}
