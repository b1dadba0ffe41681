package graft.metrics

import graft.SparkSpec
import graft.model.SeriesSpec
import org.apache.spark.sql.functions._

/** Randomized parity for the two custom numeric kernels: the
  * Mann-Kendall Aggregator (S, tie-corrected variance, continuity-
  * corrected z, two-tailed p, Sen's slope) against a naive reference
  * with an INDEPENDENT normal CDF (Abramowitz–Stegun 7.1.26, so the p
  * check does not share the engine's erfc), over tie-heavy series with
  * duplicate timestamps and sub-minimum lengths; and the PercentileRank
  * expression against a naive interpolator over thresholds with
  * duplicates, values at/below/above every threshold, and NaN.
  */
class KernelFuzzSpec extends SparkSpec {

  // Abramowitz–Stegun 7.1.26 erf approximation, |err| < 1.5e-7 — chosen
  // BECAUSE it is not the engine's erfc implementation
  private def asErf(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(x))
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    if (x >= 0) y else -y
  }
  private def naiveTwoTailedP(z: Double): Double =
    1.0 - asErf(math.abs(z) / math.sqrt(2.0))

  private final case class Mk(s: Long, varS: Double, z: Double, p: Double,
                              sen: Double)

  private def naiveMk(pts: Seq[(Double, Double)]): Option[Mk] = {
    val x = pts.sortBy(p => (p._1, p._2)).map(_._2).toArray
    val n = x.length
    if (n < 4) return None
    var s = 0L
    val slopes = scala.collection.mutable.ArrayBuffer[Double]()
    for (i <- 0 until n - 1; j <- i + 1 until n) {
      s += math.signum(x(j) - x(i)).toLong
      slopes += (x(j) - x(i)) / (j - i)
    }
    var varS = n.toDouble * (n - 1) * (2 * n + 5) / 18.0
    x.groupBy(identity).values.map(_.length).filter(_ > 1)
      .foreach(t => varS -= t.toDouble * (t - 1) * (2 * t + 5) / 18.0)
    val z = if (s > 0) (s - 1) / math.sqrt(varS)
      else if (s < 0) (s + 1) / math.sqrt(varS) else 0.0
    val sorted = slopes.sorted
    val m = sorted.length
    val sen = if (m % 2 == 1) sorted(m / 2)
      else (sorted(m / 2 - 1) + sorted(m / 2)) / 2.0
    Some(Mk(s, varS, z, naiveTwoTailedP(z), sen))
  }

  test("Mann-Kendall aggregator matches the naive reference on tie-heavy series") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val base = java.time.Instant.parse("2026-03-01T00:00:00Z").getEpochSecond
    val series: Map[String, Seq[(Double, Double)]] = (0 until 8).map { k =>
      val n = Seq(2, 3, 4, 5, 9, 16, 25, 40)(k)
      // small value set => heavy value ties (the correction term) and
      // sign-0 pairs; duplicate timestamps => the (t, v) total order
      val pts = (0 until n).map { _ =>
        ((base + rnd.nextInt(n) * 3600L).toDouble,
          (rnd.nextInt(5) + 1).toDouble / 2)
      }
      s"k$k" -> pts
    }.toMap
    val rows = series.toSeq.flatMap { case (k, pts) =>
      pts.map { case (t, v) =>
        (k, new java.sql.Timestamp((t * 1000).toLong), v)
      }
    }
    val got = Trends.mannKendall(
        rows.toDF("k", "ts", "v"), SeriesSpec("ts", Seq("k"), "v"))
      .collect().map { r =>
        r.getAs[String]("k") -> ((r.getAs[Long]("s"), r.getAs[Double]("var_s"),
          r.getAs[Double]("z"), r.getAs[Double]("p_value"),
          r.getAs[Double]("sen_slope")))
      }.toMap
    series.foreach { case (k, pts) =>
      val (gs, gvar, gz, gp, gsen) = got(k)
      naiveMk(pts) match {
        case None => // n < 4: zeroed-NaN contract
          assert(gs == 0L && gvar.isNaN && gz.isNaN && gp.isNaN && gsen.isNaN,
            s"$k (n=${pts.length} < 4): expected the NaN contract, got ${got(k)}")
        case Some(w) =>
          assert(gs == w.s, s"$k: S $gs != ${w.s}")
          assert(math.abs(gvar - w.varS) < 1e-9, s"$k: var_s $gvar != ${w.varS}")
          assert(math.abs(gz - w.z) < 1e-9, s"$k: z $gz != ${w.z}")
          assert(math.abs(gp - w.p) < 1e-6, s"$k: p $gp != ${w.p} (independent erf)")
          assert(math.abs(gsen - w.sen) < 1e-12, s"$k: sen $gsen != ${w.sen}")
      }
    }
  }

  test("PercentileRank expression matches a naive interpolator incl. duplicate thresholds") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    def naive(v: Double, thr: Seq[Double], pct: Seq[Double]): Option[Double] = {
      val n = thr.length
      if (v.isNaN || n == 0) None
      else if (v <= thr.head) Some(pct.head)
      else if (v >= thr.last) Some(pct.last)
      else {
        var i = 0
        while (i < n - 1 && v > thr(i + 1)) i += 1
        val (t0, t1, p0, p1) = (thr(i), thr(i + 1), pct(i), pct(i + 1))
        Some(if (t1 == t0) p0 else p0 + (p1 - p0) * (v - t0) / (t1 - t0))
      }
    }
    (0 until 5).foreach { round =>
      val nThr = 2 + rnd.nextInt(6)
      // sorted thresholds WITH duplicates (the t1 == t0 plateau branch)
      val thr = Seq.fill(nThr)(rnd.nextInt(40).toDouble / 2).sorted
      val pct = (1 to nThr).map(i => i * 100.0 / (nThr + 1))
      val values: Seq[java.lang.Double] =
        (thr.map(java.lang.Double.valueOf) ++ // exactly AT each threshold
          Seq(thr.head - 1, thr.last + 1).map(java.lang.Double.valueOf) ++
          Seq(java.lang.Double.valueOf(Double.NaN), null) ++
          Seq.fill(12)(java.lang.Double.valueOf(rnd.nextInt(44).toDouble / 2 - 1)))
      val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
        .select(col("id"), col("v"),
          graft.plans.Expressions.percentile_rank(col("v"),
            typedLit(thr), typedLit(pct)).as("pr"))
      val got = df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      values.zipWithIndex.foreach { case (v, i) =>
        val want =
          if (v == null) None else naive(v.doubleValue, thr, pct)
        (got(i.toLong), want) match {
          case (Some(g), Some(w)) =>
            assert(math.abs(g - w) < 1e-12,
              s"round $round v=$v thr=$thr: $g != $w")
          case (g, w) => assert(g == w, s"round $round v=$v thr=$thr: $g != $w")
        }
      }
    }
  }
}
