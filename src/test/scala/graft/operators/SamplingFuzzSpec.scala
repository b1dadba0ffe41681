package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized parity for [[Sampling.temperatureMix]]'s threshold
  * arithmetic against a fully independent driver-side reference: the
  * dyadic sqrt-chain power, the sorted-source weight sum, the floor'd
  * per-source keep thresholds, and the md5 bucket selection are all
  * recomputed in plain Scala (MessageDigest, BigInt-free doubles) and the
  * kept row SET must match exactly — across random source counts, wildly
  * skewed source sizes (including sources too small to fill their
  * tempered share, which contribute everything), every legal alpha tier,
  * and random target fractions.
  */
class SamplingFuzzSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(salt: String, src: String, id: Long, buckets: Long): Long =
    java.lang.Long.parseLong(md5hex(s"$salt:$src:$id").take(8), 16) % buckets

  test("temperatureMix kept-set parity with an independent threshold replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    (0 until 8).foreach { round =>
      val nSources = 1 + rnd.nextInt(5)
      val sizes = (0 until nSources).map { s =>
        // skew: tiny sources (1 row) through ~2000-row ones
        s"src$s" -> (rnd.nextInt(4) match {
          case 0 => 1 + rnd.nextInt(3)
          case 1 => 10 + rnd.nextInt(40)
          case _ => 200 + rnd.nextInt(1800)
        })
      }
      val alpha = Seq(1.0, 0.5, 0.25, 0.125)(rnd.nextInt(4))
      val target = 0.05 + rnd.nextDouble() * 0.95
      val salt = s"fuzz$round"
      var nextId = 0L
      val rows = sizes.flatMap { case (s, n) =>
        (0 until n).map { _ => nextId += 1; (nextId, s) }
      }
      val df = rows.toDF("doc_id", "source")
      val got = Sampling.temperatureMix(df, "source", "doc_id", alpha,
          target, salt)
        .select("doc_id").collect().map(_.getLong(0)).toSet

      // independent replay of the documented contract
      val sqrts = (math.log(alpha) / math.log(0.5)).round.toInt
      def powDyadic(x: Double) = (1 to sqrts).foldLeft(x)((v, _) => math.sqrt(v))
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val n = counts.map(_._2).sum
      val weights = counts.map { case (s, ns) => s -> powDyadic(ns * 1.0 / n) }
      val sumW = weights.map(_._2).sum
      val thresholds = counts.zip(weights).map { case ((s, ns), (_, w)) =>
        s -> math.floor(math.min(1.0, (target * n) * (w / sumW) / ns) * 1000000).toLong
      }.toMap
      val want = rows.filter { case (id, s) =>
        bucket(salt, s, id, 1000000L) < thresholds(s)
      }.map(_._1).toSet
      assert(got == want,
        s"round $round (alpha=$alpha target=$target sizes=${sizes.map(_._2)}): " +
          s"${(got diff want).size} extra, ${(want diff got).size} missing")
      // the composition property the operator exists for: sources small
      // enough to be capped contribute everything they have
      val capped = thresholds.filter(_._2 >= 1000000L).keySet
      capped.foreach { s =>
        val all = rows.filter(_._2 == s).map(_._1).toSet
        assert(all.subsetOf(got), s"capped source $s must pass through whole")
      }
    }
  }

  test("weightedMix / hashSample parity with the same independent md5 replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val a = (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val b = (1000L until 1300L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val keepA = 1 + rnd.nextInt(99); val keepB = 1 + rnd.nextInt(99)
    val got = Sampling.weightedMix(
        Seq(("a", a, keepA), ("b", b, keepB)), "doc_id", buckets = 100)
      .select("doc_id", "mix_source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    def keep(src: String, id: Long, k: Int) =
      java.lang.Long.parseLong(md5hex(s"graft:$src:$id").take(8), 16) % 100 < k
    val want =
      (0L until 500L).filter(keep("a", _, keepA)).map((_, "a")).toSet ++
        (1000L until 1300L).filter(keep("b", _, keepB)).map((_, "b")).toSet
    assert(got == want)
  }
}
