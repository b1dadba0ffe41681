package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bit-reproducibility claim [[QualityModel]]'s scaladoc makes,
  * executed: the integer-quantized gradient makes the fit independent of
  * partitioning (any layout sums the same longs), and a driver-side
  * naive GD over the same doubles — BigInt accumulator, same
  * quantization formula — reproduces the weight trajectory EXACTLY,
  * across random feature tables, label balances, and iteration counts.
  */
class QualityModelFuzzSpec extends SparkSpec {

  test("fitLogistic is partition-invariant and bit-equal to a naive BigInt GD") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val featureCols = Seq("f_bias", "f_a", "f_b", "f_c")
    (0 until 4).foreach { round =>
      val n = 50 + rnd.nextInt(400)
      val rows = (0 until n).map { i =>
        // features on a coarse grid (the realistic ratio shape) with the
        // bias pinned at 1.0, labels imbalanced at random
        (1.0,
          math.floor(rnd.nextDouble() * 1e6) / 1e6,
          math.floor(rnd.nextDouble() * 1e6) / 1e6,
          math.floor(rnd.nextDouble() * 1e6) / 1e6,
          if (rnd.nextDouble() < 0.2 + 0.6 * rnd.nextDouble()) 1.0 else 0.0)
      }
      val iters = 3 + rnd.nextInt(8)
      val lr = Seq(1.0, 5.0, 10.0)(rnd.nextInt(3))
      val df = rows.toDF("f_bias", "f_a", "f_b", "f_c", "label").cache()
      val w1 = QualityModel.fitLogistic(df.repartition(1), featureCols,
        "label", iters, lr)
      val w13 = QualityModel.fitLogistic(df.repartition(13), featureCols,
        "label", iters, lr)
      assert(w1.toSeq == w13.toSeq,
        s"round $round: fit depends on partitioning\n${w1.toSeq}\n${w13.toSeq}")

      // naive driver-side GD: same quantization, BigInt accumulation
      var w = Array.fill(featureCols.size)(0.0)
      (0 until iters).foreach { _ =>
        val g = Array.fill(featureCols.size)(BigInt(0))
        rows.foreach { case (b, a, c, d, y) =>
          val x = Array(b, a, c, d)
          val z = featureCols.indices.map(j => x(j) * w(j)).sum
          val p = 1.0 / (1.0 + math.exp(-z))
          featureCols.indices.foreach { j =>
            g(j) += BigInt(math.floor((p - y) * x(j) * 1e9 + 0.5).toLong)
          }
        }
        w = w.zipWithIndex.map { case (wi, j) =>
          wi - lr * (g(j).toDouble / 1e9) / n
        }
      }
      assert(w1.toSeq == w.toSeq,
        s"round $round: engine fit != naive BigInt GD\n${w1.toSeq}\n${w.toSeq}")
      df.unpersist()
    }
  }
}
