package graft.metrics

import graft.SparkSpec
import graft.model.SeriesSpec
import org.apache.spark.sql.functions._

/** Rolling mean vs a naive in-memory reference implementation with
  * pandas semantics (centered, left-heavy even windows, min_periods) —
  * SURVEY.md §7.4-3 flags this as a hard part worth pinning exactly.
  */
class RollingRefSpec extends SparkSpec {
  import spark.implicits._

  private def naive(xs: Vector[Double], window: Int, minP: Int,
                    center: Boolean): Vector[Option[Double]] = {
    val (lo, hi) =
      if (center) (-(window / 2), window - 1 - window / 2)
      else (-(window - 1), 0)
    xs.indices.map { i =>
      val s = xs.slice(math.max(i + lo, 0), math.min(i + hi + 1, xs.length))
      if (s.length >= minP) Some(s.sum / s.length) else None
    }.toVector
  }

  private def run(xs: Vector[Double], window: Int, minP: Int, center: Boolean) = {
    val df = xs.zipWithIndex.map { case (v, i) =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), "k", v)
    }.toDF("ts", "k", "v")
    Temporal.rollingMean(df, SeriesSpec("ts", Seq("k"), "v"), window,
      Some(minP), center)
      .orderBy("ts").select("rolling_mean").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toVector
  }

  test("odd centered window matches the naive reference") {
    val rnd = new scala.util.Random(7)
    val xs = Vector.fill(40)(rnd.nextDouble() * 100)
    val got = run(xs, window = 5, minP = 2, center = true)
    val want = naive(xs, 5, 2, center = true)
    got.zip(want).foreach {
      case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9)
      case (a, b) => assert(a == b)
    }
  }

  test("even centered window is left-heavy like pandas") {
    val xs = Vector(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val got = run(xs, window = 4, minP = 1, center = true)
    val want = naive(xs, 4, 1, center = true)
    assert(got == want)
    // explicit left-heavy check: at i=2 the frame is [1,2,3,4], mean 2.5
    assert(got(2).contains(2.5))
  }

  test("trailing window matches and respects min_periods") {
    val xs = Vector(10.0, 20.0, 30.0, 40.0)
    val got = run(xs, window = 3, minP = 3, center = false)
    val want = naive(xs, 3, 3, center = false)
    assert(got == want)
    assert(got(0).isEmpty && got(1).isEmpty) // below min_periods → null
    assert(got(2).contains(20.0))
  }
}
