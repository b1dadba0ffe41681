package graft.metrics

import graft.SparkSpec
import graft.model.SeriesSpec
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Randomized parity for the two window-shaped operators whose semantics
  * live in ordering details — gap sessionization (boundary at gap
  * STRICTLY greater than gapSeconds, ties ordered by the tie-break
  * column) and the centered rolling mean (lo = -window/2,
  * hi = window-1-window/2, count(value) ≥ minPeriods over NON-NULL
  * values only) — against naive references, on coarse-grid timestamps
  * that force exact-gap boundaries, same-timestamp ties, and null
  * values inside windows.
  */
class WindowFuzzSpec extends SparkSpec {

  test("sessionize matches a naive reference on tie- and boundary-heavy input") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val base = java.time.Instant.parse("2026-02-01T00:00:00Z").getEpochSecond
    val gap = 1800L
    // coarse grid in multiples of 900s: gaps hit exactly 1800 often (the
    // strict-> boundary), and same-user same-ts ties are common
    val events: Seq[(Long, Long, java.sql.Timestamp)] = (0 until 200).map { i =>
      (i.toLong, rnd.nextInt(6).toLong,
        new java.sql.Timestamp((base + rnd.nextInt(50) * 900L) * 1000L))
    }
    // naive: per user, order by (ts, event_id); new session when the gap
    // from the previous event is > gapSeconds
    val expect = events.groupBy(_._2).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3.getTime, e._1))
      var idx = 0L
      var prev = Long.MinValue
      val sessions = scala.collection.mutable.Map.empty[Long,
        scala.collection.mutable.ArrayBuffer[Long]]
      sorted.foreach { e =>
        val t = e._3.getTime / 1000
        if (prev == Long.MinValue || t - prev > gap) idx += 1
        sessions.getOrElseUpdate(idx, scala.collection.mutable.ArrayBuffer()) += t
        prev = t
      }
      sessions.map { case (s, ts) =>
        (u, s) -> ((ts.size.toLong, (ts.max - ts.min).toDouble))
      }
    }
    val got = Streams.sessionize(
        events.toDF("event_id", "user_id", "ts"),
        "user_id", "ts", gapSeconds = gap, orderCols = Seq("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expect,
      s"sessionize diverges: ${got.toSet.diff(expect.toSet)} vs ${expect.toSet.diff(got.toSet)}")
  }

  test("centered rolling mean matches a naive reference incl. null values") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val base = java.time.Instant.parse("2026-02-01T00:00:00Z").getEpochSecond
    for (window <- Seq(7, 4); minP <- Seq(Some(3), None)) {
      val rows: Seq[(Long, String, java.sql.Timestamp, java.lang.Double)] =
        (0 until 120).map { i =>
          val v: java.lang.Double =
            if (rnd.nextInt(5) == 0) null
            else java.lang.Double.valueOf(math.floor(rnd.nextDouble() * 1e6) / 1e3)
          (i.toLong, s"k${rnd.nextInt(3)}",
            new java.sql.Timestamp((base + rnd.nextInt(40) * 600L) * 1000L), v)
        }
      val effMinP = minP.getOrElse(math.max(window / 2, 1))
      val lo = -(window / 2); val hi = window - 1 - window / 2
      val expect: Map[Long, Option[Double]] = rows.groupBy(_._2).flatMap {
        case (_, ks) =>
          val sorted = ks.sortBy(r => (r._3.getTime, r._1)).toIndexedSeq
          sorted.indices.map { i =>
            val win = (math.max(0, i + lo) to math.min(sorted.length - 1, i + hi))
              .map(sorted(_)).flatMap(r => Option(r._4).map(_.doubleValue))
            sorted(i)._1 -> (if (win.size >= effMinP) Some(win.sum / win.size) else None)
          }
      }
      val spec = SeriesSpec("ts", Seq("k"), "value")
      val got = Temporal.rollingMean(
          rows.toDF("event_id", "k", "ts", "value"),
          spec, window = window, minPeriods = minP, center = true,
          orderCols = Seq("event_id"))
        .select(col("event_id"), col("rolling_mean"))
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val tag = s"window=$window minPeriods=$minP"
      assert(got.keySet == expect.keySet, s"$tag: rows not preserved")
      expect.foreach { case (id, want) =>
        (got(id), want) match {
          case (Some(g), Some(w)) =>
            assert(math.abs(g - w) < 1e-9, s"$tag row $id: $g != $w")
          case (g, w) => assert(g == w, s"$tag row $id: $g != $w")
        }
      }
    }
  }
}
