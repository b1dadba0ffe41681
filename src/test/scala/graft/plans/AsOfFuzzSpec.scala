package graft.plans

import graft.SparkSpec
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** Randomized as-of parity: all three engine paths — the union+window
  * composition, the shuffled sort-merge exec, and the zero-shuffle
  * broadcast exec — against a naive in-memory reference, over inputs a
  * coarse timestamp grid makes adversarial: left==right timestamp ties
  * (the ≥ edge), multiple candidates per key, users with no matches,
  * null keys and null timestamps on both sides, with and without a
  * tolerance bound. Right rows are deduped on (key, ts) because the
  * tie-break among IDENTICAL right timestamps is documented as
  * unspecified; everything else is pinned row-for-row.
  */
class AsOfFuzzSpec extends SparkSpec {

  private val base = java.time.Instant.parse("2026-01-01T00:00:00Z").toEpochMilli

  test("composition, merge exec and broadcast exec all match the naive reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    def ts(slot: Int) = new java.sql.Timestamp(base + slot * 60000L)

    val lefts: Seq[(Long, java.lang.Long, java.sql.Timestamp)] =
      (0 until 150).map { i =>
        val u: java.lang.Long =
          if (rnd.nextInt(20) == 0) null else java.lang.Long.valueOf(rnd.nextInt(8).toLong)
        val t: java.sql.Timestamp =
          if (rnd.nextInt(25) == 0) null else ts(rnd.nextInt(40))
        (i.toLong, u, t)
      }
    val rights: Seq[(Long, java.lang.Long, java.sql.Timestamp, Double)] =
      (0 until 90).map { j =>
        val u: java.lang.Long =
          if (rnd.nextInt(20) == 0) null else java.lang.Long.valueOf(rnd.nextInt(8).toLong)
        val t: java.sql.Timestamp =
          if (rnd.nextInt(25) == 0) null else ts(rnd.nextInt(40))
        (1000L + j, u, t, math.floor(rnd.nextDouble() * 1e6) / 1e3)
      }.groupBy(r => (r._2, r._3)).map(_._2.head).toSeq

    val leftDf = lefts.toDF("event_id", "user_id", "ts")
    val rightDf = rights.toDF("purchase_id", "user_id", "pts", "purchase_value")
      .select(col("user_id"), col("pts"), col("purchase_id"), col("purchase_value"))

    def naive(tol: Option[Long]): Map[Long, Option[(Long, Double, Long)]] =
      lefts.map { case (id, u, t) =>
        id -> {
          if (u == null || t == null) None
          else {
            val latest = rights
              .filter(r => r._2 != null && r._2 == u && r._3 != null && !r._3.after(t))
              .sortBy(_._3.getTime).lastOption
            latest.filter(r =>
                tol.forall(s => (t.getTime - r._3.getTime) / 1000 <= s))
              .map(r => (r._1, r._4, r._3.getTime))
          }
        }
      }.toMap

    def collectPath(df: org.apache.spark.sql.DataFrame): Map[Long, Option[(Long, Double, Long)]] =
      df.select(col("event_id"), col("purchase_id"), col("purchase_value"), col("asof_ts"))
        .collect().map { r =>
          val id = r.getLong(0)
          id -> (if (r.isNullAt(1)) None
                 else Some((r.getLong(1), r.getDouble(2),
                   r.getAs[java.sql.Timestamp](3).getTime)))
        }.toMap

    for (tol <- Seq(None, Some(600L), Some(0L))) {
      val expect = naive(tol)
      val comp = collectPath(AsOfJoin.asofJoin(leftDf, rightDf,
        on = Seq("user_id"), leftTs = "ts", rightTs = "pts",
        rightVals = Seq("purchase_id", "purchase_value"), tolerance = tol))
      val merge = collectPath(AsOfMerge.asofMergeJoin(leftDf, rightDf,
        on = Seq("user_id"), leftTs = "ts", rightTs = "pts",
        rightVals = Seq("purchase_id", "purchase_value"), tolerance = tol,
        broadcast = Some(false)))
      val bcast = collectPath(AsOfMerge.asofMergeJoin(leftDf, rightDf,
        on = Seq("user_id"), leftTs = "ts", rightTs = "pts",
        rightVals = Seq("purchase_id", "purchase_value"), tolerance = tol,
        broadcast = Some(true)))
      Seq("composition" -> comp, "merge" -> merge, "broadcast" -> bcast)
        .foreach { case (name, got) =>
          assert(got.keySet == expect.keySet,
            s"$name tol=$tol: left rows not preserved")
          expect.foreach { case (id, want) =>
            assert(got(id) == want,
              s"$name tol=$tol event $id: got ${got(id)}, want $want")
          }
        }
    }
  }
}
