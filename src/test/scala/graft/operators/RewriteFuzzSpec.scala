package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized invisibility checks for the algebraic-rewrite operators:
  * incremental partial/merge (any batch split of the same rows must
  * finalize to the direct aggregate — including empty batches, all-null
  * groups, single-element groups) and salted aggregation/join (the salt
  * is a physical knob, never a semantic one — results must equal the
  * plain forms row-for-row on skewed random input).
  */
class RewriteFuzzSpec extends SparkSpec {

  test("incremental partial/merge over random batch splits equals the direct aggregate") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    (0 until 3).foreach { round =>
      val rows: Seq[(String, java.lang.Double, Int)] = (0 until 300).map { _ =>
        val k = s"g${rnd.nextInt(6)}"
        val v: java.lang.Double = k match {
          case "g4" => null // all-null group
          case "g5" => java.lang.Double.valueOf(42.0) // constant group (std 0)
          case _ =>
            if (rnd.nextInt(8) == 0) null
            else java.lang.Double.valueOf(math.floor(
              (rnd.nextDouble() * 2e4 - 1e4) * 1e3) / 1e3)
        }
        (k, v, rnd.nextInt(2 + round * 2)) // 2/4/6-way batch split
      } :+ (("g_single", java.lang.Double.valueOf(7.5), 0)) // 1-element group
      val df = rows.toDF("k", "v", "batch")
      val nBatches = rows.map(_._3).max + 1
      // some batch ids may be EMPTY for some groups — and one batch id is
      // guaranteed globally empty to exercise merge over an empty state
      val states = (0 to nBatches).map(b =>
        Incremental.partialState(df.where(col("batch") === b), Seq("k"), "v"))
      val merged = Incremental.merge(states, Seq("k"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
      val direct = df.groupBy(col("k")).agg(
          count(col("v")).as("n"), avg(col("v")).as("mean"),
          stddev_pop(col("v")).as("std"),
          min(col("v")).as("min"), max(col("v")).as("max"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
      assert(merged.keySet == direct.keySet, s"round $round: group sets differ")
      direct.foreach { case (k, (n, mean, std, mn, mx)) =>
        val (gn, gmean, gstd, gmn, gmx) = merged(k)
        assert(gn == n, s"round $round $k: n $gn != $n")
        def close(a: Option[Double], b: Option[Double], what: String): Unit =
          (a, b) match {
            case (Some(x), Some(y)) =>
              assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)),
                s"round $round $k: $what $x != $y")
            case (x, y) => assert(x == y, s"round $round $k: $what $x != $y")
          }
        close(gmean, mean, "mean"); close(gstd, std, "std")
        close(gmn, mn, "min"); close(gmx, mx, "max")
      }
    }
  }

  test("salted aggregation and salted join equal the plain forms on skewed input") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    // 80% of rows share one hot key — the shape salting exists for
    val fact: Seq[(Long, Long, Double)] = (0 until 400).map { i =>
      val k = if (rnd.nextInt(5) > 0) 7L else rnd.nextInt(20).toLong
      (i.toLong, k, math.floor(rnd.nextDouble() * 1e6) / 1e3)
    }
    val build: Seq[(Long, String)] = (0 until 20).map(k => (k.toLong, s"dim$k"))
    val factDf = fact.toDF("row_id", "k", "v")
    val buildDf = build.toDF("k", "label")

    for (buckets <- Seq(1, 4, 16)) {
      val salted = Salting.saltedStats(factDf, Seq("k"), "v", "row_id", buckets)
        .collect().map(r => r.getLong(0) ->
          ((r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
            r.getDouble(5)))).toMap
      val plain = factDf.groupBy(col("k")).agg(
          sum(col("v")).as("sum_value"), count(col("v")).as("n"),
          min(col("v")).as("min_value"), max(col("v")).as("max_value"))
        .withColumn("avg_value", col("sum_value") / col("n"))
        .collect().map(r => r.getLong(0) ->
          ((r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
            r.getDouble(5)))).toMap
      assert(salted.keySet == plain.keySet, s"buckets=$buckets: key sets differ")
      plain.foreach { case (k, (s, n, mn, mx, av)) =>
        val (gs, gn, gmn, gmx, gav) = salted(k)
        assert(gn == n && gmn == mn && gmx == mx, s"buckets=$buckets key $k")
        assert(math.abs(gs - s) <= 1e-9 * math.max(1.0, math.abs(s)),
          s"buckets=$buckets key $k: sum $gs != $s")
        assert(math.abs(gav - av) <= 1e-9 * math.max(1.0, math.abs(av)),
          s"buckets=$buckets key $k: avg $gav != $av")
      }

      val sj = Salting.saltedJoin(factDf, buildDf, "k", "row_id", buckets)
        .select(col("row_id"), col("label")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val pj = factDf.join(buildDf, Seq("k"))
        .select(col("row_id"), col("label")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(sj == pj, s"buckets=$buckets: salted join row set diverges " +
        s"(${sj.length} vs ${pj.length} rows)")
    }
  }
}
