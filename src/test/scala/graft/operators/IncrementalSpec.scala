package graft.operators

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  private def finalStats(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Double, Double, Double, Double)] =
    df.collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
    }.toMap

  private def approxEq(a: (Long, Double, Double, Double, Double),
                       b: (Long, Double, Double, Double, Double)): Boolean =
    a._1 == b._1 &&
      math.abs(a._2 - b._2) < 1e-9 && math.abs(a._3 - b._3) < 1e-9 &&
      a._4 == b._4 && a._5 == b._5

  test("merged batch states equal the single-state aggregate, any split") {
    val li = Tables.lineitem(spark, sfDir)
    val keys = Seq("l_returnflag")
    val direct = finalStats(Incremental.merge(
      Seq(Incremental.partialState(li, keys, "l_quantity")), keys))
    // split by an arbitrary hash — nothing to do with the grouping key
    val parts = (0 until 3).map(i =>
      li.where(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(3)) === i))
    val merged = finalStats(Incremental.merge(
      parts.map(p => Incremental.partialState(p, keys, "l_quantity")), keys))
    assert(direct.keySet == merged.keySet)
    direct.foreach { case (k, v) =>
      assert(approxEq(v, merged(k)), s"$k: $v vs ${merged(k)}")
    }
  }

  test("merge is associative: hierarchical merge equals flat merge") {
    val li = Tables.lineitem(spark, sfDir)
    val keys = Seq("l_returnflag")
    val parts = (0 until 4).map(i =>
      Incremental.partialState(
        li.where(pmod(col("l_orderkey"), lit(4)) === i), keys, "l_quantity"))
    val flat = finalStats(Incremental.merge(parts, keys))
    // re-partialize pairwise merged states, then merge the two levels:
    // state(state(a)+state(b)) must behave like a+b
    def restate(ss: Seq[org.apache.spark.sql.DataFrame]) =
      ss.reduce(_.unionByName(_))
        .groupBy(keys.map(col): _*)
        .agg(sum("p_n").as("p_n"), sum("p_sum").as("p_sum"),
          sum("p_sumsq").as("p_sumsq"),
          min("p_min").as("p_min"), max("p_max").as("p_max"))
    val tiered = finalStats(Incremental.merge(
      Seq(restate(parts.take(2)), restate(parts.drop(2))), keys))
    flat.foreach { case (k, v) =>
      assert(approxEq(v, tiered(k)), s"$k: $v vs ${tiered(k)}")
    }
  }

  test("constant groups report exactly zero std (clamp holds)") {
    import spark.implicits._
    val df = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0), ("b", 2.0))
      .toDF("k", "v")
    val out = Incremental.merge(
      Seq(Incremental.partialState(df, Seq("k"), "v")), Seq("k"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("a") == 0.0 && out("b") == 0.0)
  }
}
