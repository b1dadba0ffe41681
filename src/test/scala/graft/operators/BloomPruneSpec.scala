package graft.operators

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {

  test("bloom-pruned semi join equals the exact semi join") {
    val li = Tables.lineitem(spark, sfDir)
    val dim = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") === "1-URGENT")
    val pruned = BloomPrune.prunedSemiJoin(li, dim, "l_orderkey", "o_orderkey")
      .select("l_orderkey", "l_linenumber")
    val exact = li.join(dim, li("l_orderkey") === dim("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
    assert(pruned.exceptAll(exact).isEmpty && exact.exceptAll(pruned).isEmpty)
  }

  test("string keys dispatch to mightContainString — no silent cast-to-null") {
    import spark.implicits._
    val fact = Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4)).toDF("code", "v")
    val dim = Seq("b", "d").toDF("code") // same column name on both sides
    val kept = BloomPrune.prunedSemiJoin(fact, dim, "code", "code")
      .select("v").as[Int].collect().sorted.toSeq
    assert(kept == Seq(2, 4))
    // unsupported key types fail loudly instead of pruning everything
    val arr = Seq((Seq(1), 1)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      BloomPrune.prunedSemiJoin(arr, arr, "k", "k")
    }
  }

  test("mismatched key families are rejected — no silent false negatives") {
    import spark.implicits._
    val factStr = Seq(("1", 1), ("2", 2)).toDF("k", "v")
    val dimLong = Seq(1L, 2L).toDF("k")
    // string fact vs long dim: the filter would hash longs but be probed
    // with strings — every row silently dropped; must throw instead
    intercept[IllegalArgumentException] {
      BloomPrune.prunedSemiJoin(factStr, dimLong, "k", "k")
    }
    intercept[IllegalArgumentException] {
      BloomPrune.prunedSemiJoin(dimLong, factStr, "k", "k")
    }
    // mixed integral widths are fine: both sides widen to long
    val factLong = Seq(1L, 2L, 3L, 4L).toDF("k")
    val dimInt = Seq(2, 4).toDF("k")
    val kept = BloomPrune.prunedSemiJoin(factLong, dimInt, "k", "k")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 4L))
  }

  test("probe is a codegen expression — no UDF node, inside WholeStageCodegen") {
    val li = Tables.lineitem(spark, sfDir)
    val dim = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") === "1-URGENT")
    val pruned = BloomPrune.prunedSemiJoin(li, dim, "l_orderkey", "o_orderkey")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF") &&
      !plan.contains("ScalaUDF"), s"probe must not be a UDF:\n$plan")
    assert(plan.contains("graft_bloom_might_contain"), plan)
    // null keys probe false (the UDF contract): nulls never reach the join
    import spark.implicits._
    val fact = Seq(Some(1L), None, Some(2L)).toDF("k")
    val d2 = Seq(1L, 2L).toDF("k")
    val kept = BloomPrune.prunedSemiJoin(fact, d2, "k", "k")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L))
  }

  test("the filter prunes most non-matching keys at the configured fpp") {
    import spark.implicits._
    val dim = spark.range(0, 1000).toDF("k")
    val bf = dim.stat.bloomFilter("k", 1000, 0.01)
    // keys 1000..10999 are not in the filter; ≈1% false positives allowed
    val fp = (1000L until 11000L).count(bf.mightContainLong)
    assert(fp < 300, s"false-positive count $fp way above the 1% target")
    // no false negatives, ever — that's the correctness contract
    assert((0L until 1000L).forall(bf.mightContainLong))
  }
}
