package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.sql.types._

/** Bloom-filter join pruning — the manual, composable form of Spark's
  * runtime bloom filter: build a compact filter over the small side's
  * join keys, broadcast it, and drop non-matching fact rows BEFORE the
  * join's shuffle.
  *
  * At 100 TB the win is shuffle volume: a selective dimension predicate
  * prunes the overwhelming share of fact bytes for a few MB of filter
  * shipped to every executor. The filter is conservative (false
  * positives only, never false negatives), so it composes with the exact
  * join that follows — results are identical to the unpruned join, the
  * plan is just cheaper. (No reference analog; the reference's joins are
  * all broadcast-sized, `metrics/anomalies.py:46-53`.)
  */
object BloomPrune {

  /** Exact left-semi join with a bloom pre-filter on the fact side.
    *
    * `expectedItems`/`fpp` size the filter (bits ≈ −n·ln(fpp)/ln²2);
    * overshooting `expectedItems` only costs memory, undershooting only
    * raises the false-positive rate — correctness never depends on it
    * because the exact semi join runs on the pruned remainder.
    *
    * Key types are dispatched explicitly (integral → mightContainLong,
    * string → mightContainString) and anything else is rejected up
    * front: a silent cast-to-long of a string key would null out every
    * row and break the no-false-negatives contract.
    */
  def prunedSemiJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 100000L, fpp: Double = 0.01
  ): DataFrame = {
    def keyFamily(df: DataFrame, key: String, side: String): Boolean =
      df.schema(key).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case StringType => false
        case other => throw new IllegalArgumentException(
          s"BloomPrune: unsupported $side key type $other for '$key' " +
            "(integral and string keys only — matching dim.stat.bloomFilter)")
      }
    val integralKey = keyFamily(fact, factKey, "fact")
    // the dim side must hash in the SAME family: a string dim key bloom
    // filter probed with long-hashed fact keys (or vice versa) would
    // produce false NEGATIVES — silently dropped rows — not just noise
    if (keyFamily(dim, dimKey, "dim") != integralKey)
      throw new IllegalArgumentException(
        s"BloomPrune: key type family mismatch — fact '$factKey' is " +
          s"${fact.schema(factKey).dataType} but dim '$dimKey' is " +
          s"${dim.schema(dimKey).dataType}; the filter would be built over " +
          "differently-hashed values and drop matching rows")
    // integral dim keys are widened to long so byte/short/int dims probe
    // identically to the fact side's cast("long")
    val dimKeyCol =
      if (integralKey) col(dimKey).cast("long") else col(dimKey)
    val bf = dim.select(dimKeyCol.as(dimKey)).stat
      .bloomFilter(dimKey, expectedItems, fpp)
    // codegen'd probe (plans/Expressions.BloomMightContain): the filter rides
    // the plan's broadcast task binary, the probe stays inside whole-stage
    // codegen instead of crossing a UDF boundary per fact row
    val mightContain: Column = graft.plans.Expressions.bloom_might_contain(
      if (integralKey) col(factKey).cast("long") else col(factKey), bf)
    // no distinct() on the build side (left_semi already deduplicates);
    // the dim key is aliased so factKey == dimKey doesn't turn the join
    // condition ambiguous
    fact.where(mightContain)
      .join(dim.select(col(dimKey).as("__bloom_key")),
        col(factKey) === col("__bloom_key"), "left_semi")
  }
}
