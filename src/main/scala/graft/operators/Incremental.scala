package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: mergeable per-batch partial states
  * instead of recompute-from-raw.
  *
  * At 100 TB the statistics a serving layer needs (count/mean/std/min/
  * max per group — the reference's `global_stats`/`region_stats` shape,
  * `api/routes/data.py`) cannot be recomputed over the full corpus per
  * ingest batch. The algebraic form of those aggregates — (n, Σx, Σx²,
  * min, max) — is closed under addition, so each batch reduces to a
  * tiny keyed state table and the up-to-date answer is a merge of
  * states, never a second scan of raw rows. This is the same partial/
  * final split Spark's own hash aggregate performs inside one query,
  * lifted across queries/batches/days; it is also exactly what a
  * Structured Streaming sink maintains, so batch backfill and the live
  * stream share one state schema.
  *
  * Numerical note: Σx² carries the usual cancellation risk when
  * `std ≪ |mean|`; at the library's 6-decimal oracle tolerance and
  * double precision this holds to |mean|/std ≲ 10⁵, the practical range
  * of every driver metric. For pathological regimes, shift values by a
  * per-group pivot before accumulating.
  */
object Incremental {

  val StateCols: Seq[String] = Seq("p_n", "p_sum", "p_sumsq", "p_min", "p_max")

  /** Reduce one batch to its mergeable partial state: one row per key,
    * carrying the algebraic accumulator. Map-side combinable — the
    * shuffle ships group-cardinality state, not rows.
    */
  def partialState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    // a key named like a state column would collide in the output schema
    // and corrupt every later merge — refuse up front
    require(keys.intersect(StateCols).isEmpty,
      s"partialState: key columns may not be named any of $StateCols")
    val v = col(valueCol).cast("double")
    df.groupBy(keys.map(col): _*)
      .agg(
        count(v).as("p_n"),
        sum(v).as("p_sum"),
        sum(v * v).as("p_sumsq"),
        min(v).as("p_min"),
        max(v).as("p_max"))
  }

  /** Merge partial states (any number of batches, any grouping of the
    * same data) into the finalized per-key aggregate. Associative and
    * commutative by construction, so states can be combined in any
    * order — per-day, per-region, or hierarchically.
    */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    val combined = states.reduce(_.unionByName(_))
    val n: Column = sum(col("p_n"))
    val s: Column = sum(col("p_sum"))
    val s2: Column = sum(col("p_sumsq"))
    combined.groupBy(keys.map(col): _*)
      .agg(
        n.as("n"),
        (s / n).as("mean"),
        // population std from the merged moments, clamped at 0 against
        // floating-point jitter for constant groups; NULL (not 0) when the
        // group has no non-null values — matching direct stddev_pop, which
        // greatest(NULL, 0.0)'s null-skipping would otherwise mask
        when(n === 0, lit(null).cast("double"))
          .otherwise(sqrt(greatest(s2 / n - (s / n) * (s / n), lit(0.0))))
          .as("std"),
        min(col("p_min")).as("min"),
        max(col("p_max")).as("max"))
  }
}
