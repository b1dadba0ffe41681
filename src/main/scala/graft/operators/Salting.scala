package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting (SURVEY.md §7.4-8; the manual complement to
  * AQE's skew-join handling for aggregations).
  *
  * A hot group key makes one reducer the straggler. Salting splits every
  * group into `saltBuckets` deterministic sub-groups (salt = hash of a
  * high-cardinality column mod k), aggregates partially per (key, salt),
  * then combines partials per key. Only decomposable aggregates are
  * offered (sum/count/min/max/avg) — the combine step is exact, so results
  * are identical to the unsalted aggregation (the oracle checks this).
  */
object Salting {

  /** Deterministic salt from a tie-breaker column (NOT rand(): results
    * must be reproducible run-to-run).
    */
  def salt(tieBreaker: Column, saltBuckets: Int): Column =
    pmod(xxhash64(tieBreaker), lit(saltBuckets))

  /** Two-stage salted aggregation producing sum/count/min/max/avg of
    * `valueCol` per `keys`, bit-identical to the direct groupBy.
    */
  def saltedStats(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      tieBreaker: String,
      saltBuckets: Int = 16
  ): DataFrame = {
    val v = col(valueCol)
    // NOT fanned out (r18 opt, measured): the partial aggregation is
    // ~0.2 µs/row — serializing 600k rows into a fan-out exchange cost
    // 4.9× what the serial partial agg did. Salted aggregation's scan
    // stage stays as the input provides it.
    val partial = df
      .withColumn("_salt", salt(col(tieBreaker), saltBuckets))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(
        sum(v).as("_sum"), count(v).as("_cnt"),
        min(v).as("_min"), max(v).as("_max"))
    partial.groupBy(keys.map(col): _*)
      .agg(
        sum(col("_sum")).as("sum_value"),
        sum(col("_cnt")).as("n"),
        min(col("_min")).as("min_value"),
        max(col("_max")).as("max_value"))
      .withColumn("avg_value", col("sum_value") / col("n"))
  }

  /** Skew-safe inner equi-join: the fact side is salted deterministically
    * and the build side replicated once per salt bucket, so a hot join
    * key spreads over `saltBuckets` reducers instead of pinning one
    * straggler. Row-for-row identical to the plain join (every fact row
    * meets every matching build row in exactly one (key, salt) bucket).
    *
    * For when the build side is too big to broadcast (which would dodge
    * skew entirely) but can afford k× replication — the middle regime
    * between broadcast-hash and AQE's skewedJoin split. Build-side rows
    * must be unique per key-match semantics the caller intends; the
    * replication factor multiplies build-side shuffle volume only.
    */
  def saltedJoin(
      fact: DataFrame,
      build: DataFrame,
      key: String,
      tieBreaker: String,
      saltBuckets: Int = 16
  ): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    // a pre-existing _salt column would be silently replaced on the fact
    // side and become part of the join key on the build side — refuse
    require(!fact.columns.contains("_salt") && !build.columns.contains("_salt"),
      "saltedJoin: inputs must not already have a '_salt' column")
    // spread the fact side before the probe: a single-row-group scan is
    // one task, and with the replicated side broadcast the whole join
    // would otherwise run serially in the scan stage (Fanout no-ops when
    // the scan is already parallel). (key, tieBreaker) is high-cardinality
    // and deterministic — even spread, stable under task retry.
    val saltedFact = Fanout(fact, Seq(key, tieBreaker))
      .withColumn("_salt", salt(col(tieBreaker), saltBuckets))
    val replicated = build.withColumn("_salt",
      explode(array((0 until saltBuckets).map(lit(_)): _*)))
    saltedFact.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
