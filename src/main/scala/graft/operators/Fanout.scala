package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Scale-adaptive scan fan-out (optimization guide §2.5, "input skew: one
  * huge unsplittable file … repartition immediately after the read").
  *
  * A parquet file with one row group is ONE scan task no matter how many
  * cores the cluster has — Spark's byte-range splits cannot divide a row
  * group. Every expression fused into that scan stage (gram hashing, HTML
  * extraction, broadcast-join probes, partial aggregation) then runs
  * serially while the rest of the cluster idles. This helper inserts one
  * deterministic hash repartition right after the read so the per-row
  * work spreads over the cluster — and is a NO-OP whenever the frame's
  * planned parallelism is already within 2× of the cluster's, so a real
  * deployment (where a table is thousands of splits) never pays a
  * pointless full-corpus shuffle. Only the degenerate under-parallel scan
  * pays the exchange, and what it shuffles is the small table that caused
  * the degeneracy in the first place.
  *
  * The keys must be deterministic row properties (ids, join keys) — never
  * rand() — so task retries reproduce the same placement (guide §2.5,
  * SPARK-38388). Callers own key choice; high cardinality relative to the
  * core count keeps the spread even.
  */
object Fanout {

  /** Target partition count: a CONSTANT (conf-overridable), deliberately
    * NOT the core count. The row→partition assignment decides the ORDER
    * in which floating-point partial aggregates combine downstream; tying
    * it to defaultParallelism would make round-to-6-decimals outputs
    * differ between the driver's 32-core and low-core runs. A pinned
    * count keeps results bit-identical at every SPARK_GRAFT_CPUS (the
    * same property the single-split scan had), while still giving every
    * core work: 64 partitions = 2 waves at 32 cores, 8 waves at 8 — the
    * per-task state is tiny either way. Parallelism ADAPTATION lives in
    * the guard below, not in this constant.
    */
  private def targetParts(df: DataFrame): Int =
    df.sparkSession.conf.getOption("spark.graft.fanout.partitions")
      .map(_.toInt).getOrElse(64)

  def apply(df: DataFrame, keys: Seq[String]): DataFrame =
    byColumns(df, keys.map(col))

  def byColumns(df: DataFrame, keys: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    if (cores <= 1) return df
    // "already parallel" is judged from plan-statistics BYTES, not from
    // df.rdd.getNumPartitions: materializing the RDD lineage costs a full
    // physical-planning pass per call (~40-70 ms measured), while the
    // optimizer statistics are one analysis pass (~10 ms). A frame whose
    // estimated bytes would already yield >= cores/2 max-size splits scans
    // parallel enough on its own; anything smaller is the degenerate
    // few-row-groups case this helper exists for. Unknown-stats relations
    // default to a huge estimate and are (safely) left alone.
    val maxPartitionBytes = spark.conf
      .getOption("spark.sql.files.maxPartitionBytes")
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(128L * 1024 * 1024)
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes >= BigInt(cores.toLong / 2 max 1L) * maxPartitionBytes) df
    else df.repartition(targetParts(df), keys: _*)
  }
}
