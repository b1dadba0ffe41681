package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Dataflow composition (reference `processing/dask_pipeline.py`,
  * SURVEY.md D1-D6).
  *
  * Spark's laziness replaces the explicit compute: steps extend the logical
  * plan via `df.transform`, and the action at the end triggers one
  * optimized job. `persist` caches intermediates; `graphInfo` surfaces the
  * plan the way `get_graph_info` surfaced Dask task counts.
  */
final case class PipelineStep(name: String, fn: DataFrame => DataFrame)

/** D1/D2 — ordered list of Dataset→Dataset functions
  * (`dask_pipeline.py:16-94`). Immutable; `add` returns a new pipeline.
  */
final case class Pipeline(steps: Vector[PipelineStep] = Vector.empty,
                          name: String = "pipeline") {
  def add(stepName: String)(fn: DataFrame => DataFrame): Pipeline =
    copy(steps = steps :+ PipelineStep(stepName, fn))

  /** Compose all steps onto the input plan — still lazy. */
  def apply(df: DataFrame): DataFrame =
    steps.foldLeft(df)((d, s) => d.transform(s.fn))

  /** Execute = compose + action (the reference's `.execute()` with its
    * final `.compute()`, `dask_pipeline.py:50-82`).
    */
  def execute(df: DataFrame): Array[org.apache.spark.sql.Row] = apply(df).collect()
}

object Pipeline {
  def create(name: String = "pipeline"): Pipeline = Pipeline(name = name)

  /** D4 — apply a row-batch kernel to each partition independently with an
    * explicit output type (the reference's `map_blocks` with its output
    * template, `dask_pipeline.py:134-161`). The kernel must be pure
    * per-partition — results may not depend on partitioning.
    */
  def mapBlocks[T: org.apache.spark.sql.Encoder](
      df: DataFrame)(fn: Iterator[org.apache.spark.sql.Row] => Iterator[T]): org.apache.spark.sql.Dataset[T] =
    df.mapPartitions(fn)

  /** D5 — apply an arbitrary transform to each key group
    * (`ds.groupby(...).map(func)`, `dask_pipeline.py:195-212`): the typed
    * `KeyValueGroupedDataset.flatMapGroups` surface. Groups must fit in
    * executor memory — use aggregates instead when the per-group logic is
    * expressible declaratively.
    */
  def applyToGroups[K: org.apache.spark.sql.Encoder, T: org.apache.spark.sql.Encoder](
      df: DataFrame, key: org.apache.spark.sql.Row => K)(
      fn: (K, Iterator[org.apache.spark.sql.Row]) => IterableOnce[T]): org.apache.spark.sql.Dataset[T] =
    df.groupByKey(key).flatMapGroups(fn)

  /** D3 — apply one function to N datasets concurrently
    * (`dask_pipeline.py:97-131`): each plan is internally parallel; the
    * futures overlap independent jobs, which Spark's scheduler interleaves
    * across executor slots (use the FAIR pool in production).
    */
  def executeParallel[T](
      datasets: Seq[DataFrame],
      fn: DataFrame => T,
      maxConcurrency: Int = 4
  ): Seq[T] = {
    val ec = ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(maxConcurrency))
    try {
      val futures = datasets.map(d => Future(fn(d))(ec))
      futures.map(Await.result(_, Duration.Inf))
    } finally ec.shutdown()
  }
}

/** D6 — lazy pipeline wrapper with history, persist and plan introspection
  * (`dask_pipeline.py:215-297`).
  */
final class LazyPipeline private (private var df: DataFrame,
                                  private var hist: Vector[String]) {
  def apply(name: String)(fn: DataFrame => DataFrame): LazyPipeline = {
    df = df.transform(fn); hist = hist :+ name; this
  }

  /** Cache intermediates in executor memory/disk (`persist`,
    * `dask_pipeline.py:267-276`).
    */
  def persist(level: StorageLevel = StorageLevel.MEMORY_AND_DISK): LazyPipeline = {
    df = df.persist(level); this
  }

  def compute(): Array[org.apache.spark.sql.Row] = df.collect()
  def dataFrame: DataFrame = df
  def history: Seq[String] = hist

  /** Plan stats ≅ `get_graph_info` (`dask_pipeline.py:278-297`). */
  def graphInfo: Map[String, String] = Map(
    "history" -> hist.mkString(" -> "),
    "logical_plan_nodes" -> df.queryExecution.optimizedPlan.collect { case p => p }.size.toString,
    "physical_plan" -> df.queryExecution.executedPlan.nodeName,
    "columns" -> df.columns.mkString(","))
}

object LazyPipeline {
  def apply(df: DataFrame): LazyPipeline = new LazyPipeline(df, Vector.empty)
}
