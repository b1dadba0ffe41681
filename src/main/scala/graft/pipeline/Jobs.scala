package graft.pipeline

import graft.ingest.{BBox, GridSource}
import graft.metrics._
import graft.model.SeriesSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentHashMap
import scala.concurrent.{ExecutionContext, Future}

/** Async job runner + op-descriptor interpreter (reference
  * `tasks/celery_tasks.py`, SURVEY.md D7-D9, P7).
  *
  * Celery + Redis collapse into Spark: a job is a Future wrapping an
  * action, grouped via `setJobGroup` so it is cancellable and attributable;
  * status lives in a concurrent map (a SparkListener could stream stage
  * progress the way Celery streamed task state).
  */
object Jobs {

  /** P7 — the "operations list" API of the reference's task runner
    * (`celery_tasks.py:210-231`): declarative descriptors interpreted onto
    * a DataFrame.
    */
  sealed trait Op
  final case class SliceTime(start: String, end: String) extends Op
  final case class SliceRegion(bbox: BBox) extends Op
  final case class Resample(freq: String) extends Op // "monthly"|"seasonal"|"annual"
  case object ComputeMean extends Op
  final case class Select(cols: Seq[String]) extends Op
  final case class Filter(condition: String) extends Op

  def interpret(df: DataFrame, spec: SeriesSpec, ops: Seq[Op]): DataFrame =
    ops.foldLeft(df) {
      case (d, SliceTime(s, e)) =>
        d.where(col(spec.tsCol).between(lit(s).cast("timestamp"), lit(e).cast("timestamp")))
      case (d, SliceRegion(b)) => GridSource.applyBBox(d, b)
      case (d, Resample("monthly")) => Temporal.monthlyMean(d, spec)
      case (d, Resample("seasonal")) => Temporal.seasonalMean(d, spec)
      case (d, Resample("annual")) => Temporal.annualMean(d, spec)
      case (_, Resample(f)) => throw new IllegalArgumentException(s"Unknown resample freq: $f")
      case (d, ComputeMean) =>
        d.groupBy(spec.keyCols.map(col): _*).agg(avg(col(spec.valueCol)).as("mean_value"))
      case (d, Select(cols)) => d.select(cols.map(col): _*)
      case (d, Filter(c)) => d.where(c)
    }

  /** D8 — metric dispatch by name (`celery_tasks.py:84-157`). */
  def computeMetric(df: DataFrame, spec: SeriesSpec, metric: String,
                    referencePeriod: Option[(String, String)] = None): DataFrame =
    metric match {
      case "monthly" => Temporal.monthlyMean(df, spec)
      case "seasonal" => Temporal.seasonalMean(df, spec)
      case "annual" => Temporal.annualMean(df, spec)
      case "climatology" => Temporal.climatology(df, spec, Temporal.ByMonth, referencePeriod)
      case "percentiles" => Percentiles.climatologicalPercentiles(df, spec,
        referencePeriod = referencePeriod)
      case "trend" => Trends.linearTrend(df, spec, referencePeriod)
      case "trend_significance" => Trends.mannKendall(df, spec)
      case "anomaly" => Anomalies.anomaly(df, spec, referencePeriod = referencePeriod)
      case other => throw new IllegalArgumentException(s"Unknown metric: $other")
    }

  // ---- D7/D9: job lifecycle

  sealed trait JobStatus
  case object Pending extends JobStatus
  case object Running extends JobStatus
  final case class Done(rows: Long) extends JobStatus
  final case class Failed(error: String) extends JobStatus

  final class JobManager(spark: SparkSession)(implicit ec: ExecutionContext) {
    private val statuses = new ConcurrentHashMap[String, JobStatus]()

    /** Submit an action as a cancellable job; progress is attributable via
      * the job group in the Spark UI/listeners.
      */
    def submit(jobId: String, df: => DataFrame): Future[Long] = {
      statuses.put(jobId, Pending)
      Future {
        statuses.put(jobId, Running)
        spark.sparkContext.setJobGroup(jobId, s"graft job $jobId", interruptOnCancel = true)
        try {
          val n = df.count()
          statuses.put(jobId, Done(n))
          n
        } catch {
          case e: Throwable => statuses.put(jobId, Failed(e.getMessage)); throw e
        } finally spark.sparkContext.clearJobGroup()
      }
    }

    def status(jobId: String): Option[JobStatus] = Option(statuses.get(jobId))
    def cancel(jobId: String): Unit = spark.sparkContext.cancelJobGroup(jobId)
  }
}
