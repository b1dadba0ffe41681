package graft.serve

import graft.model.SeriesSpec
import graft.pipeline.Jobs
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The REST route contract, HTTP-free (reference `api/routes/metrics.py`,
  * `api/routes/data.py`, `api/main.py`): request validation with the same
  * bounds, dispatch to the operator library, typed errors instead of HTTP
  * codes. A real server (any JVM HTTP framework) binds these handlers
  * 1:1 — the engine side is complete without pulling a web dependency
  * into the build.
  */
object Routes {

  sealed trait ApiError { def message: String }
  final case class NotFound(message: String) extends ApiError      // ≅ 404
  final case class InvalidParam(message: String) extends ApiError  // ≅ 422

  /** ≅ GET /metrics/temporal/{dataset}?metric=...&lat=&lon=
    * (reference `api/routes/metrics.py:11-46`): Literal metric validation,
    * lat ∈ [-90, 90], lon ∈ [-180, 180].
    */
  final case class MetricRequest(
      dataset: String,
      metric: String,
      lat: Option[Double] = None,
      lon: Option[Double] = None,
      referencePeriod: Option[(String, String)] = None)

  val AllowedMetrics: Set[String] = Set(
    "monthly", "seasonal", "annual", "climatology", "percentiles",
    "trend", "trend_significance", "anomaly")

  def metricRoute(
      spark: SparkSession,
      registry: Map[String, (DataFrame, SeriesSpec)],
      req: MetricRequest
  ): Either[ApiError, DataFrame] =
    for {
      entry <- registry.get(req.dataset)
        .toRight(NotFound(s"Dataset not found: ${req.dataset}"))
      _ <- Either.cond(AllowedMetrics.contains(req.metric), (),
        InvalidParam(s"Unknown metric '${req.metric}'. " +
          s"Allowed: ${AllowedMetrics.toSeq.sorted.mkString(", ")}"))
      _ <- Either.cond(req.lat.forall(l => l >= -90 && l <= 90), (),
        InvalidParam(s"lat must be in [-90, 90], got ${req.lat.get}"))
      _ <- Either.cond(req.lon.forall(l => l >= -180 && l <= 180), (),
        InvalidParam(s"lon must be in [-180, 180], got ${req.lon.get}"))
      _ <- Either.cond(
        req.lat.isEmpty && req.lon.isEmpty || entry._2.keyCols.length >= 2, (),
        InvalidParam(s"Dataset '${req.dataset}' has no (lat, lon) grid; " +
          "point queries are not supported for it"))
    } yield {
      val (df, spec) = entry
      val scoped = (req.lat, req.lon) match {
        case (Some(la), Some(lo)) =>
          val (nlat, nlon) = Api.nearestCell(df, la, lo,
            latCol = spec.keyCols.head, lonCol = spec.keyCols(1))
          df.where(org.apache.spark.sql.functions.col(spec.keyCols.head) === nlat &&
            org.apache.spark.sql.functions.col(spec.keyCols(1)) === nlon)
        case _ => df
      }
      Jobs.computeMetric(scoped, spec, req.metric, req.referencePeriod)
    }
}
