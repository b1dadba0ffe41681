package graft.serve

import graft.ingest.{BBox, GridSource}
import graft.model.SeriesSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query-surface functions behind the REST layer (reference
  * `api/routes/data.py`, SURVEY.md A11/A12, P4, §2.9 limits).
  *
  * Serving caps mirror the reference (`api/main.py:98-102`): 10,000 points
  * and 8,760 time steps per request — enforced as `limit()` guards so a
  * misbehaving client cannot trigger an unbounded collect.
  */
object Api {

  val MaxPointsPerRequest = 10000
  val MaxTimeSteps = 8760

  /** P4 — nearest grid cell to (lat, lon), per-axis like xarray
    * `sel(method="nearest")`: nearest distinct lat, nearest distinct lon,
    * ties broken toward the smaller coordinate. Two tiny fully-parallel
    * aggregations; only two scalars reach the driver.
    */
  def nearestCell(df: DataFrame, lat: Double, lon: Double,
                  latCol: String = "lat", lonCol: String = "lon"): (Double, Double) = {
    def nearest(c: String, v: Double): Double =
      df.select(col(c)).distinct()
        .orderBy(abs(col(c) - v), col(c))
        .head().getDouble(0)
    (nearest(latCol, lat), nearest(lonCol, lon))
  }

  /** P4 — time series at a point: snap to the nearest cell, then an
    * equality+range filter that pushes down to the scan. Output capped at
    * [[MaxTimeSteps]] rows.
    */
  def pointSeries(
      df: DataFrame,
      spec: SeriesSpec,
      lat: Double,
      lon: Double,
      timeRange: Option[(String, String)] = None,
      latCol: String = "lat",
      lonCol: String = "lon"
  ): DataFrame = {
    val (nlat, nlon) = nearestCell(df, lat, lon, latCol, lonCol)
    val in = timeRange.fold(df) { case (s, e) =>
      df.where(col(spec.tsCol).between(lit(s).cast("timestamp"), lit(e).cast("timestamp")))
    }
    in.where(col(latCol) === nlat && col(lonCol) === nlon)
      .select(col(spec.tsCol), col(latCol), col(lonCol), col(spec.valueCol))
      .orderBy(col(spec.tsCol))
      .limit(MaxTimeSteps)
  }

  /** A11 — global summary per value column: mean/std/min/max/p5/p95
    * (reference `src/arco_demo.py:234-260`). One aggregate pass.
    */
  def globalStats(df: DataFrame, valueCols: Seq[String]): DataFrame = {
    val aggs = valueCols.flatMap { v =>
      Seq(
        avg(col(v)).as(s"${v}_mean"),
        stddev_pop(col(v)).as(s"${v}_std"),
        min(col(v)).as(s"${v}_min"),
        max(col(v)).as(s"${v}_max"),
        percentile(col(v), lit(0.05)).as(s"${v}_p5"),
        percentile(col(v), lit(0.95)).as(s"${v}_p95"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** A12 — region statistics over a bbox and time range: mean/std/min/max/
    * p10/p50/p90 (reference `api/routes/data.py:172-214`).
    */
  def regionStats(
      df: DataFrame,
      spec: SeriesSpec,
      bbox: BBox,
      timeRange: Option[(String, String)] = None,
      latCol: String = "lat",
      lonCol: String = "lon"
  ): DataFrame = {
    val sliced = timeRange.fold(df) { case (s, e) =>
      df.where(col(spec.tsCol).between(lit(s).cast("timestamp"), lit(e).cast("timestamp")))
    }
    val v = col(spec.valueCol)
    GridSource.applyBBox(sliced, bbox, latCol, lonCol).agg(
      count(lit(1)).as("n"),
      avg(v).as("mean"),
      stddev_pop(v).as("std"),
      min(v).as("min"),
      max(v).as("max"),
      percentile(v, lit(0.10)).as("p10"),
      percentile(v, lit(0.50)).as("p50"),
      percentile(v, lit(0.90)).as("p90"))
  }

  /** Region extraction with the serving point cap
    * (reference `api/routes/data.py:135-169` + `api/main.py:99`).
    */
  def regionData(df: DataFrame, spec: SeriesSpec, bbox: BBox,
                 latCol: String = "lat", lonCol: String = "lon"): DataFrame =
    GridSource.applyBBox(df, bbox, latCol, lonCol)
      .select(col(spec.tsCol), col(latCol), col(lonCol), col(spec.valueCol))
      .limit(MaxPointsPerRequest)
}
