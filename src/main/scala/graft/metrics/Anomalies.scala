package graft.metrics

import graft.model.SeriesSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Anomalies relative to a climatological reference
  * (reference `metrics/anomalies.py`, SURVEY.md J1/J3, P6).
  *
  * Every operator here is "fact table ⋈ tiny climatology" — the xarray
  * `groupby(...) - climatology` alignment is an equi-join on
  * (climatological group, cell) against an aggregate with ≤366 rows per
  * cell. We broadcast the climatology side explicitly, so the fact table is
  * never shuffled: at 100 TB the plan is scan → broadcast-join → project,
  * all inside one codegen stage.
  */
object Anomalies {

  private def joinClim(
      df: DataFrame,
      spec: SeriesSpec,
      group: Temporal.ClimGroup,
      clim: DataFrame
  ): DataFrame = {
    spec.validate(df)
    df.withColumn(group.name, group.expr(col(spec.tsCol)))
      .join(broadcast(clim), group.name +: spec.keyCols)
  }

  /** J1 — absolute anomaly: value − climatological mean
    * (reference `metrics/anomalies.py:13-65`). Climatology is computed from
    * `referencePeriod` unless a pre-computed one is passed (same contract as
    * the reference's `climatology=` argument).
    */
  def anomaly(
      df: DataFrame,
      spec: SeriesSpec,
      group: Temporal.ClimGroup = Temporal.ByMonth,
      referencePeriod: Option[(String, String)] = None,
      climatology: Option[DataFrame] = None
  ): DataFrame = {
    val clim = climatology.getOrElse(Temporal.climatology(df, spec, group, referencePeriod))
    joinClim(df, spec, group, clim)
      .withColumn("anomaly", col(spec.valueCol) - col("clim_mean"))
      .drop("clim_mean", "clim_std")
  }

  /** Standardized anomaly (z-score): (value − mean) / std with the
    * reference's ddof=0 population std (`metrics/anomalies.py:68-137`,
    * xarray `.std()` default).
    */
  def standardizedAnomaly(
      df: DataFrame,
      spec: SeriesSpec,
      group: Temporal.ClimGroup = Temporal.ByMonth,
      referencePeriod: Option[(String, String)] = None,
      climatology: Option[DataFrame] = None
  ): DataFrame = {
    val clim = climatology.getOrElse(Temporal.climatology(df, spec, group, referencePeriod))
    joinClim(df, spec, group, clim)
      .withColumn("anomaly", col(spec.valueCol) - col("clim_mean"))
      .withColumn("zscore", zdiv(col("anomaly"), col("clim_std")))
      .drop("clim_mean", "clim_std")
  }

  /** z = anomaly / std with numpy division semantics, not an ANSI
    * DIVIDE_BY_ZERO error: 0/0 → NaN, x/0 → ±inf (sign of x). The x/0 case
    * is reachable — with a `referencePeriod` (or user-supplied) climatology
    * a row OUTSIDE the reference window can carry a nonzero anomaly over a
    * zero-variance group; only a full-series climatology guarantees
    * anomaly ≡ 0 wherever std = 0 (reference `metrics/anomalies.py`
    * inherits exactly these semantics from numpy).
    */
  private def zdiv(anomaly: Column, std: Column): Column =
    when(std === 0.0,
      when(anomaly === 0.0, lit(Double.NaN))
        .otherwise(signum(anomaly) * lit(Double.PositiveInfinity)))
      .otherwise(anomaly / std)

  /** Standardized anomaly for the DENSE regime — one shuffle, no join.
    *
    * [[standardizedAnomaly]]'s broadcast join is optimal when the
    * climatology is small relative to the fact table (monthly groups, few
    * cells, or a reference period collapses it) — it stays ahead even at
    * the 189M-row probe grid with a monthly climatology. The regime that
    * kills it is (cell × climatological group) approaching fact size: a
    * day-of-year climatology on the 23.7M-row probe grid makes the
    * broadcast form 8× slower than this one (97.9 s vs 11.7 s, SCALE.md),
    * and at the 189M-row grid the forced broadcast would ship a ~95M-row
    * relation — past Spark's 8 GiB broadcast hard limit, i.e. the plan
    * fails outright. This form computes the same ddof=0 z-score with
    * window aggregates over (group, cells): a single exchange of the fact
    * table, one sort, no second relation. Use it when no
    * `referencePeriod`/pre-computed climatology is needed (the climatology
    * is the full series itself).
    */
  def standardizedAnomalyWindowed(
      df: DataFrame,
      spec: SeriesSpec,
      group: Temporal.ClimGroup = Temporal.ByMonth
  ): DataFrame = {
    spec.validate(df)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((group.name +: spec.keyCols).map(col): _*)
    df.withColumn(group.name, group.expr(col(spec.tsCol)))
      .withColumn("anomaly", col(spec.valueCol) - avg(col(spec.valueCol)).over(w))
      .withColumn("zscore", zdiv(col("anomaly"), stddev_pop(col(spec.valueCol)).over(w)))
  }

  /** Severity classification of a z-score column — the 6-deep nested
    * `xr.where` chain of the reference (`metrics/anomalies.py:220-247`) as
    * a single CaseWhen expression, int8 classes −3…3.
    */
  def severity(z: Column): Column =
    when(z < -2, -3)
      .when(z < -1.5, -2)
      .when(z < -1, -1)
      .when(z <= 1, 0)
      .when(z <= 1.5, 1)
      .when(z <= 2, 2)
      .otherwise(3)
      .cast("tinyint")

  def classifySeverity(df: DataFrame, zscoreCol: String = "zscore"): DataFrame =
    df.withColumn("severity", severity(col(zscoreCol)))

  /** J3/F-UDF1 — percentile rank of each value within its cell's historical
    * distribution (reference `metrics/anomalies.py:140-217`): clamped
    * piecewise-linear interpolation against the sorted threshold vector.
    * Thresholds ride along as a broadcast ArrayType column.
    */
  def percentileRank(
      df: DataFrame,
      spec: SeriesSpec,
      percentiles: Seq[Int] = Percentiles.DefaultPercentiles,
      group: Temporal.ClimGroup = Temporal.ByMonth,
      referencePeriod: Option[(String, String)] = None
  ): DataFrame = {
    val thr = Percentiles.thresholdVectors(df, spec, percentiles, Some(group), referencePeriod)
    val pcts = typedLit(percentiles.map(_.toDouble))
    joinClim(df, spec, group, thr)
      .withColumn("percentile_rank",
        graft.plans.Expressions.percentile_rank(
          col(spec.valueCol).cast("double"), col("vals"), pcts))
      .drop("vals")
  }
}
