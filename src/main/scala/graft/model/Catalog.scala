package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset discovery catalog (reference `api/routes/data.py:12-40`
  * SAMPLE_DATASETS registry + `src/stac_demo.py:142-189` STAC
  * Catalog/Collection metadata, SURVEY.md §1.1).
  *
  * One row per dataset with the fields STAC's `cube:dimensions` carries:
  * row count, temporal extent and step count, column inventory. Built by
  * scanning footers + one aggregate per table — the discovery pass a
  * client runs before issuing real queries.
  */
object Catalog {

  /** Describe one parquet dataset: identity, size, temporal extent (if a
    * time column is probed), schema summary.
    */
  def describe(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = Tables.load(spark, dir, name)
    val tsCol = graft.ingest.GridSource.detectTimeColumn(df.schema)
    val base = df.agg(count(lit(1)).as("n_rows"))
      .withColumn("dataset_id", lit(name))
      .withColumn("n_columns", lit(df.schema.size))
      .withColumn("columns", lit(df.schema.fieldNames.sorted.mkString(",")))
    tsCol match {
      case Some(c) =>
        val t = df.agg(
          min(col(c)).cast("date").as("ts_min"),
          max(col(c)).cast("date").as("ts_max"),
          countDistinct(col(c)).as("n_timesteps"))
        base.crossJoin(t)
      case None =>
        base
          .withColumn("ts_min", lit(null).cast("date"))
          .withColumn("ts_max", lit(null).cast("date"))
          .withColumn("n_timesteps", lit(null).cast("long"))
    }
  }

  /** Catalog over a set of datasets — the registry/discovery table. */
  def build(spark: SparkSession, dir: String, names: Seq[String]): DataFrame =
    names.map(describe(spark, dir, _)).reduce(_.unionByName(_))
      .select(col("dataset_id"), col("n_rows"), col("n_columns"),
        col("columns"), col("ts_min"), col("ts_max"), col("n_timesteps"))
}
