package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Canonical data model of the engine.
  *
  * The reference models data as an xarray `Dataset`: named N-d variables over
  * shared labeled axes (`time`, `lat`, `lon`) plus free-form attrs
  * (reference `tests/conftest.py:35-52`). The Spark-native shape is a
  * long/tidy DataFrame: one row per (time, cell) with one column per
  * variable, per-variable attrs carried as `StructField.metadata`
  * (SURVEY.md §1.4). All operators in `graft.metrics` are written against a
  * [[SeriesSpec]] so the same operator runs on any table with a timestamp
  * column, grouping keys ("cells"), and a numeric value column.
  */
final case class SeriesSpec(
    tsCol: String,
    keyCols: Seq[String],
    valueCol: String
) {
  /** Fail fast with the reference's error contract (`ValueError` naming
    * the missing dimension and what exists, e.g.
    * `metrics/temporal.py:63-64`): every metric operator validates before
    * building a plan, so the user sees the schema problem, not an
    * unresolved-column analysis error three operators deep.
    */
  def validate(df: DataFrame): Unit = {
    val have = df.columns.toSet
    val need = (tsCol +: valueCol +: keyCols)
    val missing = need.filterNot(have)
    require(missing.isEmpty,
      s"Columns not found: ${missing.mkString(", ")}. " +
        s"Available: ${df.columns.sorted.mkString(", ")}")
  }
}

/** Variable metadata ≅ xarray per-variable attrs
  * (reference `tests/conftest.py:55-64`: units/long_name/standard_name;
  * `metrics/temporal.py:42` stamps cell_methods).
  */
final case class VarAttrs(
    units: Option[String] = None,
    longName: Option[String] = None,
    standardName: Option[String] = None,
    cellMethods: Option[String] = None
) {
  def toMetadata: Metadata = {
    val b = new MetadataBuilder()
    units.foreach(b.putString("units", _))
    longName.foreach(b.putString("long_name", _))
    standardName.foreach(b.putString("standard_name", _))
    cellMethods.foreach(b.putString("cell_methods", _))
    b.build()
  }
}

/** CF-style provenance stamping for metric outputs — the Spark analog of
  * the reference's `out[var].attrs[...] = ...` on every resample/anomaly/
  * percentile result (`metrics/temporal.py:42`, `metrics/anomalies.py:
  * 56-63,128-133`, `metrics/percentiles.py:72-75,109-110`): attrs live in
  * `StructField.metadata`, survive parquet roundtrips (Spark persists
  * them in the footer schema), and never touch row values — so a CF-aware
  * consumer keeps `cell_methods`/`units` provenance while the DuckDB
  * value oracles are untouched.
  */
object CfAttrs {
  /** Current metadata of a column (empty when absent) — the base an
    * operator copies before overriding, like the reference's
    * `original_attrs = ds[var].attrs.copy()`.
    */
  def of(df: DataFrame, name: String): Metadata =
    df.schema.fields.find(_.name == name).map(_.metadata).getOrElse(Metadata.empty)

  /** Stamp `colName` with `base` plus the builder's additions. */
  def stamp(df: DataFrame, colName: String, base: Metadata = Metadata.empty)(
      fn: MetadataBuilder => Unit): DataFrame = {
    val b = new MetadataBuilder().withMetadata(base)
    fn(b)
    df.withMetadata(colName, b.build())
  }
}

object GridSchema {
  /** Canonical dense-grid schema (SURVEY.md §1.4): the idiomatic Spark
    * translation of the reference's (time, lat, lon) data cube.
    */
  val canonical: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = true)
  ))

  /** Attach attrs to a variable column without touching data — the Spark
    * analog of `ds[var].attrs.update(...)`.
    */
  def withAttrs(df: DataFrame, col: String, attrs: VarAttrs): DataFrame =
    df.withMetadata(col, attrs.toMetadata)
}

/** Loader for the driver-provided test tables (TESTDATA.md). Centralizes
  * `spark.read.parquet` so every query benefits from the same scan options.
  */
object Tables {
  /** JVM-wide schema cache: the driver tables are immutable fixtures, so
    * re-inferring the schema — a single-task footer-read Spark job — on
    * every `spark.read.parquet` is a fixed per-query driver cost for zero
    * information. Supplying the cached schema skips that job entirely
    * (the first read per (path, mtime) still infers). The directory's
    * mtime rides in the key so a rewritten dataset at the same path
    * (files added/replaced bump the dir mtime) re-infers instead of
    * silently reading renamed columns as null.
    */
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), StructType]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val key = (path, new java.io.File(path).lastModified())
    val schema = schemaCache.getOrElseUpdate(key,
      spark.read.parquet(path).schema)
    normalizeTs(spark.read.schema(schema).parquet(path))
  }

  /** The events table stores TIMESTAMP(NANOS) which Spark reads as long
    * nanos under spark.sql.legacy.parquet.nanosAsLong; the generated values
    * are µs-aligned, so converting to TimestampType (µs) is lossless.
    * Shared by the batch loader and the streaming reader (same physical
    * schema must normalize identically on both paths).
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.name == "ts" && f.dataType == LongType =>
        // integer DIV, not `/`: double division rounds half the sub-µs
        // tails up one µs, diverging from DuckDB's truncating ns→µs cast
        d.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case (d, f) if f.name == "ts" && f.dataType == TimestampNTZType =>
        // some parquet writers mark the column isAdjustedToUTC=false, which
        // Spark surfaces as TIMESTAMP_NTZ — a type `withWatermark` rejects
        // (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). The NTZ→TIMESTAMP cast is
        // only lossless when the session tz is UTC (entry points pin it);
        // a non-UTC caller must fail loudly here, not silently shift every
        // ts by its zone offset.
        val tz = d.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"Tables.normalizeTs: TIMESTAMP_NTZ reinterpretation requires " +
            s"spark.sql.session.timeZone=UTC, got '$tz'")
        d.withColumn("ts", d.col("ts").cast(TimestampType))
      case (d, _) => d
    }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
