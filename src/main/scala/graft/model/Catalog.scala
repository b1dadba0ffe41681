package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    *
    * ONE aggregate per dataset — counts and the temporal extent come out
    * of the same agg, so describe plans a single subtree (no crossJoin of
    * two single-row aggregates; until round 13 the extent was a separate
    * agg glued on with a broadcast crossJoin, an extra exchange + join per
    * dataset that made a wide catalog driver-serial).
    */
  def describe(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = Tables.load(spark, dir, name)
    val tsCol = graft.ingest.GridSource.detectTimeColumn(df.schema)
    val extent = tsCol match {
      case Some(c) => Seq(
        min(col(c)).cast("date").as("ts_min"),
        max(col(c)).cast("date").as("ts_max"),
        countDistinct(col(c)).as("n_timesteps"))
      case None => Seq(
        max(lit(null).cast("date")).as("ts_min"),
        max(lit(null).cast("date")).as("ts_max"),
        max(lit(null).cast("long")).as("n_timesteps"))
    }
    df.agg(count(lit(1)).as("n_rows"), extent: _*)
      .withColumn("dataset_id", lit(name))
      .withColumn("n_columns", lit(df.schema.size))
      .withColumn("columns", lit(df.schema.fieldNames.sorted.mkString(",")))
  }

  /** Catalog over a set of datasets — the registry/discovery table. The
    * union of single-agg subtrees executes as ONE Spark action whose
    * independent per-dataset stages the scheduler runs concurrently —
    * build time stays flat as the catalog widens.
    */
  def build(spark: SparkSession, dir: String, names: Seq[String]): DataFrame =
    names.map(describe(spark, dir, _)).reduce(_.unionByName(_))
      .select(col("dataset_id"), col("n_rows"), col("n_columns"),
        col("columns"), col("ts_min"), col("ts_max"), col("n_timesteps"))

  // ---- STAC emission (reference `src/stac_demo.py`: Catalog :55-79,
  // Collection with cube:dimensions/cube:variables :82-189, Item with
  // bbox/geometry/assets :199-276). The JSON is built with EXPLICIT
  // deterministic formatting — fixed field order, %.6f numerics over
  // round(x, 6), ISO-8601 Z timestamps — rather than to_json, so an
  // external STAC client sees stable documents and the DuckDB oracle can
  // re-derive every byte from the same parquet tables. Extents, steps and
  // intervals are COMPUTED from the data in one aggregate per dataset;
  // only schema constants (variable names/units, ids, descriptions) are
  // caller-supplied — same split as the reference, which hardcodes its
  // variable table but derives extents from the store.

  private def f6(c: Column): Column = format_string("%.6f", round(c, 6))
  private def iso(c: Column): Column =
    date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")

  /** JSON string-escape for caller-supplied text (ids, descriptions,
    * units, hrefs, keywords) interpolated into the documents — a quote
    * in a unit string must not produce a malformed STAC document.
    */
  private def jstr(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `cube:dimensions` JSON over (time, lat, lon): temporal extent +
    * mean step as an ISO-8601 duration in whole seconds, spatial extents
    * + mean step per axis. (Mean step, not modal: one agg pass; at 100 TB
    * swap the three countDistincts for approx_count_distinct — the only
    * non-streaming aggregate here.)
    */
  private def cubeDimensions(): Column = concat(
    lit("""{"time":{"type":"temporal","extent":["""),
    lit("\""), iso(col("ts_min")), lit("\",\""), iso(col("ts_max")),
    lit("\"],\"step\":\"PT"),
    // floor-division on exact sub-2^53 longs: identical to DuckDB's `//`
    floor((unix_timestamp(col("ts_max")) - unix_timestamp(col("ts_min")))
      / greatest(col("n_ts") - 1, lit(1L))).cast("long"),
    lit("""S"},"lat":{"type":"spatial","axis":"y","extent":["""),
    f6(col("lat_min")), lit(","), f6(col("lat_max")),
    lit("""],"step":"""),
    f6((col("lat_max") - col("lat_min")) / greatest(col("n_lat") - 1, lit(1L))),
    lit(""","reference_system":"EPSG:4326"},"lon":{"type":"spatial","axis":"x","extent":["""),
    f6(col("lon_min")), lit(","), f6(col("lon_max")),
    lit("""],"step":"""),
    f6((col("lon_max") - col("lon_min")) / greatest(col("n_lon") - 1, lit(1L))),
    lit(""","reference_system":"EPSG:4326"}}"""))

  /** One-pass extent aggregate shared by [[stacItem]]/[[stacCollection]].
    * An EMPTY dataset rejects loudly in the same pass (the extra
    * assert_true column costs nothing): NULL extents would otherwise ride
    * through `concat` and emit a row whose whole json document is NULL —
    * a STAC publisher would push a null document with no error anywhere.
    */
  private def extentAgg(df: DataFrame, tsCol: String, latCol: String,
                        lonCol: String): DataFrame = {
    val a = df.agg(
      min(col(tsCol)).as("ts_min"), max(col(tsCol)).as("ts_max"),
      countDistinct(col(tsCol)).as("n_ts"),
      min(col(latCol)).as("lat_min"), max(col(latCol)).as("lat_max"),
      countDistinct(col(latCol)).as("n_lat"),
      min(col(lonCol)).as("lon_min"), max(col(lonCol)).as("lon_max"),
      countDistinct(col(lonCol)).as("n_lon"),
      count(lit(1)).as("n_rows"))
    // the guard rides INSIDE every extent column (a separate check column
    // would be pruned away with its side effect — the CDXJ lesson): any
    // consumer that touches an extent trips it on empty input
    def g(c: String) = coalesce(
      assert_true(col("n_rows") > 0,
        lit("STAC extent over an EMPTY dataset: no extent exists — " +
          "publish nothing rather than a null document")),
      col(c)).as(c)
    a.select(g("ts_min"), g("ts_max"), col("n_ts"),
      g("lat_min"), g("lat_max"), col("n_lat"),
      g("lon_min"), g("lon_max"), col("n_lon"))
  }

  private def varsJson(variables: Seq[(String, String)]): String =
    variables.map { case (name, unit) =>
      s""""${jstr(name)}":{"type":"data","dimensions":["time","lat","lon"],"unit":"${jstr(unit)}"}"""
    }.mkString(",")

  /** STAC Item for a spatio-temporal dataset (reference
    * `stac_demo.py:199-260`): bbox + closed polygon geometry from the
    * data's lon/lat extent, start/end datetimes, `cube:dimensions` /
    * `cube:variables`, and parquet data/metadata assets. One aggregate
    * job; returns (kind, id, json).
    */
  def stacItem(
      df: DataFrame,
      datasetId: String,
      tsCol: String,
      latCol: String,
      lonCol: String,
      variables: Seq[(String, String)],
      href: String,
      collectionId: String = "graft"
  ): DataFrame = {
    val w = f6(col("lon_min")); val s = f6(col("lat_min"))
    val e = f6(col("lon_max")); val n = f6(col("lat_max"))
    extentAgg(df, tsCol, latCol, lonCol).select(
      lit("Item").as("kind"),
      lit(datasetId).as("id"),
      concat(
        lit(s"""{"type":"Feature","stac_version":"1.0.0","id":"${jstr(datasetId)}","bbox":["""),
        w, lit(","), s, lit(","), e, lit(","), n,
        lit("""],"geometry":{"type":"Polygon","coordinates":[[["""),
        w, lit(","), s, lit("],["), e, lit(","), s, lit("],["),
        e, lit(","), n, lit("],["), w, lit(","), n, lit("],["),
        w, lit(","), s,
        lit(s"""]]]},"properties":{"title":"ARCO dataset: ${jstr(datasetId)}","start_datetime":""""),
        iso(col("ts_min")), lit("\",\"end_datetime\":\""), iso(col("ts_max")),
        lit("""","cube:dimensions":"""), cubeDimensions(),
        lit(s""","cube:variables":{${varsJson(variables)}},"graft:format":"parquet","graft:compression":"zstd"},"""),
        lit(s""""assets":{"data":{"href":"${jstr(href)}","type":"application/x-parquet","roles":["data"]},"""),
        lit(s""""metadata":{"href":"${jstr(href)}/_metadata","type":"application/json","roles":["metadata"]}},"""),
        lit(s""""collection":"${jstr(collectionId)}"}""")).as("json"))
  }

  /** STAC Collection (reference `stac_demo.py:82-189`): spatial bbox +
    * temporal interval extent derived from the data, license/keywords,
    * and the same `cube:dimensions` the items carry.
    */
  def stacCollection(
      df: DataFrame,
      collectionId: String,
      description: String,
      tsCol: String,
      latCol: String,
      lonCol: String,
      keywords: Seq[String] = Seq("ARCO", "climate", "parquet")
  ): DataFrame = {
    val kw = keywords.map(k => "\"" + jstr(k) + "\"").mkString(",")
    extentAgg(df, tsCol, latCol, lonCol).select(
      lit("Collection").as("kind"),
      lit(collectionId).as("id"),
      concat(
        lit(s"""{"type":"Collection","stac_version":"1.0.0","id":"${jstr(collectionId)}","description":"${jstr(description)}","license":"proprietary","extent":{"spatial":{"bbox":[["""),
        f6(col("lon_min")), lit(","), f6(col("lat_min")), lit(","),
        f6(col("lon_max")), lit(","), f6(col("lat_max")),
        lit("""]]},"temporal":{"interval":[["""),
        lit("\""), iso(col("ts_min")), lit("\",\""), iso(col("ts_max")),
        lit(s"""\"]]}},"keywords":[$kw],"cube:dimensions":"""),
        cubeDimensions(), lit("}")).as("json"))
  }

  /** The full Catalog → Collection → Item chain for ONE dataset in ONE
    * aggregate pass: [[stacItem]] and [[stacCollection]] each run their
    * own extent aggregate, so emitting all three documents separately
    * scans the data twice (the three-countDistinct Expand makes that the
    * dominant cost); this computes the extent once and derives every
    * document from the same row. Byte-identical output to the three
    * separate builders.
    */
  def stacBundle(
      df: DataFrame,
      datasetId: String,
      tsCol: String,
      latCol: String,
      lonCol: String,
      variables: Seq[(String, String)],
      href: String,
      collectionId: String,
      catalogId: String,
      catalogDescription: String,
      collectionDescription: String,
      keywords: Seq[String] = Seq("ARCO", "climate", "parquet")
  ): DataFrame = {
    val catalogJson =
      s"""{"type":"Catalog","stac_version":"1.0.0","id":"${jstr(catalogId)}","description":"${jstr(catalogDescription)}","links":[{"rel":"child","href":"collections/${jstr(collectionId)}"}]}"""
    val kw = keywords.map(k => "\"" + jstr(k) + "\"").mkString(",")
    val w = f6(col("lon_min")); val s = f6(col("lat_min"))
    val e = f6(col("lon_max")); val n = f6(col("lat_max"))
    val collectionJson = concat(
      lit(s"""{"type":"Collection","stac_version":"1.0.0","id":"${jstr(collectionId)}","description":"${jstr(collectionDescription)}","license":"proprietary","extent":{"spatial":{"bbox":[["""),
      w, lit(","), s, lit(","), e, lit(","), n,
      lit("""]]},"temporal":{"interval":[["""),
      lit("\""), iso(col("ts_min")), lit("\",\""), iso(col("ts_max")),
      lit(s"""\"]]}},"keywords":[$kw],"cube:dimensions":"""),
      cubeDimensions(), lit("}"))
    val itemJson = concat(
      lit(s"""{"type":"Feature","stac_version":"1.0.0","id":"${jstr(datasetId)}","bbox":["""),
      w, lit(","), s, lit(","), e, lit(","), n,
      lit("""],"geometry":{"type":"Polygon","coordinates":[[["""),
      w, lit(","), s, lit("],["), e, lit(","), s, lit("],["),
      e, lit(","), n, lit("],["), w, lit(","), n, lit("],["),
      w, lit(","), s,
      lit(s"""]]]},"properties":{"title":"ARCO dataset: ${jstr(datasetId)}","start_datetime":""""),
      iso(col("ts_min")), lit("\",\"end_datetime\":\""), iso(col("ts_max")),
      lit("""","cube:dimensions":"""), cubeDimensions(),
      lit(s""","cube:variables":{${varsJson(variables)}},"graft:format":"parquet","graft:compression":"zstd"},"""),
      lit(s""""assets":{"data":{"href":"${jstr(href)}","type":"application/x-parquet","roles":["data"]},"""),
      lit(s""""metadata":{"href":"${jstr(href)}/_metadata","type":"application/json","roles":["metadata"]}},"""),
      lit(s""""collection":"${jstr(collectionId)}"}"""))
    extentAgg(df, tsCol, latCol, lonCol)
      .select(explode(array(
        struct(lit("Catalog").as("kind"), lit(catalogId).as("id"),
          lit(catalogJson).as("json")),
        struct(lit("Collection").as("kind"), lit(collectionId).as("id"),
          collectionJson.as("json")),
        struct(lit("Item").as("kind"), lit(datasetId).as("id"),
          itemJson.as("json")))).as("doc"))
      .select(col("doc.kind").as("kind"), col("doc.id").as("id"),
        col("doc.json").as("json"))
  }

  /** Root STAC Catalog document with child links per collection
    * (reference `stac_demo.py:55-79`). Pure metadata — no Spark job.
    */
  def stacCatalog(
      spark: SparkSession,
      catalogId: String,
      description: String,
      collectionIds: Seq[String]
  ): DataFrame = {
    val links = collectionIds.map(c =>
      s"""{"rel":"child","href":"collections/${jstr(c)}"}""").mkString(",")
    spark.range(1).select(
      lit("Catalog").as("kind"),
      lit(catalogId).as("id"),
      lit(s"""{"type":"Catalog","stac_version":"1.0.0","id":"${jstr(catalogId)}","description":"${jstr(description)}","links":[$links]}""").as("json"))
  }
}
