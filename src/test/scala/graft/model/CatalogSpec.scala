package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Discovery catalog + STAC emission (reference `api/routes/data.py`
  * registry, `stac_demo.py` Catalog/Collection/Item).
  */
class CatalogSpec extends SparkSpec {

  private def grid = Tables.lineitem(spark, sfDir).select(
    col("l_shipdate").as("ts"),
    (col("l_partkey") % 180 - 89).cast("double").as("lat"),
    graft.functions.TimeFns.normalizeLon(col("l_extendedprice")).as("lon"),
    col("l_quantity"))

  test("catalog build is one union of single-agg subtrees (no crossJoin)") {
    val cat = Catalog.build(spark, sfDir, Seq("lineitem", "orders", "documents"))
    val rows = cat.collect()
    assert(rows.length == 3)
    val li = rows.find(_.getAs[String]("dataset_id") == "lineitem").get
    assert(li.getAs[Long]("n_rows") > 0 && li.getAs[Long]("n_timesteps") > 0)
    // documents has no time column: extent stays typed null
    val doc = rows.find(_.getAs[String]("dataset_id") == "documents").get
    assert(doc.isNullAt(doc.fieldIndex("ts_min")) &&
      doc.isNullAt(doc.fieldIndex("n_timesteps")))
    // single-agg describe: no join anywhere in the plan (the pre-r13 form
    // glued the extent on with a broadcast crossJoin per dataset)
    val p = cat.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"catalog build must not plan joins:\n$p")
  }

  test("STAC item: valid document, data-derived bbox and temporal extent") {
    val row = Catalog.stacItem(grid, "g1", "ts", "lat", "lon",
      Seq("l_quantity" -> "1"), href = "graft://stores/g1").head()
    assert(row.getAs[String]("kind") == "Item" && row.getAs[String]("id") == "g1")
    val json = row.getAs[String]("json")
    // parse back through Spark's JSON reader: well-formedness + fields
    import spark.implicits._
    val parsed = spark.read.json(Seq(json).toDS)
    val r = parsed.select(
      col("type"), col("stac_version"), col("collection"),
      element_at(col("bbox"), 1).as("west"),
      element_at(col("bbox"), 4).as("north"),
      col("properties.start_datetime"), col("properties.end_datetime")).head()
    assert(r.getString(0) == "Feature" && r.getString(1) == "1.0.0")
    assert(r.getString(2) == "graft")
    // lat = l_partkey % 180 - 89 ∈ [-89, 90]; lon normalized to [-180, 180)
    assert(r.getDouble(3) >= -180.0 && r.getDouble(4) <= 90.0)
    assert(r.getString(5) <= r.getString(6)) // ISO-Z strings order lexically
    // cube:dimensions carries all three dims with types
    val dims = parsed.select(col("properties.`cube:dimensions`.time.type"),
      col("properties.`cube:dimensions`.lat.axis"),
      col("properties.`cube:dimensions`.lon.axis")).head()
    assert(dims.getString(0) == "temporal" && dims.getString(1) == "y" &&
      dims.getString(2) == "x")
    // geometry is a CLOSED polygon ring: first point == last point
    val ring = parsed.select(element_at(element_at(col("geometry.coordinates"), 1), 1),
      element_at(element_at(col("geometry.coordinates"), 1), 5)).head()
    assert(ring.get(0) == ring.get(1), "polygon ring must close")
  }

  test("STAC over an EMPTY dataset rejects loudly — never a null document") {
    val empty = grid.where(org.apache.spark.sql.functions.lit(false))
    val e = intercept[Exception] {
      Catalog.stacItem(empty, "g1", "ts", "lat", "lon",
        variables = Seq("value" -> "K"), href = "graft://x").collect()
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("EMPTY dataset"), s"got: ${chain(e)}")
  }

  test("STAC builders escape caller-supplied strings (quotes stay valid JSON)") {
    val row = Catalog.stacItem(grid, """g"2\""", "ts", "lat", "lon",
      Seq("q" -> """inch (")"""), href = "graft://x").head()
    val json = row.getAs[String]("json")
    import spark.implicits._
    val parsed = spark.read.json(Seq(json).toDS)
    assert(!parsed.columns.contains("_corrupt_record"),
      s"quoted id/unit must stay valid JSON:\n$json")
    assert(parsed.select(col("id")).head().getString(0) == """g"2\""")
    assert(parsed.select(col("properties.`cube:variables`.q.unit")).head()
      .getString(0) == """inch (")""")
  }

  test("STAC collection + catalog chain links up") {
    val coll = Catalog.stacCollection(grid, "c1", "test grids", "ts", "lat", "lon")
      .head().getAs[String]("json")
    import spark.implicits._
    val c = spark.read.json(Seq(coll).toDS)
    val e = c.select(col("type"), col("license"),
      size(element_at(col("extent.spatial.bbox"), 1)),
      element_at(element_at(col("extent.temporal.interval"), 1), 1)).head()
    assert(e.getString(0) == "Collection" && e.getString(1) == "proprietary")
    assert(e.getInt(2) == 4) // [w, s, e, n]
    assert(e.getString(3).endsWith("Z"))
    val cat = Catalog.stacCatalog(spark, "root", "root catalog", Seq("c1", "c2"))
      .head().getAs[String]("json")
    val k = spark.read.json(Seq(cat).toDS)
      .select(col("type"), element_at(col("links"), 1).getField("href"),
        size(col("links"))).head()
    assert(k.getString(0) == "Catalog")
    assert(k.getString(1) == "collections/c1" && k.getInt(2) == 2)
  }
}
