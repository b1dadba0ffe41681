package graft.queries

import graft.model.{Catalog, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-discovery catalog over the driver tables. */
object CatalogQ extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_catalog" -> ((s, dir) =>
      Catalog.build(s, dir, Seq("lineitem", "orders", "events", "documents"))),
    // STAC emission (reference stac_demo.py): the full Catalog →
    // Collection → Item chain over the lineitem-derived grid, every
    // extent/step/interval computed from the data. The `ver` column
    // get_json_object-parses the emitted document back (well-formedness
    // through a real JSON parser); the oracle re-derives every byte in
    // DuckDB and replays the extraction with json_extract_string.
    "q_stac_item" -> ((s, dir) => {
      // the canonical 18×36 lineitem grid (same derivation as NetCdfQ /
      // HttpQ): a uniform 10° raster, so the emitted cube:dimensions
      // steps are the real grid spacing — and the extent aggregate's
      // distinct counts stay tiny (36 lons, not 600k price-derived
      // doubles)
      val grid = Tables.lineitem(s, dir).select(
        col("l_shipdate").as("ts"),
        (col("l_partkey") % 18 * 10 - 85).cast("double").as("lat"),
        (col("l_suppkey") % 36 * 10 - 175).cast("double").as("lon"),
        col("l_quantity"))
      Catalog.stacBundle(grid, "lineitem_grid", "ts", "lat", "lon",
          variables = Seq("l_quantity" -> "1"),
          href = "graft://stores/lineitem_grid", collectionId = "graft-grids",
          catalogId = "graft", catalogDescription = "graft dataset catalog",
          collectionDescription = "Grid datasets derived from the driver tables")
        .withColumn("ver", get_json_object(col("json"), "$.stac_version"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_catalog" ->
      """SELECT 'lineitem' AS dataset_id, count(*) AS n_rows, 11 AS n_columns,
        |  'l_discount,l_extendedprice,l_linenumber,l_linestatus,l_orderkey,l_partkey,l_quantity,l_returnflag,l_shipdate,l_suppkey,l_tax'
        |    AS columns,
        |  CAST(min(l_shipdate) AS DATE) AS ts_min,
        |  CAST(max(l_shipdate) AS DATE) AS ts_max,
        |  count(DISTINCT l_shipdate) AS n_timesteps
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders', count(*), 6,
        |  'o_custkey,o_orderdate,o_orderkey,o_orderpriority,o_orderstatus,o_totalprice',
        |  CAST(min(o_orderdate) AS DATE), CAST(max(o_orderdate) AS DATE),
        |  count(DISTINCT o_orderdate)
        |FROM orders
        |UNION ALL
        |SELECT 'events', count(*), 6,
        |  'event_id,event_type,props,ts,user_id,value',
        |  CAST(min(ts) AS DATE), CAST(max(ts) AS DATE),
        |  count(DISTINCT CAST(ts AS TIMESTAMP))
        |FROM events
        |UNION ALL
        |SELECT 'documents', count(*), 5,
        |  'doc_id,lang,n_chars,source,text',
        |  NULL, NULL, NULL
        |FROM documents""".stripMargin,
    // Byte-for-byte re-derivation of the emitted STAC documents: the same
    // extent aggregate over the same derived grid, the same %.6f / ISO-Z /
    // floor-division formatting, the same fixed field order — then the
    // same stac_version extraction through DuckDB's JSON parser.
    "q_stac_item" ->
      """WITH g AS (
        |  SELECT l_shipdate AS ts,
        |         CAST(l_partkey % 18 * 10 - 85 AS DOUBLE) AS lat,
        |         CAST(l_suppkey % 36 * 10 - 175 AS DOUBLE) AS lon
        |  FROM lineitem),
        |e AS (
        |  SELECT min(ts) AS ts_min, max(ts) AS ts_max, count(DISTINCT ts) AS n_ts,
        |         min(lat) AS lat_min, max(lat) AS lat_max, count(DISTINCT lat) AS n_lat,
        |         min(lon) AS lon_min, max(lon) AS lon_max, count(DISTINCT lon) AS n_lon
        |  FROM g),
        |f AS (
        |  SELECT printf('%.6f', round(lon_min, 6)) AS w,
        |         printf('%.6f', round(lat_min, 6)) AS s,
        |         printf('%.6f', round(lon_max, 6)) AS e2,
        |         printf('%.6f', round(lat_max, 6)) AS n2,
        |         strftime(ts_min, '%Y-%m-%dT%H:%M:%SZ') AS t0,
        |         strftime(ts_max, '%Y-%m-%dT%H:%M:%SZ') AS t1,
        |         CAST(floor((epoch(ts_max) - epoch(ts_min)) / greatest(n_ts - 1, 1)) AS BIGINT) AS step_s,
        |         printf('%.6f', round((lat_max - lat_min) / greatest(n_lat - 1, 1), 6)) AS lat_step,
        |         printf('%.6f', round((lon_max - lon_min) / greatest(n_lon - 1, 1), 6)) AS lon_step
        |  FROM e),
        |d AS (
        |  SELECT *, '{"time":{"type":"temporal","extent":["' || t0 || '","' || t1
        |    || '"],"step":"PT' || step_s || 'S"},"lat":{"type":"spatial","axis":"y","extent":['
        |    || s || ',' || n2 || '],"step":' || lat_step
        |    || ',"reference_system":"EPSG:4326"},"lon":{"type":"spatial","axis":"x","extent":['
        |    || w || ',' || e2 || '],"step":' || lon_step
        |    || ',"reference_system":"EPSG:4326"}}' AS dims
        |  FROM f),
        |docs AS (
        |  SELECT 'Catalog' AS kind, 'graft' AS id,
        |         '{"type":"Catalog","stac_version":"1.0.0","id":"graft","description":"graft dataset catalog","links":[{"rel":"child","href":"collections/graft-grids"}]}' AS json
        |  FROM d
        |  UNION ALL
        |  SELECT 'Collection', 'graft-grids',
        |         '{"type":"Collection","stac_version":"1.0.0","id":"graft-grids","description":"Grid datasets derived from the driver tables","license":"proprietary","extent":{"spatial":{"bbox":[['
        |         || w || ',' || s || ',' || e2 || ',' || n2
        |         || ']]},"temporal":{"interval":[["' || t0 || '","' || t1
        |         || '"]]}},"keywords":["ARCO","climate","parquet"],"cube:dimensions":' || dims || '}'
        |  FROM d
        |  UNION ALL
        |  SELECT 'Item', 'lineitem_grid',
        |         '{"type":"Feature","stac_version":"1.0.0","id":"lineitem_grid","bbox":['
        |         || w || ',' || s || ',' || e2 || ',' || n2
        |         || '],"geometry":{"type":"Polygon","coordinates":[[['
        |         || w || ',' || s || '],[' || e2 || ',' || s || '],[' || e2 || ',' || n2
        |         || '],[' || w || ',' || n2 || '],[' || w || ',' || s
        |         || ']]]},"properties":{"title":"ARCO dataset: lineitem_grid","start_datetime":"'
        |         || t0 || '","end_datetime":"' || t1 || '","cube:dimensions":' || dims
        |         || ',"cube:variables":{"l_quantity":{"type":"data","dimensions":["time","lat","lon"],"unit":"1"}},"graft:format":"parquet","graft:compression":"zstd"},"assets":{"data":{"href":"graft://stores/lineitem_grid","type":"application/x-parquet","roles":["data"]},"metadata":{"href":"graft://stores/lineitem_grid/_metadata","type":"application/json","roles":["metadata"]}},"collection":"graft-grids"}'
        |  FROM d)
        |SELECT kind, id, json, json_extract_string(json, '$.stac_version') AS ver
        |FROM docs""".stripMargin
  )
}
