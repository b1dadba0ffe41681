package graft.queries

import graft.model.{SeriesSpec, Tables}
import graft.serve.Server
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Serving-layer queries driven through a REAL socket: each query starts
  * [[graft.serve.Server]] on an ephemeral port, issues HTTP GETs with the
  * JDK client, and rebuilds a DataFrame from the JSON the wire returned —
  * so the oracle gate covers socket → route → engine → JSON end-to-end
  * (the reference's uvicorn+FastAPI surface, `api/routes/data.py:88-127`,
  * `api/main.py:107-117`), not just the route functions.
  */
object HttpQ extends QueryPack {

  /** Same deterministic lineitem-derived grid as [[ApiQ]] so the HTTP
    * answer replays against the identical DuckDB oracle.
    */
  private def grid(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("lat", (col("l_partkey") % 18 * 10 - 85).cast("double"))
      .withColumn("lon", (col("l_suppkey") % 36 * 10 - 175).cast("double"))

  private val gridSpec = SeriesSpec("l_shipdate", Seq("lat", "lon"), "l_quantity")

  private def withServer[A](s: SparkSession, dir: String)(
      f: (Server.Running, String => HttpResponse[String]) => A): A = {
    val srv = Server.start(s, Map("lineitem_grid" -> (grid(s, dir), gridSpec)))
    val client = HttpClient.newHttpClient()
    def get(path: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${srv.port}$path")).build(),
      HttpResponse.BodyHandlers.ofString())
    try f(srv, get) finally srv.stop()
  }

  /** Extract the raw JSON text of `"field": <value>` from a JSON object,
    * where the value is an array or string. String-aware bracket matcher —
    * enough for our own response envelopes (row payloads inside are
    * Spark-serialized flat objects).
    */
  private[queries] def jsonField(body: String, field: String): String = {
    val marker = "\"" + field + "\":"
    val at = body.indexOf(marker)
    require(at >= 0, s"field '$field' not in response: ${body.take(200)}")
    var i = at + marker.length
    while (body(i) == ' ') i += 1
    body(i) match {
      case '[' =>
        var depth = 0; var inStr = false; var esc = false
        val start = i
        while ({
          val c = body(i)
          if (esc) esc = false
          else if (inStr) { if (c == '\\') esc = true else if (c == '"') inStr = false }
          else c match {
            case '"' => inStr = true
            case '[' => depth += 1
            case ']' => depth -= 1
            case _ =>
          }
          i += 1
          depth > 0
        }) ()
        body.substring(start, i)
      case '"' =>
        val sb = new StringBuilder
        i += 1
        var esc = false
        while (esc || body(i) != '"') {
          if (esc) {
            body(i) match {
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case 'r' => sb.append('\r'); case c => sb.append(c)
            }
            esc = false
          } else if (body(i) == '\\') esc = true
          else sb.append(body(i))
          i += 1
        }
        sb.toString
      case c => sys.error(s"unsupported field start '$c'")
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P4 over the wire: the monthly-mean-at-a-point flagship, but the
    // series rows come back through HTTP JSON instead of a DataFrame
    // handle. Oracle = q_point_series's SQL verbatim.
    "q_http_point_series" -> ((s, dir) => withServer(s, dir) { (_, get) =>
      val resp = get("/api/v1/data/datasets/lineitem_grid/point?lat=10.3&lon=42.7")
      require(resp.statusCode() == 200, s"expected 200, got ${resp.statusCode()}")
      val rowsJson = jsonField(resp.body(), "data")
      import s.implicits._
      val rows = s.read.json(s.createDataset(Seq(rowsJson)))
      round6(
        rows.select(to_timestamp(col("l_shipdate")).as("l_shipdate"),
            col("lat"), col("lon"), col("l_quantity"))
          .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("month"),
            col("lat"), col("lon"))
          .agg(avg(col("l_quantity")).as("mean_value"), count(lit(1)).as("n")),
        "mean_value")
    }),
    // The STAC discovery chain over the wire: landing Catalog, Collection
    // with data-derived extent, items FeatureCollection — each document
    // returned verbatim from the socket and re-derived byte-for-byte by
    // the DuckDB oracle from the same lineitem grid (stac_demo.py's API
    // surface: /, /collections/{id}, /collections/{id}/items).
    "q_http_stac" -> ((s, dir) => withServer(s, dir) { (_, get) =>
      def body(path: String): String = {
        val r = get(path)
        require(r.statusCode() == 200, s"$path: ${r.statusCode()} ${r.body()}")
        r.body()
      }
      import s.implicits._
      Seq(
        ("catalog", body("/stac")),
        ("collection", body("/stac/collections/lineitem_grid")),
        ("items", jsonField(
          body("/stac/collections/lineitem_grid/items"), "features")))
        .toDF("doc", "json")
        .withColumn("ver", when(col("doc") === "items",
            get_json_object(col("json"), "$[0].stac_version"))
          .otherwise(get_json_object(col("json"), "$.stac_version")))
    }),
    // The FastAPI error contract over the wire: 404 unknown dataset, 422
    // validation (range, missing param, half-specified reference period),
    // health 200 — each probe row carries the status AND the detail body,
    // replayed by a VALUES oracle (q_serving_caps style).
    "q_http_contract" -> ((s, dir) => withServer(s, dir) { (_, get) =>
      import s.implicits._
      def probe(name: String, path: String): (String, Int, String) = {
        val r = get(path)
        val detail =
          if (r.statusCode() == 200) "" else jsonField(r.body(), "detail")
        (name, r.statusCode(), detail)
      }
      Seq(
        probe("unknown_dataset", "/api/v1/data/datasets/nope"),
        probe("lat_out_of_range",
          "/api/v1/data/datasets/lineitem_grid/point?lat=123&lon=0"),
        probe("lon_missing",
          "/api/v1/data/datasets/lineitem_grid/point?lat=10"),
        probe("lat_not_a_number",
          "/api/v1/data/datasets/lineitem_grid/point?lat=abc&lon=0"),
        probe("half_time_range",
          "/api/v1/data/datasets/lineitem_grid/point?lat=10&lon=20&start_date=1996-01-01"),
        probe("half_reference_period",
          "/api/v1/metrics/anomaly/lineitem_grid?ref_start=1996-01-01"),
        probe("unknown_path", "/api/v2/anything"),
        probe("health", "/health"))
        .toDF("probe", "status", "detail")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_http_point_series" -> ApiQ.oracles("q_point_series"),
    // every byte of the three wire documents rebuilt from lineitem: the
    // HTTP grid's lat/lon derivation, the same %.6f / ISO-Z / floor-step
    // formatting as model/Catalog, the same fixed field order
    "q_http_stac" ->
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
        |  SELECT 'catalog' AS doc,
        |         '{"type":"Catalog","stac_version":"1.0.0","id":"graft-analytics","description":"graft-analytics STAC catalog","links":[{"rel":"child","href":"collections/lineitem_grid"}]}' AS json
        |  FROM d
        |  UNION ALL
        |  SELECT 'collection',
        |         '{"type":"Collection","stac_version":"1.0.0","id":"lineitem_grid","description":"graft-analytics dataset lineitem_grid","license":"proprietary","extent":{"spatial":{"bbox":[['
        |         || w || ',' || s || ',' || e2 || ',' || n2
        |         || ']]},"temporal":{"interval":[["' || t0 || '","' || t1
        |         || '"]]}},"keywords":["ARCO","climate","parquet"],"cube:dimensions":' || dims || '}'
        |  FROM d
        |  UNION ALL
        |  SELECT 'items',
        |         '[{"type":"Feature","stac_version":"1.0.0","id":"lineitem_grid","bbox":['
        |         || w || ',' || s || ',' || e2 || ',' || n2
        |         || '],"geometry":{"type":"Polygon","coordinates":[[['
        |         || w || ',' || s || '],[' || e2 || ',' || s || '],[' || e2 || ',' || n2
        |         || '],[' || w || ',' || n2 || '],[' || w || ',' || s
        |         || ']]]},"properties":{"title":"ARCO dataset: lineitem_grid","start_datetime":"'
        |         || t0 || '","end_datetime":"' || t1 || '","cube:dimensions":' || dims
        |         || ',"cube:variables":{"l_quantity":{"type":"data","dimensions":["time","lat","lon"],"unit":"1"}},"graft:format":"parquet","graft:compression":"zstd"},"assets":{"data":{"href":"graft://datasets/lineitem_grid","type":"application/x-parquet","roles":["data"]},"metadata":{"href":"graft://datasets/lineitem_grid/_metadata","type":"application/json","roles":["metadata"]}},"collection":"lineitem_grid"}]'
        |  FROM d)
        |SELECT doc, json,
        |       CASE WHEN doc = 'items'
        |            THEN json_extract_string(json, '$[0].stac_version')
        |            ELSE json_extract_string(json, '$.stac_version') END AS ver
        |FROM docs""".stripMargin,
    "q_http_contract" ->
      """SELECT * FROM (VALUES
        |  ('unknown_dataset', 404, 'Dataset not found: nope'),
        |  ('lat_out_of_range', 422, 'lat must be in [-90, 90], got 123.0'),
        |  ('lon_missing', 422, 'lon is required'),
        |  ('lat_not_a_number', 422, 'lat must be a number, got ''abc'''),
        |  ('half_time_range', 422, 'start_date and end_date must be given together'),
        |  ('half_reference_period', 422, 'ref_start and ref_end must be given together'),
        |  ('unknown_path', 404, 'Not found'),
        |  ('health', 200, '')
        |) AS t(probe, status, detail)""".stripMargin
  )
}
