package graft.serve

import graft.SparkSpec
import graft.bench.DataGen
import graft.model.SeriesSpec

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** End-to-end HTTP tests: a real socket, a real client, real Spark jobs
  * behind the handlers — the uvicorn-level coverage the reference gets
  * from its FastAPI test client.
  */
class ServerSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val grid = DataGen.sampleGrid(spark, days = 120)
  private val spec = SeriesSpec("ts", Seq("lat", "lon"), "temperature")
  private lazy val registry = Map("era5_sample" -> (grid, spec))

  private lazy val srv = Server.start(spark, registry)
  private val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = {
    srv.stop() // releases the socket AND shuts down the handler pool
    super.afterAll()
  }

  private def get(path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${srv.port}$path")).build(),
      HttpResponse.BodyHandlers.ofString())

  test("banner, info, and health endpoints answer 200 JSON") {
    val root = get("/")
    assert(root.statusCode() == 200)
    assert(root.headers().firstValue("Content-Type").get == "application/json")
    assert(root.body().contains("\"endpoints\""))
    assert(get("/api/v1/info").body().contains("\"max_points_per_request\":10000"))
    assert(get("/health").body().contains("\"status\":\"healthy\""))
    assert(get("/health/live").body().contains("\"alive\""))
    val ready = get("/health/ready")
    assert(ready.statusCode() == 200)
    assert(ready.body().contains("\"execution\":true"))
  }

  test("dataset catalog lists and describes; unknown id is a 404 detail") {
    val list = get("/api/v1/data/datasets")
    assert(list.statusCode() == 200)
    assert(list.body().contains("\"count\":1") &&
      list.body().contains("\"era5_sample\""))
    val one = get("/api/v1/data/datasets/era5_sample")
    assert(one.body().contains("\"variable\":\"temperature\""))
    val missing = get("/api/v1/data/datasets/nope")
    assert(missing.statusCode() == 404)
    assert(missing.body() == "{\"detail\":\"Dataset not found: nope\"}")
  }

  test("STAC chain: catalog links collections, collection carries extent, items wrap the feature") {
    val root = get("/stac")
    assert(root.statusCode() == 200)
    assert(root.body().contains("\"type\":\"Catalog\"") &&
      root.body().contains("\"href\":\"collections/era5_sample\""))
    val list = get("/stac/collections")
    assert(list.statusCode() == 200 && list.body().contains("\"count\":1"))
    val coll = get("/stac/collections/era5_sample")
    assert(coll.statusCode() == 200)
    assert(coll.body().contains("\"type\":\"Collection\"") &&
      coll.body().contains("\"cube:dimensions\"") &&
      coll.body().contains("\"temporal\":{\"interval\""))
    val items = get("/stac/collections/era5_sample/items")
    assert(items.statusCode() == 200)
    assert(items.body().contains("\"type\":\"FeatureCollection\"") &&
      items.body().contains("\"stac_version\":\"1.0.0\"") &&
      items.body().contains("\"cube:variables\"") &&
      items.body().contains("\"collection\":\"era5_sample\""))
    // a dataset without a lat/lon grid gets a 422, unknown id a 404
    assert(get("/stac/collections/nope").statusCode() == 404)
  }

  test("point route returns a capped ordered series; bad lat is a 422") {
    val ok = get("/api/v1/data/datasets/era5_sample/point?lat=12.0&lon=33.0")
    assert(ok.statusCode() == 200)
    // 120 daily rows at the snapped cell, Spark-serialized
    assert("\"temperature\":".r.findAllIn(ok.body()).size == 120)
    val bad = get("/api/v1/data/datasets/era5_sample/point?lat=123&lon=0")
    assert(bad.statusCode() == 422)
    assert(bad.body().contains("lat must be in [-90, 90]"))
    val nonNum = get("/api/v1/data/datasets/era5_sample/point?lat=abc&lon=0")
    assert(nonNum.statusCode() == 422)
  }

  test("region and stats routes honor the bbox; missing bbox on region is 422") {
    val stats = get("/api/v1/data/datasets/era5_sample/stats" +
      "?min_lon=0&min_lat=0&max_lon=90&max_lat=45")
    assert(stats.statusCode() == 200)
    assert(stats.body().contains("\"p50\":"))
    val global = get("/api/v1/data/datasets/era5_sample/stats")
    assert(global.statusCode() == 200)
    assert(global.body().contains("\"temperature_mean\":"))
    assert(get("/api/v1/data/datasets/era5_sample/region").statusCode() == 422)
    val region = get("/api/v1/data/datasets/era5_sample/region" +
      "?min_lon=0&min_lat=0&max_lon=90&max_lat=45")
    assert(region.statusCode() == 200)
  }

  test("metric routes dispatch; invalid metric is a 422 with the allow-list") {
    val monthly = get("/api/v1/metrics/temporal/era5_sample?metric=monthly&lat=12&lon=33")
    assert(monthly.statusCode() == 200)
    assert(monthly.body().contains("\"metric\":\"monthly\""))
    val trend = get("/api/v1/metrics/trend/era5_sample")
    assert(trend.statusCode() == 200)
    val bad = get("/api/v1/metrics/temporal/era5_sample?metric=hourly")
    assert(bad.statusCode() == 422)
    assert(bad.body().contains("Allowed:"))
    assert(get("/api/v1/metrics/temporal/nope?metric=monthly").statusCode() == 404)
  }

  test("response cache serves repeat requests without recomputing") {
    val path = "/api/v1/data/datasets/era5_sample/point?lat=45.0&lon=100.0"
    val first = get(path)
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val second = get(path)
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(first.body() == second.body())
    assert(jobsBefore == jobsAfter, "cache hit must not launch Spark jobs")
  }

  test("half-specified reference period is a 422, like start/end dates") {
    val half = get("/api/v1/metrics/anomaly/era5_sample?ref_start=2020-01-01")
    assert(half.statusCode() == 422)
    assert(half.body().contains("ref_start and ref_end must be given together"))
  }

  test("a file-backed cache is shared across server instances") {
    val dir = java.nio.file.Files.createTempDirectory("graft-srv-cache")
    val a = Server.start(spark, registry,
      cacheBackend = Some(new Cache.FileBackend(dir)))
    val b = Server.start(spark, registry,
      cacheBackend = Some(new Cache.FileBackend(dir)))
    try {
      val path = "/api/v1/data/datasets/era5_sample/point?lat=-33.0&lon=18.0"
      def on(port: Int) = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).build(),
        HttpResponse.BodyHandlers.ofString())
      val first = on(a.port)
      assert(first.statusCode() == 200)
      val second = on(b.port) // different process-analog, same backing dir
      assert(second.body() == first.body())
      assert(b.cacheStats().hits == 1,
        "second server must hit the shared file cache, not recompute")
      assert(get("/api/v1/info").body().contains("in-memory-lru"),
        "default server still reports the in-process backend")
    } finally { a.stop(); b.stop() }
  }

  test("concurrent soak: parallel clients over a live cache node, no bleed") {
    // N parallel HTTP clients hammering point/stats/metric routes against
    // a server whose response cache is a LIVE CacheServer over TCP — the
    // full serving stack under concurrency. Every response must be
    // byte-identical to its single-threaded reference for ITS parameters
    // (a cross-request bleed — wrong cache key, shared mutable state in a
    // handler, protocol desync on the cache wire — shows up as one
    // client's body under another's params), and the cache must actually
    // serve repeats (hit rate > 0). Three full rounds guard against
    // order-dependent flakes.
    val node = new Cache.CacheServer(new Cache.LruBackend(ttlSeconds = 600)).start()
    val s2 = Server.start(spark, registry,
      cacheBackend = Some(new Cache.NetBackend("127.0.0.1", node.boundPort)))
    try {
      val paths = Vector(
        "/api/v1/data/datasets/era5_sample/point?lat=10.0&lon=20.0",
        "/api/v1/data/datasets/era5_sample/point?lat=-40.0&lon=150.0",
        "/api/v1/data/datasets/era5_sample/point?lat=62.0&lon=-110.0",
        "/api/v1/data/datasets/era5_sample/stats" +
          "?min_lon=0&min_lat=0&max_lon=90&max_lat=45",
        "/api/v1/data/datasets/era5_sample/stats",
        "/api/v1/metrics/temporal/era5_sample?metric=monthly&lat=12&lon=33",
        "/api/v1/metrics/trend/era5_sample",
        "/api/v1/data/datasets/era5_sample")
      def on(path: String): HttpResponse[String] = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${s2.port}$path")).build(),
        HttpResponse.BodyHandlers.ofString())
      // single-threaded reference bodies (also primes the cache)
      val expected = paths.map(p => p -> on(p).body()).toMap
      (1 to 3).foreach { round =>
        val nClients = 8
        val perClient = 12
        val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val pool = java.util.concurrent.Executors.newFixedThreadPool(nClients)
        try {
          val futures = (0 until nClients).map { c =>
            pool.submit(new Runnable {
              def run(): Unit = {
                val rnd = new scala.util.Random(round * 1000 + c)
                val cl = HttpClient.newHttpClient()
                (0 until perClient).foreach { _ =>
                  val p = paths(rnd.nextInt(paths.length))
                  try {
                    val resp = cl.send(
                      HttpRequest.newBuilder(
                        URI.create(s"http://127.0.0.1:${s2.port}$p")).build(),
                      HttpResponse.BodyHandlers.ofString())
                    if (resp.statusCode() != 200)
                      errors.add(s"$p -> ${resp.statusCode()}")
                    else if (resp.body() != expected(p))
                      errors.add(s"$p -> body drift (cross-request bleed?)")
                  } catch {
                    case e: Exception => errors.add(s"$p -> ${e.getMessage}")
                  }
                }
              }
            })
          }
          futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
        } finally pool.shutdownNow()
        assert(errors.isEmpty,
          s"round $round: ${errors.size} failures, first: ${errors.peek()}")
      }
      val st = s2.cacheStats()
      assert(st.hits > 0, s"repeats must hit the cache node, got $st")
      assert(!st.degraded, "the TCP backend must stay healthy under load")
    } finally { s2.stop(); node.stop() }
  }

  test("unknown path 404s; non-GET is a 405") {
    assert(get("/api/v2/whatever").statusCode() == 404)
    val post = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${srv.port}/health"))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(post.statusCode() == 405)
  }
}
