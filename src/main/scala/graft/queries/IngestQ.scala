package graft.queries

import graft.functions.TimeFns
import graft.ingest.{BBox, GridSink, GridSource, LayoutPlanner, ZOrder}
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2/S5/S6, P1-P3, S7-S12, W2, F8 bound to the driver tables. */
object IngestQ extends QueryPack {

  /** One temp root per JVM, removed by a shutdown hook — repeated
    * Verify/test runs no longer accumulate orphan stores in /tmp.
    */
  private lazy val tmpRoot: java.nio.file.Path = graft.util.Tmp.root("graft_store")

  /** Memoized stores: each (session UUID, sfDir, tag) is written ONCE and
    * shared by every query that reads it back — q_roundtrip / q_store_info /
    * q_rechunk drive three read paths over two writes instead of writing a
    * fresh store per invocation. Keyed by `sessionUUID`, not the session
    * object, so stopped sessions stay GC-able.
    */
  private val stores =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), String]

  /** S7/S8 — plan a Timeseries layout for a lineitem slice and write it.
    * Drives planner + sink through the driver gate: the read-back queries
    * below fail if the write path drops/dups rows or mangles types.
    */
  private def writeTempStore(s: SparkSession, dir: String): String =
    stores.getOrElseUpdate((graft.util.Sessions.id(s), dir, "base"), {
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate", "l_quantity")
      val store = java.nio.file.Files.createTempDirectory(tmpRoot, "base")
        .resolve("lineitem").toString
      val layout = LayoutPlanner.plan(li.schema, LayoutPlanner.Timeseries,
        cellCols = Seq("l_returnflag"), tsCol = "l_shipdate")
      GridSink.writeGrid(li, store, layout)
      store
    })

  /** S10 — rechunk the Timeseries store to the Balanced layout (range
    * repartition on (cell, ts) + sort) and persist the result; written with
    * a plain sink so the partitioning under test is the one [[GridSink
    * .rechunk]] produced, not a second repartition inside writeGrid.
    */
  private def rechunkStore(s: SparkSession, dir: String): String =
    stores.getOrElseUpdate((graft.util.Sessions.id(s), dir, "rechunk"), {
      val src = GridSink.openStore(s, writeTempStore(s, dir))
      val layout = LayoutPlanner.plan(src.schema, LayoutPlanner.Balanced,
        cellCols = Seq("l_returnflag"), tsCol = "l_shipdate")
      val store = java.nio.file.Files.createTempDirectory(tmpRoot, "re")
        .resolve("lineitem").toString
      GridSink.rechunk(src, layout).write
        .option("compression", layout.compression)
        .option("maxRecordsPerFile", layout.maxRecordsPerFile)
        .parquet(store)
      store
    })

  /** +formats — the same lineitem slice written once as CSV (with header)
    * and once as ORC; q_format_roundtrip reads both back via
    * [[GridSource.readTable]] and must see identical aggregates.
    */
  private def formatStore(s: SparkSession, dir: String, fmt: String): String =
    stores.getOrElseUpdate((graft.util.Sessions.id(s), dir, fmt), {
      val src = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_returnflag", "l_shipdate", "l_quantity")
      val path = java.nio.file.Files.createTempDirectory(tmpRoot, fmt)
        .resolve("lineitem").toString
      val w = src.coalesce(4).write.format(fmt)
      (if (fmt == "csv") w.option("header", "true") else w).save(path)
      path
    })

  /** +Z-order — the lat/lon-decorated lineitem rewritten clustered on the
    * Morton key (range-partitioned + sorted by z ⇒ per-file disjoint
    * spatial tiles). One write, shared by q_zorder_bbox's read-back.
    */
  private def zorderStore(s: SparkSession, dir: String): String =
    stores.getOrElseUpdate((graft.util.Sessions.id(s), dir, "zorder"), {
      val g = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"),
          (col("l_partkey") % 180 - 89).cast("double").as("lat"),
          TimeFns.normalizeLon(col("l_extendedprice")).as("lon"))
      val path = java.nio.file.Files.createTempDirectory(tmpRoot, "zo")
        .resolve("grid").toString
      ZOrder.cluster(g, "lat", "lon", numPartitions = 8)
        .write.option("compression", "zstd")
        .option("maxRecordsPerFile", 20000L).parquet(path)
      path
    })

  /** +compaction — a deliberately fragmented store (64 tiny files) and
    * its compacted rewrite, shared by q_compact.
    */
  private def fragStore(s: SparkSession, dir: String): String =
    stores.getOrElseUpdate((graft.util.Sessions.id(s), dir, "frag"), {
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_returnflag", "l_shipdate", "l_quantity")
      val path = java.nio.file.Files.createTempDirectory(tmpRoot, "frag")
        .resolve("lineitem").toString
      li.repartition(64).write.parquet(path)
      path
    })

  private def compactedStore(s: SparkSession, dir: String): String =
    stores.getOrElseUpdate((graft.util.Sessions.id(s), dir, "compacted"), {
      val dest = java.nio.file.Files.createTempDirectory(tmpRoot, "cmp")
        .resolve("lineitem").toString
      GridSink.compact(s, fragStore(s, dir), dest, targetFileMB = 16,
        sortCols = Seq("l_shipdate"))
      dest
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2/P1/P2 — projection + time-range + value predicate, all pushed to
    // the parquet scan.
    "q_scan_pushdown" -> ((s, dir) =>
      GridSource.readGrid(s, s"$dir/lineitem.parquet",
          variables = Seq("l_orderkey", "l_linenumber", "l_quantity"),
          timeRange = Some(("1996-01-01", "1996-12-31")),
          tsCol = "l_shipdate")
        .where(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_shipdate").cast("date").as("ship_date"))),
    // S5/F8 — longitude normalization + antimeridian bbox as OR predicate.
    // A synthetic lon is derived from l_extendedprice to exercise the wrap.
    "q_antimeridian" -> ((s, dir) => {
      val withLon = Tables.lineitem(s, dir)
        .withColumn("lat", (col("l_partkey") % 180 - 89).cast("double"))
        .withColumn("lon", TimeFns.normalizeLon(col("l_extendedprice")))
      round6(
        GridSource.applyBBox(withLon, BBox(west = 170, south = -60, east = -170, north = 60))
          .select(col("l_orderkey"), col("l_linenumber"), col("lat"), col("lon")),
        "lon")
    }),
    // S6 — one-pass dataset summary.
    "q_dataset_info" -> ((s, dir) =>
      round6(
        GridSource.datasetInfo(Tables.lineitem(s, dir), "l_shipdate", "l_quantity")
          .withColumn("ts_min", col("ts_min").cast("date"))
          .withColumn("ts_max", col("ts_max").cast("date")),
        "value_mean")),
    // S7-S11 — layout plan → write → open: the aggregate over the
    // read-back store must equal the same aggregate over the source.
    "q_roundtrip" -> ((s, dir) => {
      val back = GridSink.openStore(s, writeTempStore(s, dir))
      round6(
        back.groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 6).as("sum_qty"),
            min(col("l_shipdate")).cast("date").as("first_ship"),
            max(col("l_shipdate")).cast("date").as("last_ship"),
            avg(col("l_quantity")).as("avg_qty")),
        "avg_qty")
    }),
    // S12 — store introspection: exact row count plus structural
    // invariants as booleans the oracle mirrors as literals.
    "q_store_info" -> ((s, dir) => {
      val si = GridSink.storeInfo(s, writeTempStore(s, dir))
      import s.implicits._
      Seq((si.nRows, si.nFiles > 0, si.totalBytes > 0,
          si.schemaDdl.contains("l_shipdate TIMESTAMP")))
        .toDF("n_rows", "has_files", "has_bytes", "has_ts_column")
    }),
    // S3/S4 — schema probes: the expected answers are knowable a priori
    // from each table's schema (name conventions, then dtype fallback), so
    // the literal oracle is an independent expectation, not an engine echo.
    "q_detect_schema" -> ((s, dir) => {
      import s.implicits._
      def probe(name: String, schema: org.apache.spark.sql.types.StructType) = {
        val (la, lo) = GridSource.detectLatLonColumns(schema)
        (name, GridSource.detectTimeColumn(schema).getOrElse(""),
          la.getOrElse(""), lo.getOrElse(""))
      }
      Seq(
        probe("lineitem", Tables.lineitem(s, dir).schema),
        probe("events", Tables.events(s, dir).schema),
        probe("grid", graft.bench.DataGen.smallGrid(s).schema))
        .toDF("table_name", "ts_col", "lat_col", "lon_col")
    }),
    // S10 — the rechunked (Balanced-layout) store must carry exactly the
    // same data as the source: a different aggregate shape than q_roundtrip
    // (yearly, with a distinct count) so the two read paths aren't one test.
    "q_rechunk" -> ((s, dir) => {
      val back = GridSink.openStore(s, rechunkStore(s, dir))
      round6(
        back.groupBy(year(col("l_shipdate")).as("year"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 6).as("sum_qty"),
            countDistinct(col("l_returnflag")).as("n_flags"),
            min(col("l_orderkey")).as("min_order"),
            max(col("l_orderkey")).as("max_order")),
        "sum_qty")
    }),
    // +formats — CSV and ORC read paths: write the same slice in both
    // formats, read back through readTable (explicit schema for CSV —
    // header+string parsing; ORC self-describing), and aggregate. A
    // format layer that mangles types/headers/timestamps fails here.
    "q_format_roundtrip" -> ((s, dir) => {
      val schema = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_returnflag", "l_shipdate", "l_quantity").schema
      def summarize(df: DataFrame, fmt: String): DataFrame =
        df.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 6).as("sum_qty"),
            min(col("l_shipdate")).cast("date").as("first_ship"))
          .withColumn("fmt", lit(fmt))
      summarize(GridSource.readTable(s, formatStore(s, dir, "csv"), "csv",
          Some(schema)), "csv")
        .unionByName(
          summarize(GridSource.readTable(s, formatStore(s, dir, "orc"), "orc"),
            "orc"))
    }),
    // S13/S14 — the synthetic generator itself, driver-checked: the
    // deterministic twin replaces randn/rand with md5 hash draws keyed on
    // integer grid indices, so DuckDB replays the whole generation —
    // grid cross-join, lat gradient, seasonal cycle, Box-Muller noise,
    // inverse-CDF exponential — and must land on the same 12 monthly
    // aggregates. (Generator queries ignore sfDir by design: the source
    // IS the generator.)
    "q_datagen" -> ((s, _) =>
      round6(
        graft.bench.DataGen.deterministicGrid(s)
          .groupBy(month(col("ts")).as("month"))
          .agg(
            count(lit(1)).as("n"),
            avg(col("temperature")).as("mean_temp"),
            avg(col("precipitation")).as("mean_precip")),
        "mean_temp", "mean_precip")),
    // W2 — mean time step between distinct timestamps (here: 1 day).
    "q_time_resolution" -> ((s, dir) =>
      round6(
        GridSource.resolution(Tables.lineitem(s, dir),
          TimeFns.epochSeconds(col("l_shipdate"))),
        "resolution")),
    // +compaction — the 64-file fragmented store compacted to the byte
    // target: fewer files, identical rows. The aggregate runs over the
    // COMPACTED store; the booleans assert the file count dropped and no
    // row was lost/duplicated.
    "q_compact" -> ((s, dir) => {
      val before = GridSink.storeInfo(s, fragStore(s, dir))
      val after = GridSink.storeInfo(s, compactedStore(s, dir))
      round6(
        GridSink.openStore(s, compactedStore(s, dir))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 6).as("sum_qty"))
          .withColumn("fewer_files", lit(after.nFiles < before.nFiles))
          .withColumn("rows_kept", lit(after.nRows == before.nRows)),
        "sum_qty")
    }),
    // +Z-order — bbox aggregate over the Morton-clustered rewrite. The
    // bbox predicate runs on lat/lon (pushed to the scan; the clustering
    // is what makes those min-max stats selective) and the result must be
    // byte-identical to the same bbox over the unclustered source — the
    // layout is invisible to semantics, only the files touched change.
    "q_zorder_bbox" -> ((s, dir) =>
      round6(
        GridSource.readGrid(s, zorderStore(s, dir))
          .where(col("lat").between(-30, 30) && col("lon").between(20, 80))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 6).as("sum_qty"),
            countDistinct(col("l_orderkey")).as("n_orders")),
        "sum_qty"))
  )

  def oracles: Map[String, String] = Map(
    "q_scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |  AND l_quantity >= 45""".stripMargin,
    "q_antimeridian" ->
      """WITH g AS (
        |  SELECT l_orderkey, l_linenumber,
        |         CAST(l_partkey % 180 - 89 AS DOUBLE) AS lat,
        |         fmod(fmod(l_extendedprice + 180, 360) + 360, 360) - 180 AS lon
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, lat, round(lon, 6) AS lon
        |FROM g
        |WHERE lat BETWEEN -60 AND 60 AND (lon >= 170 OR lon <= -170)""".stripMargin,
    "q_dataset_info" ->
      """SELECT count(*) AS n_rows,
        |       count(DISTINCT l_shipdate) AS n_timesteps,
        |       CAST(min(l_shipdate) AS DATE) AS ts_min,
        |       CAST(max(l_shipdate) AS DATE) AS ts_max,
        |       min(l_quantity) AS value_min,
        |       max(l_quantity) AS value_max,
        |       round(avg(l_quantity), 6) AS value_mean
        |FROM lineitem""".stripMargin,
    "q_roundtrip" ->
      """SELECT l_returnflag,
        |       count(*) AS n,
        |       round(sum(l_quantity), 6) AS sum_qty,
        |       CAST(min(l_shipdate) AS DATE) AS first_ship,
        |       CAST(max(l_shipdate) AS DATE) AS last_ship,
        |       round(avg(l_quantity), 6) AS avg_qty
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_store_info" ->
      """SELECT count(*) AS n_rows, true AS has_files, true AS has_bytes,
        |       true AS has_ts_column
        |FROM lineitem""".stripMargin,
    // lineitem: no conventional time name -> dtype fallback finds the first
    // timestamp column (l_shipdate); no lat/lon. events: name match on ts.
    // grid: full conventional schema.
    "q_detect_schema" ->
      """SELECT * FROM (VALUES
        |  ('lineitem', 'l_shipdate', '', ''),
        |  ('events', 'ts', '', ''),
        |  ('grid', 'ts', 'lat', 'lon'))
        |AS t(table_name, ts_col, lat_col, lon_col)""".stripMargin,
    "q_rechunk" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS year,
        |       count(*) AS n,
        |       round(sum(l_quantity), 6) AS sum_qty,
        |       count(DISTINCT l_returnflag) AS n_flags,
        |       min(l_orderkey) AS min_order,
        |       max(l_orderkey) AS max_order
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_format_roundtrip" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         round(sum(l_quantity), 6) AS sum_qty,
        |         CAST(min(l_shipdate) AS DATE) AS first_ship
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n, sum_qty, first_ship, 'csv' AS fmt FROM s
        |UNION ALL
        |SELECT l_returnflag, n, sum_qty, first_ship, 'orc' AS fmt FROM s""".stripMargin,
    // Full replay of DataGen.deterministicGrid: same md5 keys, same
    // Box-Muller, same association (2·(sqrt·cos) parenthesized — float ×
    // is not associative).
    "q_datagen" ->
      """WITH days AS (SELECT unnest(range(0, 366)) AS d),
        |     lats AS (SELECT unnest(range(0, 19)) AS i),
        |     lons AS (SELECT unnest(range(0, 36)) AS j),
        |     g AS (
        |  SELECT DATE '2020-01-01' + CAST(d AS INTEGER) AS dt,
        |         i * 10.0 - 90.0 AS lat, d, i, j
        |  FROM days, lats, lons),
        |     u AS (
        |  SELECT dt, lat,
        |    (CAST(concat('0x', substr(md5('graft-gen:t1:' || d || ':' || i || ':' || j), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0 AS u1,
        |    (CAST(concat('0x', substr(md5('graft-gen:t2:' || d || ':' || i || ':' || j), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0 AS u2,
        |    (CAST(concat('0x', substr(md5('graft-gen:p:' || d || ':' || i || ':' || j), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0 AS u3,
        |    dayofyear(DATE '2020-01-01' + CAST(d AS INTEGER)) AS doy
        |  FROM g),
        |     v AS (
        |  SELECT month(dt) AS month,
        |    288.0 - 40.0 * abs(lat) / 90.0
        |      + 10.0 * sin(2 * pi() * (doy - 80) / 365.0)
        |      + 2.0 * (sqrt(-2.0 * ln(u1)) * cos(2 * pi() * u2)) AS temperature,
        |    -0.001 * ln(1.0 - u3) AS precipitation
        |  FROM u)
        |SELECT CAST(month AS INTEGER) AS month, count(*) AS n,
        |       round(avg(temperature), 6) AS mean_temp,
        |       round(avg(precipitation), 6) AS mean_precip
        |FROM v GROUP BY 1""".stripMargin,
    // mean consecutive diff telescopes to (max-min)/(n-1) — mirrors the
    // single-aggregate form in GridSource.resolution
    "q_time_resolution" ->
      """WITH c AS (SELECT DISTINCT epoch(l_shipdate) AS coord FROM lineitem)
        |SELECT round((max(coord) - min(coord)) / (count(*) - 1), 6) AS resolution
        |FROM c""".stripMargin,
    // compaction is lossless: aggregate over the compacted store equals
    // the raw table; the structural booleans are mirrored as literals
    "q_compact" ->
      """SELECT l_returnflag, count(*) AS n,
        |       round(sum(l_quantity), 6) AS sum_qty,
        |       true AS fewer_files, true AS rows_kept
        |FROM lineitem GROUP BY 1""".stripMargin,
    // the z-ordered rewrite must be semantically invisible: same bbox
    // aggregate as over the raw table (same lat/lon derivation as
    // q_antimeridian)
    "q_zorder_bbox" ->
      """WITH g AS (
        |  SELECT l_returnflag, l_quantity, l_orderkey,
        |         CAST(l_partkey % 180 - 89 AS DOUBLE) AS lat,
        |         fmod(fmod(l_extendedprice + 180, 360) + 360, 360) - 180 AS lon
        |  FROM lineitem)
        |SELECT l_returnflag, count(*) AS n,
        |       round(sum(l_quantity), 6) AS sum_qty,
        |       count(DISTINCT l_orderkey) AS n_orders
        |FROM g
        |WHERE lat BETWEEN -30 AND 30 AND lon BETWEEN 20 AND 80
        |GROUP BY 1""".stripMargin
  )
}
