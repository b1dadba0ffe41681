package graft.queries

import graft.ingest.NetCdf
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1-parity on-ramp through the oracle gate: lineitem-derived grid →
  * aggregate → written to REAL NetCDF classic files (CF time units,
  * _FillValue for absent cells) → re-read distributed by [[NetCdf.read]]
  * / [[NetCdf.readDir]] → re-aggregated — and DuckDB replays the whole
  * thing from the parquet tables, so a byte-layout bug anywhere in
  * writer or reader shows up as a hash mismatch, not just a unit-test
  * failure. (Reference: `ingest/netcdf_reader.py:13-77`, conventions
  * probe `:80-111`.)
  */
object NetCdfQ extends QueryPack {

  /** The ApiQ lineitem grid rolled up per (ship year, cell), as dense
    * slabs: per-year time axis, 18×36 lat/lon grid, fill for absent
    * cells. Bounded: ≤ 7 years × 18 lats × 36 lons = 4536 rows at ANY sf.
    */
  private val Fill = -9999.0
  private val lats = (0 until 18).map(i => i * 10.0 - 85)
  private val lons = (0 until 36).map(i => i * 10.0 - 175)

  private def gridSlabs(s: SparkSession, dir: String)
      : (Array[Int], Array[Double], Array[Double]) = {
    val cells = Tables.lineitem(s, dir)
      .withColumn("lat", (col("l_partkey") % 18 * 10 - 85).cast("double"))
      .withColumn("lon", (col("l_suppkey") % 36 * 10 - 175).cast("double"))
      .groupBy(year(col("l_shipdate")).as("ship_year"), col("lat"), col("lon"))
      .agg(count(lit(1)).cast("double").as("n"), avg(col("l_quantity")).as("mean_qty"))
      .collect()
    val years = cells.map(_.getInt(0)).distinct.sorted
    val yIdx = years.zipWithIndex.toMap
    val nVals = Array.fill(years.length * 18 * 36)(Fill)
    val qVals = Array.fill(years.length * 18 * 36)(Fill)
    cells.foreach { r =>
      val i = (yIdx(r.getInt(0)) * 18 + ((r.getDouble(1) + 85) / 10).round.toInt) * 36 +
        ((r.getDouble(2) + 175) / 10).round.toInt
      nVals(i) = r.getDouble(3); qVals(i) = r.getDouble(4)
    }
    (years, nVals, qVals)
  }

  private def gridDims(years: Seq[Int]) = Seq(
    NetCdf.Dim("time", years.length), NetCdf.Dim("lat", 18), NetCdf.Dim("lon", 36))

  private def gridVars(years: Seq[Int], nVals: Array[Double], qVals: Array[Double]) = Seq(
    (NetCdf.VarDef("time", Seq("time"), NetCdf.NcDouble,
      Seq("units" -> "days since 1970-01-01")),
      years.map(y => java.time.LocalDate.of(y, 1, 1).toEpochDay.toDouble).toArray),
    (NetCdf.VarDef("lat", Seq("lat"), NetCdf.NcDouble,
      Seq("units" -> "degrees_north")), lats.toArray),
    (NetCdf.VarDef("lon", Seq("lon"), NetCdf.NcDouble,
      Seq("units" -> "degrees_east")), lons.toArray),
    (NetCdf.VarDef("n", Seq("time", "lat", "lon"), NetCdf.NcDouble,
      Seq("_FillValue" -> Fill)), nVals),
    (NetCdf.VarDef("mean_qty", Seq("time", "lat", "lon"), NetCdf.NcDouble,
      Seq("_FillValue" -> Fill, "units" -> "items")), qVals))

  private val gridGatts = Seq(
    "Conventions" -> "CF-1.8", "source" -> "graft lineitem grid")

  private val ncStreamSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Write `years.length` time steps of the slabs to one .nc file. */
  private def writeGrid(path: String, years: Seq[Int],
                        nVals: Array[Double], qVals: Array[Double],
                        version: Int = 1): Unit =
    NetCdf.write(path, gridDims(years), gridVars(years, nVals, qVals),
      gridGatts, version = version)

  /** The same grid as a NetCDF-4 (HDF5) file — dimension scales,
    * DIMENSION_LIST, chunked-unfiltered data (one chunk per time step),
    * the libhdf5 layout for an unlimited time dim.
    */
  private def writeGridH5(path: String, years: Seq[Int],
                          nVals: Array[Double], qVals: Array[Double],
                          deflate: Int = 0, layoutVersion: Int = 3,
                          eaIndex: Boolean = false,
                          bt2Index: Boolean = false, bt2NodeSize: Int = 2048,
                          chunkCodec: String = "zlib"): Unit =
    graft.ingest.Hdf5.write(path, gridDims(years), gridVars(years, nVals, qVals),
      gridGatts, chunked = true, deflate = deflate,
      layoutVersion = layoutVersion, eaIndex = eaIndex,
      bt2Index = bt2Index, bt2NodeSize = bt2NodeSize,
      chunkCodec = chunkCodec)

  /** CF time back to ship_year, fills back to null — the read side both
    * queries share; output rows match the lineitem group-by oracle.
    */
  private def backToRows(df: DataFrame): DataFrame =
    round6(df.where(col("n").isNotNull)
      .select(year(col("time")).as("ship_year"), col("lat"), col("lon"),
        col("n").cast("long").as("n"), col("mean_qty")),
      "mean_qty")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_netcdf_roundtrip" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc").resolve("grid.nc").toString
      writeGrid(path, years.toSeq, nVals, qVals)
      backToRows(NetCdf.read(s, path, Seq("n", "mean_qty")))
    }),
    // The archive layout the reference ingests — ONE FILE PER YEAR —
    // read back as a single frame by readDir (each file's scan
    // independently parallel over its time axis). Same oracle as the
    // single-file roundtrip: the multi-file read must reproduce the
    // identical row set, so a slab-offset or union bug in the directory
    // path hash-mismatches.
    "q_netcdf_archive" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val base = java.nio.file.Files.createTempDirectory("graft-nc-arch")
      val slab = 18 * 36
      years.zipWithIndex.foreach { case (y, i) =>
        writeGrid(base.resolve(f"y$y%04d.nc").toString, Seq(y),
          nVals.slice(i * slab, (i + 1) * slab),
          qVals.slice(i * slab, (i + 1) * slab))
      }
      backToRows(NetCdf.readDir(s, base.toString, Seq("n", "mean_qty")))
    }),
    // STREAMING archive ingest: the same one-file-per-year archive but
    // with MIXED containers (classic / CDF-5 / NetCDF-4+deflate cycling
    // per year), consumed by NetCdf.readStream — checkpointed file-source
    // discovery + per-file flatMap decode, dispatched by signature — into
    // a memory sink, then re-aggregated. Same oracle as the batch
    // roundtrip: the stream must deliver every file exactly once with
    // batch-identical decode, whatever the container format.
    "q_stream_netcdf" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val base = java.nio.file.Files.createTempDirectory("graft-nc-stream")
      val slab = 18 * 36
      years.zipWithIndex.foreach { case (y, i) =>
        val p = base.resolve(f"y$y%04d.nc").toString
        val n1 = nVals.slice(i * slab, (i + 1) * slab)
        val q1 = qVals.slice(i * slab, (i + 1) * slab)
        i % 3 match {
          case 0 => writeGrid(p, Seq(y), n1, q1)
          case 1 => writeGrid(p, Seq(y), n1, q1, version = 5)
          case _ => writeGridH5(p, Seq(y), n1, q1, deflate = 6)
        }
      }
      val name = s"graft_stream_nc_${ncStreamSeq.incrementAndGet()}"
      val sq = NetCdf.readStream(s, base.toString, Seq("n", "mean_qty"))
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("graft-nc-stream-ck").toString)
        .start()
      try sq.processAllAvailable() finally sq.stop()
      backToRows(s.table(name))
    }),
    // The reference's LAZY open with pushdown (S2/S5): timeRange prunes
    // whole outer slices before any data byte is read, bbox masks cells —
    // including the antimeridian wrap (west 95 → east −95 keeps
    // |lon| ≥ 95 as an OR, `netcdf_reader.py:147-156`). DuckDB replays
    // the same predicates over lineitem, so a mask/pruning bug anywhere
    // hash-mismatches.
    "q_netcdf_pushdown" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc-push").resolve("grid.nc").toString
      writeGrid(path, years.toSeq, nVals, qVals)
      backToRows(NetCdf.read(s, path, Seq("n", "mean_qty"),
        timeRange = Some(("1993-01-01", "1995-12-31")),
        bbox = Some((95.0, -45.0, -95.0, 45.0))))
    }),
    // The SAME grid through the NetCDF-4/HDF5 container (from-spec reader:
    // superblock, object headers, dimension scales, DIMENSION_LIST via the
    // global heap, chunked-unfiltered B-tree index) — identical oracle to
    // the classic roundtrip, so any byte-layout bug in the HDF5 path
    // hash-mismatches against DuckDB's replay from lineitem.
    "q_netcdf4_roundtrip" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc4").resolve("grid.nc").toString
      writeGridH5(path, years.toSeq, nVals, qVals)
      backToRows(NetCdf.read(s, path, Seq("n", "mean_qty"))) // dispatches on signature
    }),
    // Open-time pushdown through the HDF5 path: pruned time slices never
    // have their CHUNKS read, bbox masks cells — same predicates and the
    // same DuckDB replay as q_netcdf_pushdown.
    "q_netcdf4_pushdown" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc4-push").resolve("grid.nc").toString
      writeGridH5(path, years.toSeq, nVals, qVals)
      backToRows(NetCdf.read(s, path, Seq("n", "mean_qty"),
        timeRange = Some(("1993-01-01", "1995-12-31")),
        bbox = Some((95.0, -45.0, -95.0, 45.0))))
    }),
    // The compressed container real netCDF-4 archives ship: every data
    // chunk runs the shuffle → deflate → fletcher32 pipeline (checksums
    // verified on read, filters applied in reverse per the B-tree key's
    // mask). Same oracle as the uncompressed roundtrip, so a defect in
    // any filter stage — transpose order, zlib framing, checksum byte
    // order — hash-mismatches against DuckDB's replay from lineitem.
    "q_netcdf4_deflate" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc4z").resolve("grid.nc").toString
      writeGridH5(path, years.toSeq, nVals, qVals, deflate = 6)
      backToRows(NetCdf.read(s, path, Seq("n", "mean_qty")))
    }),
    // The HDF5 1.10+ "latest" file format (h5py libver='latest'): version-4
    // data layout with a Fixed Array chunk index, compressed chunks, and
    // lookup3-checksummed index structures — same oracle again, so a v4
    // index-walk or checksum defect hash-mismatches.
    "q_netcdf4_latest" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc4l").resolve("grid.nc").toString
      writeGridH5(path, years.toSeq, nVals, qVals, deflate = 6, layoutVersion = 4)
      backToRows(NetCdf.read(s, path, Seq("n", "mean_qty")))
    }),
    // The hdf5plugin-era codec real modern archives adopt: every chunk
    // shuffle -> ZSTD -> fletcher32 (registered filter 32015), decoded
    // through zstd-jni off Spark's own classpath. Same oracle again.
    "q_netcdf4_zstd" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc4zs").resolve("grid.nc").toString
      writeGridH5(path, years.toSeq, nVals, qVals, deflate = 3,
        chunkCodec = "zstd")
      backToRows(NetCdf.read(s, path, Seq("n", "mean_qty")))
    }),
    // The H5Pset_szip pipeline ERA5-era archives actually carry: every
    // chunk shuffle -> szip -> fletcher32 (filter id 4), decoded by the
    // from-spec CCSDS-121 coder in Szip.scala (NN preprocessing + Rice
    // entropy options, raw HDF5 framing). Same oracle once more, so a
    // defect anywhere in the bit-level coder hash-mismatches against
    // DuckDB's replay from lineitem.
    "q_netcdf4_szip" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc4sz").resolve("grid.nc").toString
      writeGridH5(path, years.toSeq, nVals, qVals, deflate = 1,
        chunkCodec = "szip")
      backToRows(NetCdf.read(s, path, Seq("n", "mean_qty")))
    }),
    // The N-BIT filter (id 5): data vars stored as 16 significant bits
    // of each 32-bit int — counts plus a SIGNED derivative (n % 97 − 48,
    // negatives included) so the decode-side sign extension is on the
    // oracle path, not just spec-checked. Pipeline [nbit, fletcher32],
    // reduced-precision datatype message carried and honored.
    "q_netcdf4_nbit" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val dqVals = nVals.map(v =>
        if (v == Fill) Fill else (v.toLong % 97 - 48).toDouble)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc4nb").resolve("grid.nc").toString
      val vars = gridVars(years.toSeq, nVals, qVals).take(3) ++ Seq(
        (NetCdf.VarDef("n", Seq("time", "lat", "lon"), NetCdf.NcInt, Nil), nVals),
        (NetCdf.VarDef("dq", Seq("time", "lat", "lon"), NetCdf.NcInt, Nil), dqVals))
      graft.ingest.Hdf5.write(path, gridDims(years.toSeq), vars, gridGatts,
        chunked = true, deflate = 1, chunkCodec = "nbit")
      NetCdf.read(s, path, Seq("n", "dq"))
        .where(col("n") =!= Fill)
        .select(year(col("time")).as("ship_year"), col("lat"), col("lon"),
          col("n").cast("long").as("n"), col("dq").cast("int").as("dq"))
    }),
    // The SCALE+OFFSET filter (id 6), float D-scale variant: every chunk
    // stores round(v·10⁶) − min in the minimal per-chunk bit width. The
    // grid is pre-rounded to 6 decimals (the engine's round6), making
    // the lossy-by-design filter EXACT here — so the standard roundtrip
    // oracle replays it value-for-value.
    "q_netcdf4_scaleoffset" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      // java BigDecimal.valueOf + HALF_UP = Spark's round(col, 6)
      val q6 = qVals.map(v => java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc4so").resolve("grid.nc").toString
      writeGridH5(path, years.toSeq, nVals, q6, deflate = 1,
        chunkCodec = "scaleoffset")
      backToRows(NetCdf.read(s, path, Seq("n", "mean_qty")))
    }),
    // The latest-format UNLIMITED-dimension shape: version-4 layout with
    // an Extensible Array chunk index (what libhdf5 1.10+ writes for the
    // netCDF-4 time-unlimited case), compressed chunks, every EA
    // structure lookup3-checksummed — same oracle once more.
    "q_netcdf4_unlimited" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc4u").resolve("grid.nc").toString
      writeGridH5(path, years.toSeq, nVals, qVals, deflate = 6,
        layoutVersion = 4, eaIndex = true)
      backToRows(NetCdf.read(s, path, Seq("n", "mean_qty")))
    }),
    // The v2-B-tree chunk index — the remaining latest-format index
    // (libhdf5's choice for >1 unlimited dim, and what some
    // h5py libver='latest' settings emit). A 128-byte node size forces a
    // real multi-level tree over the ~7 per-year chunks, so BTIN child
    // pointers and their variable-width record counts are on the read
    // path, not just a single-leaf root. Oracle identical to every other
    // container roundtrip: DuckDB replays the grid from lineitem.
    "q_netcdf4_btree2" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc4b").resolve("grid.nc").toString
      writeGridH5(path, years.toSeq, nVals, qVals, deflate = 6,
        layoutVersion = 4, bt2Index = true, bt2NodeSize = 128)
      backToRows(NetCdf.read(s, path, Seq("n", "mean_qty")))
    }),
    // DENSE group link storage: the layout libhdf5 switches to past the
    // compact threshold (>8 links per group) — link messages as fractal-
    // heap managed objects behind a type-5 name-index v2-B-tree. The
    // reader must resolve FRHP/FHDB blocks, managed heap IDs, and the
    // hash-ordered record walk; identical oracle to the flat roundtrip.
    "q_netcdf4_dense" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc4dl").resolve("grid.nc").toString
      graft.ingest.Hdf5.write(path, gridDims(years.toSeq),
        gridVars(years.toSeq, nVals, qVals), gridGatts,
        chunked = true, deflate = 6, denseLinks = true)
      backToRows(NetCdf.read(s, path, Seq("n", "mean_qty")))
    }),
    // GROUPED NetCDF-4: the data variables live in a child group
    // ("stats/n", "stats/mean_qty") with root-level dimension scales —
    // the multi-model/product archive shape. The reader's recursive
    // symbol-table walk must surface path-qualified names and resolve
    // DIMENSION_LIST across the group boundary; identical oracle to the
    // flat roundtrip, so a walk or name-resolution bug hash-mismatches.
    "q_netcdf4_groups" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc4g").resolve("grid.nc").toString
      val grouped = gridVars(years.toSeq, nVals, qVals).map {
        case (vd, data) if vd.dimNames.length == 3 =>
          (vd.copy(name = s"stats/${vd.name}"), data)
        case other => other
      }
      graft.ingest.Hdf5.write(path, gridDims(years.toSeq), grouped,
        gridGatts, chunked = true, deflate = 6)
      backToRows(NetCdf.read(s, path, Seq("stats/n", "stats/mean_qty"))
        .withColumnsRenamed(Map("stats/n" -> "n", "stats/mean_qty" -> "mean_qty")))
    }),
    // CDF-5 (64-bit data) variant of the classic container, same oracle.
    "q_netcdf5_roundtrip" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc5").resolve("grid.nc").toString
      writeGrid(path, years.toSeq, nVals, qVals, version = 5)
      backToRows(NetCdf.read(s, path, Seq("n", "mean_qty")))
    }),
    // USER-FACING NetCDF-4 EXPORT: NetCdf.write(version = 4) — the same
    // public entry point as CDF-1/CDF-5, delegating to the from-spec HDF5
    // writer with the standard shuffle→deflate→fletcher32 encoding — then
    // read back through the engine. Same oracle as every container
    // roundtrip, so an export-side layout bug hash-mismatches.
    "q_netcdf4_export" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc4e").resolve("grid.nc4").toString
      NetCdf.write(path, gridDims(years.toSeq),
        gridVars(years.toSeq, nVals, qVals), gridGatts, version = 4)
      require(graft.ingest.Hdf5.isHdf5(path, Map.empty),
        "version=4 export must produce an HDF5 container, not classic")
      backToRows(NetCdf.read(s, path, Seq("n", "mean_qty")))
    }),
    // S6 for .nc (dataset-info probe): variables, dtypes, dim tuples,
    // value counts, units — header-only, no data read. The value counts
    // derive from the ship-year span, which DuckDB recomputes from
    // lineitem, so even the header metadata is oracle-derived, not pinned.
    "q_netcdf_info" -> ((s, dir) => {
      val (years, nVals, qVals) = gridSlabs(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc-info").resolve("grid.nc").toString
      writeGrid(path, years.toSeq, nVals, qVals)
      NetCdf.info(s, path)
        .select(col("variable"), col("dtype"), col("dims"),
          col("n_values"), col("units"))
    })
  )

  private val roundtripSql =
    """SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
      |       CAST(l_partkey % 18 * 10 - 85 AS DOUBLE) AS lat,
      |       CAST(l_suppkey % 36 * 10 - 175 AS DOUBLE) AS lon,
      |       count(*) AS n,
      |       round(avg(l_quantity), 6) AS mean_qty
      |FROM lineitem
      |GROUP BY 1, 2, 3""".stripMargin

  private val pushdownSql =
    """SELECT * FROM (
      |  SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
      |         CAST(l_partkey % 18 * 10 - 85 AS DOUBLE) AS lat,
      |         CAST(l_suppkey % 36 * 10 - 175 AS DOUBLE) AS lon,
      |         count(*) AS n,
      |         round(avg(l_quantity), 6) AS mean_qty
      |  FROM lineitem
      |  GROUP BY 1, 2, 3
      |) WHERE ship_year BETWEEN 1993 AND 1995
      |  AND lat BETWEEN -45 AND 45
      |  AND (lon >= 95 OR lon <= -95)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_netcdf_roundtrip" -> roundtripSql,
    "q_netcdf_archive" -> roundtripSql,
    "q_netcdf4_roundtrip" -> roundtripSql,
    "q_netcdf4_deflate" -> roundtripSql,
    "q_netcdf4_latest" -> roundtripSql,
    "q_netcdf4_unlimited" -> roundtripSql,
    "q_netcdf4_btree2" -> roundtripSql,
    "q_netcdf4_groups" -> roundtripSql,
    "q_netcdf4_dense" -> roundtripSql,
    "q_netcdf4_export" -> roundtripSql,
    "q_netcdf4_zstd" -> roundtripSql,
    "q_netcdf4_szip" -> roundtripSql,
    // exactness by construction: values pre-rounded to the D-scale's 6
    // decimals roundtrip bit-for-bit, so the shared replay applies
    "q_netcdf4_scaleoffset" -> roundtripSql,
    "q_netcdf4_nbit" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        |       CAST(l_partkey % 18 * 10 - 85 AS DOUBLE) AS lat,
        |       CAST(l_suppkey % 36 * 10 - 175 AS DOUBLE) AS lon,
        |       count(*) AS n,
        |       CAST(count(*) % 97 - 48 AS INTEGER) AS dq
        |FROM lineitem
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_netcdf5_roundtrip" -> roundtripSql,
    "q_stream_netcdf" -> roundtripSql,
    "q_netcdf4_pushdown" -> pushdownSql,
    "q_netcdf_pushdown" ->
      """SELECT * FROM (
        |  SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        |         CAST(l_partkey % 18 * 10 - 85 AS DOUBLE) AS lat,
        |         CAST(l_suppkey % 36 * 10 - 175 AS DOUBLE) AS lon,
        |         count(*) AS n,
        |         round(avg(l_quantity), 6) AS mean_qty
        |  FROM lineitem
        |  GROUP BY 1, 2, 3
        |) WHERE ship_year BETWEEN 1993 AND 1995
        |  AND lat BETWEEN -45 AND 45
        |  AND (lon >= 95 OR lon <= -95)""".stripMargin,
    // header metadata derived from the same grid: nyears comes from the
    // data, so DuckDB recomputes it instead of pinning
    "q_netcdf_info" ->
      """WITH y AS (
        |  SELECT count(DISTINCT year(l_shipdate)) AS nyears FROM lineitem)
        |SELECT variable, dtype, dims, n_values, units FROM (
        |  SELECT 'time' AS variable, 'double' AS dtype, 'time' AS dims,
        |         CAST(nyears AS BIGINT) AS n_values,
        |         'days since 1970-01-01' AS units FROM y
        |  UNION ALL
        |  SELECT 'lat', 'double', 'lat', 18, 'degrees_north' FROM y
        |  UNION ALL
        |  SELECT 'lon', 'double', 'lon', 36, 'degrees_east' FROM y
        |  UNION ALL
        |  SELECT 'n', 'double', 'time,lat,lon',
        |         CAST(nyears * 18 * 36 AS BIGINT), NULL FROM y
        |  UNION ALL
        |  SELECT 'mean_qty', 'double', 'time,lat,lon',
        |         CAST(nyears * 18 * 36 AS BIGINT), 'items' FROM y
        |)""".stripMargin
  )
}
