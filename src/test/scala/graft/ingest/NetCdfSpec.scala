package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NetCdfSpec extends SparkSpec {
  import NetCdf._

  test("cfTimeUnits parses the CF time vocabulary") {
    assert(cfTimeUnits("days since 1970-01-01").contains((86400.0, 0L)))
    assert(cfTimeUnits("hours since 1970-01-01 00:00:00").contains((3600.0, 0L)))
    val d = cfTimeUnits("seconds since 2020-01-02T00:00:00Z")
    assert(d.contains((1.0, 1577923200000000L)))
    assert(cfTimeUnits("kelvin").isEmpty)
    assert(cfTimeUnits("Days since 1996-01-01").isDefined, "case-insensitive")
  }

  test("CF epochs with UTC offsets and single-digit fields parse correctly") {
    // negative offset (common in real CF files): -6:00 means 06:00 UTC
    assert(parseEpochMicros("1970-01-01 00:00:00-6:00").contains(6L * 3600 * 1000000L))
    assert(parseEpochMicros("1970-01-01 00:00:00+05:30").contains(-(5L * 3600 + 30 * 60) * 1000000L))
    assert(parseEpochMicros("1970-01-01T01:00:00-0100").contains(2L * 3600 * 1000000L))
    // single-digit date/time components (xarray accepts these)
    assert(parseEpochMicros("1970-1-1 0:0:0").contains(0L))
    assert(parseEpochMicros("1970-01-01 00:00:30.5").contains(30500000L))
    assert(parseEpochMicros("not a date").isEmpty)
    // cfTimeUnits no longer degrades offset epochs to undecoded doubles
    assert(cfTimeUnits("hours since 1990-01-01 00:00:00-6:00")
      .contains((3600.0, (java.time.Instant.parse("1990-01-01T06:00:00Z").getEpochSecond) * 1000000L)))
  }

  test("pushdown predicates that bind to no dimension fail loudly") {
    val path = tmpDir() + "/nobind.nc"
    // no CF time units, dims named a/b (not lat/lon)
    write(path,
      dims = Seq(Dim("a", 2), Dim("b", 2)),
      vars = Seq(
        (VarDef("a", Seq("a"), NcDouble), Array(0.0, 1.0)),
        (VarDef("b", Seq("b"), NcDouble), Array(0.0, 1.0)),
        (VarDef("x", Seq("a", "b"), NcDouble), Array(1.0, 2.0, 3.0, 4.0))))
    val e1 = intercept[IllegalArgumentException] {
      read(spark, path, Seq("x"), timeRange = Some(("2020-01-01", "2020-02-01")))
    }.getMessage
    assert(e1.contains("timeRange") && e1.contains("bound to no dimension"))
    val e2 = intercept[IllegalArgumentException] {
      read(spark, path, Seq("x"), bbox = Some((0.0, 0.0, 1.0, 1.0)))
    }.getMessage
    assert(e2.contains("bbox"))
  }

  test("header roundtrip: dims, coord vars, attrs, types survive") {
    val path = tmpDir() + "/h.nc"
    write(path,
      dims = Seq(Dim("time", 2), Dim("lat", 3)),
      vars = Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "days since 2020-01-01")), Array(0.0, 1.0)),
        (VarDef("lat", Seq("lat"), NcDouble), Array(-10.0, 0.0, 10.0)),
        (VarDef("t2m", Seq("time", "lat"), NcFloat,
          Seq("units" -> "K", "_FillValue" -> -9999.0f)),
          Array(1, 2, 3, 4, 5, -9999).map(_.toDouble))),
      gatts = Seq("title" -> "graft test", "Conventions" -> "CF-1.8"))
    val h = readHeader(path)
    assert(h.version == 1 && h.numRecs == 0)
    assert(h.dims == IndexedSeq(Dim("time", 2), Dim("lat", 3)))
    assert(h.gatts.find(_.name == "title").flatMap(_.str).contains("graft test"))
    val t2m = h.variable("t2m")
    assert(t2m.tpe == NcFloat)
    assert(t2m.dimIds == IndexedSeq(0, 1))
    assert(t2m.attr("units").flatMap(_.str).contains("K"))
    assert(t2m.attr("_FillValue").flatMap(_.num).contains(-9999.0))
    assert(readVarDriver(path, h, "lat").toSeq == Seq(-10.0, 0.0, 10.0))
    // info() surfaces the variable inventory
    val inf = NetCdf.info(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(inf == Map("time" -> 2L, "lat" -> 3L, "t2m" -> 6L))
  }

  test("headers past the 1 MiB probe parse (buffer grows on underflow); " +
    "genuinely truncated files reject loudly") {
    val path = tmpDir() + "/bigheader.nc"
    // a ~3 MiB global attr pushes the header far past the 1 MiB probe —
    // previously a bare BufferUnderflowException
    write(path,
      dims = Seq(Dim("x", 2)),
      vars = Seq((VarDef("v", Seq("x"), NcDouble), Array(1.0, 2.0))),
      gatts = Seq("history" -> ("h" * (3 << 20))))
    val h = readHeader(path)
    assert(h.gatts.find(_.name == "history").flatMap(_.str).exists(_.length == (3 << 20)))
    assert(readVarDriver(path, h, "v").toSeq == Seq(1.0, 2.0))
    // truncate the file mid-header: loud, named reject — not an opaque
    // underflow and not an infinite grow loop
    val all = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val tPath = tmpDir() + "/trunc.nc"
    java.nio.file.Files.write(java.nio.file.Paths.get(tPath),
      java.util.Arrays.copyOf(all, 1 << 20))
    val e = intercept[Exception] { readHeader(tPath) }
    assert(e.getMessage.contains("truncated NetCDF header"), e.getMessage)
  }

  test("distributed read: CF time decode, unpacking, fill -> null") {
    val path = tmpDir() + "/grid.nc"
    val (nt, nlat, nlon) = (4, 3, 2)
    val temps = Array.tabulate(nt * nlat * nlon)(i => 250.0 + i) // kelvin
    // pack as shorts: t = raw * 0.5 + 200, fill = -32768
    val packed = temps.map(t => (t - 200.0) / 0.5)
    packed(5) = -32768.0
    write(path,
      dims = Seq(Dim("time", nt), Dim("lat", nlat), Dim("lon", nlon)),
      vars = Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "hours since 2021-06-01")),
          Array.tabulate(nt)(_ * 6.0)),
        (VarDef("lat", Seq("lat"), NcDouble), Array(-45.0, 0.0, 45.0)),
        (VarDef("lon", Seq("lon"), NcDouble), Array(0.0, 90.0)),
        (VarDef("t2m", Seq("time", "lat", "lon"), NcShort,
          Seq("scale_factor" -> 0.5, "add_offset" -> 200.0,
            "_FillValue" -> (-32768: Short))), packed),
        (VarDef("count", Seq("time", "lat", "lon"), NcInt),
          Array.tabulate(nt * nlat * nlon)(_.toDouble))))
    val df = read(spark, path, Seq("t2m", "count"))
    assert(df.columns.toSeq == Seq("time", "lat", "lon", "t2m", "count"))
    assert(df.count() == nt * nlat * nlon)
    assert(df.schema("time").dataType.typeName == "timestamp")
    // CF time: hour offsets from the epoch in the units string
    val times = df.select(col("time")).distinct().orderBy("time")
      .collect().map(_.getTimestamp(0).toString)
    assert(times.head == "2021-06-01 00:00:00.0" && times(1) == "2021-06-01 06:00:00.0")
    // unpacking: raw * 0.5 + 200 restores kelvin, fill is null
    val row0 = df.where(col("count") === 0).head()
    assert(row0.getDouble(row0.fieldIndex("t2m")) == 250.0)
    assert(df.where(col("t2m").isNull).count() == 1)
    assert(df.where(col("count") === 5).head().isNullAt(3))
    // row-major unravel: value follows the (time, lat, lon) odometer
    val at = df.where(col("time") === lit("2021-06-01 06:00:00").cast("timestamp") &&
      col("lat") === 0.0 && col("lon") === 90.0).head()
    val flat = ((1 * nlat) + 1) * nlon + 1
    assert(at.getDouble(at.fieldIndex("t2m")) == 250.0 + flat)
  }

  test("converted parquet equals the in-memory source (the on-ramp contract)") {
    val base = tmpDir()
    val path = base + "/conv.nc"
    val n = Array.tabulate(2 * 2 * 2)(i => (i * 7 % 5) + 1.0)
    write(path,
      dims = Seq(Dim("time", 2), Dim("lat", 2), Dim("lon", 2)),
      vars = Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "days since 1996-01-01")), Array(0.0, 31.0)),
        (VarDef("lat", Seq("lat"), NcDouble), Array(-10.0, 10.0)),
        (VarDef("lon", Seq("lon"), NcDouble), Array(20.0, 40.0)),
        (VarDef("pr", Seq("time", "lat", "lon"), NcDouble), n)))
    convertToParquet(spark, path, base + "/pq", Seq("pr"))
    val back = spark.read.parquet(base + "/pq")
    val direct = read(spark, path, Seq("pr"))
    // parquet round-trips names and types (nullability widens on read)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      direct.schema.map(f => (f.name, f.dataType)))
    // aggregate equivalence, the q_monthly_mean-style check
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(month(col("time")).as("m")).agg(sum("pr").as("s"))
        .orderBy("m").collect().toSeq
    assert(agg(back) == agg(direct))
    assert(agg(back).map(_.getDouble(1)).sum == n.sum)
  }

  test("open-time pushdown: timeRange prunes slices, bbox masks cells (antimeridian OR)") {
    val path = tmpDir() + "/push.nc"
    val (nt, nlat, nlon) = (6, 4, 6)
    write(path,
      dims = Seq(Dim("time", nt), Dim("lat", nlat), Dim("lon", nlon)),
      vars = Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "days since 2022-01-01")), Array.tabulate(nt)(_ * 10.0)),
        (VarDef("lat", Seq("lat"), NcDouble), Array(-60.0, -20.0, 20.0, 60.0)),
        (VarDef("lon", Seq("lon"), NcDouble),
          Array(-150.0, -90.0, -30.0, 30.0, 90.0, 150.0)),
        (VarDef("x", Seq("time", "lat", "lon"), NcDouble),
          Array.tabulate(nt * nlat * nlon)(_.toDouble))))
    // full read filtered afterwards = pushdown read: same rows
    val full = read(spark, path, Seq("x"))
    val pushed = read(spark, path, Seq("x"),
      timeRange = Some(("2022-01-11", "2022-01-31")),         // days 10,20,30
      bbox = Some((120.0, -30.0, -120.0, 70.0)))              // lon wraps; lat -20,20,60
    val expected = full.where(
      col("time").between(lit("2022-01-11").cast("timestamp"),
        lit("2022-01-31").cast("timestamp")) &&
      col("lat").between(-30.0, 70.0) &&
      (col("lon") >= 120.0 || col("lon") <= -120.0))
    assert(pushed.count() == 3L * 3 * 2, s"got ${pushed.count()}")
    assert(pushed.orderBy("time", "lat", "lon").collect().toSeq ==
      expected.orderBy("time", "lat", "lon").collect().toSeq)
    // outer pruning is physical: only the 3 selected slices become tasks
    assert(pushed.rdd.getNumPartitions <= 3)
  }

  test("readDir unions an archive directory of monthly files") {
    // the reference's archive layout: one file per time chunk
    val base = tmpDir()
    val lats = Array(-30.0, 30.0)
    (0 until 3).foreach { m =>
      write(s"$base/y1996m$m.nc",
        dims = Seq(Dim("time", 2), Dim("lat", 2)),
        vars = Seq(
          (VarDef("time", Seq("time"), NcDouble,
            Seq("units" -> "days since 1996-01-01")),
            Array(m * 31.0, m * 31.0 + 1)),
          (VarDef("lat", Seq("lat"), NcDouble), lats),
          (VarDef("x", Seq("time", "lat"), NcDouble),
            Array.tabulate(4)(i => m * 100.0 + i))))
    }
    val df = readDir(spark, base, Seq("x"))
    assert(df.count() == 3 * 2 * 2)
    // every file contributes its own slab; totals follow the per-file fill
    val total = df.agg(sum("x")).head().getDouble(0)
    assert(total == (0 until 3).map(m => 4 * m * 100.0 + 6).sum)
    // readDir of a dir without .nc files fails loudly
    val empty = base + "/empty"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(empty))
    val err = intercept[IllegalArgumentException] {
      readDir(spark, empty, Seq("x"))
    }.getMessage
    assert(err.contains("no .nc files"))
    // the many-file FILE-GRAIN path (one decode task per file) returns the
    // identical row set as the per-file union plan — with and without
    // pushdown, which file-grain applies inside each task
    def rows(threshold: Int, tr: Option[(String, String)]) =
      readDir(spark, base, Seq("x"), timeRange = tr,
        fileGrainThreshold = threshold)
        .orderBy("time", "lat").collect().toSeq
    assert(rows(1, None) == rows(Int.MaxValue, None))
    val tr = Some(("1996-01-30", "1996-03-05"))
    assert(rows(1, tr) == rows(Int.MaxValue, tr))
    assert(rows(1, tr).nonEmpty)
  }

  test("CDF-5 roundtrip: 64-bit header fields, unsigned and 64-bit types") {
    val path = tmpDir() + "/v5.nc"
    val (nt, nlat) = (3, 4)
    write(path,
      dims = Seq(Dim("time", nt), Dim("lat", nlat)),
      vars = Seq(
        (VarDef("time", Seq("time"), NcInt64,
          Seq("units" -> "days since 2000-01-01")), Array(0.0, 1.0, 2.0)),
        (VarDef("lat", Seq("lat"), NcDouble), Array(-30.0, -10.0, 10.0, 30.0)),
        (VarDef("u8", Seq("time", "lat"), NcUByte),
          Array.tabulate(nt * nlat)(i => (i * 23 % 256).toDouble)),
        (VarDef("u16", Seq("time", "lat"), NcUShort),
          Array.tabulate(nt * nlat)(i => (i * 7001 % 65536).toDouble)),
        (VarDef("u32", Seq("time", "lat"), NcUInt,
          Seq("big" -> 3000000000L)),
          Array.tabulate(nt * nlat)(i => 4.0e9 + i)),
        (VarDef("i64", Seq("time", "lat"), NcInt64),
          Array.tabulate(nt * nlat)(i => -5.0e15 + i * 1e12))),
      gatts = Seq("Conventions" -> "CF-1.8"),
      version = 5)
    val h = readHeader(path)
    assert(h.version == 5)
    assert(h.dims == IndexedSeq(Dim("time", nt), Dim("lat", nlat)))
    assert(h.variable("u32").attr("big").flatMap(_.num).contains(3.0e9))
    assert(h.variable("time").tpe == NcInt64)
    val df = read(spark, path, Seq("u8", "u16", "u32", "i64"))
    assert(df.count() == nt * nlat)
    assert(df.schema("time").dataType.typeName == "timestamp", "CF time on int64 axis")
    val r0 = df.orderBy("time", "lat").head()
    assert(r0.getDouble(r0.fieldIndex("u8")) == 0.0)
    assert(r0.getDouble(r0.fieldIndex("u32")) == 4.0e9, "uint past Int range")
    assert(r0.getDouble(r0.fieldIndex("i64")) == -5.0e15)
    // unsigned wrap-around is NOT applied to in-range values
    val all = df.select(sum(col("u8"))).head().getDouble(0)
    assert(all == (0 until nt * nlat).map(i => i * 23 % 256).sum.toDouble)
  }

  test("CDF-5 pushdown behaves exactly like classic") {
    val path = tmpDir() + "/v5push.nc"
    val nt = 5
    write(path,
      dims = Seq(Dim("time", nt), Dim("lat", 2)),
      vars = Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "days since 2022-01-01")), Array.tabulate(nt)(_ * 10.0)),
        (VarDef("lat", Seq("lat"), NcDouble), Array(-45.0, 45.0)),
        (VarDef("x", Seq("time", "lat"), NcDouble),
          Array.tabulate(nt * 2)(_.toDouble))),
      version = 5)
    val pushed = read(spark, path, Seq("x"),
      timeRange = Some(("2022-01-11", "2022-01-31")))
    assert(pushed.count() == 3L * 2)
    assert(pushed.rdd.getNumPartitions <= 3)
  }

  test("version=4 export writes a compressed HDF5 container, round-trips") {
    // the public export entry point must not downgrade NetCDF-4 round
    // trips to classic: version=4 delegates to the from-spec HDF5 writer
    // with shuffle→deflate→fletcher32. Size parity: on a compressible
    // grid the .nc4 comes out SMALLER than the CDF-5 flat layout.
    val (nt, nlat, nlon) = (6, 12, 24)
    val n = nt * nlat * nlon
    val dims = Seq(Dim("time", nt), Dim("lat", nlat), Dim("lon", nlon))
    val vars = Seq(
      (VarDef("time", Seq("time"), NcDouble,
        Seq("units" -> "days since 2000-01-01")), Array.tabulate(nt)(_.toDouble)),
      (VarDef("lat", Seq("lat"), NcDouble), Array.tabulate(nlat)(i => i * 15.0 - 82.5)),
      (VarDef("lon", Seq("lon"), NcDouble), Array.tabulate(nlon)(i => i * 15.0 - 172.5)),
      (VarDef("t2m", Seq("time", "lat", "lon"), NcDouble,
        Seq("units" -> "K")), Array.tabulate(n)(i => 270.0 + (i % 13))))
    val base = tmpDir()
    write(s"$base/flat.nc", dims, vars, version = 5)
    write(s"$base/grid.nc4", dims, vars, version = 4)
    assert(Hdf5.isHdf5(s"$base/grid.nc4", Map.empty), "HDF5 container")
    assert(!Hdf5.isHdf5(s"$base/flat.nc", Map.empty))
    val a = read(spark, s"$base/flat.nc", Seq("t2m"))
      .orderBy("time", "lat", "lon").collect().toSeq
    val b = read(spark, s"$base/grid.nc4", Seq("t2m"))
      .orderBy("time", "lat", "lon").collect().toSeq
    assert(a == b, "export round-trips through the same read plan")
    val szFlat = new java.io.File(s"$base/flat.nc").length()
    val sz4 = new java.io.File(s"$base/grid.nc4").length()
    assert(sz4 < szFlat, s"deflate beats flat on a compressible grid ($sz4 vs $szFlat)")
    // filters really recorded (not just a chunked-uncompressed container)
    val f = Hdf5.readStructure(s"$base/grid.nc4", Map.empty)
    assert(f.datasets.find(_.name == "t2m").get.filters.map(_.id) ==
      IndexedSeq(2, 1, 3), "shuffle, deflate, fletcher32")
  }

  test("a record-dimension file reads identically (spec interleaving)") {
    // hand-build a CDF-1 file with time as the RECORD dim and two record
    // vars, exercising the interleaved-record read path our writer does
    // not produce
    val path = tmpDir() + "/rec.nc"
    val bb = java.nio.ByteBuffer.allocate(4096)
    def name(s: String): Unit = {
      bb.putInt(s.length); bb.put(s.getBytes("UTF-8"))
      (s.length % 4) match { case 0 => case r => (0 until 4 - r).foreach(_ => bb.put(0.toByte)) }
    }
    bb.put(Array[Byte]('C', 'D', 'F', 1))
    bb.putInt(3) // numrecs = 3
    bb.putInt(0x0A); bb.putInt(2)
    name("time"); bb.putInt(0) // record dim
    name("x"); bb.putInt(2)
    bb.putInt(0); bb.putInt(0) // no gatts
    bb.putInt(0x0B); bb.putInt(2) // two record vars
    val vsize = 2 * 8 // 2 doubles, already 4-aligned
    // headerLen: computed after layout — patch begins below
    val beginPatch = scala.collection.mutable.ArrayBuffer[Int]()
    name("a"); bb.putInt(2); bb.putInt(0); bb.putInt(1); bb.putInt(0); bb.putInt(0)
    bb.putInt(6); bb.putInt(vsize); beginPatch += bb.position(); bb.putInt(0)
    name("b"); bb.putInt(2); bb.putInt(0); bb.putInt(1); bb.putInt(0); bb.putInt(0)
    bb.putInt(6); bb.putInt(vsize); beginPatch += bb.position(); bb.putInt(0)
    val headerEnd = bb.position()
    bb.putInt(beginPatch(0), headerEnd)
    bb.putInt(beginPatch(1), headerEnd + vsize)
    // records interleaved: rec r = [a(r, 0..1), b(r, 0..1)]
    (0 until 3).foreach { r =>
      bb.putDouble(r * 10.0); bb.putDouble(r * 10.0 + 1)
      bb.putDouble(r * 100.0); bb.putDouble(r * 100.0 + 1)
    }
    val bytes = new Array[Byte](bb.position()); bb.rewind(); bb.get(bytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)

    val h = readHeader(path)
    assert(h.numRecs == 3 && h.dims(0).isRecord)
    assert(h.recSize == 2 * vsize, "two record vars -> summed vsizes")
    val df = read(spark, path, Seq("a", "b")).orderBy("time", "x")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (0L, 0L, 0.0, 0.0), (0L, 1L, 1.0, 1.0),
      (1L, 0L, 10.0, 100.0), (1L, 1L, 11.0, 101.0),
      (2L, 0L, 20.0, 200.0), (2L, 1L, 21.0, 201.0)))
  }
}
