package graft.ingest

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {
  import LayoutPlanner._

  test("readGrid validates missing variables with available list") {
    val e = intercept[IllegalArgumentException] {
      GridSource.readGrid(spark, s"$sfDir/lineitem.parquet",
        variables = Seq("no_such_col"), tsCol = "l_shipdate")
    }
    assert(e.getMessage.contains("no_such_col"))
    assert(e.getMessage.contains("l_quantity")) // lists what IS available
  }

  test("readGrid projection reaches the parquet scan (column pruning)") {
    val df = GridSource.readGrid(spark, s"$sfDir/lineitem.parquet",
      variables = Seq("l_quantity"), timeRange = Some(("1996-01-01", "1996-12-31")),
      tsCol = "l_shipdate")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("l_extendedprice"), "unrequested column must be pruned from scan")
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      "time-range filter must be pushed to parquet")
  }

  test("bbox: plain and antimeridian selection") {
    import spark.implicits._
    val df = Seq((-170.0, 0.0), (0.0, 0.0), (175.0, 0.0), (-10.0, 70.0))
      .toDF("lon", "lat")
    assert(GridSource.applyBBox(df, BBox(-20, -10, 10, 10)).count() == 1)
    // box crossing the antimeridian picks up both ±edges but not lon=0
    val cross = GridSource.applyBBox(df, BBox(170, -10, -160, 10))
    assert(cross.select("lon").as[Double].collect().toSet == Set(-170.0, 175.0))
  }

  test("schema probes find time and lat/lon columns by convention") {
    val s = Tables.lineitem(spark, sfDir).schema
    assert(GridSource.detectTimeColumn(s).contains("l_shipdate")) // dtype fallback
    val ev = Tables.events(spark, sfDir).schema
    assert(GridSource.detectTimeColumn(ev).contains("ts"))
    import org.apache.spark.sql.types._
    val grid = StructType(Seq(StructField("time", TimestampType),
      StructField("latitude", DoubleType), StructField("longitude", DoubleType)))
    assert(GridSource.detectTimeColumn(grid).contains("time"))
    assert(GridSource.detectLatLonColumns(grid) == (Some("latitude"), Some("longitude")))
  }

  test("layout plans match access-pattern invariants") {
    val schema = Tables.lineitem(spark, sfDir).schema
    val ts = plan(schema, Timeseries, Seq("l_returnflag"), "l_shipdate")
    assert(ts.sortWithinPartitions.last == "l_shipdate") // series contiguous in time
    assert(ts.partitionBy.isEmpty)
    val sp = plan(schema, Spatial, Seq("l_returnflag"), "l_shipdate", Some("ship_year"))
    assert(sp.partitionBy == Seq("ship_year")) // one dir per time bucket
    val ba = plan(schema, Balanced, Seq("l_returnflag"), "l_shipdate")
    assert(ba.rangePartition)
    assert(ts.maxRecordsPerFile > 1000)
  }

  test("layout planner surfaces warnings instead of clamping silently") {
    val schema = Tables.lineitem(spark, sfDir).schema
    // in-band plan with real columns: no warnings
    val ok = plan(schema, Timeseries, Seq("l_returnflag"), "l_shipdate")
    assert(ok.warnings.isEmpty, ok.warnings.mkString("; "))
    // out-of-band byte target: clamped AND surfaced (reference warns at
    // chunking.py:258-265; until round 13 this repo clamped silently)
    val tiny = plan(schema, Timeseries, Seq("l_returnflag"), "l_shipdate",
      targetFileMB = 1)
    val floor16 = plan(schema, Timeseries, Seq("l_returnflag"), "l_shipdate",
      targetFileMB = 16)
    assert(tiny.maxRecordsPerFile == floor16.maxRecordsPerFile) // still clamped
    assert(tiny.warnings.exists(_.contains("clamped to 16 MB")), tiny.warnings)
    val huge = plan(schema, Timeseries, Seq("l_returnflag"), "l_shipdate",
      targetFileMB = 4096)
    assert(huge.warnings.exists(_.contains("clamped to 1024 MB")), huge.warnings)
    // unknown plan columns: flagged, not failed (reference's unknown-dim
    // warning, chunking.py:246-255)
    val bad = plan(schema, Timeseries, Seq("no_such_cell"), "no_such_ts")
    assert(bad.warnings.count(_.contains("not in schema")) == 2, bad.warnings)
    // derived partition column: warning names the derive-before-write fix
    val derived = plan(schema, Spatial, Seq("l_returnflag"), "l_shipdate",
      Some("ship_year"))
    assert(derived.warnings.exists(_.contains("derive it before writeGrid")),
      derived.warnings)
    // Spatial without a bucket column: the every-scan-reads-everything trap
    val flat = plan(schema, Spatial, Seq("l_returnflag"), "l_shipdate")
    assert(flat.warnings.exists(_.contains("without timeBucketCol")), flat.warnings)
  }

  test("write-read roundtrip preserves data; overwrite protection works") {
    val li = Tables.lineitem(spark, sfDir)
    val layout = plan(li.schema, Timeseries, Seq("l_returnflag"), "l_shipdate")
    val out = tmpDir() + "/store"
    GridSink.writeGrid(li, out, layout)
    val back = GridSink.openStore(spark, out)
    assert(back.count() == li.count())
    assert(back.schema.map(_.name).toSet == li.schema.map(_.name).toSet)
    // checksum-style compare on a numeric column
    val a = li.agg(sum("l_extendedprice")).head.getDouble(0)
    val b = back.agg(sum("l_extendedprice")).head.getDouble(0)
    assert(math.abs(a - b) / math.abs(a) < 1e-12) // relative: sum order differs after repartition
    // second write without overwrite must fail (reference w- mode)
    intercept[Exception] { GridSink.writeGrid(li, out, layout) }
    GridSink.writeGrid(li.limit(10), out, layout, overwrite = true)
    assert(GridSink.openStore(spark, out).count() == 10)
    val info = GridSink.storeInfo(spark, out)
    assert(info.nRows == 10 && info.nFiles > 0 && info.totalBytes > 0)
  }

  test("compaction merges small files losslessly and keeps sort order") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_shipdate", "l_quantity")
    val frag = tmpDir() + "/frag"
    li.repartition(32).write.parquet(frag)
    val before = GridSink.storeInfo(spark, frag)
    assert(before.nFiles >= 32)
    val dest = tmpDir() + "/compacted"
    val after = GridSink.compact(spark, frag, dest, targetFileMB = 16,
      sortCols = Seq("l_shipdate"))
    assert(after.nFiles < before.nFiles, s"${after.nFiles} vs ${before.nFiles}")
    assert(after.nRows == before.nRows)
    val a = li.agg(sum("l_quantity")).head.getDouble(0)
    val b = GridSink.openStore(spark, dest).agg(sum("l_quantity")).head.getDouble(0)
    assert(math.abs(a - b) / math.abs(a) < 1e-12)
  }

  test("compact rejects nested src/dest in BOTH directions (a parent dest " +
    "would recursively delete the source store before the scan runs)") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity").limit(100)
    val base = tmpDir()
    val src = base + "/store"
    li.write.parquet(src)
    val up = intercept[IllegalArgumentException] {
      GridSink.compact(spark, src, base)
    }
    assert(up.getMessage.contains("contains src"))
    val down = intercept[IllegalArgumentException] {
      GridSink.compact(spark, src, src + "/compacted")
    }
    assert(down.getMessage.contains("inside src"))
    // the source store is intact after both rejects
    assert(GridSink.openStore(spark, src).count() == 100)
    // a sibling dest still works
    assert(GridSink.compact(spark, src, base + "/ok").nRows == 100)
  }

  test("readGrid rejects an unparseable timeRange bound loudly instead of " +
    "silently returning zero rows (non-ANSI cast-to-NULL)") {
    val e = intercept[RuntimeException] {
      GridSource.readGrid(spark, s"$sfDir/lineitem.parquet",
        variables = Seq("l_quantity"),
        timeRange = Some(("1996-13-45", "1996-12-31")), tsCol = "l_shipdate")
    }
    assert(e.getMessage.contains("unparseable timestamp bound"))
  }

  test("codec choices roundtrip (S9: zstd, lz4, gzip)") {
    val li = Tables.lineitem(spark, sfDir).limit(500)
    Seq("zstd", "lz4", "gzip").foreach { codec =>
      val out = tmpDir() + s"/$codec"
      val layout = plan(li.schema, Balanced, Seq("l_returnflag"), "l_shipdate")
        .copy(compression = codec)
      GridSink.writeGrid(li, out, layout)
      assert(GridSink.openStore(spark, out).count() == 500, codec)
      // parquet file-name markers: .gz.parquet / .lz4hadoop.parquet / .zstd.parquet
      val ext = codec match {
        case "gzip" => "gz"; case "lz4" => "lz4hadoop"; case c => c
      }
      val files = new java.io.File(out).listFiles.map(_.getName)
      assert(files.exists(_.contains(s".$ext.parquet")), s"$codec files: ${files.mkString(",")}")
    }
  }

  test("csv and json roundtrip through readTable") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val base = tmpDir()
    li.write.option("header", "true").csv(s"$base/csv")
    li.write.json(s"$base/json")
    val fromCsv = GridSource.readTable(spark, s"$base/csv", "csv", Some(li.schema))
    val fromJson = GridSource.readTable(spark, s"$base/json", "json", Some(li.schema))
    assert(fromCsv.count() == li.count())
    assert(fromJson.count() == li.count())
    val key = li.agg(sum("l_orderkey")).head.getLong(0)
    assert(fromCsv.agg(sum("l_orderkey")).head.getLong(0) == key)
    assert(fromJson.agg(sum("l_orderkey")).head.getLong(0) == key)
    // schema-less csv path infers types
    val inferred = GridSource.readTable(spark, s"$base/csv", "csv")
    assert(inferred.schema("l_quantity").dataType ==
      org.apache.spark.sql.types.DoubleType)
    // orc is a first-class columnar alternative
    li.write.orc(s"$base/orc")
    val fromOrc = GridSource.readTable(spark, s"$base/orc", "orc")
    assert(fromOrc.count() == li.count())
    assert(fromOrc.agg(sum("l_orderkey")).head.getLong(0) == key)
  }

  test("spatial layout writes partitioned directories") {
    val li = Tables.lineitem(spark, sfDir).withColumn("ship_year", year(col("l_shipdate")))
    val layout = plan(li.schema, Spatial, Seq("l_returnflag"), "l_shipdate", Some("ship_year"))
    val out = tmpDir() + "/spatial"
    GridSink.writeGrid(li, out, layout)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("ship_year=")))
    // partition pruning: filter on the bucket reads one directory
    val pruned = GridSink.openStore(spark, out).where(col("ship_year") === 1996)
    assert(pruned.count() ==
      li.where(col("ship_year") === 1996).count())
    // and the plan proves it: the predicate lands in PartitionFilters, so
    // non-matching directories are never opened
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("ship_year"),
      s"partition filter must prune directories:\n$p")
  }
}
