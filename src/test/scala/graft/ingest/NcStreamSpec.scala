package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming archive ingest: NetCdf.readStream watches a directory and
  * decodes each newly-landed file (classic / CDF-5 / HDF5, by signature)
  * exactly once, unioned with the batch semantics of readDir.
  */
class NcStreamSpec extends SparkSpec {
  import NetCdf.{Dim, VarDef, NcDouble}

  private def gridFile(base: String, name: String, day: Double,
                       vals: Array[Double], container: String,
                       nlat: Int = 2): String = {
    val path = s"$base/$name"
    val dims = Seq(Dim("time", 1), Dim("lat", nlat), Dim("lon", 2))
    val vars = Seq(
      (VarDef("time", Seq("time"), NcDouble,
        Seq("units" -> "days since 2000-01-01")), Array(day)),
      (VarDef("lat", Seq("lat"), NcDouble),
        Array.tabulate(nlat)(i => -30.0 + 60.0 * i / math.max(1, nlat - 1))),
      (VarDef("lon", Seq("lon"), NcDouble), Array(-90.0, 90.0)),
      (VarDef("t2m", Seq("time", "lat", "lon"), NcDouble), vals))
    container match {
      case "classic" => NetCdf.write(path, dims, vars)
      case "cdf5"    => NetCdf.write(path, dims, vars, version = 5)
      case "hdf5z"   => Hdf5.write(path, dims, vars, chunked = true, deflate = 6)
    }
    path
  }

  test("stream ≡ batch over a mixed archive; new files discovered incrementally") {
    val base = tmpDir()
    gridFile(base, "a.nc", 0.0, Array(1, 2, 3, 4).map(_.toDouble), "classic")
    gridFile(base, "b.nc", 1.0, Array(5, 6, 7, 8).map(_.toDouble), "hdf5z")
    val stream = NetCdf.readStream(spark, base, Seq("t2m"))
    assert(stream.isStreaming)
    val sq = stream.writeStream.format("memory").queryName("nc_stream_mixed")
      .outputMode("append").option("checkpointLocation", tmpDir()).start()
    try {
      sq.processAllAvailable()
      val got = spark.table("nc_stream_mixed")
      val batch = NetCdf.readDir(spark, base, Seq("t2m"))
      assert(got.orderBy("time", "lat", "lon").collect().toSeq ==
        batch.orderBy("time", "lat", "lon").collect().toSeq)
      // a CDF-5 file lands after the stream started: picked up by the next
      // trigger, previously-processed files NOT re-emitted (file-log
      // exactly-once)
      gridFile(base, "c.nc", 2.0, Array(9, 10, 11, 12).map(_.toDouble), "cdf5")
      sq.processAllAvailable()
      val after = spark.table("nc_stream_mixed")
      assert(after.count() == 12)
      assert(after.agg(sum("t2m")).head().getDouble(0) == (1 to 12).sum.toDouble)
    } finally sq.stop()
  }

  test("per-file pushdown prunes streamed rows like the batch reader") {
    val base = tmpDir()
    gridFile(base, "a.nc", 0.0, Array(1, 2, 3, 4).map(_.toDouble), "classic")
    gridFile(base, "b.nc", 40.0, Array(5, 6, 7, 8).map(_.toDouble), "hdf5z")
    val stream = NetCdf.readStream(spark, base, Seq("t2m"),
      timeRange = Some(("2000-01-01", "2000-01-31")),
      bbox = Some((-180.0, -90.0, 0.0, 90.0))) // western hemisphere only
    val sq = stream.writeStream.format("memory").queryName("nc_stream_pushdown")
      .outputMode("append").option("checkpointLocation", tmpDir()).start()
    try {
      sq.processAllAvailable()
      val got = spark.table("nc_stream_pushdown")
      // b.nc is outside the time range entirely; a.nc keeps lon=-90 only
      assert(got.count() == 2)
      assert(got.agg(sum("t2m")).head().getDouble(0) == 1.0 + 3.0)
    } finally sq.stop()
  }

  test("a schema-divergent file fails loudly instead of mis-binding") {
    val base = tmpDir()
    gridFile(base, "a.nc", 0.0, Array(1, 2, 3, 4).map(_.toDouble), "classic")
    val sq = NetCdf.readStream(spark, base, Seq("t2m"))
      .writeStream.format("memory").queryName("nc_stream_diverge")
      .outputMode("append").option("checkpointLocation", tmpDir()).start()
    try {
      sq.processAllAvailable()
      // a finer grid with the SAME columns unions fine (readDir parity)...
      gridFile(base, "ok.nc", 1.0, Array.fill(6)(1.0), "classic", nlat = 3)
      sq.processAllAvailable()
      assert(spark.table("nc_stream_diverge").count() == 10)
      // ...but a different column STRUCTURE (time axis without CF units →
      // double, not timestamp) must fail loudly
      NetCdf.write(s"$base/d.nc",
        dims = Seq(Dim("time", 1), Dim("lat", 2), Dim("lon", 2)),
        vars = Seq(
          (VarDef("time", Seq("time"), NcDouble), Array(2.0)),
          (VarDef("lat", Seq("lat"), NcDouble), Array(-30.0, 30.0)),
          (VarDef("lon", Seq("lon"), NcDouble), Array(-90.0, 90.0)),
          (VarDef("t2m", Seq("time", "lat", "lon"), NcDouble),
            Array.fill(4)(1.0))))
      val e = intercept[Exception] { sq.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] = Option(t).toSeq
        .flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("differs from the archive schema")))
    } finally sq.stop()
  }

  test("an initially-empty archive needs an explicit schema sample") {
    val base = tmpDir()
    val e = intercept[Exception] { NetCdf.readStream(spark, base, Seq("t2m")) }
    assert(e.getMessage.contains("pass sampleFile explicitly"))
    // with a sample from elsewhere the stream starts empty and fills later
    val sampleDir = tmpDir()
    val sample = gridFile(sampleDir, "s.nc", 0.0,
      Array(0, 0, 0, 0).map(_.toDouble), "classic")
    val sq = NetCdf.readStream(spark, base, Seq("t2m"), sampleFile = Some(sample))
      .writeStream.format("memory").queryName("nc_stream_empty")
      .outputMode("append").option("checkpointLocation", tmpDir()).start()
    try {
      sq.processAllAvailable()
      assert(spark.table("nc_stream_empty").count() == 0)
      gridFile(base, "a.nc", 1.0, Array(1, 2, 3, 4).map(_.toDouble), "hdf5z")
      sq.processAllAvailable()
      assert(spark.table("nc_stream_empty").count() == 4)
    } finally sq.stop()
  }
}
