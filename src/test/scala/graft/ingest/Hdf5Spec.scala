package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Hdf5Spec extends SparkSpec {
  import NetCdf.{Dim, VarDef, NcDouble, NcFloat, NcShort, NcInt}

  private def chainMsg(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")

  private def writeGrid(path: String, chunked: Boolean, deflate: Int = 0,
                        layoutVersion: Int = 3, faPageBits: Int = 0,
                        eaIndex: Boolean = false,
                        implicitIndex: Boolean = false,
                        bt2Index: Boolean = false,
                        bt2NodeSize: Int = 2048,
                        chunkCodec: String = "zlib",
                        headerVersion: Int = 1): Unit = {
    val (nt, nlat, nlon) = (4, 3, 2)
    val temps = Array.tabulate(nt * nlat * nlon)(i => 250.0 + i)
    val packed = temps.map(t => (t - 200.0) / 0.5)
    packed(5) = -32768.0
    Hdf5.write(path,
      dims = Seq(Dim("time", nt), Dim("lat", nlat), Dim("lon", nlon)),
      vars = Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "hours since 2021-06-01")), Array.tabulate(nt)(_ * 6.0)),
        (VarDef("lat", Seq("lat"), NcDouble,
          Seq("units" -> "degrees_north")), Array(-45.0, 0.0, 45.0)),
        (VarDef("lon", Seq("lon"), NcDouble), Array(0.0, 90.0)),
        (VarDef("t2m", Seq("time", "lat", "lon"), NcShort,
          Seq("scale_factor" -> 0.5, "add_offset" -> 200.0,
            "_FillValue" -> -32768.0)), packed),
        (VarDef("count", Seq("time", "lat", "lon"), NcInt),
          Array.tabulate(nt * nlat * nlon)(_.toDouble))),
      gatts = Seq("Conventions" -> "CF-1.8", "title" -> "graft h5 test"),
      chunked = chunked, deflate = deflate,
      layoutVersion = layoutVersion, faPageBits = faPageBits,
      eaIndex = eaIndex, implicitIndex = implicitIndex,
      bt2Index = bt2Index, bt2NodeSize = bt2NodeSize,
      chunkCodec = chunkCodec, headerVersion = headerVersion)
  }

  test("structure parse: signature, dim scales, DIMENSION_LIST, attrs") {
    val path = tmpDir() + "/s.h5"
    writeGrid(path, chunked = false)
    assert(Hdf5.isHdf5(path, Map.empty))
    val f = Hdf5.readStructure(path, Map.empty)
    assert(f.datasets.map(_.name).sorted ==
      IndexedSeq("count", "lat", "lon", "t2m", "time"))
    val t2m = f.datasets.find(_.name == "t2m").get
    assert(t2m.dims == IndexedSeq(4, 3, 2))
    assert(t2m.dtype.cls == 0 && t2m.dtype.size == 2 && t2m.dtype.signed)
    assert(t2m.attrNum("scale_factor").contains(0.5))
    assert(t2m.attrNum("_FillValue").contains(-32768.0))
    val lat = f.datasets.find(_.name == "lat").get
    assert(lat.isDimScale)
    assert(lat.attrStr("units").contains("degrees_north"))
    // DIMENSION_LIST refs resolve to the dim-scale header addresses
    val byAddr = f.datasets.map(d => d.addr -> d.name).toMap
    assert(t2m.dimRefs.get.map(byAddr) == IndexedSeq("time", "lat", "lon"))
  }

  test("distributed read (contiguous): CF time, unpacking, fill -> null") {
    val path = tmpDir() + "/c.h5"
    writeGrid(path, chunked = false)
    val df = Hdf5.read(spark, path, Seq("t2m", "count"))
    assert(df.columns.toSeq == Seq("time", "lat", "lon", "t2m", "count"))
    assert(df.count() == 24)
    assert(df.schema("time").dataType.typeName == "timestamp")
    val times = df.select(col("time")).distinct().orderBy("time")
      .collect().map(_.getTimestamp(0).toString)
    assert(times.head == "2021-06-01 00:00:00.0" && times(1) == "2021-06-01 06:00:00.0")
    val row0 = df.where(col("count") === 0).head()
    assert(row0.getDouble(row0.fieldIndex("t2m")) == 250.0)
    assert(df.where(col("t2m").isNull).count() == 1)
    assert(df.where(col("count") === 5).head().isNullAt(3))
    // row-major unravel matches the classic reader's odometer
    val at = df.where(col("time") === lit("2021-06-01 06:00:00").cast("timestamp") &&
      col("lat") === 0.0 && col("lon") === 90.0).head()
    val flat = ((1 * 3) + 1) * 2 + 1
    assert(at.getDouble(at.fieldIndex("t2m")) == 250.0 + flat)
  }

  test("chunked-unfiltered layout reads identically to contiguous") {
    val base = tmpDir()
    writeGrid(base + "/a.h5", chunked = false)
    writeGrid(base + "/b.h5", chunked = true)
    val a = Hdf5.read(spark, base + "/a.h5", Seq("t2m", "count"))
      .orderBy("time", "lat", "lon").collect().toSeq
    val b = Hdf5.read(spark, base + "/b.h5", Seq("t2m", "count"))
      .orderBy("time", "lat", "lon").collect().toSeq
    assert(a == b)
    // the chunk index really is a B-tree: structure sees one chunk/slice
    val f = Hdf5.readStructure(base + "/b.h5", Map.empty)
    f.datasets.find(_.name == "t2m").get.layout match {
      case Hdf5.Chunked(cdims, chunks) =>
        assert(cdims == IndexedSeq(1, 3, 2))
        assert(chunks.length == 4)
        assert(chunks.map(_.offsets.head).sorted == IndexedSeq(0L, 1L, 2L, 3L))
      case other => fail(s"expected chunked layout, got $other")
    }
  }

  test("pushdown: timeRange prunes slices, bbox masks cells") {
    val path = tmpDir() + "/p.h5"
    writeGrid(path, chunked = true)
    val pushed = Hdf5.read(spark, path, Seq("count"),
      timeRange = Some(("2021-06-01 05:00:00", "2021-06-01 13:00:00")), // hours 6, 12
      bbox = Some((-10.0, -50.0, 100.0, 10.0))) // lat -45, 0; lon 0, 90
    assert(pushed.count() == 2L * 2 * 2)
    assert(pushed.rdd.getNumPartitions <= 2, "outer pruning is physical")
    val full = Hdf5.read(spark, path, Seq("count"))
    val expected = full.where(
      col("time").between(lit("2021-06-01 05:00:00").cast("timestamp"),
        lit("2021-06-01 13:00:00").cast("timestamp")) &&
        col("lat").between(-50.0, 10.0) && col("lon").between(-10.0, 100.0))
    assert(pushed.orderBy("time", "lat", "lon").collect().toSeq ==
      expected.orderBy("time", "lat", "lon").collect().toSeq)
  }

  test("deflate+shuffle+fletcher32 chunks read identically to unfiltered") {
    val base = tmpDir()
    writeGrid(base + "/plain.h5", chunked = true)
    writeGrid(base + "/z.h5", chunked = true, deflate = 6)
    val a = Hdf5.read(spark, base + "/plain.h5", Seq("t2m", "count"))
      .orderBy("time", "lat", "lon").collect().toSeq
    val z = Hdf5.read(spark, base + "/z.h5", Seq("t2m", "count"))
      .orderBy("time", "lat", "lon").collect().toSeq
    assert(a == z)
    // the pipeline really is recorded on the data variables, in applied
    // order (shuffle, deflate, fletcher32), and chunks really shrank
    val f = Hdf5.readStructure(base + "/z.h5", Map.empty)
    val t2m = f.datasets.find(_.name == "t2m").get
    assert(t2m.filters.map(_.id) == IndexedSeq(2, 1, 3))
    assert(t2m.filters(0).cdata == IndexedSeq(2)) // shuffle elem size
    assert(t2m.filters(1).cdata == IndexedSeq(6)) // deflate level
    val lat = f.datasets.find(_.name == "lat").get
    assert(lat.filters.isEmpty, "coordinate vars stay uncompressed")
    // stored chunks are the filtered bytes (zlib header + checksum make
    // tiny fixture chunks LARGER — the point is they differ from raw)
    t2m.layout match {
      case Hdf5.Chunked(cdims, zc) =>
        val rawBytes = cdims.product * t2m.dtype.size
        assert(zc.forall(_.size != rawBytes))
        assert(zc.forall(_.mask == 0))
      case other => fail(s"expected chunked layout, got $other")
    }
  }

  test("lz4 and zstd chunk codecs read identically to unfiltered") {
    val base = tmpDir()
    writeGrid(base + "/plain.h5", chunked = true)
    val expected = Hdf5.read(spark, base + "/plain.h5", Seq("t2m", "count"))
      .orderBy("time", "lat", "lon").collect().toSeq
    for (codec <- Seq("lz4", "zstd")) {
      val p = s"$base/$codec.h5"
      writeGrid(p, chunked = true, deflate = 3, chunkCodec = codec)
      val got = Hdf5.read(spark, p, Seq("t2m", "count"))
        .orderBy("time", "lat", "lon").collect().toSeq
      assert(got == expected, s"$codec mismatch")
      val ids = Hdf5.readStructure(p, Map.empty)
        .datasets.find(_.name == "t2m").get.filters.map(_.id)
      assert(ids == IndexedSeq(2, if (codec == "lz4") 32004 else 32015, 3))
    }
    // lz4 plugin framing survives multi-block chunks incl. the
    // incompressible-block escape
    val rnd = new scala.util.Random(11)
    for (n <- Seq(0, 5, 1000, 5000)) {
      val compressible = Array.tabulate(n)(i => (i % 7).toByte)
      val noise = Array.fill(n)(rnd.nextInt().toByte)
      for (raw <- Seq(compressible, noise)) {
        val enc = Hdf5.lz4EncodeChunk(raw, blockSize0 = 1024)
        assert(Hdf5.lz4DecodeChunk(enc, "prop").toSeq == raw.toSeq)
      }
    }
  }

  test("szip chunks (CCSDS-121) read identically to unfiltered; corrupt block rejects") {
    val base = tmpDir()
    writeGrid(base + "/plain.h5", chunked = true)
    val expected = Hdf5.read(spark, base + "/plain.h5", Seq("t2m", "count"))
      .orderBy("time", "lat", "lon").collect().toSeq
    val p = s"$base/szip.h5"
    writeGrid(p, chunked = true, deflate = 1, chunkCodec = "szip")
    val got = Hdf5.read(spark, p, Seq("t2m", "count"))
      .orderBy("time", "lat", "lon").collect().toSeq
    assert(got == expected, "szip mismatch")
    // pipeline recorded as shuffle → szip → fletcher32, with the four
    // H5Pset_szip client-data words (mask, bits/pixel, px/block, px/scanline)
    val t2m = Hdf5.readStructure(p, Map.empty).datasets.find(_.name == "t2m").get
    assert(t2m.filters.map(_.id) == IndexedSeq(2, 4, 3))
    assert(t2m.filters(1).cdata == Hdf5.SzipCdata)
    // corrupt one byte inside the first chunk's szip payload (past the
    // 4-byte size prefix, before the trailing fletcher32): the checksum
    // catches it BEFORE the szip decoder ever runs — never a silent
    // mis-decode
    val chunk = t2m.layout match {
      case Hdf5.Chunked(_, cs) => cs.minBy(_.addr)
      case other => fail(s"expected chunked layout, got $other")
    }
    val raf = new java.io.RandomAccessFile(p, "rw")
    try {
      raf.seek(chunk.addr + 6)
      val b = raf.read(); raf.seek(chunk.addr + 6); raf.write(b ^ 0x5A)
    } finally raf.close()
    val e = intercept[Exception] {
      Hdf5.read(spark, p, Seq("t2m")).collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("fletcher32")),
      s"corruption must be caught by the checksum, got: $messages")
  }

  test("lzf codec (h5py default): compression, and the skip-mask on no gain") {
    // big-enough chunks that lzf really compresses the smooth variable;
    // the full-entropy variable gets NO gain → stored unfiltered with the
    // lzf filter's mask bit set, exactly h5py's optional-filter behavior
    val (nt, nlat, nlon) = (3, 16, 32)
    val n = nt * nlat * nlon
    val rnd = new scala.util.Random(5)
    val smooth = Array.tabulate(n)(i => 300.0 + (i % 7))
    val noise = Array.fill(n)(java.lang.Double.longBitsToDouble(
      rnd.nextLong() & 0x7FEFFFFFFFFFFFFFL))
    def dims = Seq(Dim("time", nt), Dim("lat", nlat), Dim("lon", nlon))
    def vars = Seq(
      (VarDef("time", Seq("time"), NcDouble,
        Seq("units" -> "hours since 2023-01-01")), Array.tabulate(nt)(_.toDouble)),
      (VarDef("lat", Seq("lat"), NcDouble),
        Array.tabulate(nlat)(i => i * 10.0 - 75)),
      (VarDef("lon", Seq("lon"), NcDouble),
        Array.tabulate(nlon)(i => i * 10.0 - 175)),
      (VarDef("smooth", Seq("time", "lat", "lon"), NcDouble), smooth),
      (VarDef("noise", Seq("time", "lat", "lon"), NcDouble), noise))
    val base = tmpDir()
    Hdf5.write(s"$base/plain.h5", dims, vars, chunked = true)
    Hdf5.write(s"$base/lzf.h5", dims, vars, chunked = true, deflate = 1,
      chunkCodec = "lzf")
    val a = Hdf5.read(spark, s"$base/plain.h5", Seq("smooth", "noise"))
      .orderBy("time", "lat", "lon").collect().toSeq
    val z = Hdf5.read(spark, s"$base/lzf.h5", Seq("smooth", "noise"))
      .orderBy("time", "lat", "lon").collect().toSeq
    assert(a == z)
    val f = Hdf5.readStructure(s"$base/lzf.h5", Map.empty)
    def chunksOf(nm: String) = f.datasets.find(_.name == nm).get.layout match {
      case Hdf5.Chunked(_, cs) => cs
      case other => fail(s"expected chunked, got $other")
    }
    assert(f.datasets.find(_.name == "smooth").get.filters.map(_.id) ==
      IndexedSeq(2, 32000, 3))
    assert(chunksOf("smooth").forall(_.mask == 0), "smooth chunks compressed")
    assert(chunksOf("smooth").forall(_.size < nlat * nlon * 8), "lzf really shrank them")
    assert(chunksOf("noise").forall(_.mask == 2), "noise chunks skipped lzf")
    // kernel roundtrips: repetitive data exercises back-references (incl.
    // the extended-length branch), random data the incompressible return
    val rep = Array.tabulate(4000)(i => (i % 9).toByte)
    val enc = Hdf5.lzfCompress(rep)
    assert(enc.isDefined && enc.get.length < rep.length / 4)
    assert(Hdf5.lzfDecompress(enc.get, rep.length, "t").toSeq == rep.toSeq)
    val rnd2 = Array.fill(4000)(rnd.nextInt().toByte)
    assert(Hdf5.lzfCompress(rnd2).isEmpty)
    for (sz <- Seq(0, 1, 2, 3, 31, 33, 300)) {
      val d = Array.tabulate(sz)(i => (i * 17 % 5).toByte)
      Hdf5.lzfCompress(d).foreach(e =>
        assert(Hdf5.lzfDecompress(e, sz, "t").toSeq == d.toSeq, s"sz=$sz"))
    }
  }

  test("pushdown prunes deflate chunks exactly like unfiltered ones") {
    val path = tmpDir() + "/pz.h5"
    writeGrid(path, chunked = true, deflate = 4)
    val pushed = Hdf5.read(spark, path, Seq("count"),
      timeRange = Some(("2021-06-01 05:00:00", "2021-06-01 13:00:00")),
      bbox = Some((-10.0, -50.0, 100.0, 10.0)))
    assert(pushed.count() == 2L * 2 * 2)
    assert(pushed.rdd.getNumPartitions <= 2, "outer pruning is physical")
  }

  test("fletcher32 catches a corrupted chunk byte loudly") {
    val path = tmpDir() + "/bad.h5"
    writeGrid(path, chunked = true, deflate = 6)
    val f = Hdf5.readStructure(path, Map.empty)
    val chunk = f.datasets.find(_.name == "count").get.layout match {
      case Hdf5.Chunked(_, cs) => cs.head
      case other => fail(s"expected chunked, got $other")
    }
    val raf = new java.io.RandomAccessFile(path, "rw")
    try {
      raf.seek(chunk.addr + 2)
      val orig = raf.read()
      raf.seek(chunk.addr + 2)
      raf.write(orig ^ 0x5A)
    } finally raf.close()
    val e = intercept[Exception] {
      Hdf5.read(spark, path, Seq("count")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("fletcher32") || m.contains("deflate")),
      s"expected a checksum/stream failure, got: ${msgs(e).mkString(" | ")}")
  }

  test("shuffle/unshuffle and fletcher32 kernels are exact") {
    val rnd = new scala.util.Random(7)
    for (elemSize <- Seq(2, 4, 8); n <- Seq(0, 1, 5, 64)) {
      val raw = Array.fill(n * elemSize + (n % 3))(rnd.nextInt().toByte)
      val round = Hdf5.unshuffleBytes(Hdf5.shuffleBytes(raw, elemSize), elemSize)
      assert(round.toSeq == raw.toSeq, s"elemSize=$elemSize n=$n")
    }
    // spec-style vector: odd length exercises the trailing-byte branch
    val abc = "abcde".getBytes("US-ASCII")
    assert(Hdf5.fletcher32(abc, abc.length) == Hdf5.fletcher32(abc.clone(), abc.length))
    assert(Hdf5.fletcher32(abc, abc.length) != Hdf5.fletcher32("abcdf".getBytes("US-ASCII"), 5))
  }

  test("lookup3 matches the published hashlittle vectors") {
    // Bob Jenkins' lookup3.c self-test values — interop anchor for
    // reading real latest-format files (libhdf5's H5_checksum_metadata)
    assert(Hdf5.lookup3(Array.empty[Byte], 0, 0, 0) == 0xdeadbeef)
    val four = "Four score and seven years ago".getBytes("US-ASCII")
    assert(Hdf5.lookup3(four, 0, four.length, 0) == 0x17770551)
    assert(Hdf5.lookup3(four, 0, four.length, 1) == 0xcd628161)
  }

  test("v4 layouts (Fixed Array / Single Chunk) read identically to v1 B-tree") {
    val base = tmpDir()
    writeGrid(base + "/v3.h5", chunked = true)
    val expected = Hdf5.read(spark, base + "/v3.h5", Seq("t2m", "count"))
      .orderBy("time", "lat", "lon").collect().toSeq
    for ((nameSuffix, deflate) <- Seq(("plain", 0), ("z", 6))) {
      val p = s"$base/v4_$nameSuffix.h5"
      writeGrid(p, chunked = true, deflate = deflate, layoutVersion = 4)
      val got = Hdf5.read(spark, p, Seq("t2m", "count"))
        .orderBy("time", "lat", "lon").collect().toSeq
      assert(got == expected, s"v4 $nameSuffix mismatch")
      // the index really is a v4 Fixed Array (outer dim 4 > 1 chunk)
      val f = Hdf5.readStructure(p, Map.empty)
      f.datasets.find(_.name == "t2m").get.layout match {
        case Hdf5.Chunked(cdims, cs) =>
          assert(cdims == IndexedSeq(1, 3, 2) && cs.length == 4)
          assert(cs.map(_.offsets.head).sorted == IndexedSeq(0L, 1L, 2L, 3L))
        case other => fail(s"expected chunked, got $other")
      }
    }
  }

  test("v4 paged Fixed Array data block (page bitmap + per-page checksums)") {
    val path = tmpDir() + "/paged.h5"
    // pageBits=1 → pages of 2 elements; 4 outer chunks → 2 pages
    writeGrid(path, chunked = true, deflate = 4, layoutVersion = 4)
    val expected = Hdf5.read(spark, path, Seq("t2m", "count"))
      .orderBy("time", "lat", "lon").collect().toSeq
    val paged = tmpDir() + "/paged2.h5"
    writeGrid(paged, chunked = true, deflate = 4, layoutVersion = 4, faPageBits = 1)
    val got = Hdf5.read(spark, paged, Seq("t2m", "count"))
      .orderBy("time", "lat", "lon").collect().toSeq
    assert(got == expected)
  }

  test("v4 single-chunk dataset (incl. filtered) reads via the Single Chunk index") {
    val path = tmpDir() + "/single.h5"
    // one outer step ⇒ one chunk ⇒ Single Chunk index in the layout msg
    val (nlat, nlon) = (3, 2)
    Hdf5.write(path,
      Seq(Dim("time", 1), Dim("lat", nlat), Dim("lon", nlon)),
      Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "hours since 2021-06-01")), Array(0.0)),
        (VarDef("lat", Seq("lat"), NcDouble), Array(-60.0, 0.0, 60.0)),
        (VarDef("lon", Seq("lon"), NcDouble), Array(-90.0, 90.0)),
        (VarDef("t2m", Seq("time", "lat", "lon"), NcDouble),
          Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))),
      chunked = true, deflate = 6, layoutVersion = 4)
    val rows = Hdf5.read(spark, path, Seq("t2m")).orderBy("lat", "lon").collect()
    assert(rows.map(_.getDouble(3)).toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    val f = Hdf5.readStructure(path, Map.empty)
    f.datasets.find(_.name == "t2m").get.layout match {
      case Hdf5.Chunked(cdims, cs) =>
        assert(cdims == IndexedSeq(1, 3, 2) && cs.length == 1)
        assert(cs.head.offsets.forall(_ == 0L))
      case other => fail(s"expected chunked, got $other")
    }
  }

  test("v4 extensible array (default params) reads identically to v1 B-tree") {
    // 4 outer chunks + default idxBlkElmts=4 → all elements inline in the
    // EAIB; with deflate the filtered-element encoding is exercised too
    val base = tmpDir()
    writeGrid(base + "/v3.h5", chunked = true)
    val expected = Hdf5.read(spark, base + "/v3.h5", Seq("t2m", "count"))
      .orderBy("time", "lat", "lon").collect().toSeq
    for ((sfx, dz) <- Seq(("plain", 0), ("z", 6))) {
      val p = s"$base/ea_$sfx.h5"
      writeGrid(p, chunked = true, deflate = dz, layoutVersion = 4, eaIndex = true)
      val got = Hdf5.read(spark, p, Seq("t2m", "count"))
        .orderBy("time", "lat", "lon").collect().toSeq
      assert(got == expected, s"ea $sfx mismatch")
    }
  }

  test("v4 extensible array: super blocks and paged data blocks") {
    // params chosen so 25 chunks span every EA zone: 1 inline element,
    // direct data blocks (2+4), one unpaged super block (2×4), then a
    // paged super block (2×8 in pages of 4)
    val ea = Hdf5.EaParams(maxNelmtsBits = 16, idxBlkElmts = 1,
      dataBlkMinElmts = 2, supBlkMinDataPtrs = 2, maxDblkPageNelmtsBits = 2)
    val (nt, nlat, nlon) = (25, 2, 1)
    val vals = Array.tabulate(nt * nlat * nlon)(i => 100.0 + i)
    def dims = Seq(Dim("time", nt), Dim("lat", nlat), Dim("lon", nlon))
    def vars = Seq(
      (VarDef("time", Seq("time"), NcDouble,
        Seq("units" -> "hours since 2022-01-01")), Array.tabulate(nt)(_.toDouble)),
      (VarDef("lat", Seq("lat"), NcDouble), Array(-45.0, 45.0)),
      (VarDef("lon", Seq("lon"), NcDouble), Array(0.0)),
      (VarDef("t2m", Seq("time", "lat", "lon"), NcDouble), vals))
    val base = tmpDir()
    Hdf5.write(s"$base/v3.h5", dims, vars, chunked = true)
    val expected = Hdf5.read(spark, s"$base/v3.h5", Seq("t2m"))
      .orderBy("time", "lat", "lon").collect().toSeq
    for ((sfx, dz) <- Seq(("plain", 0), ("z", 4))) {
      val p = s"$base/ea_$sfx.h5"
      Hdf5.write(p, dims, vars, chunked = true, deflate = dz,
        layoutVersion = 4, eaIndex = true, eaParams = ea)
      val got = Hdf5.read(spark, p, Seq("t2m"))
        .orderBy("time", "lat", "lon").collect().toSeq
      assert(got == expected, s"ea-deep $sfx mismatch")
      val f = Hdf5.readStructure(p, Map.empty)
      f.datasets.find(_.name == "t2m").get.layout match {
        case Hdf5.Chunked(cdims, cs) =>
          assert(cdims == IndexedSeq(1, 2, 1) && cs.length == nt)
          assert(cs.map(_.offsets.head).sorted == (0 until nt).map(_.toLong))
        case other => fail(s"expected chunked, got $other")
      }
    }
  }

  test("v4 v2-B-tree chunk index (single leaf root) reads identically to v1 B-tree") {
    // 4 chunks fit one leaf at the libhdf5-default 2048-byte node → the
    // header's rootNrec/total path and type-10/11 record decode, both
    // unfiltered and through the shuffle→deflate→fletcher32 pipeline
    val base = tmpDir()
    writeGrid(base + "/v3.h5", chunked = true)
    val expected = Hdf5.read(spark, base + "/v3.h5", Seq("t2m", "count"))
      .orderBy("time", "lat", "lon").collect().toSeq
    for ((sfx, dz) <- Seq(("plain", 0), ("z", 6))) {
      val p = s"$base/bt2_$sfx.h5"
      writeGrid(p, chunked = true, deflate = dz, layoutVersion = 4, bt2Index = true)
      val got = Hdf5.read(spark, p, Seq("t2m", "count"))
        .orderBy("time", "lat", "lon").collect().toSeq
      assert(got == expected, s"bt2 $sfx mismatch")
      val f = Hdf5.readStructure(p, Map.empty)
      f.datasets.find(_.name == "t2m").get.layout match {
        case Hdf5.Chunked(cdims, cs) =>
          assert(cdims == IndexedSeq(1, 3, 2) && cs.length == 4)
          assert(cs.map(_.offsets.head) == IndexedSeq(0L, 1L, 2L, 3L),
            "in-order walk yields row-major chunk order")
        case other => fail(s"expected chunked, got $other")
      }
    }
  }

  test("v4 v2-B-tree: depth-2 tree (BTIN nodes, variable-width pointer fields)") {
    // node size 128 with rank-3 records forces maxLeafRec=3 and two
    // internal levels for 20 chunks — exercising child-pointer record
    // counts AND the depth>1 cumulative-total fields libhdf5 sizes from
    // its per-level geometry
    val (nt, nlat, nlon) = (20, 2, 1)
    val vals = Array.tabulate(nt * nlat * nlon)(i => 7.0 + i)
    def dims = Seq(Dim("time", nt), Dim("lat", nlat), Dim("lon", nlon))
    def vars = Seq(
      (VarDef("time", Seq("time"), NcDouble,
        Seq("units" -> "hours since 2024-03-01")), Array.tabulate(nt)(_.toDouble)),
      (VarDef("lat", Seq("lat"), NcDouble), Array(-45.0, 45.0)),
      (VarDef("lon", Seq("lon"), NcDouble), Array(0.0)),
      (VarDef("t2m", Seq("time", "lat", "lon"), NcDouble), vals))
    val base = tmpDir()
    Hdf5.write(s"$base/v3.h5", dims, vars, chunked = true)
    val expected = Hdf5.read(spark, s"$base/v3.h5", Seq("t2m"))
      .orderBy("time", "lat", "lon").collect().toSeq
    for ((sfx, dz) <- Seq(("plain", 0), ("z", 4))) {
      val p = s"$base/bt2deep_$sfx.h5"
      Hdf5.write(p, dims, vars, chunked = true, deflate = dz,
        layoutVersion = 4, bt2Index = true, bt2NodeSize = 128)
      val got = Hdf5.read(spark, p, Seq("t2m"))
        .orderBy("time", "lat", "lon").collect().toSeq
      assert(got == expected, s"bt2-deep $sfx mismatch")
      val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
      def countSlices(sig: String): Int = {
        val s = sig.getBytes("US-ASCII")
        (0 to raw.length - 4).count(i =>
          raw(i) == s(0) && raw(i + 1) == s(1) && raw(i + 2) == s(2) && raw(i + 3) == s(3))
      }
      assert(countSlices("BTIN") >= 2, "fixture really has internal nodes")
      assert(countSlices("BTLF") >= 4, "fixture really splits across leaves")
      val f = Hdf5.readStructure(p, Map.empty)
      f.datasets.find(_.name == "t2m").get.layout match {
        case Hdf5.Chunked(cdims, cs) =>
          assert(cdims == IndexedSeq(1, 2, 1) && cs.length == nt)
          assert(cs.map(_.offsets.head) == (0 until nt).map(_.toLong))
        case other => fail(s"expected chunked, got $other")
      }
    }
  }

  test("v4 corrupt v2-B-tree leaf checksum fails loudly") {
    val path = tmpDir() + "/badbt2.h5"
    writeGrid(path, chunked = true, deflate = 4, layoutVersion = 4, bt2Index = true)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val pos = bytes.indexOfSlice("BTLF".getBytes("US-ASCII"))
    assert(pos > 0, "fixture contains a v2-B-tree leaf")
    // flip inside the record region (past sig/version/type)
    bytes(pos + 10) = (bytes(pos + 10) ^ 0x3C).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    val e = intercept[Exception] { Hdf5.read(spark, path, Seq("t2m")).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("checksum mismatch")),
      s"expected checksum failure, got: ${msgs(e).mkString(" | ")}")
  }

  test("v4 unfiltered partial edge chunks (H5Pset_chunk_opts) read raw") {
    // flag bit 0 in the v4 layout message: partial bound chunks are
    // stored RAW with no filter-mask record in the index. 5 outer steps
    // in chunks of 2 → the last chunk covers one slice only (a true edge
    // chunk) and skips the shuffle→deflate→fletcher32 pipeline entirely;
    // the reader must defilter the first two chunks and pass the third
    // through untouched.
    val (nt, nlat, nlon) = (5, 3, 2)
    def dims = Seq(Dim("time", nt), Dim("lat", nlat), Dim("lon", nlon))
    val vals = Array.tabulate(nt * nlat * nlon)(i => 250.0 + i)
    def vars = Seq(
      (VarDef("time", Seq("time"), NcDouble,
        Seq("units" -> "hours since 2021-06-01")), Array.tabulate(nt)(_ * 6.0)),
      (VarDef("lat", Seq("lat"), NcDouble), Array(-45.0, 0.0, 45.0)),
      (VarDef("lon", Seq("lon"), NcDouble), Array(0.0, 90.0)),
      (VarDef("t2m", Seq("time", "lat", "lon"), NcDouble), vals))
    val base = tmpDir()
    Hdf5.write(s"$base/plain.h5", dims, vars, chunked = true)
    val expected = Hdf5.read(spark, s"$base/plain.h5", Seq("t2m"))
      .orderBy("time", "lat", "lon").collect().toSeq
    val p = s"$base/edge.h5"
    Hdf5.write(p, dims, vars, chunked = true, deflate = 6, layoutVersion = 4,
      chunkOuter = 2, dontFilterEdge = true)
    val got = Hdf5.read(spark, p, Seq("t2m"))
      .orderBy("time", "lat", "lon").collect().toSeq
    assert(got == expected, "raw edge chunk + filtered interior chunks")
    // the fixture really has the shape claimed: 3 chunks, edge stored at
    // exactly the raw byte count (no checksum trailer, no deflate header)
    val f = Hdf5.readStructure(p, Map.empty)
    f.datasets.find(_.name == "t2m").get.layout match {
      case Hdf5.Chunked(cdims, cs) =>
        assert(cdims == IndexedSeq(2, 3, 2) && cs.length == 3)
        val rawBytes = 2 * 3 * 2 * 8
        assert(cs.last.size == rawBytes, "edge chunk stored raw, full-size")
        assert(cs.last.mask == -1, "reader marks the edge chunk skip-all")
        assert(cs.dropRight(1).forall(_.mask == 0), "interior chunks filtered")
      case other => fail(s"expected chunked, got $other")
    }
    // and a multi-slice-chunk file WITHOUT the flag still round-trips
    // (chunks spanning outer slices exercise the slab intersection path)
    val p2 = s"$base/span.h5"
    Hdf5.write(p2, dims, vars, chunked = true, deflate = 6, layoutVersion = 4,
      chunkOuter = 2)
    val got2 = Hdf5.read(spark, p2, Seq("t2m"))
      .orderBy("time", "lat", "lon").collect().toSeq
    assert(got2 == expected, "multi-slice filtered chunks")
  }

  test("v4 implicit chunk index (early-allocated contiguous chunks)") {
    // 8-aligned (double) chunks — the implicit index stores no per-chunk
    // records at all: address = base + linear-chunk-index × chunk bytes
    val (nt, nlat, nlon) = (4, 3, 2)
    def dims = Seq(Dim("time", nt), Dim("lat", nlat), Dim("lon", nlon))
    def vars = Seq(
      (VarDef("time", Seq("time"), NcDouble,
        Seq("units" -> "hours since 2021-06-01")), Array.tabulate(nt)(_ * 6.0)),
      (VarDef("lat", Seq("lat"), NcDouble), Array(-45.0, 0.0, 45.0)),
      (VarDef("lon", Seq("lon"), NcDouble), Array(0.0, 90.0)),
      (VarDef("t2m", Seq("time", "lat", "lon"), NcDouble),
        Array.tabulate(nt * nlat * nlon)(i => 250.0 + i)))
    val base = tmpDir()
    Hdf5.write(s"$base/v3.h5", dims, vars, chunked = true)
    val expected = Hdf5.read(spark, s"$base/v3.h5", Seq("t2m"))
      .orderBy("time", "lat", "lon").collect().toSeq
    val p = s"$base/impl.h5"
    Hdf5.write(p, dims, vars, chunked = true, layoutVersion = 4,
      implicitIndex = true)
    val got = Hdf5.read(spark, p, Seq("t2m"))
      .orderBy("time", "lat", "lon").collect().toSeq
    assert(got == expected)
    val f = Hdf5.readStructure(p, Map.empty)
    f.datasets.find(_.name == "t2m").get.layout match {
      case Hdf5.Chunked(cdims, cs) =>
        assert(cdims == IndexedSeq(1, 3, 2) && cs.length == 4)
        // implicit: addresses stride by exactly the chunk byte size
        val stride = cdims.product * 8
        assert(cs.sortBy(_.offsets.head).map(_.addr).sliding(2).forall {
          case Seq(a, b2) => b2 - a == stride; case _ => true })
      case other => fail(s"expected chunked, got $other")
    }
  }

  test("v2 object headers (latest prefix) parse, checksummed, incl. with v4 layouts") {
    // the full h5py libver='latest' shape: v2 OHDR prefixes over v4
    // chunked layouts. Messages are PACKED (no gap, last message flush at
    // the chunk-0 boundary), which regresses the chunk-0 size accounting:
    // trimming even one message byte loses the layout or an attribute.
    val base = tmpDir()
    writeGrid(base + "/v1h.h5", chunked = true)
    val expected = Hdf5.read(spark, base + "/v1h.h5", Seq("t2m", "count"))
      .orderBy("time", "lat", "lon").collect().toSeq
    for ((sfx, lv, dz) <- Seq(("v3", 3, 0), ("v4z", 4, 6))) {
      val p = s"$base/v2h_$sfx.h5"
      writeGrid(p, chunked = true, deflate = dz, layoutVersion = lv,
        headerVersion = 2)
      val got = Hdf5.read(spark, p, Seq("t2m", "count"))
        .orderBy("time", "lat", "lon").collect().toSeq
      assert(got == expected, s"v2-header $sfx mismatch")
      // attributes survived the packed parse (the LAST messages in the
      // chunk are the ones a size-accounting bug would drop)
      val f = Hdf5.readStructure(p, Map.empty)
      assert(f.datasets.find(_.name == "t2m").get
        .attrNum("scale_factor").contains(0.5))
      assert(f.datasets.find(_.name == "lat").get.isDimScale)
    }
    // the header checksum is real: flip one byte inside OHDR → loud
    val p2 = s"$base/v2h_bad.h5"
    writeGrid(p2, chunked = true, headerVersion = 2)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p2))
    val pos = bytes.indexOfSlice("OHDR".getBytes("US-ASCII"))
    assert(pos > 0)
    bytes(pos + 10) = (bytes(pos + 10) ^ 0x2A).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(p2), bytes)
    val e = intercept[Exception] { Hdf5.readStructure(p2, Map.empty) }
    assert(Option(e.getMessage).exists(_.contains("checksum mismatch")))
  }

  test("v4 corrupt extensible-array structure fails loudly") {
    val path = tmpDir() + "/badea.h5"
    writeGrid(path, chunked = true, deflate = 4, layoutVersion = 4, eaIndex = true)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val pos = bytes.indexOfSlice("EAIB".getBytes("US-ASCII"))
    assert(pos > 0, "fixture contains an EA index block")
    // flip inside the element region (past sig/version/client/back-pointer)
    bytes(pos + 20) = (bytes(pos + 20) ^ 0x3C).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    val e = intercept[Exception] { Hdf5.read(spark, path, Seq("t2m")).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("checksum mismatch")),
      s"expected checksum failure, got: ${msgs(e).mkString(" | ")}")
  }

  test("v4 corrupt fixed-array checksum fails loudly") {
    val path = tmpDir() + "/badfa.h5"
    writeGrid(path, chunked = true, layoutVersion = 4)
    // find FAHD in the raw bytes and flip one byte of its payload
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val sig = "FAHD".getBytes("US-ASCII")
    val pos = bytes.indexOfSlice(sig)
    assert(pos > 0, "fixture contains a fixed-array header")
    bytes(pos + 8) = (bytes(pos + 8) ^ 0x5A).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    val e = intercept[Exception] { Hdf5.read(spark, path, Seq("t2m")).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("checksum mismatch")),
      s"expected checksum failure, got: ${msgs(e).mkString(" | ")}")
  }

  test("non-root groups: symbol-table walk, path-qualified names") {
    // grouped product shape (e.g. multi-model archives): shared root
    // dimension scales, per-group data variables. The reader must list
    // "m1/t2m" and "m2/t2m" and read each through the same distributed
    // plan; DIMENSION_LIST references resolve across the group boundary.
    val (nt, nlat, nlon) = (3, 2, 2)
    val n = nt * nlat * nlon
    val path = tmpDir() + "/g.h5"
    Hdf5.write(path,
      dims = Seq(Dim("time", nt), Dim("lat", nlat), Dim("lon", nlon)),
      vars = Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "hours since 2020-01-01")), Array.tabulate(nt)(_ * 6.0)),
        (VarDef("lat", Seq("lat"), NcDouble), Array(-30.0, 30.0)),
        (VarDef("lon", Seq("lon"), NcDouble), Array(0.0, 180.0)),
        (VarDef("m1/t2m", Seq("time", "lat", "lon"), NcDouble,
          Seq("units" -> "K")), Array.tabulate(n)(i => 270.0 + i)),
        (VarDef("m2/t2m", Seq("time", "lat", "lon"), NcDouble),
          Array.tabulate(n)(i => 280.0 + i)),
        (VarDef("sfc", Seq("time", "lat", "lon"), NcDouble),
          Array.tabulate(n)(i => 1000.0 + i))),
      chunked = true, deflate = 4)
    val f = Hdf5.readStructure(path, Map.empty)
    assert(f.datasets.map(_.name).sorted ==
      IndexedSeq("lat", "lon", "m1/t2m", "m2/t2m", "sfc", "time"))
    assert(f.datasets.find(_.name == "m1/t2m").get.attrStr("units").contains("K"))
    // distributed read of one grouped + one root variable together
    val df = Hdf5.read(spark, path, Seq("m1/t2m", "sfc"))
      .orderBy("time", "lat", "lon").collect()
    assert(df.length == n)
    assert(df.head.getDouble(3) == 270.0 && df.head.getDouble(4) == 1000.0)
    assert(df.last.getDouble(3) == 270.0 + n - 1)
    // the two groups really hold distinct data
    val m2 = Hdf5.read(spark, path, Seq("m2/t2m")).orderBy("time", "lat", "lon")
      .collect()
    assert(m2.head.getDouble(3) == 280.0)
    // info lists grouped variables with path-qualified names
    val inf = NetCdf.info(spark, path).collect().map(_.getString(0)).toSet
    assert(Set("m1/t2m", "m2/t2m", "sfc")(inf.intersect(Set("m1/t2m", "m2/t2m", "sfc")).head) &&
      inf.contains("m1/t2m") && inf.contains("m2/t2m"))
  }

  test("dense (fractal-heap) group links: many-variable files read fully") {
    // the past-compact-threshold layout libhdf5 switches to (>8 links):
    // link messages as fractal-heap managed objects behind a type-5
    // name-index v2-B-tree. 14 root links + a dense child group drive
    // FRHP/FHDB parsing, managed-ID resolution, the hash-ordered leaf
    // walk, and cross-storage nesting (dense root -> dense child).
    val nx = 4
    val varDefs =
      (0 until 10).map(i => (VarDef(f"v$i%02d", Seq("x"), NcDouble),
        Array.tabulate(nx)(t => i * 100.0 + t))) ++
      Seq((VarDef("grp/w", Seq("x"), NcDouble),
        Array.tabulate(nx)(t => 7000.0 + t)),
        (VarDef("grp/z", Seq("x"), NcDouble),
          Array.tabulate(nx)(t => 8000.0 + t)))
    val vars = Seq((VarDef("x", Seq("x"), NcDouble),
      Array.tabulate(nx)(_.toDouble))) ++ varDefs
    val base = tmpDir()
    for ((sfx, hv) <- Seq(("v1", 1), ("v2", 2))) {
      val p = s"$base/dense_$sfx.h5"
      Hdf5.write(p, dims = Seq(Dim("x", nx)), vars = vars,
        denseLinks = true, headerVersion = hv)
      assert(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
        .indexOfSlice("FRHP".getBytes("US-ASCII")) > 0, "really dense storage")
      val f = Hdf5.readStructure(p, Map.empty)
      assert(f.datasets.map(_.name).sorted ==
        ((0 until 10).map(i => f"v$i%02d") ++ Seq("grp/w", "grp/z", "x")).sorted,
        s"$sfx: all dense links resolve, incl. the dense child group")
      val df = Hdf5.read(spark, p, Seq("v03", "grp/w")).orderBy("x").collect()
      assert(df.map(_.getDouble(1)).toSeq == Seq(300.0, 301.0, 302.0, 303.0))
      assert(df.map(_.getDouble(2)).toSeq == Seq(7000.0, 7001.0, 7002.0, 7003.0))
    }
    // the direct-block checksum is real: flip one payload byte → loud
    val p2 = s"$base/dense_bad.h5"
    Hdf5.write(p2, dims = Seq(Dim("x", nx)), vars = vars, denseLinks = true)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p2))
    val pos = bytes.indexOfSlice("FHDB".getBytes("US-ASCII"))
    assert(pos > 0)
    bytes(pos + 30) = (bytes(pos + 30) ^ 0x11).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(p2), bytes)
    val e = intercept[Exception] { Hdf5.readStructure(p2, Map.empty) }
    assert(Option(e.getMessage).exists(_.contains("checksum mismatch")))
  }

  test("dense (fractal-heap) attributes: CF semantics survive the move") {
    // latest-format files push attributes into a fractal heap behind a
    // type-8 name-index v2-B-tree once a dataset carries more than ~8 —
    // and CF semantics (scale/offset/fill, DIMENSION_LIST, dim-scale
    // CLASS) ride on attributes, so the dense path must feed the same
    // grid decode, not just the metadata listing
    val base = tmpDir()
    writeGrid(base + "/compact.h5", chunked = true, deflate = 4)
    val expected = Hdf5.read(spark, base + "/compact.h5", Seq("t2m", "count"))
      .orderBy("time", "lat", "lon").collect().toSeq
    val (nt, nlat, nlon) = (4, 3, 2)
    val temps = Array.tabulate(nt * nlat * nlon)(i => 250.0 + i)
    val packed = temps.map(t => (t - 200.0) / 0.5)
    packed(5) = -32768.0
    val manyAttrs = (0 until 9).map(i => s"extra_a$i" -> s"v$i")
    val p = base + "/dense.h5"
    Hdf5.write(p,
      dims = Seq(Dim("time", nt), Dim("lat", nlat), Dim("lon", nlon)),
      vars = Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "hours since 2021-06-01")), Array.tabulate(nt)(_ * 6.0)),
        (VarDef("lat", Seq("lat"), NcDouble,
          Seq("units" -> "degrees_north")), Array(-45.0, 0.0, 45.0)),
        (VarDef("lon", Seq("lon"), NcDouble), Array(0.0, 90.0)),
        (VarDef("t2m", Seq("time", "lat", "lon"), NcShort,
          Seq("scale_factor" -> 0.5, "add_offset" -> 200.0,
            "_FillValue" -> -32768.0) ++ manyAttrs), packed),
        (VarDef("count", Seq("time", "lat", "lon"), NcInt),
          Array.tabulate(nt * nlat * nlon)(_.toDouble))),
      gatts = Seq("Conventions" -> "CF-1.8", "title" -> "graft h5 test"),
      chunked = true, deflate = 4, denseAttrs = true)
    assert(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
      .indexOfSlice("FRHP".getBytes("US-ASCII")) > 0, "really dense storage")
    val f = Hdf5.readStructure(p, Map.empty)
    val t2m = f.datasets.find(_.name == "t2m").get
    assert(t2m.attrNum("scale_factor").contains(0.5))
    assert(t2m.attrNum("_FillValue").contains(-32768.0))
    assert(t2m.attrStr("extra_a7").contains("v7"))
    assert(f.datasets.find(_.name == "lat").get.isDimScale,
      "dim-scale CLASS survives dense storage")
    val byAddr = f.datasets.map(d => d.addr -> d.name).toMap
    assert(t2m.dimRefs.get.map(byAddr) == IndexedSeq("time", "lat", "lon"),
      "DIMENSION_LIST resolves through the heap-stored message")
    val got = Hdf5.read(spark, p, Seq("t2m", "count"))
      .orderBy("time", "lat", "lon").collect().toSeq
    assert(got == expected, "identical decode to the compact-attribute file")
  }

  test("NetCdf.read dispatches on the HDF5 signature transparently") {
    val path = tmpDir() + "/d.nc" // .nc extension, HDF5 container — the
    writeGrid(path, chunked = false) // netCDF-4 situation users actually hit
    val df = NetCdf.read(spark, path, Seq("count"))
    assert(df.count() == 24)
    val inf = NetCdf.info(spark, path).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(inf("t2m") == "short" && inf("count") == "int" && inf("lat") == "double")
  }

  test("float32 data + unsigned types decode correctly") {
    val path = tmpDir() + "/f.h5"
    Hdf5.write(path,
      dims = Seq(Dim("x", 3)),
      vars = Seq(
        (VarDef("x", Seq("x"), NcDouble), Array(1.0, 2.0, 3.0)),
        (VarDef("f", Seq("x"), NcFloat), Array(1.5, -2.5, 3.25)),
        (VarDef("u", Seq("x"), NetCdf.NcUShort), Array(65535.0, 0.0, 40000.0))))
    val df = Hdf5.read(spark, path, Seq("f", "u")).orderBy("x")
    val rows = df.collect()
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.5, -2.5, 3.25))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(65535.0, 0.0, 40000.0))
  }

  test("readDir unions a mixed classic + netCDF-4 archive") {
    val base = tmpDir()
    NetCdf.write(s"$base/y0.nc",
      dims = Seq(Dim("time", 1), Dim("lat", 2)),
      vars = Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "days since 1996-01-01")), Array(0.0)),
        (VarDef("lat", Seq("lat"), NcDouble), Array(-30.0, 30.0)),
        (VarDef("x", Seq("time", "lat"), NcDouble), Array(1.0, 2.0))))
    Hdf5.write(s"$base/y1.nc",
      dims = Seq(Dim("time", 1), Dim("lat", 2)),
      vars = Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "days since 1996-01-01")), Array(31.0)),
        (VarDef("lat", Seq("lat"), NcDouble), Array(-30.0, 30.0)),
        (VarDef("x", Seq("time", "lat"), NcDouble), Array(3.0, 4.0))))
    val df = NetCdf.readDir(spark, base, Seq("x"))
    assert(df.count() == 4)
    assert(df.agg(sum("x")).head().getDouble(0) == 10.0)
  }

  test("positional dim fallback binds equal-length axes to DISTINCT " +
    "scales (square grid: lat/lon both len 2 must not both resolve 'lat')") {
    import Hdf5.{H5Dataset, H5File, H5Type, Contiguous}
    val dt = H5Type(cls = 1, size = 8, littleEndian = true, signed = true)
    def scale(name: String, addr: Long) = H5Dataset(name, addr, dt,
      IndexedSeq(2), Contiguous(0L, 16L), Map.empty, None,
      isDimScale = true, dimRefs = None)
    val lat = scale("lat", 1L)
    val lon = scale("lon", 2L)
    // no DIMENSION_LIST → positional fallback
    val v = H5Dataset("temp", 3L, dt, IndexedSeq(2, 2),
      Contiguous(0L, 32L), Map.empty, None,
      isDimScale = false, dimRefs = None)
    val names = Hdf5.dimNamesOf(v, H5File(IndexedSeq(lat, lon, v)))
    assert(names == IndexedSeq("lat", "lon"),
      s"square grid bound both axes to: $names")
    // a third equal-length axis with no scale left falls back to phony
    val v3 = v.copy(dims = IndexedSeq(2, 2, 2))
    assert(Hdf5.dimNamesOf(v3, H5File(IndexedSeq(lat, lon, v3)))
      == IndexedSeq("lat", "lon", "phony_dim_2"))
  }

  test("nbit filter (id 5): int roundtrip with negatives, reduced-" +
    "precision datatype honored, out-of-precision write rejects") {
    val path = tmpDir() + "/nbit.h5"
    // values across the signed 16-bit precision range, incl. extremes
    val vals = Array(-32768.0, -9999.0, -1.0, 0.0, 1.0, 12345.0, 32767.0,
      -300.0, 42.0, 7.0, -42.0, 2.0)
    Hdf5.write(path,
      dims = Seq(Dim("time", 4), Dim("lat", 3)),
      vars = Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "days since 2020-01-01")), Array.tabulate(4)(_.toDouble)),
        (VarDef("lat", Seq("lat"), NcDouble), Array(-10.0, 0.0, 10.0)),
        (VarDef("v", Seq("time", "lat"), NcInt), vals)),
      chunked = true, deflate = 1, chunkCodec = "nbit")
    val got = NetCdf.read(spark, path, Seq("v"))
      .orderBy("time", "lat").select("v").collect().map(_.getDouble(0))
    assert(got.toSeq == vals.toSeq)
    // a value needing more than 16 significant bits must reject at write
    // (silently dropping significant bits would corrupt data)
    val e = intercept[Exception] {
      Hdf5.write(tmpDir() + "/nbit2.h5",
        dims = Seq(Dim("t", 2)),
        vars = Seq(
          (VarDef("t", Seq("t"), NcDouble), Array(0.0, 1.0)),
          (VarDef("v", Seq("t"), NcInt), Array(1.0, 40000.0))),
        chunked = true, deflate = 1, chunkCodec = "nbit")
    }
    assert(chainMsg(e).contains("does not fit nbit precision"))
    // and a float data var under nbit rejects up front (datatype-driven)
    val e2 = intercept[Exception] {
      Hdf5.write(tmpDir() + "/nbit3.h5",
        dims = Seq(Dim("t", 1)),
        vars = Seq(
          (VarDef("t", Seq("t"), NcDouble), Array(0.0)),
          (VarDef("v", Seq("t"), NcDouble), Array(1.5))),
        chunked = true, deflate = 1, chunkCodec = "nbit")
    }
    assert(chainMsg(e2).contains("fixed-point"))
  }

  test("scaleoffset filter (id 6): int-type roundtrip with negatives; " +
    "D-scale exact on 6-decimal data; corrupt streams reject") {
    // INT scale type: min-subtract + minbits packing, negatives included
    val path = tmpDir() + "/so-int.h5"
    val ivals = Array(-500.0, -499.0, 0.0, 123.0, 9999.0, 9998.0)
    Hdf5.write(path,
      dims = Seq(Dim("time", 3), Dim("lat", 2)),
      vars = Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "days since 2020-01-01")), Array(0.0, 1.0, 2.0)),
        (VarDef("lat", Seq("lat"), NcDouble), Array(-10.0, 10.0)),
        (VarDef("v", Seq("time", "lat"), NcInt), ivals)),
      chunked = true, deflate = 1, chunkCodec = "scaleoffset")
    val got = NetCdf.read(spark, path, Seq("v"))
      .orderBy("time", "lat").select("v").collect().map(_.getDouble(0))
    assert(got.toSeq == ivals.toSeq)
    // D-scale on doubles pre-rounded to 6 decimals is exact; a CONSTANT
    // chunk exercises the minbits = 0 (header-only) path
    val path2 = tmpDir() + "/so-f.h5"
    val dvals = Array(1.234567, -2.5, 0.0, 99.000001, 1.234567, 7.0)
    Hdf5.write(path2,
      dims = Seq(Dim("time", 3), Dim("lat", 2)),
      vars = Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "days since 2020-01-01")), Array(0.0, 1.0, 2.0)),
        (VarDef("lat", Seq("lat"), NcDouble), Array(-10.0, 10.0)),
        (VarDef("v", Seq("time", "lat"), NcDouble), dvals),
        (VarDef("flat", Seq("time", "lat"), NcDouble), Array.fill(6)(3.25))),
      chunked = true, deflate = 1, chunkCodec = "scaleoffset")
    val back = NetCdf.read(spark, path2, Seq("v", "flat"))
      .orderBy("time", "lat").collect()
    assert(back.map(_.getAs[Double]("v")).toSeq == dvals.toSeq)
    assert(back.map(_.getAs[Double]("flat")).forall(_ == 3.25))
    // corrupt negatives at the codec layer: truncated packed stream,
    // impossible minbits, under-sized header — all loud
    val p = ScaleOffset.Params(ScaleOffset.IntType, 0, 4, signed = true,
      isFloat = false)
    val enc = ScaleOffset.encode(
      Array[Byte](1, 0, 0, 0, 9, 0, 0, 0, 5, 0, 0, 0), p, "t")
    val trunc = intercept[Exception] {
      ScaleOffset.decode(java.util.Arrays.copyOf(enc, enc.length - 1) match {
        case a => a(0) = 40.toByte; a // claim 40 minbits over a short body
      }, 3, p, "t")
    }
    assert(chainMsg(trunc).contains("scaleoffset stream"),
      s"got: ${chainMsg(trunc)}")
    val badBits = intercept[Exception] {
      val a = enc.clone(); a(0) = 99.toByte
      ScaleOffset.decode(a, 3, p, "t")
    }
    assert(chainMsg(badBits).contains("minbits"))
    val short = intercept[Exception] {
      ScaleOffset.decode(Array[Byte](1, 2, 3), 1, p, "t")
    }
    assert(chainMsg(short).contains("header"))
    // nbit decode on a truncated stream is equally loud
    val nb = Nbit.encode(Array[Byte](1, 0, 0, 0, 2, 0, 0, 0), 4, 16, 0,
      signed = true, "t")
    val nbErr = intercept[Exception] {
      Nbit.decode(java.util.Arrays.copyOf(nb, nb.length - 1), 2, 4, 16, 0,
        signed = true, "t")
    }
    // the exact-length tripwire fires: a stream of the wrong size is a
    // foreign/corrupt layout, rejected before any bits are read
    assert(chainMsg(nbErr).contains("nbit stream"), s"got: ${chainMsg(nbErr)}")
    // a 2-byte float (HDF5 cls 1, size 2) rejects at Params construction:
    // toFixed/fromFixed only address 4/8-byte float strides, so anything
    // else must be loud instead of corrupting strides at decode time
    val halfFloat = intercept[Exception] {
      ScaleOffset.Params(ScaleOffset.FloatDScale, 2, 2, signed = true,
        isFloat = true)
    }
    assert(chainMsg(halfFloat).contains("4/8-byte floats"),
      s"got: ${chainMsg(halfFloat)}")
  }
}
