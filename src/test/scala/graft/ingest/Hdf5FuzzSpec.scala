package graft.ingest

import graft.SparkSpec

/** Randomized whole-file roundtrips over the HDF5 writer × reader:
  * seeded random dims/values driven through every chunk-index × codec ×
  * header combination the writer supports, read back distributed
  * ([[NetCdf.read]] → [[Hdf5.read]]) and compared cell-for-cell.
  *
  * The directed Hdf5Spec covers each path once at one fixed 4×3×2 shape;
  * this sweep covers the INTERACTIONS (paged Fixed Array × multi-slice
  * chunks, v2-B-tree × zstd, groups × Extensible Array, dense links ×
  * deflate, …) at shapes the fixtures never pinned — including 1-length
  * axes, chunkOuter ≥ nt, and planted `_FillValue` cells.
  */
class Hdf5FuzzSpec extends SparkSpec {
  import NetCdf.{Dim, VarDef, NcDouble, NcInt}

  private final case class Cfg(name: String, layoutVersion: Int = 3,
      deflate: Int = 0, faPageBits: Int = 0, eaIndex: Boolean = false,
      implicitIndex: Boolean = false, bt2Index: Boolean = false,
      bt2NodeSize: Int = 2048, chunkCodec: String = "zlib",
      denseLinks: Boolean = false, denseAttrs: Boolean = false,
      headerVersion: Int = 1, grouped: Boolean = false)

  // every writer-supported (index, codec, header, link-storage) leg, each
  // fuzzed at a fresh seeded-random shape below
  private val cfgs = Seq(
    Cfg("v3-zlib", deflate = 6),
    Cfg("v3-lzf", deflate = 1, chunkCodec = "lzf"),
    Cfg("v3-szip", deflate = 1, chunkCodec = "szip"),
    Cfg("v3-zstd", deflate = 3, chunkCodec = "zstd"),
    Cfg("v3-lz4", deflate = 1, chunkCodec = "lz4"),
    Cfg("v3-nbit", deflate = 1, chunkCodec = "nbit"),
    Cfg("v3-scaleoffset", deflate = 1, chunkCodec = "scaleoffset"),
    Cfg("v3-unfiltered"),
    Cfg("v4-fa", layoutVersion = 4, deflate = 6),
    Cfg("v4-fa-paged", layoutVersion = 4, deflate = 4, faPageBits = 1),
    Cfg("v4-ea", layoutVersion = 4, deflate = 6, eaIndex = true),
    Cfg("v4-implicit", layoutVersion = 4, implicitIndex = true),
    Cfg("v4-bt2-small", layoutVersion = 4, deflate = 6, bt2Index = true,
      bt2NodeSize = 128),
    Cfg("v4-bt2-zstd", layoutVersion = 4, deflate = 3, bt2Index = true,
      chunkCodec = "zstd"),
    Cfg("v3-dense", deflate = 6, denseLinks = true, denseAttrs = true),
    Cfg("v4-ea-grouped", layoutVersion = 4, deflate = 6, eaIndex = true,
      grouped = true),
    Cfg("v3-ohdr2", deflate = 6, headerVersion = 2),
    Cfg("v3-szip-grouped", deflate = 1, chunkCodec = "szip", grouped = true))

  test("seeded random roundtrips across every index × codec combination") {
    val rnd = new scala.util.Random(20260816L)
    val epochDay = java.time.LocalDate.of(2020, 1, 1).toEpochDay
    cfgs.foreach { c =>
      val nt = 1 + rnd.nextInt(5)
      val nlat = 1 + rnd.nextInt(4)
      val nlon = 1 + rnd.nextInt(4)
      val n = nt * nlat * nlon
      val fixedPoint = c.chunkCodec == "nbit"  // writer: all data vars int
      val sixDp = c.chunkCodec == "scaleoffset" // D-scale 6: exact iff 6 dp
      val Fill = -99999.0
      def gen(): Array[Double] =
        if (fixedPoint) Array.fill(n)((rnd.nextInt(1001) - 500).toDouble)
        else if (sixDp) Array.fill(n)(
          java.math.BigDecimal.valueOf(rnd.nextDouble() * 200 - 100)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
        else Array.fill(n)(rnd.nextDouble() * 2e4 - 1e4)
      val a = gen()
      val b = gen()
      // plant a fill cell on the lossless-double legs: fill must read NULL
      val fillIdx =
        if (!fixedPoint && !sixDp && n > 1) {
          val i = rnd.nextInt(n); a(i) = Fill; Some(i)
        } else None
      val tpe = if (fixedPoint) NcInt else NcDouble
      val vaAttrs: Seq[(String, Any)] =
        fillIdx.map(_ => Seq[(String, Any)]("_FillValue" -> Fill)).getOrElse(Nil)
      val prefix = if (c.grouped) "g/" else ""
      val chunkOuter = 1 + rnd.nextInt(2) // may exceed nt — writer clamps
      val vars = Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "days since 2020-01-01")),
          Array.tabulate(nt)(_.toDouble)),
        (VarDef("lat", Seq("lat"), NcDouble), Array.tabulate(nlat)(i => i * 10.0 - 40)),
        (VarDef("lon", Seq("lon"), NcDouble), Array.tabulate(nlon)(i => i * 10.0 - 20)),
        (VarDef(prefix + "va", Seq("time", "lat", "lon"), tpe, vaAttrs), a),
        (VarDef(prefix + "vb", Seq("time", "lat", "lon"), tpe), b))
      val path = tmpDir() + s"/${c.name}.nc"
      val tag = s"${c.name} (nt=$nt nlat=$nlat nlon=$nlon chunkOuter=$chunkOuter)"
      try {
        Hdf5.write(path, Seq(Dim("time", nt), Dim("lat", nlat), Dim("lon", nlon)),
          vars, Seq("title" -> s"fuzz ${c.name}"), chunked = true,
          deflate = c.deflate, layoutVersion = c.layoutVersion,
          faPageBits = c.faPageBits, eaIndex = c.eaIndex,
          implicitIndex = c.implicitIndex, bt2Index = c.bt2Index,
          bt2NodeSize = c.bt2NodeSize, chunkOuter = chunkOuter,
          denseLinks = c.denseLinks, denseAttrs = c.denseAttrs,
          chunkCodec = c.chunkCodec, headerVersion = c.headerVersion)
        val rows = NetCdf.read(spark, path, Seq(prefix + "va", prefix + "vb"))
          .collect()
        assert(rows.length == n, s"$tag: ${rows.length} rows, expected $n")
        rows.foreach { r =>
          val ts = r.getAs[java.sql.Timestamp]("time")
          val t = (ts.getTime / 86400000L - epochDay).toInt
          val la = ((r.getAs[Double]("lat") + 40) / 10).round.toInt
          val lo = ((r.getAs[Double]("lon") + 20) / 10).round.toInt
          assert(t >= 0 && t < nt && la >= 0 && la < nlat && lo >= 0 && lo < nlon,
            s"$tag: coords out of range ($t, $la, $lo)")
          val i = (t * nlat + la) * nlon + lo
          val vaName = prefix + "va"
          val vbName = prefix + "vb"
          if (fillIdx.contains(i))
            assert(r.isNullAt(r.fieldIndex(vaName)),
              s"$tag: planted fill cell $i must read NULL")
          else {
            val got = r.getAs[Double](vaName)
            if (sixDp)
              assert(math.abs(got - a(i)) < 1e-9, s"$tag: va[$i] $got != ${a(i)}")
            else assert(got == a(i), s"$tag: va[$i] $got != ${a(i)}")
          }
          val gotB = r.getAs[Double](vbName)
          if (sixDp)
            assert(math.abs(gotB - b(i)) < 1e-9, s"$tag: vb[$i] $gotB != ${b(i)}")
          else assert(gotB == b(i), s"$tag: vb[$i] $gotB != ${b(i)}")
        }
      } catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case e: Throwable =>
          fail(s"$tag: roundtrip threw ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
  }
}
