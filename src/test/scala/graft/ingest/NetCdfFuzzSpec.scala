package graft.ingest

import graft.SparkSpec

/** Randomized whole-file roundtrips over the classic NetCDF writer ×
  * reader: CDF-1 and CDF-5 containers × every numeric external type the
  * writer encodes × scale/offset packing × `_FillValue`, at seeded-random
  * grid shapes — odd element counts hit the per-variable 4-byte padding
  * edges (the classic-format gotcha for 1- and 2-byte types) that the
  * directed NetCdfSpec's fixed shapes may step over.
  */
class NetCdfFuzzSpec extends SparkSpec {
  import NetCdf._

  private final case class Cfg(name: String, version: Int, tpe: NcType,
      lo: Double, hi: Double, packed: Boolean = false,
      fill: Boolean = false)

  private val cfgs = Seq(
    Cfg("c1-byte", 1, NcByte, -128, 127),
    Cfg("c1-short", 1, NcShort, -32768, 32767),
    Cfg("c1-int", 1, NcInt, -1e6, 1e6),
    Cfg("c1-float", 1, NcFloat, -1e4, 1e4),
    Cfg("c1-double", 1, NcDouble, -1e8, 1e8),
    Cfg("c5-ubyte", 5, NcUByte, 0, 255),
    Cfg("c5-ushort", 5, NcUShort, 0, 65535),
    Cfg("c5-uint", 5, NcUInt, 0, 4.0e9),
    Cfg("c5-int64", 5, NcInt64, -1e12, 1e12),
    Cfg("c5-double", 5, NcDouble, -1e8, 1e8),
    Cfg("c1-short-packed", 1, NcShort, -32768, 32767, packed = true),
    Cfg("c5-int-packed", 5, NcInt, -1e6, 1e6, packed = true),
    Cfg("c1-double-fill", 1, NcDouble, -1e8, 1e8, fill = true),
    Cfg("c1-float-fill", 1, NcFloat, -1e4, 1e4, fill = true),
    Cfg("c5-short-fill", 5, NcShort, -32767, 32767, fill = true),
    Cfg("c1-byte-fill", 1, NcByte, -127, 127, fill = true))

  test("seeded random roundtrips across container versions and types") {
    val rnd = new scala.util.Random(20260816L)
    val epochDay = java.time.LocalDate.of(2020, 1, 1).toEpochDay
    cfgs.foreach { c =>
      val nt = 1 + rnd.nextInt(5)
      val nlat = 1 + rnd.nextInt(5)
      val nlon = 1 + rnd.nextInt(5)
      val n = nt * nlat * nlon
      val Scale = 0.5
      val Off = 200.0
      // raw on-disk values, integral within the type's range; floats are
      // generated AS floats so the double comparison is exact
      def rawGen(): Double = c.tpe match {
        case NcFloat => (rnd.nextFloat() * (c.hi - c.lo) + c.lo).toFloat.toDouble
        case NcDouble => rnd.nextDouble() * (c.hi - c.lo) + c.lo
        case _ => math.floor(rnd.nextDouble() * (c.hi - c.lo) + c.lo)
      }
      val rawA = Array.fill(n)(rawGen())
      val rawB = Array.fill(n)(rawGen())
      // the fill raw value: below every generated value so no collision
      val FillRaw = c.tpe match {
        case NcByte => -128.0
        case NcShort => -32768.0
        case NcFloat => -99999.0f.toDouble
        case _ => c.lo - 1
      }
      val fillIdx = if (c.fill && n > 1) {
        val i = rnd.nextInt(n); rawA(i) = FillRaw; Some(i)
      } else None
      // expected read-back values: unpack(raw) = raw*scale + offset when
      // packed; fill -> null
      def expected(raw: Double): Double = if (c.packed) raw * Scale + Off else raw
      val attrsA: Seq[(String, Any)] =
        (if (c.packed) Seq[(String, Any)]("scale_factor" -> Scale, "add_offset" -> Off) else Nil) ++
          (if (c.fill) Seq[(String, Any)]("_FillValue" -> FillRaw) else Nil)
      val attrsB: Seq[(String, Any)] =
        if (c.packed) Seq[(String, Any)]("scale_factor" -> Scale, "add_offset" -> Off) else Nil
      val vars = Seq(
        (VarDef("time", Seq("time"), NcDouble,
          Seq("units" -> "days since 2020-01-01")),
          Array.tabulate(nt)(_.toDouble)),
        (VarDef("lat", Seq("lat"), NcDouble), Array.tabulate(nlat)(i => i * 10.0 - 40)),
        (VarDef("lon", Seq("lon"), NcDouble), Array.tabulate(nlon)(i => i * 10.0 - 20)),
        (VarDef("va", Seq("time", "lat", "lon"), c.tpe, attrsA), rawA),
        (VarDef("vb", Seq("time", "lat", "lon"), c.tpe, attrsB), rawB))
      val path = tmpDir() + s"/${c.name}.nc"
      val tag = s"${c.name} (nt=$nt nlat=$nlat nlon=$nlon)"
      try {
        NetCdf.write(path, Seq(Dim("time", nt), Dim("lat", nlat), Dim("lon", nlon)),
          vars, Seq("title" -> s"fuzz ${c.name}"), version = c.version)
        val rows = NetCdf.read(spark, path, Seq("va", "vb")).collect()
        assert(rows.length == n, s"$tag: ${rows.length} rows, expected $n")
        rows.foreach { r =>
          val ts = r.getAs[java.sql.Timestamp]("time")
          val t = (ts.getTime / 86400000L - epochDay).toInt
          val la = ((r.getAs[Double]("lat") + 40) / 10).round.toInt
          val lo = ((r.getAs[Double]("lon") + 20) / 10).round.toInt
          assert(t >= 0 && t < nt && la >= 0 && la < nlat && lo >= 0 && lo < nlon,
            s"$tag: coords out of range ($t, $la, $lo)")
          val i = (t * nlat + la) * nlon + lo
          if (fillIdx.contains(i))
            assert(r.isNullAt(r.fieldIndex("va")),
              s"$tag: planted fill cell $i must read NULL")
          else {
            val got = r.getAs[Double]("va")
            assert(got == expected(rawA(i)),
              s"$tag: va[$i] $got != ${expected(rawA(i))} (raw ${rawA(i)})")
          }
          val gotB = r.getAs[Double]("vb")
          assert(gotB == expected(rawB(i)),
            s"$tag: vb[$i] $gotB != ${expected(rawB(i))} (raw ${rawB(i)})")
        }
      } catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case e: Throwable =>
          fail(s"$tag: roundtrip threw ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
  }
}
