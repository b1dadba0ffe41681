package graft.ingest

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Generator-driven properties for the HDF5 chunk-filter kernels
  * (shuffle transpose, deflate, fletcher32) — the pure byte-level pieces
  * under the compressed-chunk read/write paths exercised end-to-end by
  * Hdf5Spec and q_netcdf4_deflate.
  */
object Hdf5Props extends Properties("hdf5-filters") {

  private val elemSize: Gen[Int] = Gen.oneOf(1, 2, 4, 8)
  private val payload: Gen[Array[Byte]] =
    Gen.chooseNum(0, 512).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte)))

  property("unshuffle inverts shuffle for any payload and element size") =
    forAll(payload, elemSize) { (raw, es) =>
      Hdf5.unshuffleBytes(Hdf5.shuffleBytes(raw, es), es).toSeq == raw.toSeq
    }

  property("shuffle is a permutation: same multiset of bytes, same length") =
    forAll(payload, elemSize) { (raw, es) =>
      val s = Hdf5.shuffleBytes(raw, es)
      s.length == raw.length && s.toSeq.sorted == raw.toSeq.sorted
    }

  property("stored pipeline bytes decode back to the raw chunk") =
    forAll(payload, elemSize, Gen.chooseNum(1, 9)) { (raw, es, level) =>
      // writer side: shuffle → deflate(level) → fletcher32 appended
      val stored = Hdf5.storedChunkBytes(raw, es, level)
      // reader side, pipeline in reverse: verify+strip checksum, inflate,
      // unshuffle — the same composition chunkValues applies
      val n = stored.length - 4
      val ck = (stored(n) & 0xFF) | ((stored(n + 1) & 0xFF) << 8) |
        ((stored(n + 2) & 0xFF) << 16) | ((stored(n + 3) & 0xFF) << 24)
      val computed = Hdf5.fletcher32(stored, n)
      val inflated = Hdf5.inflateBytes(java.util.Arrays.copyOf(stored, n), "prop")
      ck == computed &&
        Hdf5.unshuffleBytes(inflated, es).toSeq == raw.toSeq
    }

  property("fletcher32 detects every single-byte corruption") =
    forAll(payload.suchThat(_.nonEmpty), Gen.chooseNum(0, Int.MaxValue),
      Gen.chooseNum(1, 255)) { (raw, posSeed, delta) =>
      val pos = posSeed % raw.length
      val bad = raw.clone()
      bad(pos) = (bad(pos) ^ delta).toByte
      Hdf5.fletcher32(bad, bad.length) != Hdf5.fletcher32(raw, raw.length)
    }

  property("v2-B-tree geometry: pointer widths from libhdf5's per-level maxima") =
    forAll(Gen.chooseNum(64, 1 << 16), Gen.chooseNum(16, 64),
      Gen.chooseNum(0, 4)) { (nodeSize, recordSize, depth) =>
      (nodeSize - 10) / recordSize < 1 || (try {
        val g = Hdf5.Bt2Geometry(nodeSize, recordSize, 8, depth)
        // cumMax grows strictly per level; every enc width covers its max
        g.info.map(_._2).sliding(2).forall {
          case Seq(a, b) => b > a; case _ => true
        } &&
        g.info.zipWithIndex.forall { case ((_, cum, w), lvl) =>
          if (lvl == 0) w == 0 // leaf pointers carry no subtree-total field
          else w >= 1 && w <= 8 && BigInt(cum) < (BigInt(1) << (8 * w)) } &&
        Hdf5.limitEncSize(g.maxLeafRec.toLong) == g.maxNrecSize
      } catch {
        // a node too small to hold one internal record is a LOUD reject
        // (same require the reader applies to on-disk geometry) — that
        // rejection is itself the correct behavior for the combo
        case e: IllegalArgumentException =>
          e.getMessage.contains("below one internal record")
      })
    }

  property("limitEncSize is the minimal byte width for its argument") =
    forAll(Gen.chooseNum(0L, Long.MaxValue)) { n =>
      val w = Hdf5.limitEncSize(n)
      w >= 1 && w <= 8 &&
        (BigInt(n) < (BigInt(1) << (8 * w))) &&
        (w == 1 || BigInt(n) >= (BigInt(1) << (8 * (w - 1))))
    }

  property("v2-B-tree chunk index round-trips any grid/node-size/filter combo") =
    forAll(Gen.chooseNum(1, 30), Gen.oneOf(128, 160, 256, 512),
      Gen.oneOf(0, 4)) { (nt, nodeSize, deflate) =>
      // end-to-end: writer plans a minimum-depth tree for nt chunks at
      // this node size, reader walks it back — values and chunk layout
      // must survive any (count, geometry, filtered?) combination
      val dir = java.nio.file.Files.createTempDirectory("graft-bt2-prop")
      try {
        val path = dir.resolve("g.h5").toString
        val vals = Array.tabulate(nt * 2)(i => 3.0 + i)
        Hdf5.write(path,
          dims = Seq(NetCdf.Dim("time", nt), NetCdf.Dim("lat", 2)),
          vars = Seq(
            (NetCdf.VarDef("time", Seq("time"), NetCdf.NcDouble),
              Array.tabulate(nt)(_.toDouble)),
            (NetCdf.VarDef("lat", Seq("lat"), NetCdf.NcDouble), Array(-1.0, 1.0)),
            (NetCdf.VarDef("x", Seq("time", "lat"), NetCdf.NcDouble), vals)),
          chunked = true, deflate = deflate, layoutVersion = 4,
          bt2Index = true, bt2NodeSize = nodeSize)
        val f = Hdf5.readStructure(path, Map.empty)
        val layoutOk = f.datasets.find(_.name == "x").get.layout match {
          case Hdf5.Chunked(cdims, cs) =>
            cdims == IndexedSeq(1, 2) && cs.length == nt &&
              cs.map(_.offsets.head) == (0 until nt).map(_.toLong)
          case _ => false
        }
        layoutOk && Hdf5.readVarDriver(path, Map.empty, "x").toSeq == vals.toSeq
      } finally {
        java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }

  property("fletcher32 matches across fold boundaries (>=360-word blocks)") =
    forAll(Gen.chooseNum(700, 740), Gen.chooseNum(-128, 127).map(_.toByte)) {
      (nWords, fill) =>
        // a constant block crossing the 360-word partial-fold boundary:
        // recomputing over a copy must agree (fold arithmetic is stable)
        val raw = Array.fill(nWords * 2)(fill)
        Hdf5.fletcher32(raw, raw.length) == Hdf5.fletcher32(raw.clone(), raw.length)
    }

  property("nbit packs/unpacks int32 exactly at any precision 2..32") =
    forAll(Gen.chooseNum(2, 32), Gen.chooseNum(1, 200),
      Gen.chooseNum(0, Int.MaxValue)) { (prec, n, seed) =>
      val rnd = new scala.util.Random(seed)
      // signed values that fit `prec` bits
      val lo = if (prec >= 32) Int.MinValue.toLong else -(1L << (prec - 1))
      val hi = if (prec >= 32) Int.MaxValue.toLong else (1L << (prec - 1)) - 1
      val vals = Array.fill(n)(lo + (math.abs(rnd.nextLong()) % (hi - lo + 1)))
      val raw = new Array[Byte](n * 4)
      vals.zipWithIndex.foreach { case (v, i) => Nbit.writeLe(raw, i * 4, 4, v) }
      val enc = Nbit.encode(raw, 4, prec, 0, signed = true, "prop")
      val dec = Nbit.decode(enc, n, 4, prec, 0, signed = true, "prop")
      enc.length <= raw.length &&
        (0 until n).forall(i =>
          ((Nbit.readLe(dec, i * 4, 4) << 32) >> 32) == vals(i))
    }

  property("scaleoffset int-type roundtrips any int32 multiset; header-" +
    "only when constant") =
    forAll(Gen.chooseNum(1, 200), Gen.chooseNum(0, Int.MaxValue),
      Gen.oneOf(true, false)) { (n, seed, constant) =>
      val rnd = new scala.util.Random(seed)
      val vals =
        if (constant) Array.fill(n)(rnd.nextInt().toLong)
        else Array.fill(n)(rnd.nextInt().toLong)
      if (constant) java.util.Arrays.fill(vals, vals(0))
      val raw = new Array[Byte](n * 4)
      vals.zipWithIndex.foreach { case (v, i) => Nbit.writeLe(raw, i * 4, 4, v) }
      val p = ScaleOffset.Params(ScaleOffset.IntType, 0, 4, signed = true,
        isFloat = false)
      val enc = ScaleOffset.encode(raw, p, "prop")
      val dec = ScaleOffset.decode(enc, n, p, "prop")
      (!constant || enc.length == 13) && dec.toSeq == raw.toSeq
    }

  property("scaleoffset D-scale is exact on values pre-rounded to the " +
    "factor's decimals") =
    forAll(Gen.chooseNum(0, 6), Gen.chooseNum(1, 100),
      Gen.chooseNum(0, Int.MaxValue)) { (d, n, seed) =>
      val rnd = new scala.util.Random(seed)
      val scale = math.pow(10.0, d)
      val vals = Array.fill(n)((rnd.nextInt(2000001) - 1000000) / scale)
      val raw = new Array[Byte](n * 8)
      vals.zipWithIndex.foreach { case (v, i) =>
        Nbit.writeLe(raw, i * 8, 8, java.lang.Double.doubleToLongBits(v)) }
      val p = ScaleOffset.Params(ScaleOffset.FloatDScale, d, 8, signed = true,
        isFloat = true)
      val dec = ScaleOffset.decode(ScaleOffset.encode(raw, p, "prop"), n, p, "prop")
      (0 until n).forall(i =>
        java.lang.Double.longBitsToDouble(Nbit.readLe(dec, i * 8, 8)) == vals(i))
    }
}
