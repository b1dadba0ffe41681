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

  property("fletcher32 matches across fold boundaries (>=360-word blocks)") =
    forAll(Gen.chooseNum(700, 740), Gen.chooseNum(-128, 127).map(_.toByte)) {
      (nWords, fill) =>
        // a constant block crossing the 360-word partial-fold boundary:
        // recomputing over a copy must agree (fold arithmetic is stable)
        val raw = Array.fill(nWords * 2)(fill)
        Hdf5.fletcher32(raw, raw.length) == Hdf5.fletcher32(raw.clone(), raw.length)
    }
}
