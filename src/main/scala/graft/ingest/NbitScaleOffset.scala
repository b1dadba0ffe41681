package graft.ingest

/** HDF5's two datatype-aware filters — N-bit (filter id 5) and
  * scale+offset (filter id 6) — implemented from their public
  * documentation (H5Pset_nbit / H5Pset_scaleoffset reference pages and
  * the HDF5 1.8 "N-bit and Scale+Offset filters" feature description;
  * reference reads them through libhdf5,
  * `/root/reference/src/climate_pipeline/ingest/netcdf_reader.py:13-77`).
  *
  * Semantics (the documented contract):
  *  - **N-bit** stores only the `precision` significant bits at
  *    `bitOffset` of each fixed-point element, dropping the padding the
  *    in-memory layout carries; reading restores full-size elements (a
  *    signed type sign-extends from its precision — what a consumer sees
  *    through the library's datatype conversion).
  *  - **Scale+offset** with `H5Z_SO_INT` packs `v − min(v)` in the
  *    minimal `minbits` per element after an integer min/max scan; with
  *    `H5Z_SO_FLOAT_DSCALE` it first fixes `round(v · 10^D)` (the
  *    documented GRiB D-scaling), making the filter lossy beyond D
  *    decimal places and exact within them.
  *
  * Bit-level layout: where the public spec is silent (it specifies the
  *  algorithm and the API, not the packed order), this writer/reader
  *  pair pins its own documented layout — elements in order, each
  *  contributing its bits MSB-first; scale+offset prepends the header
  *  `[minbits: u32 LE][minval width: u8 = 8][minval: i64 LE]`, matching
  *  the shape of libhdf5's stream (4-byte minbits, explicit-width
  *  minval). Fixtures written here are read back here; both directions
  *  are corrupt-input-loud (Hdf5Spec).
  */
private[ingest] object PackedBits {

  /** MSB-first bit packer: element i's bits land before element i+1's,
    * high bit first — the natural order a bit-level dump shows.
    */
  final class Writer(capacityBits: Long) {
    require(capacityBits <= Int.MaxValue.toLong * 8, "packed stream over 2 GiB")
    private val buf = new Array[Byte](((capacityBits + 7) / 8).toInt)
    private var bitPos = 0L

    def put(value: Long, nbits: Int): Unit = {
      var i = nbits - 1
      while (i >= 0) {
        if (((value >>> i) & 1L) != 0)
          buf((bitPos >>> 3).toInt) = (buf((bitPos >>> 3).toInt) |
            (0x80 >>> (bitPos & 7).toInt)).toByte
        bitPos += 1
        i -= 1
      }
    }

    def bytes: Array[Byte] = java.util.Arrays.copyOf(buf, ((bitPos + 7) / 8).toInt)
  }

  final class Reader(buf: Array[Byte], startByte: Int, ctx: String) {
    private var bitPos = startByte.toLong * 8

    def get(nbits: Int): Long = {
      if (bitPos + nbits > buf.length.toLong * 8)
        sys.error(s"$ctx: packed stream truncated " +
          s"(need $nbits bits at bit $bitPos of ${buf.length.toLong * 8})")
      var v = 0L
      var i = 0
      while (i < nbits) {
        v = (v << 1) | ((buf((bitPos >>> 3).toInt) >>> (7 - (bitPos & 7).toInt)) & 1)
        bitPos += 1
        i += 1
      }
      v
    }
  }
}

private[ingest] object Nbit {

  /** Pack `precision` bits at `bitOffset` of each little-endian
    * `elemSize`-byte element. Values that carry information OUTSIDE the
    * stored bits reject loudly — silently dropping significant bits
    * would corrupt data on the write path.
    */
  def encode(raw: Array[Byte], elemSize: Int, precision: Int,
             bitOffset: Int, signed: Boolean, ctx: String): Array[Byte] = {
    require(raw.length % elemSize == 0, s"$ctx: nbit input not element-aligned")
    require(precision >= 1 && bitOffset >= 0 &&
      precision + bitOffset <= elemSize * 8,
      s"$ctx: nbit precision $precision + offset $bitOffset vs ${elemSize * 8} bits")
    val n = raw.length / elemSize
    val w = new PackedBits.Writer(n.toLong * precision)
    var i = 0
    while (i < n) {
      val full = readLe(raw, i * elemSize, elemSize)
      val kept = (full >>> bitOffset) & mask(precision)
      // loud reject: the value must survive the roundtrip exactly —
      // reconstruct and compare against the original element
      val back =
        if (signed) signExtend(kept, precision) << bitOffset
        else kept << bitOffset
      val orig = if (signed && elemSize < 8) signExtend(full, elemSize * 8) else full
      if (back != orig)
        sys.error(s"$ctx: value ${orig} does not fit nbit precision " +
          s"$precision (offset $bitOffset) — write a wider precision")
      w.put(kept, precision)
      i += 1
    }
    w.bytes
  }

  /** Restore `nelems` full little-endian elements; signed types
    * sign-extend from the precision bit.
    *
    * The exact-length check is the foreign-layout tripwire: this reader
    * pins its own packed order (module doc), and a stream produced by a
    * different nbit implementation (libhdf5 carries additional header
    * bytes) will not measure exactly ceil(n·precision/8) — it must
    * REJECT, never decode to plausible garbage.
    */
  def decode(packed: Array[Byte], nelems: Int, elemSize: Int, precision: Int,
             bitOffset: Int, signed: Boolean, ctx: String): Array[Byte] = {
    require(precision >= 1 && bitOffset >= 0 &&
      precision + bitOffset <= elemSize * 8,
      s"$ctx: nbit precision $precision + offset $bitOffset vs ${elemSize * 8} bits")
    val expect = ((nelems.toLong * precision + 7) / 8).toInt
    require(packed.length == expect,
      s"$ctx: nbit stream is ${packed.length} bytes, this layout packs " +
        s"$nelems × $precision bits into $expect — foreign nbit layouts " +
        "(e.g. libhdf5's) are not readable here; repack with `h5repack -f GZIP=4`")
    val r = new PackedBits.Reader(packed, 0, ctx)
    val out = new Array[Byte](nelems * elemSize)
    var i = 0
    while (i < nelems) {
      val kept = r.get(precision)
      val full =
        if (signed) signExtend(kept, precision) << bitOffset
        else kept << bitOffset
      writeLe(out, i * elemSize, elemSize, full)
      i += 1
    }
    out
  }

  private def mask(bits: Int): Long = if (bits >= 64) -1L else (1L << bits) - 1
  private def signExtend(v: Long, bits: Int): Long =
    if (bits >= 64) v else (v << (64 - bits)) >> (64 - bits)

  private[ingest] def readLe(buf: Array[Byte], off: Int, size: Int): Long = {
    var v = 0L
    var i = size - 1
    while (i >= 0) { v = (v << 8) | (buf(off + i) & 0xFFL); i -= 1 }
    v
  }

  private[ingest] def writeLe(buf: Array[Byte], off: Int, size: Int, v: Long): Unit = {
    var i = 0
    while (i < size) { buf(off + i) = ((v >>> (8 * i)) & 0xFF).toByte; i += 1 }
  }
}

private[ingest] object ScaleOffset {

  /** H5Z_SO_* scale types (public H5Pset_scaleoffset enum values). */
  val FloatDScale = 0
  val IntType = 2

  final case class Params(scaleType: Int, scaleFactor: Int, elemSize: Int,
                          signed: Boolean, isFloat: Boolean) {
    require(scaleType == FloatDScale || scaleType == IntType,
      s"scaleoffset scale type $scaleType (0 = float D-scale, 2 = int)")
    require(!isFloat || scaleType == FloatDScale,
      "float data requires the D-scale type")
    require(isFloat || scaleType == IntType, "integer data requires the int type")
    require(scaleFactor >= 0 && scaleFactor <= 15,
      s"D-scale factor $scaleFactor out of [0, 15]")
    // toFixed/fromFixed address float buffers at 4/8-byte strides only;
    // a 2-byte float (HDF5 cls 1, size 2) must reject loudly here rather
    // than corrupt strides or overrun the element buffer downstream
    require(!isFloat || elemSize == 4 || elemSize == 8,
      s"scaleoffset D-scale supports 4/8-byte floats, got $elemSize bytes")
  }

  private def pow10(d: Int): Double = math.pow(10.0, d)

  /** Element → fixed integer: identity for ints, round(v·10^D) for
    * floats (loud on non-finite — D-scaling cannot represent them).
    */
  private def toFixed(raw: Array[Byte], i: Int, p: Params, ctx: String): Long =
    if (!p.isFloat) {
      val v = Nbit.readLe(raw, i * p.elemSize, p.elemSize)
      if (p.signed && p.elemSize < 8) (v << (64 - p.elemSize * 8)) >> (64 - p.elemSize * 8)
      else v
    } else {
      val v =
        if (p.elemSize == 8)
          java.lang.Double.longBitsToDouble(Nbit.readLe(raw, i * 8, 8))
        else
          java.lang.Float.intBitsToFloat(Nbit.readLe(raw, i * 4, 4).toInt).toDouble
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
        sys.error(s"$ctx: scaleoffset D-scale cannot represent non-finite value $v")
      math.round(v * pow10(p.scaleFactor))
    }

  private def fromFixed(out: Array[Byte], i: Int, p: Params, fixed: Long): Unit =
    if (!p.isFloat) Nbit.writeLe(out, i * p.elemSize, p.elemSize, fixed)
    else if (p.elemSize == 8)
      Nbit.writeLe(out, i * 8, 8,
        java.lang.Double.doubleToLongBits(fixed.toDouble / pow10(p.scaleFactor)))
    else
      Nbit.writeLe(out, i * 4, 4,
        java.lang.Float.floatToIntBits(
          (fixed.toDouble / pow10(p.scaleFactor)).toFloat).toLong & 0xFFFFFFFFL)

  /** `[minbits u32 LE][minval width u8 = 8][minval i64 LE][packed bits]`:
    * each element stores `fixed(v) − min` in `minbits` bits; minbits = 0
    * (constant chunk) stores the header alone.
    */
  def encode(raw: Array[Byte], p: Params, ctx: String): Array[Byte] = {
    require(raw.length % p.elemSize == 0, s"$ctx: scaleoffset input not element-aligned")
    val n = raw.length / p.elemSize
    require(n > 0, s"$ctx: scaleoffset on an empty chunk")
    val fixed = new Array[Long](n)
    var i = 0
    while (i < n) { fixed(i) = toFixed(raw, i, p, ctx); i += 1 }
    val minV = fixed.min
    val maxV = fixed.max
    val span = maxV - minV // fits: fixture ranges are far below 2^63
    require(span >= 0, s"$ctx: scaleoffset range overflow (min $minV, max $maxV)")
    val minbits = 64 - java.lang.Long.numberOfLeadingZeros(span) // 0 when span=0
    val header = new Array[Byte](13)
    header(0) = minbits.toByte
    header(1) = (minbits >>> 8).toByte
    header(2) = (minbits >>> 16).toByte
    header(3) = (minbits >>> 24).toByte
    header(4) = 8
    Nbit.writeLe(header, 5, 8, minV)
    if (minbits == 0) header
    else {
      val w = new PackedBits.Writer(n.toLong * minbits)
      i = 0
      while (i < n) { w.put(fixed(i) - minV, minbits); i += 1 }
      header ++ w.bytes
    }
  }

  def decode(stored: Array[Byte], nelems: Int, p: Params, ctx: String): Array[Byte] = {
    require(stored.length >= 13,
      s"$ctx: scaleoffset chunk under the 13-byte header (${stored.length} bytes)")
    val minbits = (stored(0) & 0xFF) | ((stored(1) & 0xFF) << 8) |
      ((stored(2) & 0xFF) << 16) | ((stored(3) & 0xFF) << 24)
    require(minbits >= 0 && minbits <= 64,
      s"$ctx: scaleoffset header claims $minbits minbits — corrupt stream")
    val minWidth = stored(4) & 0xFF
    require(minWidth == 8,
      s"$ctx: scaleoffset minval width $minWidth (this layout writes 8)")
    val minV = Nbit.readLe(stored, 5, 8)
    // exact-length tripwire (see Nbit.decode): a stream from a different
    // scale+offset implementation must reject, not decode to garbage
    val expect = 13 + (if (minbits == 0) 0
                       else ((nelems.toLong * minbits + 7) / 8).toInt)
    require(stored.length == expect,
      s"$ctx: scaleoffset stream is ${stored.length} bytes, this layout " +
        s"stores $expect for $nelems × $minbits bits — foreign layouts " +
        "(e.g. libhdf5's) are not readable here; repack with `h5repack -f GZIP=4`")
    val out = new Array[Byte](nelems * p.elemSize)
    if (minbits == 0) {
      var i = 0
      while (i < nelems) { fromFixed(out, i, p, minV); i += 1 }
    } else {
      val r = new PackedBits.Reader(stored, 13, ctx)
      var i = 0
      while (i < nelems) { fromFixed(out, i, p, minV + r.get(minbits)); i += 1 }
    }
    out
  }
}
