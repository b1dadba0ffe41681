package graft.ingest

/** CCSDS 121.0-B-2 lossless coder — the algorithm behind HDF5's szip
  * filter (registered filter id 4), written from the public Blue Book and
  * the szip/libaec stream conventions. No szip/libaec code is used or
  * linked; this exists so szip-compressed NetCDF-4/HDF5 archives (ERA5-era
  * data commonly ships with `H5Pset_szip`) stop being a loud reject.
  *
  * Scope and framing (everything else loud-rejects with a precise message):
  *
  *  - HDF5 always sets SZ_RAW_OPTION_MASK: the stored chunk is a bare
  *    CCSDS bitstream with NO szip header — all parameters ride in the
  *    filter's client data (options mask, bits/pixel, pixels/block,
  *    pixels/scanline). [[Hdf5]] strips HDF5's own 4-byte LE original-size
  *    prefix before calling [[decode]].
  *  - Entropy coding (SZ_EC_OPTION_MASK) with optional nearest-neighbor
  *    preprocessing (SZ_NN_OPTION_MASK): unit-delay prediction with the
  *    standard CCSDS delta mapping, one reference sample per scanline.
  *  - Bits are MSB-first in the stream; input samples assemble from bytes
  *    little-endian under SZ_LSB_OPTION_MASK (HDF5's choice for LE data)
  *    or big-endian under SZ_MSB_OPTION_MASK.
  *  - Per J-sample block, an ID field (3 bits for n ≤ 8, 4 for n ≤ 16,
  *    else 5) selects: all-zeros+`0` → zero-block run (FS-coded count,
  *    1..4 → f = c−1, run ≥ 5 → f = c, f = 4 reserved for
  *    remainder-of-segment); all-zeros+`1` → second extension (pairwise
  *    (a+b)(a+b+1)/2+b, FS-coded); value v in 1..2^len−2 → k-split with
  *    k = v−1 (FS-coded high parts, then k raw LSBs per sample); all-ones
  *    → uncompressed (n raw bits per preprocessed sample).
  *  - A reference-bearing block (the first of each scanline under NN)
  *    emits the n-bit raw reference immediately after the ID, then codes
  *    the remaining J−1 samples — the libaec/szip convention. The encoder
  *    never picks zero-block/second-extension for a reference block; the
  *    decoder rejects second-extension there (J−1 is odd) but accepts
  *    zero-block.
  *  - Zero-block segments are 64 blocks, counted within a scanline. The
  *    encoder always emits explicit counts (never remainder-of-segment);
  *    the decoder accepts ROS as "to the end of the current segment or
  *    scanline, whichever is nearer".
  *  - The final scanline (and its final block) may be short; sample
  *    counts derive from the caller-supplied decoded byte length.
  */
private[ingest] object Szip {

  // SZ_*_OPTION_MASK bits (public szlib.h interface constants)
  val AllowK13 = 1
  val Chip = 2
  val Ec = 4
  val Lsb = 8
  val Msb = 16
  val Nn = 32
  val Raw = 128

  final case class Params(optionsMask: Int, bitsPerPixel: Int,
                          pixelsPerBlock: Int, pixelsPerScanline: Int) {
    def nn: Boolean = (optionsMask & Nn) != 0
    def msb: Boolean = (optionsMask & Msb) != 0
    def idLen: Int =
      if (bitsPerPixel <= 8) 3 else if (bitsPerPixel <= 16) 4 else 5

    def validate(where: String): Unit = {
      require((optionsMask & Raw) != 0,
        s"$where: szip stream with an szip-internal header (RAW option " +
          "unset) — HDF5 always writes raw streams; refusing to guess")
      require((optionsMask & Ec) != 0,
        s"$where: szip without the entropy-coding option (mask $optionsMask)")
      require(Seq(8, 16, 32).contains(bitsPerPixel),
        s"$where: szip bits-per-pixel $bitsPerPixel (8/16/32 supported)")
      require(pixelsPerBlock > 0 && pixelsPerBlock <= 32 &&
          pixelsPerBlock % 2 == 0,
        s"$where: szip pixels-per-block $pixelsPerBlock (even, <= 32)")
      require(pixelsPerScanline >= pixelsPerBlock &&
          pixelsPerScanline <= 128 * pixelsPerBlock,
        s"$where: szip pixels-per-scanline $pixelsPerScanline out of band")
    }
  }

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream(1 << 12)
    private var acc = 0L
    private var nAcc = 0
    def put(value: Long, bits: Int): Unit = {
      var left = bits
      while (left > 0) {
        val take = math.min(left, 56 - nAcc)
        acc = (acc << take) | ((value >>> (left - take)) & ((1L << take) - 1))
        nAcc += take; left -= take
        while (nAcc >= 8) {
          buf.write(((acc >>> (nAcc - 8)) & 0xFF).toInt)
          nAcc -= 8
        }
      }
    }
    def putFs(v: Long): Unit = { // v zeros then a 1, i.e. the value 1 in v+1 bits
      var left = v
      while (left >= 32) { put(0L, 32); left -= 32 }
      put(1L, left.toInt + 1)
    }
    def result(): Array[Byte] = {
      if (nAcc > 0) { buf.write(((acc << (8 - nAcc)) & 0xFF).toInt); nAcc = 0 }
      buf.toByteArray
    }
  }

  private final class BitReader(data: Array[Byte], where: String) {
    private var bitPos = 0L
    private val bitLen = data.length.toLong * 8
    def get(bits: Int): Long = {
      require(bitPos + bits <= bitLen, s"$where: szip bitstream truncated")
      var v = 0L
      var left = bits
      while (left > 0) {
        val byteIx = (bitPos >>> 3).toInt
        val bitIx = (bitPos & 7).toInt
        val take = math.min(left, 8 - bitIx)
        val chunk = (data(byteIx) >> (8 - bitIx - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        bitPos += take; left -= take
      }
      v
    }
    def getFs(maxZeros: Long): Long = {
      var zeros = 0L
      while (get(1) == 0L) {
        zeros += 1
        require(zeros <= maxZeros,
          s"$where: szip fundamental-sequence run over $maxZeros — corrupt stream")
      }
      zeros
    }
  }

  private def maxVal(n: Int): Long = if (n == 64) -1L else (1L << n) - 1

  /** CCSDS standard mapper: prediction error → non-negative integer. */
  private def mapDelta(x: Long, pred: Long, n: Int): Long = {
    val theta = math.min(pred, maxVal(n) - pred)
    val d = x - pred
    if (d >= 0 && d <= theta) 2 * d
    else if (d < 0 && -d <= theta) 2 * (-d) - 1
    else theta + math.abs(d)
  }

  private def unmapDelta(m: Long, pred: Long, n: Int, where: String): Long = {
    val theta = math.min(pred, maxVal(n) - pred)
    val d =
      if (m <= 2 * theta) { if (m % 2 == 0) m / 2 else -(m + 1) / 2 }
      else if (theta == pred) m - theta // negative range exhausted → positive
      else -(m - theta)
    val x = pred + d
    require(x >= 0 && x <= maxVal(n), s"$where: szip mapped value $m out of range")
    x
  }

  private def readSamples(data: Array[Byte], p: Params, where: String): Array[Long] = {
    val bytes = p.bitsPerPixel / 8
    require(data.length % bytes == 0,
      s"$where: szip input ${data.length} B not a multiple of sample size $bytes")
    val out = new Array[Long](data.length / bytes)
    var i = 0
    while (i < out.length) {
      var v = 0L
      var b = 0
      while (b < bytes) {
        val by = (data(i * bytes + b) & 0xFFL)
        v |= (if (p.msb) by << (8 * (bytes - 1 - b)) else by << (8 * b))
        b += 1
      }
      out(i) = v
      i += 1
    }
    out
  }

  private def writeSamples(samples: Array[Long], p: Params): Array[Byte] = {
    val bytes = p.bitsPerPixel / 8
    val out = new Array[Byte](samples.length * bytes)
    var i = 0
    while (i < samples.length) {
      var b = 0
      while (b < bytes) {
        val shift = if (p.msb) 8 * (bytes - 1 - b) else 8 * b
        out(i * bytes + b) = ((samples(i) >>> shift) & 0xFF).toByte
        b += 1
      }
      i += 1
    }
    out
  }

  private val SegmentBlocks = 64

  def encode(data: Array[Byte], p: Params, where: String = "szip"): Array[Byte] = {
    p.validate(where)
    val n = p.bitsPerPixel
    val idLen = p.idLen
    val uncompId = (1L << idLen) - 1
    val kMax = (1 << idLen) - 3 // ids 1..2^len-2 → k = id-1
    val samples = readSamples(data, p, where)
    val w = new BitWriter
    var s0 = 0
    while (s0 < samples.length) {
      val line = math.min(p.pixelsPerScanline, samples.length - s0)
      // preprocess the scanline: mapped[0] = reference (raw) under NN
      val mapped = new Array[Long](line)
      if (p.nn) {
        mapped(0) = samples(s0)
        var i = 1
        while (i < line) {
          mapped(i) = mapDelta(samples(s0 + i), samples(s0 + i - 1), n)
          i += 1
        }
      } else {
        var i = 0
        while (i < line) { mapped(i) = samples(s0 + i); i += 1 }
      }
      // encode blocks, folding runs of all-zero non-reference blocks
      var b0 = 0
      var blockIx = 0
      var zeroRun = 0
      def flushZeros(): Unit = if (zeroRun > 0) {
        w.put(0L, idLen + 1) // low-entropy prefix + '0' → zero-block
        w.putFs(if (zeroRun <= 4) zeroRun - 1L else zeroRun.toLong)
        zeroRun = 0
      }
      while (b0 < line) {
        val len = math.min(p.pixelsPerBlock, line - b0)
        val ref = p.nn && b0 == 0
        val bodyStart = if (ref) b0 + 1 else b0
        var allZero = !ref
        var i = bodyStart
        while (allZero && i < b0 + len) { allZero = mapped(i) == 0; i += 1 }
        if (allZero && len == p.pixelsPerBlock) {
          zeroRun += 1
          // explicit counts only: split at segment boundaries (64 blocks)
          if ((blockIx + 1) % SegmentBlocks == 0) flushZeros()
        } else {
          flushZeros()
          // exact bit cost of each admissible option
          val body = java.util.Arrays.copyOfRange(mapped, bodyStart, b0 + len)
          val refBits = if (ref) n else 0
          var bestK = -1 // -1 → uncompressed
          var bestCost = idLen.toLong + refBits + body.length.toLong * n
          var k = 0
          while (k <= math.min(kMax, n - 1)) {
            var cost = idLen.toLong + refBits + k.toLong * body.length
            var i2 = 0
            while (i2 < body.length && cost < bestCost) {
              cost += (body(i2) >>> k) + 1; i2 += 1
            }
            if (cost < bestCost) { bestCost = cost; bestK = k }
            k += 1
          }
          if (bestK < 0) {
            w.put(uncompId, idLen)
            if (ref) w.put(mapped(b0), n)
            body.foreach(v => w.put(v, n))
          } else {
            w.put(bestK + 1L, idLen)
            if (ref) w.put(mapped(b0), n)
            body.foreach(v => w.putFs(v >>> bestK))
            if (bestK > 0) body.foreach(v => w.put(v, bestK))
          }
        }
        b0 += len
        blockIx += 1
      }
      flushZeros()
      s0 += line
    }
    w.result()
  }

  /** Decode `decodedLen` bytes from a raw CCSDS bitstream. */
  def decode(raw: Array[Byte], decodedLen: Int, p: Params,
             where: String = "szip"): Array[Byte] = {
    p.validate(where)
    val n = p.bitsPerPixel
    val idLen = p.idLen
    val uncompId = (1L << idLen) - 1
    require(decodedLen % (n / 8) == 0,
      s"$where: szip decoded length $decodedLen not a multiple of sample size")
    val total = decodedLen / (n / 8)
    val samples = new Array[Long](total)
    val r = new BitReader(raw, where)
    var s0 = 0
    while (s0 < total) {
      val line = math.min(p.pixelsPerScanline, total - s0)
      val mapped = new Array[Long](line)
      var b0 = 0
      var blockIx = 0
      while (b0 < line) {
        val len = math.min(p.pixelsPerBlock, line - b0)
        val ref = p.nn && b0 == 0
        val id = r.get(idLen)
        if (id == 0L) {
          if (r.get(1) == 0L) { // zero-block run
            if (ref) { mapped(b0) = r.get(n) } // raw reference, zero body
            val f = r.getFs(1L << 16)
            val blocksInLine = (line + p.pixelsPerBlock - 1) / p.pixelsPerBlock
            val count =
              if (f == 4L) { // remainder of segment (or scanline)
                val segEnd = (blockIx / SegmentBlocks + 1) * SegmentBlocks
                math.min(segEnd, blocksInLine) - blockIx
              }
              else if (f <= 3L) f + 1 else f
            require(count >= 1 && blockIx + count <= blocksInLine,
              s"$where: szip zero-block run $count overruns the scanline")
            // mapped() is zero-initialized: just advance
            var c = 1L
            var pos = b0 + len
            while (c < count) {
              pos += math.min(p.pixelsPerBlock, line - pos)
              c += 1
            }
            b0 = pos
            blockIx += count.toInt
          } else { // second extension
            require(!ref,
              s"$where: szip second-extension on a reference block (odd body)")
            require(len % 2 == 0,
              s"$where: szip second-extension on an odd-length short block")
            var i = 0
            while (i < len / 2) {
              val gamma = r.getFs(1L << 16)
              val ms = ((math.sqrt(8.0 * gamma + 1) - 1) / 2).toLong
              // exact triangular root (the float sqrt can be off by one)
              val m = if ((ms + 1) * (ms + 2) / 2 <= gamma) ms + 1
                      else if (ms * (ms + 1) / 2 > gamma) ms - 1 else ms
              val bVal = gamma - m * (m + 1) / 2
              val aVal = m - bVal
              require(aVal >= 0 && aVal <= maxVal(n) && bVal <= maxVal(n),
                s"$where: szip second-extension pair out of range")
              mapped(b0 + 2 * i) = aVal
              mapped(b0 + 2 * i + 1) = bVal
              i += 1
            }
            b0 += len
            blockIx += 1
          }
        } else {
          val bodyStart = if (ref) { mapped(b0) = r.get(n); b0 + 1 } else b0
          if (id == uncompId) {
            var i = bodyStart
            while (i < b0 + len) { mapped(i) = r.get(n); i += 1 }
          } else {
            val k = (id - 1).toInt
            require(k < n, s"$where: szip split k=$k >= sample bits $n")
            var i = bodyStart
            while (i < b0 + len) { mapped(i) = r.getFs(maxVal(n)) << k; i += 1 }
            if (k > 0) {
              i = bodyStart
              while (i < b0 + len) { mapped(i) |= r.get(k); i += 1 }
            }
          }
          b0 += len
          blockIx += 1
        }
      }
      // un-preprocess the scanline
      if (p.nn) {
        samples(s0) = mapped(0)
        require(samples(s0) <= maxVal(n), s"$where: szip reference out of range")
        var i = 1
        while (i < line) {
          samples(s0 + i) = unmapDelta(mapped(i), samples(s0 + i - 1), n, where)
          i += 1
        }
      } else {
        var i = 0
        while (i < line) {
          require(mapped(i) <= maxVal(n), s"$where: szip sample out of range")
          samples(s0 + i) = mapped(i)
          i += 1
        }
      }
      s0 += line
    }
    writeSamples(samples, p)
  }
}
