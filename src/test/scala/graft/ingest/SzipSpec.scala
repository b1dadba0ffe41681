package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** CCSDS-121 coder unit tests (the HDF5 szip filter's algorithm). All
  * streams here are produced and consumed by Szip.scala — the format
  * contract under test is the Blue Book structure: ID fields, FS codes,
  * k-split layout, zero-block runs, NN mapping, reference samples.
  */
class SzipSpec extends AnyFunSuite {

  private def params(mask: Int = Szip.Ec | Szip.Nn | Szip.Lsb | Szip.Raw,
                     bpp: Int = 8, ppb: Int = 32, pps: Int = 1024) =
    Szip.Params(mask, bpp, ppb, pps)

  private def roundtrip(data: Array[Byte], p: Szip.Params): Unit = {
    val enc = Szip.encode(data, p)
    val dec = Szip.decode(enc, data.length, p)
    assert(dec.toSeq == data.toSeq,
      s"roundtrip failed for ${data.length} bytes under $p")
  }

  test("roundtrip: smooth, noisy, constant, and empty 8-bit data") {
    val rnd = new scala.util.Random(7)
    val smooth = Array.tabulate(5000)(i => (100 + 3 * math.sin(i / 20.0)).toByte)
    val noise = Array.fill(5000)(rnd.nextInt().toByte)
    val const = Array.fill(5000)(42.toByte)
    val ramp = Array.tabulate(5000)(i => (i % 251).toByte)
    Seq(smooth, noise, const, ramp, Array.empty[Byte], Array[Byte](7))
      .foreach(roundtrip(_, params()))
  }

  test("roundtrip: 16- and 32-bit samples, LSB and MSB byte orders") {
    val rnd = new scala.util.Random(13)
    for (bpp <- Seq(16, 32); msb <- Seq(false, true)) {
      val mask = Szip.Ec | Szip.Nn | Szip.Raw |
        (if (msb) Szip.Msb else Szip.Lsb)
      // sample-aligned byte counts; mildly correlated values so NN bites
      val n = 400 * (bpp / 8)
      val data = new Array[Byte](n)
      var v = 1000
      for (i <- 0 until n) { v += rnd.nextInt(7) - 3; data(i) = v.toByte }
      roundtrip(data, params(mask, bpp, ppb = 16, pps = 256))
    }
  }

  test("roundtrip without preprocessing (EC only, no NN)") {
    val rnd = new scala.util.Random(3)
    val data = Array.fill(3000)((rnd.nextInt(16)).toByte) // low entropy
    roundtrip(data, params(mask = Szip.Ec | Szip.Lsb | Szip.Raw))
  }

  test("zero runs compress through zero-blocks and cross segment boundaries") {
    // constant data under NN → all deltas zero → zero-block runs; 100
    // blocks of 8 pixels per scanline of 1024 → runs longer than the
    // 64-block segment, forcing the explicit-count split at the boundary
    val data = Array.fill(4096)(9.toByte)
    val p = params(ppb = 8, pps = 1024)
    val enc = Szip.encode(data, p)
    assert(enc.length < data.length / 20,
      s"zero-block runs should collapse constant data, got ${enc.length} B")
    assert(Szip.decode(enc, data.length, p).toSeq == data.toSeq)
  }

  test("short final scanline and short final block roundtrip") {
    val rnd = new scala.util.Random(21)
    // 1000 samples with pps = 384, ppb = 32: two full scanlines + a 232-
    // sample tail whose last block is 8 samples
    val data = Array.tabulate(1000)(i => (i / 3 + rnd.nextInt(3)).toByte)
    roundtrip(data, params(ppb = 32, pps = 384))
  }

  test("decoder inverts the second-extension option (decode-only path)") {
    // hand-assemble a one-scanline stream: EC only (no ref), J = 8, one
    // block coded with the second extension. Pairs (a,b) → FS((a+b)(a+b+1)/2+b).
    val p = params(mask = Szip.Ec | Szip.Lsb | Szip.Raw, ppb = 8, pps = 8)
    val samples = Array[Int](0, 1, 1, 0, 2, 0, 0, 2)
    val bits = new StringBuilder
    bits.append("000") // ID: low-entropy prefix (3 bits for 8-bit data)
    bits.append("1")   // '1' → second extension
    samples.grouped(2).foreach { case Array(a, b) =>
      val gamma = (a + b) * (a + b + 1) / 2 + b
      bits.append("0" * gamma).append("1") // FS
    }
    val padded = bits.toString.padTo((bits.length + 7) / 8 * 8, '0')
    val raw = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val dec = Szip.decode(raw, samples.length, p)
    assert(dec.map(_.toInt).toSeq == samples.toSeq)
  }

  test("corrupt streams loud-reject, never mis-decode") {
    val data = Array.tabulate(2000)(i => (i % 97).toByte)
    val p = params()
    val enc = Szip.encode(data, p)
    // truncation → "bitstream truncated"
    val short = java.util.Arrays.copyOf(enc, enc.length / 2)
    val e1 = intercept[Exception](Szip.decode(short, data.length, p))
    assert(e1.getMessage.contains("truncated"), e1.getMessage)
    // wrong decoded length → truncated or out-of-range, never silence
    intercept[Exception](Szip.decode(enc, data.length * 2, p))
    // parameter validation
    val e2 = intercept[Exception](
      Szip.decode(enc, data.length, p.copy(optionsMask = Szip.Ec | Szip.Lsb)))
    assert(e2.getMessage.contains("RAW"), e2.getMessage)
    val e3 = intercept[Exception](
      Szip.decode(enc, data.length, p.copy(bitsPerPixel = 24)))
    assert(e3.getMessage.contains("bits-per-pixel"), e3.getMessage)
  }

  test("encoder picks the cheap option: noise stays ~raw, smooth shrinks") {
    val rnd = new scala.util.Random(31)
    val noise = Array.fill(8192)(rnd.nextInt().toByte)
    val smooth = Array.tabulate(8192)(i => (50 + (i % 3)).toByte)
    val p = params()
    val encNoise = Szip.encode(noise, p)
    val encSmooth = Szip.encode(smooth, p)
    // uncompressed option bounds the expansion to ID bits per block
    val maxOverhead = 1.0 + (p.idLen + 8.0) / (8.0 * p.pixelsPerBlock) + 0.01
    assert(encNoise.length <= (noise.length * maxOverhead).toInt + 16,
      s"noise expanded to ${encNoise.length} B")
    // deltas cycle (+1, +1, −2) → mapped (2, 2, 3) → ~3 bits/sample under
    // the k-split options, ~2.5× compression
    assert(encSmooth.length < smooth.length / 2,
      s"smooth data should compress well, got ${encSmooth.length} B")
  }
}
