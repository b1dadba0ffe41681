package graft.ingest

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Generator-driven properties for the CCSDS-121 coder (Szip.scala): any
  * byte payload, any admissible parameter combination, encode∘decode is
  * the identity. Complements SzipSpec's structural/corruption tests.
  */
object SzipProps extends Properties("szip-ccsds121") {

  private val bpp: Gen[Int] = Gen.oneOf(8, 16, 32)
  private val ppb: Gen[Int] = Gen.oneOf(8, 16, 32)
  private val blocksPerLine: Gen[Int] = Gen.chooseNum(1, 8)
  private val nn: Gen[Boolean] = Gen.oneOf(true, false)
  private val msb: Gen[Boolean] = Gen.oneOf(true, false)

  // mix of entropy regimes: constant runs, small deltas, full noise —
  // sample-aligned lengths including zero and non-multiple-of-scanline
  private def payload(bytesPerSample: Int): Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 300)
    mode <- Gen.oneOf(0, 1, 2)
    seed <- Gen.chooseNum(0, Int.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    val len = n * bytesPerSample
    mode match {
      case 0 => Array.fill(len)(17.toByte)
      case 1 =>
        var v = 100
        Array.fill(len) { v += rnd.nextInt(5) - 2; v.toByte }
      case _ => Array.fill(len)(rnd.nextInt().toByte)
    }
  }

  property("decode inverts encode for any payload and parameters") =
    forAll(bpp, ppb, blocksPerLine, nn, msb, Gen.chooseNum(0, Int.MaxValue)) {
      (n, j, bpl, useNn, useMsb, seed) =>
        val mask = Szip.Ec | Szip.Raw |
          (if (useNn) Szip.Nn else 0) | (if (useMsb) Szip.Msb else Szip.Lsb)
        val p = Szip.Params(mask, n, j, j * bpl)
        val data = payload(n / 8).pureApply(
          org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(seed))
        val enc = Szip.encode(data, p)
        Szip.decode(enc, data.length, p).toSeq == data.toSeq
    }
}
