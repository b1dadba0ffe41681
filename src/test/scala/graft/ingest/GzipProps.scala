package graft.ingest

import java.io.ByteArrayInputStream
import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Generator-driven properties for the from-spec RFC 1952 member reader
  * (Gzip.scala): any payloads, any member split, any read-chunk size —
  * the concatenated stream decodes back byte-for-byte; corruption
  * anywhere (flip, truncation, trailing garbage) throws rather than
  * truncating silently. Complements WarcSpec's file-level cases.
  */
object GzipProps extends Properties("gzip-rfc1952") {

  private def gzipMember(payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(payload); gz.finish(); gz.close()
    bos.toByteArray
  }

  private def readAll(bytes: Array[Byte], chunk: Int): Array[Byte] = {
    val in = Gzip.memberStream(new ByteArrayInputStream(bytes), "prop")
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](chunk)
    var n = in.read(buf, 0, chunk)
    while (n >= 0) {
      out.write(buf, 0, n)
      n = in.read(buf, 0, chunk)
    }
    out.toByteArray
  }

  private val payloads: Gen[List[Array[Byte]]] = for {
    k <- Gen.chooseNum(1, 6)
    seed <- Gen.chooseNum(0, Int.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    List.fill(k) {
      rnd.nextInt(4) match {
        case 0 => Array.empty[Byte] // empty member is legal
        case 1 => Array.fill(rnd.nextInt(50))(65.toByte)
        case 2 => ("text " * (1 + rnd.nextInt(40))).getBytes
        case _ => Array.fill(rnd.nextInt(5000))(rnd.nextInt().toByte)
      }
    }
  }

  private val chunks: Gen[Int] = Gen.oneOf(1, 7, 512, 1 << 16)

  property("concatenated members decode back byte-for-byte at any chunk size") =
    forAll(payloads, chunks) { (ps, chunk) =>
      val bytes = ps.map(gzipMember).foldLeft(Array.empty[Byte])(_ ++ _)
      readAll(bytes, chunk).sameElements(ps.foldLeft(Array.empty[Byte])(_ ++ _))
    }

  property("tens of thousands of consecutive empty members decode " +
    "without stack growth (loop, not one frame per member)") =
    forAll(Gen.const(())) { _ =>
      // 30k empty members would overflow the stack if read() recursed
      // once per exhausted member (the pre-r14 implementation)
      val empty = gzipMember(Array.empty[Byte])
      val tail = gzipMember("end".getBytes)
      val bos = new ByteArrayOutputStream()
      (1 to 30000).foreach(_ => bos.write(empty))
      bos.write(tail)
      readAll(bos.toByteArray, 4096).sameElements("end".getBytes)
    }

  property("truncation anywhere inside the stream throws (never silent EOF)") =
    forAll(payloads, Gen.chooseNum(0, Int.MaxValue)) { (ps, seed) =>
      val bytes = ps.map(gzipMember).foldLeft(Array.empty[Byte])(_ ++ _)
      val rnd = new scala.util.Random(seed)
      val cut = 1 + rnd.nextInt(bytes.length - 1) // strictly inside
      val res = scala.util.Try(readAll(bytes.take(cut), 4096))
      // either it throws, or (cutting exactly at a member boundary) it
      // returns ONLY whole leading members — never a partial member
      res.isFailure || {
        val memberEnds = ps.map(gzipMember).scanLeft(0)(_ + _.length)
        memberEnds.contains(cut)
      }
    }

  property("trailing garbage after the last member throws") =
    forAll(payloads, Gen.chooseNum(0, Int.MaxValue)) { (ps, seed) =>
      val rnd = new scala.util.Random(seed)
      val garbage = Array.fill(1 + rnd.nextInt(20))(rnd.nextInt().toByte)
      // avoid garbage that IS a valid member start (0x1f 0x8b would be
      // read as a truncated member — also a throw, but assert the magic
      // reject deterministically by forcing a non-magic first byte)
      if (garbage(0) == 0x1f.toByte) garbage(0) = 0x20.toByte
      val bytes = ps.map(gzipMember).foldLeft(Array.empty[Byte])(_ ++ _) ++ garbage
      scala.util.Try(readAll(bytes, 4096)).isFailure
    }

  property("a flipped byte in the deflate body or trailer throws") =
    forAll(payloads.suchThat(_.exists(_.length > 20)),
        Gen.chooseNum(0, Int.MaxValue)) { (ps, seed) =>
      val members = ps.map(gzipMember)
      val bytes = members.foldLeft(Array.empty[Byte])(_ ++ _)
      val rnd = new scala.util.Random(seed)
      // flip inside the FIRST member past its 10-byte header, so the
      // corruption hits deflate data or the CRC/ISIZE trailer
      val m0 = members.head.length
      if (m0 <= 11) true // degenerate: nothing to flip safely
      else {
        val pos = 10 + rnd.nextInt(m0 - 10)
        val flipped = bytes.clone()
        flipped(pos) = (flipped(pos) ^ 0x41).toByte
        val res = scala.util.Try(readAll(flipped, 4096))
        // a flip can by chance produce another VALID deflate stream only
        // with vanishing probability; CRC32 catches payload corruption
        res.isFailure
      }
    }
}
