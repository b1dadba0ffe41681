package graft.ingest

import java.io.{BufferedInputStream, EOFException, InputStream, PushbackInputStream}
import java.util.zip.{CRC32, Inflater}

/** From-spec (RFC 1952) reader for CONCATENATED gzip members — the
  * `.warc.gz` layout — with the loud-reject guarantees
  * `java.util.zip.GZIPInputStream` does not give: its multi-member
  * support swallows a corrupt next-member header (an IOException inside
  * `readTrailer` is reported as clean EOF), so a crawl segment whose
  * writer died mid-member silently yields a TRUNCATED record stream.
  * Here every member's header is validated, the deflate body is
  * inflated raw, the CRC32 + ISIZE trailer is VERIFIED, and bytes after
  * a member must be another well-formed member — anything else throws
  * with the caller's context string.
  */
object Gzip {

  /** One InputStream over the concatenation of all members of `raw`. */
  def memberStream(raw: InputStream, ctx: String): InputStream =
    new MemberStream(raw, ctx)

  private final class MemberStream(raw: InputStream, ctx: String)
      extends InputStream {
    private val in = new PushbackInputStream(
      new BufferedInputStream(raw, 1 << 16), FeedSize)
    private var inf: Inflater = null
    private val crc = new CRC32
    private var isize = 0L
    private val feed = new Array[Byte](FeedSize)
    private var feedLen = 0 // bytes of `feed` handed to the inflater
    private var done = false

    private def readByte(): Int = {
      val b = in.read()
      if (b < 0) throw new EOFException(s"$ctx: truncated gzip member")
      b
    }

    private def readLe16(): Int = readByte() | (readByte() << 8)

    private def readLe32(): Long =
      readByte().toLong | (readByte().toLong << 8) |
        (readByte().toLong << 16) | (readByte().toLong << 24)

    private def skipFully(n: Int): Unit = (0 until n).foreach(_ => readByte())

    private def skipZeroTerminated(): Unit = {
      var b = readByte()
      while (b != 0) b = readByte()
    }

    /** RFC 1952 §2.3 member header. False = clean EOF at a boundary. */
    private def readHeader(): Boolean = {
      val b0 = in.read()
      if (b0 < 0) return false
      val b1 = in.read()
      require(b0 == 0x1f && b1 == 0x8b,
        s"$ctx: bad gzip member magic " +
          f"0x$b0%02x${if (b1 < 0) "<EOF>" else f"0x$b1%02x"}")
      val cm = readByte()
      require(cm == 8, s"$ctx: unsupported gzip compression method $cm")
      val flg = readByte()
      require((flg & 0xe0) == 0, s"$ctx: reserved gzip FLG bits set ($flg)")
      skipFully(6) // MTIME(4) XFL OS
      if ((flg & 4) != 0) skipFully(readLe16()) // FEXTRA
      if ((flg & 8) != 0) skipZeroTerminated() // FNAME
      if ((flg & 16) != 0) skipZeroTerminated() // FCOMMENT
      if ((flg & 2) != 0) skipFully(2) // FHCRC
      inf = new Inflater(true)
      crc.reset(); isize = 0L; feedLen = 0
      true
    }

    /** End-of-member: push back over-read bytes, verify the trailer. */
    private def finishMember(): Unit = {
      val rem = inf.getRemaining
      if (rem > 0) in.unread(feed, feedLen - rem, rem)
      inf.end(); inf = null
      val crcStored = readLe32()
      require(crcStored == crc.getValue,
        s"$ctx: gzip CRC mismatch (stored $crcStored, computed ${crc.getValue})")
      val isizeStored = readLe32()
      require(isizeStored == (isize & 0xffffffffL),
        s"$ctx: gzip ISIZE mismatch (stored $isizeStored, actual $isize)")
    }

    override def read(): Int = {
      val one = new Array[Byte](1)
      val n = read(one, 0, 1)
      if (n < 0) -1 else one(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (done) return -1
      if (len == 0) return 0
      // loop, not recursion: a member can legally inflate to 0 bytes
      // (RFC 1952 allows empty members, and crafted archives can chain
      // thousands of them) — one stack frame per exhausted member would
      // overflow on such input
      while (true) {
        if (inf == null && !readHeader()) { done = true; return -1 }
        var n = inf.inflate(b, off, len)
        while (n == 0 && !inf.finished()) {
          if (inf.needsDictionary())
            sys.error(s"$ctx: gzip deflate stream demands a preset dictionary")
          if (inf.needsInput()) {
            val k = in.read(feed)
            if (k <= 0) throw new EOFException(
              s"$ctx: truncated gzip member (EOF inside the deflate stream)")
            feedLen = k
            inf.setInput(feed, 0, k)
          }
          n = inf.inflate(b, off, len)
        }
        if (n > 0) { crc.update(b, off, n); isize += n }
        if (inf.finished()) finishMember()
        if (n > 0) return n
        // n == 0: member ended with no bytes for the caller — try the next
      }
      -1 // unreachable
    }

    override def close(): Unit = {
      if (inf != null) { inf.end(); inf = null }
      in.close()
    }
  }

  private val FeedSize = 1 << 15
}
