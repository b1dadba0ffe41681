package graft.ingest

import graft.SparkSpec

/** Randomized WARC roundtrips with adversarial payload bytes: the parser
  * is length-framed (Content-Length + CRLF CRLF trailer), so a payload
  * containing "WARC/1.0\r\n", a CRLF CRLF run, a gzip magic pair, NULs,
  * or nothing at all must never desync the record walk — this sweep
  * plants exactly those byte sequences inside randomly-sized records of
  * every type, writes a real .warc.gz, and checks the full read AND the
  * byte-range indexed read reproduce every record byte-for-byte.
  */
class WarcFuzzSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val Epoch = "2026-01-01T00:00:00Z"

  test("length-framed parse survives adversarial payload bytes (full + indexed read)") {
    val rnd = new scala.util.Random(20260816L)
    val traps: Seq[Array[Byte]] = Seq(
      "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes("UTF-8"),
      "\r\n\r\n\r\n\r\n".getBytes("UTF-8"),
      Array(0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0),
      Array.fill(16)(0.toByte),
      Array.emptyByteArray,
      "HTTP/1.1 200 OK\r\n\r\nnested".getBytes("UTF-8"),
      "héllo wörld — ünïcode 世界".getBytes("UTF-8"))
    def payload(k: Int): Array[Byte] = {
      val base = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      val trap = traps(k % traps.length)
      val at = if (base.isEmpty) 0 else rnd.nextInt(base.length)
      base.take(at) ++ trap ++ base.drop(at)
    }
    val types = Seq("response", "request", "metadata", "conversion", "resource")
    val recs = (0 until 40).map { k =>
      val body = payload(k)
      val t = types(k % types.length)
      val block =
        if (t == "response")
          Warc.httpResponseBlock(200 + (k % 4) * 100, "Status Reason Words",
            "application/octet-stream", body)
        else body
      Warc.WarcRecord(
        warcType = t,
        recordId = s"urn:fuzz:$k",
        date = java.time.Instant.parse(Epoch).plusSeconds(k.toLong).toString,
        block = block,
        targetUri = if (k % 3 == 0) None else Some(s"https://fuzz.example.com/r/$k"),
        contentType =
          if (t == "response") Some("application/http;msgtype=response")
          else Some("application/octet-stream")) -> body
    }
    val dir = tmpDir()
    val path = s"$dir/fuzz.warc.gz"
    val index = Warc.write(path, recs.map(_._1))
    assert(index.length == recs.length)

    def check(df: org.apache.spark.sql.DataFrame, expectN: Int, tag: String): Unit = {
      val rows = df.collect().map(r =>
        r.getAs[String]("warc_record_id") -> r).toMap
      assert(rows.size == expectN, s"$tag: ${rows.size} records, expected $expectN")
      recs.foreach { case (rec, body) =>
        rows.get(rec.recordId).foreach { r =>
          assert(r.getAs[String]("warc_type") == rec.warcType, s"$tag ${rec.recordId}: type")
          assert(r.getAs[Array[Byte]]("payload").sameElements(body),
            s"$tag ${rec.recordId}: payload bytes diverge")
          val ts = r.getAs[java.sql.Timestamp]("warc_date").toInstant
          assert(ts == java.time.Instant.parse(rec.date), s"$tag ${rec.recordId}: date")
          if (rec.warcType == "response")
            assert(r.getAs[Int]("http_status") ==
              200 + (rec.recordId.stripPrefix("urn:fuzz:").toInt % 4) * 100,
              s"$tag ${rec.recordId}: status")
          rec.targetUri match {
            case Some(u) => assert(r.getAs[String]("warc_target_uri") == u,
              s"$tag ${rec.recordId}: uri")
            case None => assert(r.isNullAt(r.fieldIndex("warc_target_uri")),
              s"$tag ${rec.recordId}: uri must be null")
          }
        }
      }
    }

    // full scan, no type filter: every record comes back byte-faithful
    check(Warc.read(spark, dir, types = Seq.empty), recs.length, "full")
    // type-filtered scan: exactly the responses
    val nResp = recs.count(_._1.warcType == "response")
    check(Warc.read(spark, dir, types = Seq("response")), nResp, "responses")
    // byte-range indexed read of every 3rd record: O(k) point lookups
    // must land on the same bytes the sequential walk produced
    import spark.implicits._
    val picked = recs.map(_._1.recordId).zip(index)
      .collect { case (id, (off, len)) if id.stripPrefix("urn:fuzz:").toInt % 3 == 0 =>
        (path, off, len)
      }
    val sliced = Warc.readIndexed(spark, picked.toDF("file", "offset", "length"))
    check(sliced, picked.length, "indexed")
  }
}
