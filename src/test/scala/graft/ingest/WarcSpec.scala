package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSpec {

  private def rec(i: Int, text: String) = Warc.WarcRecord(
    warcType = "response",
    recordId = s"urn:test:$i",
    date = f"2026-02-0${i % 9 + 1}T00:00:00Z",
    block = Warc.httpResponseBlock(200, "OK", "text/plain", text.getBytes(UTF_8)),
    targetUri = Some(s"https://h$i.example.com/p/$i"),
    contentType = Some("application/http;msgtype=response"))

  test("write/read roundtrip: gz and plain, payload and fields survive") {
    for (gz <- Seq(true, false)) {
      val path = tmpDir() + (if (gz) "/a.warc.gz" else "/a.warc")
      val recs = (0 until 20).map(i => rec(i, s"body number $i " * (i + 1)))
      Warc.write(path, recs, gzipPerRecord = gz)
      val df = Warc.read(spark, path).orderBy("record_seq")
      assert(df.count() == 20)
      val rows = df.collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[String]("warc_type") == "response")
        assert(r.getAs[String]("warc_target_uri") == s"https://h$i.example.com/p/$i")
        assert(r.getAs[Int]("http_status") == 200)
        assert(r.getAs[String]("http_content_type") == "text/plain")
        assert(new String(r.getAs[Array[Byte]]("payload"), UTF_8) ==
          s"body number $i " * (i + 1))
      }
    }
  }

  test("type filter drops non-matching records before rows are built") {
    val path = tmpDir() + "/b.warc.gz"
    val info = Warc.WarcRecord("warcinfo", "urn:test:info",
      "2026-02-01T00:00:00Z", "software: graft\r\n".getBytes(UTF_8),
      contentType = Some("application/warc-fields"))
    Warc.write(path, info +: (0 until 5).map(i => rec(i, s"t$i")))
    assert(Warc.read(spark, path).count() == 6)
    assert(Warc.read(spark, path, types = Seq("response")).count() == 5)
    assert(Warc.read(spark, path, types = Seq("warcinfo")).count() == 1)
  }

  test("directory read unions files; non-warc files ignored") {
    val dir = tmpDir()
    Warc.write(s"$dir/p0.warc.gz", (0 until 3).map(i => rec(i, "x")))
    Warc.write(s"$dir/p1.warc.gz", (3 until 7).map(i => rec(i, "y")))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/README"),
      "not a warc".getBytes(UTF_8))
    assert(Warc.read(spark, dir).count() == 7)
  }

  test("indexed read inflates exactly one member per slice") {
    import spark.implicits._
    val path = tmpDir() + "/c.warc.gz"
    val recs = (0 until 30).map(i => rec(i, s"payload $i " * 40))
    val idx = Warc.write(path, recs)
    assert(idx.length == 30)
    // offsets are strictly increasing and contiguous
    idx.sliding(2).foreach { case Seq((o1, l1), (o2, _)) => assert(o1 + l1 == o2) }
    val picks = Seq(0, 7, 29)
    val slices = picks.map(i => (path, idx(i)._1, idx(i)._2)).toDF("file", "offset", "length")
    val got = Warc.readIndexed(spark, slices)
      .select("warc_target_uri").as[String].collect().sorted
    assert(got.toSeq == picks.map(i => s"https://h$i.example.com/p/$i").sorted)
  }

  private def chainMsg(t: Throwable): String = {
    val sb = new StringBuilder
    var c: Throwable = t
    while (c != null) { sb.append(Option(c.getMessage).getOrElse("")); c = c.getCause }
    sb.toString
  }

  test("malformed input rejects loudly") {
    // bad magic
    val p1 = tmpDir() + "/bad.warc"
    java.nio.file.Files.write(java.nio.file.Paths.get(p1),
      "NOTWARC/1.1\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes(UTF_8))
    val e1 = intercept[Exception] { Warc.read(spark, p1).count() }
    assert(chainMsg(e1).contains("WARC version"))
    // truncated block: Content-Length larger than remaining bytes
    val p2 = tmpDir() + "/trunc.warc"
    java.nio.file.Files.write(java.nio.file.Paths.get(p2),
      ("WARC/1.1\r\nWARC-Type: resource\r\nWARC-Record-ID: <urn:x>\r\n" +
        "WARC-Date: 2026-02-01T00:00:00Z\r\nContent-Length: 99\r\n\r\nshort")
        .getBytes(UTF_8))
    val e2 = intercept[Exception] { Warc.read(spark, p2).count() }
    assert(chainMsg(e2).contains("truncated"))
    // missing mandatory field
    val p3 = tmpDir() + "/nofield.warc"
    java.nio.file.Files.write(java.nio.file.Paths.get(p3),
      "WARC/1.1\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes(UTF_8))
    val e3 = intercept[Exception] { Warc.read(spark, p3).count() }
    assert(chainMsg(e3).contains("mandatory"))
  }

  test("surt keys and CDXJ roundtrip (sorted lines, JSON escaping)") {
    assert(Warc.surtKey("https://WWW.Example.COM/Doc/1?q=2")
      == "com,example,www)/doc/1?q=2")
    assert(Warc.surtKey("http://host") == "host)/")
    assert(Warc.surtKey("https://a.b.co.uk/x") == "uk,co,b,a)/x")
    // port/userinfo must not ride on a host label: example.com:8080
    // sorts adjacent to the other example.com entries
    assert(Warc.surtKey("https://Example.COM:8080/x")
      == "com,example:8080)/x")
    assert(Warc.surtKey("https://user@example.com/x") == "com,example)/x")
    // query (or fragment) with NO path: must not fold into the last host
    // label — the key stays in its host's sort range, rooted at '/'
    assert(Warc.surtKey("http://example.com?q=1") == "com,example)/?q=1")
    assert(Warc.surtKey("http://example.com#frag") == "com,example)/#frag")
    assert(Warc.surtKey("http://example.com:8080?q=1")
      == "com,example:8080)/?q=1")
    // IPv6 literal: colons are address syntax — no label reversal, the
    // port only after the closing bracket
    assert(Warc.surtKey("http://[2001:db8::1]/x") == "[2001:db8::1])/x")
    assert(Warc.surtKey("http://[2001:db8::1]:8080/x")
      == "[2001:db8::1]:8080)/x")
    val p = tmpDir() + "/idx.cdxj"
    Warc.writeCdxj(Seq(
      Warc.CdxEntry("https://zz.example.com/1", "2026-02-03T04:05:06Z",
        "f1.warc.gz", 0L, 10L, 200, "text/plain"),
      Warc.CdxEntry("https://aa.example.com/2\"quote", "2026-01-01T00:00:00Z",
        "f2.warc.gz", 10L, 20L, 404, "text/html")), p)
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(p))
    assert(lines.get(0).startsWith("com,example,aa)/2\"quote 20260101000000 "))
    val df = Warc.readCdxj(spark, p).orderBy("urlkey").collect()
    assert(df.length == 2)
    assert(df(0).getAs[String]("url") == "https://aa.example.com/2\"quote")
    assert(df(0).getAs[Long]("offset") == 10L && df(0).getAs[Int]("status") == 404)
    assert(df(1).getAs[String]("cdx_ts") == "20260203040506")
    assert(df(1).getAs[Long]("length") == 10L)
  }

  test("malformed CDXJ line rejects even when only length (not offset) " +
    "is projected — the guard rides in both fetch-critical columns") {
    val p = tmpDir() + "/bad.cdxj"
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      ("com,example)/ 20260101000000 {\"url\": \"https://example.com/\", " +
        "\"filename\": \"f.warc.gz\", \"offset\": \"notanumber\", " +
        "\"length\": \"10\"}\n").getBytes(UTF_8))
    val e = intercept[Exception] {
      Warc.readCdxj(spark, p).select("url", "length").collect()
    }
    assert(chainMsg(e).contains("malformed CDXJ"))
    val e2 = intercept[Exception] {
      Warc.readCdxj(spark, p).select("file", "offset").collect()
    }
    assert(chainMsg(e2).contains("malformed CDXJ"))
  }

  test("truncated CDXJ line (< 3 tokens) reports the offending line under " +
    "ANSI mode instead of INVALID_ARRAY_INDEX") {
    val p = tmpDir() + "/short.cdxj"
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      "com,example)/ 20260815\n".getBytes(UTF_8))
    // exercise BOTH conf states: the diagnostic must not depend on the
    // session's ANSI setting (element_at would throw before the guard)
    Seq("true", "false").foreach { ansi =>
      val prev = spark.conf.get("spark.sql.ansi.enabled")
      spark.conf.set("spark.sql.ansi.enabled", ansi)
      try {
        val e = intercept[Exception] {
          Warc.readCdxj(spark, p).select("url", "offset").collect()
        }
        assert(chainMsg(e).contains("malformed CDXJ line: com,example)/ 20260815"),
          s"ansi=$ansi got: ${chainMsg(e)}")
      } finally spark.conf.set("spark.sql.ansi.enabled", prev)
    }
  }

  test("writeDistributed: one verified .warc.gz per non-empty partition, " +
    "roundtrips through read") {
    import spark.implicits._
    val dir = tmpDir() + "/wet"
    val df = (0 until 40).map(i => (
        "conversion", s"urn:wet:$i",
        java.sql.Timestamp.from(java.time.Instant.parse("2026-03-01T00:00:00Z")),
        s"https://h/p/$i", "text/plain",
        s"extracted text $i ".getBytes(UTF_8)))
      .toDF("warc_type", "warc_record_id", "warc_date", "warc_target_uri",
        "content_type", "block")
    Warc.writeDistributed(df.repartition(6, col("warc_record_id")), dir)
    // LocalFileSystem adds .crc checksum sidecars (hidden; HDFS keeps
    // checksums server-side) — the reader's suffix filter skips them
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(files.forall(_.matches("part-\\d{5}\\.warc\\.gz")))
    assert(files.length <= 6 && files.nonEmpty)
    val back = Warc.read(spark, dir)
    assert(back.count() == 40)
    val r = back.where(col("warc_record_id") === "urn:wet:7").collect().head
    assert(new String(r.getAs[Array[Byte]]("payload"), UTF_8) == "extracted text 7 ")
    assert(r.getAs[String]("warc_type") == "conversion")
  }

  test("gzip hardening: trailing garbage, corrupt payload and truncation " +
    "all reject loudly (GZIPInputStream would report clean EOF)") {
    val dir = tmpDir()
    val good = s"$dir/good.warc.gz"
    Warc.write(good, (0 until 3).map(i => rec(i, s"content $i " * 10)))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(good))
    // (a) trailing garbage after the last member: a writer died mid-member
    val p1 = java.nio.file.Paths.get(s"$dir/garbage.warc.gz")
    java.nio.file.Files.write(p1, bytes ++ "NOT A GZIP MEMBER".getBytes(UTF_8))
    val e1 = intercept[Exception] { Warc.read(spark, p1.toString).count() }
    assert(chainMsg(e1).contains("gzip member magic"))
    // (b) one flipped byte mid-stream: CRC (or deflate) must catch it
    val flipped = bytes.clone()
    flipped(bytes.length / 2) = (flipped(bytes.length / 2) ^ 0x5a).toByte
    val p2 = java.nio.file.Paths.get(s"$dir/flip.warc.gz")
    java.nio.file.Files.write(p2, flipped)
    val e2 = intercept[Exception] { Warc.read(spark, p2.toString).count() }
    assert(chainMsg(e2).nonEmpty) // loud, whatever layer catches it first
    // (c) truncated final member
    val p3 = java.nio.file.Paths.get(s"$dir/trunc.warc.gz")
    java.nio.file.Files.write(p3, bytes.dropRight(10))
    val e3 = intercept[Exception] { Warc.read(spark, p3.toString).count() }
    assert(chainMsg(e3).toLowerCase.contains("truncated") ||
      chainMsg(e3).contains("gzip"))
    // and the happy path still reads every record with verified CRCs
    assert(Warc.read(spark, good).count() == 3)
  }

  test("readStream: incremental file discovery, exactly once per file") {
    import spark.implicits._
    val dir = tmpDir()
    Warc.write(s"$dir/w0.warc.gz", (0 until 4).map(i => rec(i, s"first $i")))
    val name = "warc_stream_spec"
    val sq = Warc.readStream(spark, dir, types = Seq("response"))
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      sq.processAllAvailable()
      assert(spark.table(name).count() == 4)
      // a new segment lands mid-stream: only ITS records are appended
      Warc.write(s"$dir/w1.warc.gz", (4 until 9).map(i => rec(i, s"late $i")))
      sq.processAllAvailable()
      val got = spark.table(name)
        .select("warc_record_id").as[String].collect().sorted
      assert(got.toSeq == (0 until 9).map(i => s"urn:test:$i").sorted)
    } finally sq.stop()
  }

  test("header folding and request records (no status line)") {
    val p = tmpDir() + "/fold.warc"
    val block = "GET /p HTTP/1.1\r\nHost: h\r\n\r\n".getBytes(UTF_8)
    val recTxt = "WARC/1.1\r\nWARC-Type: request\r\nWARC-Record-ID: <urn:q>\r\n" +
      "WARC-Date: 2026-02-01T00:00:00Z\r\n" +
      "WARC-Target-URI: https://h\r\n\t/p\r\n" + // folded continuation
      "Content-Type: application/http;msgtype=request\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      recTxt.getBytes(UTF_8) ++ block ++ "\r\n\r\n".getBytes(UTF_8))
    val r = Warc.read(spark, p).collect().head
    assert(r.getAs[String]("warc_target_uri") == "https://h /p")
    assert(r.getAs[Any]("http_status") == null) // request: no status line
    assert(new String(r.getAs[Array[Byte]]("payload"), UTF_8).isEmpty)
  }
}
