package graft.ingest

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** WARC (Web ARChive, ISO 28500 / WARC 1.1) source — the container
  * CommonCrawl and every web-scale crawl ships, and therefore the front
  * door of a 100 TB training-data pipeline (crawl → [[Warc.read]] →
  * `text/TextMetrics.extract*` → dedup → mix → pack). Written from the
  * public format spec (iipc/warc-specifications, WARC-1.1 §4: record =
  * version line, named fields, CRLF, Content-Length octets of block,
  * CRLF CRLF) — no external parser.
  *
  * Scale shape, in CommonCrawl's own terms:
  *  - **Archives parallelize at file grain** ([[read]]): a crawl dump is
  *    ~90k files of ~1 GiB, far more files than executors, so one
  *    whole-file decode per task saturates a 1000-executor cluster with
  *    zero shuffle — the same unit `NetCdf.readDir` uses.
  *  - **Per-record gzip members** ([[write]] default, the `.warc.gz`
  *    convention): each record is its own gzip member, so a byte-range
  *    index can jump to ANY record without decompressing the file.
  *    [[readIndexed]] is that path — the cc-index analog: a DataFrame of
  *    `(file, offset, length)` slices fans out record-grain, which is how
  *    you read 0.1% of 100 TB without scanning 100 TB.
  *  - **Type filter at parse time** ([[read]]`(types = …)`): records of
  *    other types are skipped inside the task before a row is built, so
  *    request/metadata records never leave the scan.
  *
  * Malformed input rejects loudly (bad magic, missing mandatory fields,
  * truncated blocks) — silent best-effort parsing corrupts a corpus
  * invisibly at scale.
  */
object Warc {

  /** One record to write. `block` is the full record block; for
    * `response` records that is an HTTP response message (status line +
    * headers + CRLF CRLF + payload) per WARC-1.1 §6.3.
    */
  final case class WarcRecord(
      warcType: String,
      recordId: String,
      date: String, // WARC-Date, ISO-8601 UTC e.g. 2026-08-15T00:00:00Z
      block: Array[Byte],
      targetUri: Option[String] = None,
      contentType: Option[String] = None)

  /** Build an HTTP response block (status line + headers + body) — the
    * payload shape of a `response` record.
    */
  def httpResponseBlock(status: Int, reason: String, contentType: String,
                        body: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 $status $reason\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n"
    head.getBytes(UTF_8) ++ body
  }

  // ---------------------------------------------------------------- write

  /** Write records to one WARC file. `gzipPerRecord = true` (default)
    * produces the standard `.warc.gz` layout — one gzip member per
    * record, members concatenated — and is what makes [[readIndexed]]'s
    * random access possible. Returns the byte-range index: one
    * `(offset, length)` per record, offsets into the written file (the
    * cc-index columns). Fixture/export path: data passes through the
    * driver, like `NetCdf.write`.
    */
  def write(path: String, records: Seq[WarcRecord],
            gzipPerRecord: Boolean = true): Seq[(Long, Long)] = {
    require(records.nonEmpty, s"refusing to write an empty WARC: $path")
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path))
    val index = Seq.newBuilder[(Long, Long)]
    var offset = 0L
    try {
      records.foreach { r =>
        val member = memberBytes(r, gzipPerRecord)
        out.write(member)
        index += ((offset, member.length.toLong))
        offset += member.length
      }
    } finally out.close()
    index.result()
  }

  /** DISTRIBUTED WARC sink — the write half of the crawl front door, and
    * the shape of a WET export (CommonCrawl's extracted-text interchange:
    * `conversion` records carrying the text a pipeline distilled from
    * each page). One task writes one `.warc.gz` of per-record gzip
    * members straight to Hadoop FS — records never gather on the driver,
    * so emitting 100 TB of WET costs exactly one scan of the source
    * frame. Partition the input first to choose segment count/size.
    *
    * Expected columns (the reader's own field names): `warc_type`,
    * `warc_record_id`, `warc_date` (timestamp), `warc_target_uri`
    * (nullable), `content_type` (nullable), `block` (binary) — the three
    * mandatory ones and `block` must be non-null (messaged reject per
    * record, not a bare NPE). Empty partitions produce no file.
    *
    * Task-commit protocol: each attempt writes
    * `_tmp/part-NNNNN-<attemptId>.warc.gz` and RENAMES into place on
    * success — a speculated or retried attempt can never interleave
    * bytes into the final file (first rename wins; losers delete their
    * temp). The target directory must be empty or absent: silently
    * mixing a new export with stale part files from an earlier layout
    * would corrupt the corpus invisibly.
    */
  def writeDistributed(records: DataFrame, dir: String): Unit = {
    val spark = records.sparkSession
    val props = NetCdf.fsProps(spark)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val dfs = dirPath.getFileSystem(taskConf(props))
    require(!dfs.exists(dirPath) || dfs.listStatus(dirPath).isEmpty,
      s"refusing to export into non-empty $dir: stale part files from an " +
        "earlier write would silently mix into the archive")
    dfs.mkdirs(dirPath)
    records
      .select(col("warc_type"), col("warc_record_id"), col("warc_date"),
        col("warc_target_uri"), col("content_type"), col("block"))
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val fs = new org.apache.hadoop.fs.Path(dir)
            .getFileSystem(taskConf(props))
          val tmp = new org.apache.hadoop.fs.Path(
            f"$dir/_tmp/part-$pid%05d-attempt${tc.taskAttemptId()}.warc.gz")
          val fin = new org.apache.hadoop.fs.Path(f"$dir/part-$pid%05d.warc.gz")
          val out = fs.create(tmp, true)
          var i = 0L
          try it.foreach { r =>
            require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2) &&
                !r.isNullAt(5),
              s"record $i of partition $pid: warc_type, warc_record_id, " +
                "warc_date and block must be non-null")
            val rec = WarcRecord(
              warcType = r.getString(0),
              recordId = r.getString(1),
              date = r.getTimestamp(2).toInstant.toString,
              block = r.getAs[Array[Byte]](5),
              targetUri = Option(r.getString(3)),
              contentType = Option(r.getString(4)))
            out.write(memberBytes(rec, gzipPerRecord = true))
            i += 1
          } finally out.close()
          // commit: first attempt's rename wins; a racing attempt finds
          // the final path taken and discards its temp
          if (!fs.rename(tmp, fin)) { fs.delete(tmp, false); () }
        }
      }
    // drop the (now empty or loser-only) attempt scratch dir
    dfs.delete(new org.apache.hadoop.fs.Path(s"$dir/_tmp"), true)
    ()
  }

  private def taskConf(props: Map[String, String])
      : org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration()
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private def memberBytes(r: WarcRecord, gzipPerRecord: Boolean): Array[Byte] = {
    val raw = recordBytes(r)
    if (!gzipPerRecord) raw
    else {
      val bos = new ByteArrayOutputStream(raw.length / 2 + 64)
      val gz = new GZIPOutputStream(bos)
      gz.write(raw); gz.finish(); gz.close()
      bos.toByteArray
    }
  }

  private def recordBytes(r: WarcRecord): Array[Byte] = {
    require(r.warcType.nonEmpty && r.recordId.nonEmpty && r.date.nonEmpty,
      "WARC-Type, WARC-Record-ID and WARC-Date are mandatory (WARC-1.1 §5)")
    val sb = new StringBuilder
    sb.append("WARC/1.1\r\n")
    sb.append(s"WARC-Type: ${r.warcType}\r\n")
    sb.append(s"WARC-Record-ID: <${r.recordId}>\r\n")
    sb.append(s"WARC-Date: ${r.date}\r\n")
    r.targetUri.foreach(u => sb.append(s"WARC-Target-URI: $u\r\n"))
    r.contentType.foreach(c => sb.append(s"Content-Type: $c\r\n"))
    sb.append(s"Content-Length: ${r.block.length}\r\n")
    sb.append("\r\n")
    sb.toString.getBytes(UTF_8) ++ r.block ++ "\r\n\r\n".getBytes(UTF_8)
  }

  // ---------------------------------------------------------------- parse

  /** One parsed record (task-side). `payload` is the HTTP message body
    * for records whose block is an HTTP message, else the whole block.
    */
  private final case class Parsed(
      warcType: String, targetUri: String, date: String, recordId: String,
      contentType: String, contentLength: Long,
      httpStatus: Option[Int], httpContentType: String,
      payload: Array[Byte])

  /** Read CRLF-terminated header lines until the blank line; supports
    * spec'd folded continuations (obsolete but legal). Returns None at
    * clean EOF before any byte (end of file between records).
    */
  private def readHeaderBlock(in: InputStream): Option[Seq[String]] = {
    val lines = Seq.newBuilder[String]
    val cur = new ByteArrayOutputStream(128)
    var sawAny = false
    var prev = -1
    while (true) {
      val b = in.read()
      if (b < 0) {
        if (!sawAny) return None
        throw new EOFException("truncated WARC header block")
      }
      sawAny = true
      if (prev == '\r' && b == '\n') {
        val bytes = cur.toByteArray
        val line = new String(bytes, 0, math.max(0, bytes.length - 1), UTF_8)
        cur.reset()
        if (line.isEmpty) return Some(lines.result())
        lines += line
      } else cur.write(b)
      prev = b
    }
    None // unreachable
  }

  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    require(n <= Int.MaxValue, s"record block of $n bytes exceeds 2 GiB")
    val buf = new Array[Byte](n.toInt)
    var off = 0
    while (off < buf.length) {
      val k = in.read(buf, off, buf.length - off)
      if (k < 0) throw new EOFException(
        s"truncated WARC block: expected $n octets, got $off")
      off += k
    }
    buf
  }

  /** Parse every record of one WARC stream (already de-gzipped if the
    * file was compressed). `types` empty = all.
    */
  private def parseStream(in: InputStream, file: String,
                          types: Set[String]): Iterator[Parsed] =
    new Iterator[Parsed] {
      private var nextRec: Parsed = null
      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null) {
          val hdr = readHeaderBlock(in) match {
            case None => return // clean EOF
            case Some(lines) => lines
          }
          require(hdr.nonEmpty && hdr.head.startsWith("WARC/"),
            s"$file: record does not start with a WARC version line " +
              s"(got '${hdr.headOption.getOrElse("")}')")
          // fold continuations, split Name: value
          val folded = hdr.tail.foldLeft(List.empty[String]) {
            case (acc, l) if l.nonEmpty && (l.head == ' ' || l.head == '\t')
                && acc.nonEmpty => (acc.head + " " + l.trim) :: acc.tail
            case (acc, l) => l :: acc
          }.reverse
          val fields = folded.map { l =>
            val i = l.indexOf(':')
            require(i > 0, s"$file: malformed WARC field '$l'")
            l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim
          }.toMap
          val wType = fields.getOrElse("warc-type",
            sys.error(s"$file: record missing mandatory WARC-Type"))
          val len = fields.getOrElse("content-length",
            sys.error(s"$file: record missing mandatory Content-Length")).toLong
          val date = fields.getOrElse("warc-date",
            sys.error(s"$file: record missing mandatory WARC-Date"))
          val rid = fields.getOrElse("warc-record-id",
            sys.error(s"$file: record missing mandatory WARC-Record-ID"))
              .stripPrefix("<").stripSuffix(">")
          val block = readFully(in, len)
          // trailer: CRLF CRLF after the block (WARC-1.1 §4)
          val t = readFully(in, 4)
          require(t.sameElements("\r\n\r\n".getBytes(UTF_8)),
            s"$file: record trailer is not CRLF CRLF")
          if (types.isEmpty || types.contains(wType)) {
            val ct = fields.getOrElse("content-type", "")
            val (status, hct, payload) =
              if (ct.startsWith("application/http")) parseHttp(block, file)
              else (None, "", block)
            nextRec = Parsed(wType, fields.getOrElse("warc-target-uri", ""),
              date, rid, ct, len, status, hct, payload)
          } // else: skip and loop — filtered records never build a row
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): Parsed = {
        val r = nextRec; advance(); r
      }
    }

  /** Split an HTTP message block into (status, Content-Type, body).
    * Requests have no status line → status None, body = message body.
    */
  private def parseHttp(block: Array[Byte], file: String)
      : (Option[Int], String, Array[Byte]) = {
    // find CRLF CRLF separating the HTTP head from the body
    var i = 0
    var sep = -1
    while (sep < 0 && i + 3 < block.length) {
      if (block(i) == '\r' && block(i + 1) == '\n' &&
          block(i + 2) == '\r' && block(i + 3) == '\n') sep = i
      i += 1
    }
    require(sep >= 0, s"$file: HTTP block has no header/body separator")
    val head = new String(block, 0, sep, UTF_8)
    val body = java.util.Arrays.copyOfRange(block, sep + 4, block.length)
    val lines = head.split("\r\n")
    val status =
      if (lines.head.startsWith("HTTP/")) {
        // status-line = HTTP-version SP 3-digit SP reason (RFC 9112 §4);
        // malformed responses reject WITH file context like every other
        // malformed-input path here, not with a bare parse exception
        val parts = lines.head.split(" ", 3)
        require(parts.length >= 2 && parts(1).matches("\\d{3}"),
          s"$file: malformed HTTP status line '${lines.head}'")
        Some(parts(1).toInt)
      } else None
    val hct = lines.tail.collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }.getOrElse("")
    (status, hct, body)
  }

  // ----------------------------------------------------------------- read

  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("record_seq", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("warc_target_uri", StringType, nullable = true),
    StructField("warc_date", TimestampType, nullable = true),
    StructField("warc_record_id", StringType, nullable = false),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true)))

  private def toRow(file: String, seq: Int, p: Parsed): Row = Row(
    file, seq, p.warcType,
    if (p.targetUri.isEmpty) null else p.targetUri,
    java.sql.Timestamp.from(java.time.Instant.parse(p.date)),
    p.recordId,
    if (p.contentType.isEmpty) null else p.contentType,
    p.contentLength,
    p.httpStatus.orNull,
    if (p.httpContentType.isEmpty) null else p.httpContentType,
    p.payload)

  private def openMaybeGz(in: InputStream, name: String): InputStream =
    // from-spec member reader, NOT GZIPInputStream: the JDK class reports
    // a corrupt next-member header as clean EOF (silent truncation of a
    // crawl segment); Gzip.memberStream verifies every header and trailer
    if (name.endsWith(".gz")) Gzip.memberStream(in, name) else in

  /** Read a WARC file or a directory of them, one whole-file decode per
    * task ([[fileGrain]] note above). `types` non-empty keeps only those
    * record types, filtered before row construction. Hadoop-FS paths
    * (hdfs:// s3a://) work — the crawl bucket never lands on the driver.
    */
  def read(spark: SparkSession, path: String,
           types: Seq[String] = Nil): DataFrame = {
    val props = NetCdf.fsProps(spark)
    val conf = taskConf(props)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.toString)
          .filter(f => f.endsWith(".warc") || f.endsWith(".warc.gz")).sorted
      else Seq(path)
    require(files.nonEmpty, s"no .warc/.warc.gz files under $path")
    val typesB = types.toSet
    val propsB = props
    val parts = math.min(files.length,
      math.max(1, spark.sparkContext.defaultParallelism))
    val rdd = spark.sparkContext.parallelize(files, parts).flatMap { f =>
      val c = taskConf(propsB)
      val fp = new org.apache.hadoop.fs.Path(f)
      val in = openMaybeGz(
        new java.io.BufferedInputStream(fp.getFileSystem(c).open(fp), 1 << 16), f)
      parseStream(in, f, typesB).zipWithIndex
        .map { case (rec, i) => toRow(f, i, rec) }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Streaming crawl ingest: watch `dir` for newly-landed WARC files and
    * emit their records incrementally, exactly once per file — the live
    * half of the crawl front door (a fetcher drops `.warc.gz` segments;
    * this stream feeds extraction/curation/dedup as they land). Built on
    * the file-stream source like `NetCdf.readStream`: the checkpointed
    * file log makes restarts resume without re-emitting processed files,
    * and a micro-batch of F new files becomes F parallel single-file
    * parse tasks. Only the `path` column crosses the source — file bytes
    * move once, inside the parse task.
    */
  def readStream(spark: SparkSession, dir: String,
                 types: Seq[String] = Nil,
                 maxFilesPerTrigger: Int = 0): DataFrame = {
    val props = NetCdf.fsProps(spark)
    val typesB = types.toSet
    val binSchema = StructType(Seq(
      StructField("path", StringType, nullable = true),
      StructField("modificationTime", TimestampType, nullable = true),
      StructField("length", LongType, nullable = true),
      StructField("content", BinaryType, nullable = true)))
    val reader0 = spark.readStream.format("binaryFile").schema(binSchema)
      .option("pathGlobFilter", "*.{warc,warc.gz}")
    val reader = if (maxFilesPerTrigger > 0)
      reader0.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
    else reader0
    import org.apache.spark.sql.functions.col
    reader.load(dir).select(col("path"))
      .as(org.apache.spark.sql.Encoders.STRING)
      .flatMap { f =>
        val c = taskConf(props)
        val fp = new org.apache.hadoop.fs.Path(f)
        val in = openMaybeGz(new java.io.BufferedInputStream(
          fp.getFileSystem(c).open(fp), 1 << 16), f)
        parseStream(in, f, typesB).zipWithIndex
          .map { case (rec, i) => toRow(f, i, rec) }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** One CDXJ index entry ([[writeCdxj]]). */
  final case class CdxEntry(url: String, date: String, file: String,
                            offset: Long, length: Long, status: Int,
                            mime: String)

  /** SURT (Sort-friendly URI Reordering Transform) key — the CDX sort
    * key: lowercase, scheme dropped, host labels REVERSED comma-joined,
    * `)` then the path. The common core (ports/queries pass through with
    * the path) — enough to sort and range-scan a crawl index.
    */
  def surtKey(url: String): String = {
    val u = url.toLowerCase
    val noScheme = u.replaceFirst("^[a-z][a-z0-9+.-]*://", "")
    // the host ends at the FIRST of '/', '?', '#': a query (or fragment)
    // on a path-less URL (http://example.com?q=1) must not fold into the
    // last host label — that would produce 'com?q=1,example)/' and sort
    // the key away from its host's range
    val cut = noScheme.indexWhere(c => c == '/' || c == '?' || c == '#')
    val (hostPort, rest) =
      if (cut < 0) (noScheme, "") else noScheme.splitAt(cut)
    val path =
      if (rest.isEmpty) "/"
      else if (rest.startsWith("/")) rest
      else "/" + rest // query/fragment with no path: root path carries it
    // port (and userinfo) must not ride on the last host label — SURT
    // reverses LABELS, then re-appends :port, so example.com:8080 sorts
    // adjacent to the other example.com entries
    val host0 = hostPort.substring(hostPort.indexOf('@') + 1)
    val (host, port) =
      if (host0.startsWith("[")) {
        // IPv6 literal: colons are address syntax, the port (if any)
        // follows the closing bracket — never split on the first ':'
        val close = host0.indexOf(']')
        if (close < 0) (host0, "") else host0.splitAt(close + 1)
      } else {
        val colon = host0.indexOf(':')
        if (colon < 0) (host0, "") else host0.splitAt(colon)
      }
    val hostKey =
      if (host.startsWith("[")) host // bracketed address: no labels to reverse
      else host.split('.').reverse.mkString(",")
    hostKey + port + ")" + path
  }

  /** Write a CDXJ sidecar (the pywb/CommonCrawl index line format:
    * `<surt-urlkey> <14-digit-timestamp> <json>`) for an archive —
    * typically from [[write]]'s returned byte-range index. Entries are
    * emitted in SURT order, the format's sort contract.
    */
  def writeCdxj(entries: Seq[CdxEntry], path: String): Unit = {
    require(entries.nonEmpty, s"refusing to write an empty CDXJ: $path")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val lines = entries.map { e =>
      val ts = java.time.Instant.parse(e.date)
        .atZone(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
      surtKey(e.url) + " " + ts + " " +
        s"""{"url": "${esc(e.url)}", "filename": "${esc(e.file)}", """ +
        s""""offset": "${e.offset}", "length": "${e.length}", """ +
        s""""status": "${e.status}", "mime": "${esc(e.mime)}"}"""
    }.sorted
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("", "\n", "\n").getBytes(UTF_8))
    ()
  }

  /** Parse CDXJ index files DISTRIBUTED (plain text scan + Column JSON
    * extraction — fully codegen'd, no driver parsing): columns
    * `(urlkey, cdx_ts, url, file, offset, length, status, mime)`. The
    * output feeds [[readIndexed]] directly — the full cc-index loop:
    * filter the (tiny) index by url/key/time, fetch ONLY those records.
    */
  def readCdxj(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val parsed = spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .select(col("value"),
        substring_index(col("value"), " ", 1).as("urlkey"),
        // try_element_at, not element_at: under ANSI mode a line with
        // fewer than 3 tokens would throw INVALID_ARRAY_INDEX before the
        // malformed-line raise_error below can name the offending line;
        // try_element_at yields the NULL the guard converts to the
        // diagnostic (same rationale as the try_casts)
        try_element_at(split(col("value"), " ", 3), lit(2)).as("cdx_ts"),
        try_element_at(split(col("value"), " ", 3), lit(3)).as("json"))
    // a malformed line (missing JSON, non-numeric offset/length, absent
    // mandatory field) REJECTS LOUDLY with the offending line — nulled-out
    // fields would silently drop records from every index-driven fetch.
    // The guard rides INSIDE columns (a separate check column would be
    // pruned away with its side effect) — in BOTH fetch-critical columns
    // (offset AND length), so a consumer projecting either still trips it;
    // a projection keeping neither cannot drive a fetch in the first place.
    def jfield(name: String) = get_json_object(col("json"), s"$$.$name")
    // try_cast, not cast: under ANSI mode a plain cast on a non-numeric
    // offset/length throws CAST_INVALID_INPUT before the guard can fire —
    // loud, but without the offending line; try_cast turns it into the
    // NULL the guard converts to the diagnostic raise_error
    def jnum(name: String) =
      expr(s"try_cast(get_json_object(json, '$$.$name') AS BIGINT)")
    def checked(inner: Column) = when(
      jfield("url").isNull || jfield("filename").isNull ||
        jnum("offset").isNull || jnum("length").isNull,
      raise_error(concat(lit(s"$path: malformed CDXJ line: "), col("value"))))
      .otherwise(inner)
    parsed.select(col("urlkey"), col("cdx_ts"),
      jfield("url").as("url"),
      jfield("filename").as("file"),
      checked(jnum("offset")).as("offset"),
      checked(jnum("length")).as("length"),
      // try_cast: status is not fetch-critical and classic CDX uses "-"
      // as a placeholder — null, not an ANSI cast error
      expr("try_cast(get_json_object(json, '$.status') AS INT)").as("status"),
      jfield("mime").as("mime"))
  }

  /** Record-grain random access — the cc-index path. `slices` has columns
    * `(file, offset, length)` (as produced by [[write]] or a crawl
    * index); each task seeks to its member, inflates ONLY those bytes,
    * and parses one record. Reading k records costs O(k), independent of
    * archive size — the only way 100 TB of WARC supports point lookups.
    * Requires per-record gzip members (`.warc.gz`) or uncompressed files.
    */
  def readIndexed(spark: SparkSession, slices: DataFrame): DataFrame = {
    val props = NetCdf.fsProps(spark)
    val rdd = slices.select("file", "offset", "length").rdd.map { r =>
      val f = r.getString(0)
      val off = r.getLong(1)
      val len = r.getLong(2)
      require(len > 0 && len <= Int.MaxValue, s"bad slice length $len")
      val c = taskConf(props)
      val fp = new org.apache.hadoop.fs.Path(f)
      val in = fp.getFileSystem(c).open(fp)
      val member = try {
        in.seek(off)
        val buf = new Array[Byte](len.toInt)
        in.readFully(buf)
        buf
      } finally in.close()
      val recs = parseStream(
        openMaybeGz(new ByteArrayInputStream(member), f), f, Set.empty).toSeq
      require(recs.length == 1,
        s"$f@$off+$len: expected exactly one record in slice, got ${recs.length}")
      toRow(f, 0, recs.head)
    }
    spark.createDataFrame(rdd, schema)
  }
}
