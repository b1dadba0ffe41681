package graft.queries

import graft.ingest.Warc
import graft.model.Tables
import graft.text.HtmlExtract
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-crawl front door: the documents table is rendered into REAL
  * `.warc.gz` archives (per-record gzip members, HTTP response blocks —
  * the CommonCrawl layout), read back distributed by [[graft.ingest.Warc]],
  * and DuckDB replays the expected rows from the parquet table directly —
  * so a defect anywhere in the WARC writer, the multi-member gunzip, the
  * record/HTTP parsing, or the byte-range index shows up as a hash
  * mismatch.
  */
object WebQ extends QueryPack {

  private val Epoch = "2026-01-01T00:00:00Z"

  private val warcStreamSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** One response record per document: URI carries (source, doc_id),
    * WARC-Date = epoch + doc_id seconds, body = the document text.
    */
  private def docRecord(docId: Long, source: String, text: String): Warc.WarcRecord = {
    val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Warc.WarcRecord(
      warcType = "response",
      recordId = s"urn:graft:doc:$docId",
      date = java.time.Instant.parse(Epoch).plusSeconds(docId).toString,
      block = Warc.httpResponseBlock(200, "OK", "text/plain", body),
      targetUri = Some(s"https://$source.example.com/doc/$docId"),
      contentType = Some("application/http;msgtype=response"))
  }

  private def docsSorted(s: SparkSession, dir: String): Array[(Long, String, String)] =
    Tables.documents(s, dir).select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)

  /** Archives are pure functions of (application, sfDir) — built once per
    * JVM (the bench loop re-times the READ path, which is the operator),
    * like SimQ.servedIndexDir. Value: (archive dir, single-file path, its
    * byte-range index, doc ids in record order).
    */
  private val warcDirs =
    scala.collection.concurrent.TrieMap.empty[String, (String, String, Seq[(Long, Long)], Seq[Long])]

  /** CDXJ sidecar for the single-file archive — written at fixture-build
    * time next to it (the crawl-time index production). */
  private def cdxPath(single: String): String = single + ".cdxj"

  private def warcFixture(s: SparkSession, dir: String)
      : (String, String, Seq[(Long, Long)], Seq[Long]) =
    warcDirs.getOrElseUpdate(s"${s.sparkContext.applicationId}:$dir", {
      val docs = docsSorted(s, dir)
      val base = java.nio.file.Files.createTempDirectory("graft-warc")
      (0 until 4).foreach { k =>
        val recs = Warc.WarcRecord("warcinfo", s"urn:graft:warcinfo:$k", Epoch,
          s"software: graft\r\npartition: $k\r\n"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8),
          contentType = Some("application/warc-fields")) +:
          docs.filter(_._1 % 4 == k).toSeq
            .map { case (id, src, text) => docRecord(id, src, text) }
        Warc.write(base.resolve(f"part-$k%02d.warc.gz").toString, recs)
      }
      // the single indexed archive lives in a SIBLING subdir: the 4-file
      // directory scan above must not see it (it repeats every record)
      val idxDir = base.resolve("indexed")
      java.nio.file.Files.createDirectories(idxDir)
      val single = idxDir.resolve("all.warc.gz").toString
      val index = Warc.write(single,
        docs.toSeq.map { case (id, src, text) => docRecord(id, src, text) })
      Warc.writeCdxj(
        docs.toSeq.zip(index).map { case ((id, src, _), (off, len)) =>
          Warc.CdxEntry(
            url = s"https://$src.example.com/doc/$id",
            date = java.time.Instant.parse(Epoch).plusSeconds(id).toString,
            file = single, offset = off, length = len,
            status = 200, mime = "text/plain")
        },
        cdxPath(single))
      (base.toString, single, index, docs.map(_._1).toSeq)
    })

  /** A second archive whose response bodies are full HTML pages (nav +
    * prose + link-dense footer) with Content-Type text/html — the input
    * shape of the end-to-end pipeline. Extraction must recover exactly
    * the document text.
    */
  private val warcHtmlDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  private def warcHtmlFixture(s: SparkSession, dir: String): String =
    warcHtmlDirs.getOrElseUpdate(s"${s.sparkContext.applicationId}:$dir", {
      val docs = docsSorted(s, dir)
      val base = java.nio.file.Files.createTempDirectory("graft-warc-html")
      (0 until 4).foreach { k =>
        val recs = docs.filter(_._1 % 4 == k).toSeq.map { case (id, src, text) =>
          val html =
            s"""<html><head><title>Doc $id</title><style>p{margin:0}</style></head>
               |<body><nav><a href="/">Home</a> <a href="/all">All docs</a></nav>
               |<p>$text</p>
               |<script>var x = "<p>not content</p>";</script>
               |<footer><a href="/c">contact</a> | <a href="/t">terms</a></footer>
               |</body></html>""".stripMargin
          val body = html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          Warc.WarcRecord("response", s"urn:graft:page:$id",
            java.time.Instant.parse(Epoch).plusSeconds(id).toString,
            Warc.httpResponseBlock(200, "OK", "text/html; charset=UTF-8", body),
            targetUri = Some(s"https://$src.example.com/doc/$id"),
            contentType = Some("application/http;msgtype=response"))
        }
        Warc.write(base.resolve(f"seg-$k%02d.warc.gz").toString, recs)
      }
      base.toString
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // END TO END: crawl bytes → training-corpus stats in ONE composed
    // plan — WARC parse → HTML main-content extraction → quality/token
    // scoring → near-dup removal → per-source rollup. Every stage is
    // oracle-checked in isolation elsewhere; this query pins their
    // composition from the wire format up. The oracle is
    // q_curation_pipeline's SQL verbatim: extraction must recover the
    // document text EXACTLY (any nav/footer/script residue shifts the
    // token counts and quality scores and hash-mismatches), and the
    // provenance (source) must survive the URI roundtrip.
    "q_web_pipeline" -> ((s, dir) => {
      // provenance (source) from the URI host, identity (doc_id) from the
      // record id, text from extraction — everything the pipeline needs
      // reconstructed from the wire format.
      //
      // localCheckpoint: BOTH downstream branches (the n-gram dedup pairs
      // and the quality/token scoring + anti-join) consume this frame —
      // without it the WARC parse + HTML extraction subtree executes
      // TWICE (at crawl scale, a double parse of the archive; at gate
      // scale it was the bench's thinnest margin). Eager local
      // materialization runs the archive scan exactly once; the
      // checkpointed blocks are dropped by the ContextCleaner when the
      // returned plan is garbage-collected, so repeated bench iterations
      // do not accumulate storage.
      // the WARC parse itself is one task (one archive file), but the
      // HTML extraction and everything downstream need not be: spread
      // the parsed records (id, source, payload) BEFORE the extraction
      // kernel, so mainContent and the whole dedup/scoring pipeline run
      // on every core (guide §2.5 — the Fanout guard no-ops when the
      // archive scan is already parallel). The checkpointed blocks then
      // carry that parallel layout to both downstream branches.
      val withIds = graft.operators.Fanout(
          Warc.read(s, warcHtmlFixture(s, dir), types = Seq("response"))
            .select(
              regexp_extract(col("warc_record_id"), ":(\\d+)$", 1)
                .cast("long").as("doc_id"),
              regexp_extract(col("warc_target_uri"), "^https://([^.]*)", 1)
                .as("source"),
              col("payload")),
          Seq("doc_id"))
        .select(col("doc_id"), col("source"),
          graft.text.HtmlExtract.mainContent(col("payload").cast("string"))
            .as("text"))
        .localCheckpoint()
      val dupIds = graft.dedup.Dedup
        .ngramJaccardPairs(withIds, "doc_id", "text", 3, 0.5)
        .select(col("id2").as("doc_id")).distinct()
      val deduped = withIds
        .withColumn("quality", graft.text.TextMetrics.qualityScore(col("text")))
        .withColumn("n_tokens", graft.text.TextMetrics.tokenCount(col("text")))
        .where(col("quality") >= 0.5)
        .join(dupIds, Seq("doc_id"), "left_anti")
      round6(
        deduped.groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            avg(col("quality")).as("avg_quality"),
            sum(col("n_tokens")).as("total_tokens"))
          .withColumn("total_tokens", col("total_tokens").cast("long")),
        "avg_quality")
    }),
    // WET export roundtrip: the HTML archive is read, main content is
    // extracted, and the distilled text is written BACK as WARC
    // `conversion` records (CommonCrawl's WET interchange) through the
    // DISTRIBUTED sink — one .warc.gz per task, records never on the
    // driver — then re-read. The oracle re-derives every row from
    // parquet: extraction must equal the document text and the whole
    // write→read loop must be byte-faithful.
    "q_wet_export" -> ((s, dir) => {
      val pages = Warc.read(s, warcHtmlFixture(s, dir), types = Seq("response"))
      val wet = pages.select(
        lit("conversion").as("warc_type"),
        regexp_replace(col("warc_record_id"), ":page:", ":wet:")
          .as("warc_record_id"),
        col("warc_date"),
        col("warc_target_uri"),
        lit("text/plain").as("content_type"),
        HtmlExtract.mainContent(col("payload").cast("string"))
          .cast("binary").as("block"))
      val out = graft.util.Tmp.root("graft_wet").toString
      Warc.writeDistributed(
        wet.repartition(4, col("warc_record_id")), out)
      Warc.read(s, out, types = Seq("conversion"))
        .select(
          regexp_extract(col("warc_record_id"), ":(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("warc_date"),
          col("payload").cast("string").as("text"))
    }),
    // Archive scan: 4 .warc.gz files (doc_id % 4), each opening with a
    // warcinfo record the type filter must drop before a row is built.
    // Row-level output (id, host, status, bytes, date, full text) makes
    // the roundtrip airtight — any parse/decode defect lands in the hash.
    "q_warc_ingest" -> ((s, dir) => {
      val (base, _, _, _) = warcFixture(s, dir)
      Warc.read(s, base, types = Seq("response"))
        .select(
          regexp_extract(col("warc_target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          regexp_extract(col("warc_target_uri"), "^https://([^/]*)", 1).as("host"),
          col("http_status").cast("int").as("status"),
          col("content_length"),
          length(col("payload")).cast("long").as("n_bytes"),
          col("warc_date"),
          col("payload").cast("string").as("text"))
    }),
    // The REAL cc-index loop, wire format included: the CDXJ sidecar
    // (surt-key + 14-digit timestamp + JSON line format) is parsed
    // DISTRIBUTED, filtered by url down to doc_id % 7 == 0, and its
    // byte ranges drive readIndexed — then each fetched record joins
    // back to its index line. The oracle re-derives the SURT key, the
    // formatted timestamp, and the payload from parquet: a defect in
    // the key transform, the line format, the JSON extraction, or the
    // offsets hash-mismatches.
    "q_warc_cdx" -> ((s, dir) => {
      import s.implicits._
      val (_, single, _, _) = warcFixture(s, dir)
      // the filtered index is tiny BY DESIGN (that is the point of an
      // index) — collect it once instead of scanning the sidecar twice
      // (once to build slices, once for the final join)
      val cdxRows = Warc.readCdxj(s, cdxPath(single))
        .where(regexp_extract(col("url"), "/doc/(\\d+)$", 1)
          .cast("long") % 7 === 0)
        .select("urlkey", "cdx_ts", "url", "file", "offset", "length",
          "status", "mime")
        .as[(String, String, String, String, Long, Long, Int, String)]
        .collect()
      val cdx = cdxRows.toSeq.toDF("urlkey", "cdx_ts", "url", "file",
        "offset", "length", "status", "mime")
      val fetched = Warc.readIndexed(s,
        cdx.select(col("file"), col("offset"), col("length")))
        .select(col("warc_target_uri").as("url"),
          length(col("payload")).cast("long").as("n_bytes"),
          col("payload").cast("string").as("text"))
      fetched.join(broadcast(cdx), Seq("url"))
        .select(
          regexp_extract(col("url"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("urlkey"), col("cdx_ts"), col("status"), col("mime"),
          col("n_bytes"), col("text"))
    }),
    // The cc-index path: ONE archive file + the writer's byte-range
    // index; only doc_id % 7 == 0 slices are fetched, each task seek+
    // inflating exactly one gzip member. Reading k records is O(k)
    // however large the archive — the 100 TB point-lookup shape.
    "q_warc_indexed" -> ((s, dir) => {
      import s.implicits._
      val (_, path, index, ids) = warcFixture(s, dir)
      val slices = ids.zip(index)
        .collect { case (id, (off, len)) if id % 7 == 0 => (path, off, len) }
        .toDF("file", "offset", "length")
      Warc.readIndexed(s, slices)
        .select(
          regexp_extract(col("warc_target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          col("warc_date"),
          col("payload").cast("string").as("text"))
    }),
    // The LIVE crawl front door: the same 4-file archive lands in a
    // watched directory and flows through a REAL Structured Streaming
    // query (checkpointed file source, memory sink, processAllAvailable)
    // — same projection, same oracle as the batch scan, so stream ≡
    // batch is driver-checked, not just spec-checked.
    "q_stream_warc" -> ((s, dir) => {
      val (base, _, _, _) = warcFixture(s, dir)
      val name = s"graft_stream_warc_${warcStreamSeq.incrementAndGet()}"
      val ck = java.nio.file.Files.createTempDirectory("graft-warc-ck")
      val sq = Warc.readStream(s, base, types = Seq("response"))
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", ck.toString)
        .start()
      // materialize off the memory sink, then RELEASE it: the sink holds
      // every payload in driver memory, and repeated invocations (bench
      // loops, re-verification) would otherwise accumulate one archive
      // copy per run; the checkpoint temp dir goes with it
      val out = try {
        sq.processAllAvailable()
        val rows = s.table(name).select(
          regexp_extract(col("warc_target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          col("warc_date"),
          col("payload").cast("string").as("text"))
        val schema = rows.schema
        s.createDataFrame(new java.util.ArrayList(
          java.util.Arrays.asList(rows.collect(): _*)), schema)
      } finally {
        sq.stop()
        s.catalog.dropTempView(name)
        java.nio.file.Files.walk(ck)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      }
      out
    }),
    // Boilerplate removal against GROUND TRUTH (q_url_curation style):
    // each document is wrapped into a full page — head/title/style,
    // a link-dense <nav>, the prose in <p> (with an entity), a mixed
    // text+link <div> above the density threshold, a second prose block,
    // a <script> whose body contains a fake tag, and a link-only footer.
    // The oracle states the EXPECTED extraction from first principles
    // (the two prose blocks, entity decoded), not a regex replay — a
    // segmentation, density, entity or strip defect all hash-mismatch.
    "q_html_extract" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title><style>p{color:red}</style></head><body>"),
        lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About pages</a></nav>"),
        lit("<p>"), col("text"), lit(" &amp; more</p>"),
        lit("<div>"), substring(col("text"), 1, 40),
        lit(" <a href=\"/m\">read much more here</a></div>"),
        lit("<h2>"), reverse(col("text")), lit("</h2>"),
        lit("<script>var x = 1 < 2; s = \"<p>not content</p>\";</script>"),
        lit("<footer><a href=\"/c\">contact</a> | <a href=\"/t\">terms</a>") ,
        lit("</footer></body></html>"))
      fanDocuments(s, dir)
        .select(col("doc_id"), html.as("html"))
        .select(
          col("doc_id"),
          HtmlExtract.title(col("html")).as("title"),
          HtmlExtract.mainContent(col("html")).as("main_text"))
        // block texts never contain '\n' (stripTags collapses whitespace),
        // so the joined string re-splits exactly; deriving the count from
        // main_text keeps the query at ONE page walk
        .withColumn("n_blocks",
          when(col("main_text") === "", lit(0))
            .otherwise(size(split(col("main_text"), "\n"))))
    })
  )

  // HTTP head the fixture writes: status line + Content-Type + an exact
  // Content-Length header + CRLF CRLF; the oracle recomputes its octet
  // count so the parsed content_length column is independently derived.
  private val httpHeadLen =
    "17 + 26 + 18 + len(CAST(octet_length(encode(text)) AS VARCHAR)) + 2"

  def oracles: Map[String, String] = Map(
    "q_warc_ingest" ->
      s"""SELECT doc_id, source || '.example.com' AS host, 200 AS status,
         |  CAST($httpHeadLen + octet_length(encode(text)) AS BIGINT) AS content_length,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  TIMESTAMP '2026-01-01 00:00:00' + to_seconds(doc_id) AS warc_date,
         |  text
         |FROM documents""".stripMargin,
    "q_warc_indexed" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  TIMESTAMP '2026-01-01 00:00:00' + to_seconds(doc_id) AS warc_date,
        |  text
        |FROM documents WHERE doc_id % 7 = 0""".stripMargin,
    "q_stream_warc" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  TIMESTAMP '2026-01-01 00:00:00' + to_seconds(doc_id) AS warc_date,
        |  text
        |FROM documents""".stripMargin,
    "q_warc_cdx" ->
      """SELECT doc_id,
        |  'com,example,' || source || ')/doc/' || doc_id AS urlkey,
        |  strftime(TIMESTAMP '2026-01-01 00:00:00' + to_seconds(doc_id),
        |           '%Y%m%d%H%M%S') AS cdx_ts,
        |  200 AS status, 'text/plain' AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  text
        |FROM documents WHERE doc_id % 7 = 0""".stripMargin,
    "q_wet_export" ->
      """SELECT doc_id,
        |  TIMESTAMP '2026-01-01 00:00:00' + to_seconds(doc_id) AS warc_date,
        |  text
        |FROM documents""".stripMargin,
    // the composition adds only derivation steps that must cancel out
    // (text → HTML page → WARC body → parse → extract → text), so the
    // expected rollup is the curation pipeline's, verbatim
    "q_web_pipeline" -> CurationQ.oracles("q_curation_pipeline"),
    "q_html_extract" ->
      """SELECT doc_id, 'Doc ' || doc_id AS title,
        |  text || ' & more' || chr(10) || reverse(text) AS main_text,
        |  2 AS n_blocks
        |FROM documents""".stripMargin
  )
}
