package graft.bench

import graft.dedup.Dedup
import graft.metrics._
import graft.model.SeriesSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: runs the core metric operators over a reference benchmark
  * grid (small 100×90×180 = 1.62M rows, medium 365×180×360 ≈ 23.7M rows,
  * large 730×360×720 ≈ 189M rows — `benchmark_suite.py:280-284`) and the
  * dedup suite over a synthetic corpus (small 20k, medium 100k, large 400k
  * docs of 80 words) — all generated in-flight, no scan cost. Evidence
  * that the plans hold well past the driver test scale; results recorded
  * in SCALE.md. Run manually, not part of the driver contract.
  *
  * Usage: runMain graft.bench.ScaleProbe [small|medium|large]
  *          [grid|corpus|text|asof|ann|web|stream|fold|serve|all]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val size = args.headOption.getOrElse("medium")
    val what = args.drop(1).headOption.getOrElse("all")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_PROBE_ONLY=tag1,tag2 narrows a probe run to specific
    // operators (substring match) — for re-measuring one cell of SCALE.md
    // without paying for the whole suite.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_PROBE_ONLY").map(_.split(",").map(_.trim).toSet)
    def wanted(tag: String): Boolean = only.forall(_.exists(tag.contains))
    def time(tag: String)(f: => Unit): Unit = if (wanted(tag)) {
      val t0 = System.nanoTime(); f
      println(f"$size $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def run(tag: String, df: => org.apache.spark.sql.DataFrame): Unit =
      time(tag)(df.write.format("noop").mode("overwrite").save())

    if (what == "grid" || what == "all") {
      val grid = DataGen.benchGrid(spark, size)
      val spec = SeriesSpec("ts", Seq("lat", "lon"), "temperature")
      println(s"$size grid_rows=${grid.count()}")
      run("monthly_mean", Temporal.monthlyMean(grid, spec))
      run("climatology", Temporal.climatology(grid, spec))
      run("zscore_broadcast", Anomalies.standardizedAnomaly(grid, spec))
      run("zscore_windowed", Anomalies.standardizedAnomalyWindowed(grid, spec))
      // day-of-year climatology: (cell × group) approaches fact size — the
      // regime where the broadcast side stops being small and the windowed
      // single-shuffle form is the survivor. At `large` the broadcast form
      // would ship a ~95M-row relation (past Spark's 8 GiB broadcast
      // limit) — skipped there; the medium number documents the crossover
      // (SCALE.md).
      if (size != "large")
        run("zscore_broadcast_doy",
          Anomalies.standardizedAnomaly(grid, spec, Temporal.ByDayOfYear))
      run("zscore_windowed_doy",
        Anomalies.standardizedAnomalyWindowed(grid, spec, Temporal.ByDayOfYear))
      run("rolling_mean_7", Temporal.rollingMean(grid, spec, window = 7))
      run("clim_percentiles", Percentiles.climatologicalPercentiles(grid, spec))
      run("approx_percentiles", Percentiles.approxClimatologicalPercentiles(grid, spec))
      run("linear_trend", Trends.linearTrend(grid, spec))
      run("mann_kendall_monthly", {
        val m = Temporal.monthlyMean(grid, spec)
          .select(col("month").as("ts"), col("lat"), col("lon"), col("mean_value"))
        Trends.mannKendall(m, SeriesSpec("ts", Seq("lat", "lon"), "mean_value"))
      })
    }

    if (what == "corpus" || what == "all") {
      val nDocs = size match {
        case "small" => 20000L
        case "medium" => 100000L
        case "large" => 400000L
        case other => throw new IllegalArgumentException(s"Unknown size: $other")
      }
      val docs = DataGen.corpus(spark, nDocs)
      println(s"$size corpus_docs=${docs.count()}")
      run("exact_dedup", Dedup.exactGroups(docs, "id", "text"))
      run("ngram_jaccard", Dedup.ngramJaccardPairs(docs, "id", "text",
        n = 3, threshold = 0.5))
      // cacheGramSets: minhash reads the gram sets three times (signatures
      // + both verify sides); with a generated (or re-scanned) input the
      // cache is what makes those reads share one tokenize pass
      run("minhash_dedup", Dedup.minhashDedup(docs, "id", "text",
        n = 3, numHashes = 64, bands = 32, threshold = 0.5,
        cacheGramSets = true))
      run("simhash_pairs", Dedup.simhashPairs(docs, "id", "text", maxHamming = 3))
    }

    if (what == "text" || what == "all") {
      val nDocs = size match {
        case "small" => 20000L
        case "medium" => 100000L
        case "large" => 400000L
        case other => throw new IllegalArgumentException(s"Unknown size: $other")
      }
      val docs = DataGen.corpus(spark, nDocs)
      println(s"$size text_docs=${docs.count()}")
      run("pii_redact", docs.select(col("id"),
        graft.text.TextMetrics.piiEmailCount(col("text")).as("n_email"),
        graft.text.TextMetrics.piiPhoneCount(col("text")).as("n_phone"),
        graft.text.TextMetrics.piiIpv4Count(col("text")).as("n_ip"),
        length(graft.text.TextMetrics.redactPii(col("text"))).as("len")))
      run("unigram_logprob",
        graft.text.TextMetrics.meanTokenLogProb(docs, "id", "text"))
      run("quality_score", docs.select(col("id"),
        graft.text.TextMetrics.qualityScore(col("text")).as("q"),
        graft.text.TextMetrics.dupWordFrac(col("text")).as("dw"),
        graft.text.TextMetrics.topWordFrac(col("text")).as("tw")))
      // benchmark = a 1k-doc slice; the corpus side is the full table —
      // the realistic shape (eval sets are tiny, corpora are not)
      run("decontaminate", graft.dedup.Dedup.contamination(
        docs.where(col("id") >= 1000), "id", "text",
        docs.where(col("id") < 1000), "text", width = 8))
      run("tfidf_top3",
        graft.text.TextMetrics.tfIdfTopTerms(docs, "id", "text", k = 3))
      run("pack_sequences", graft.operators.Packing.packSummary(
        docs, "id", "text", budget = 2048, shards = 64))
      // overlapping chunking (r16): scan-local explode+slice, output
      // ~tokens/stride rows — must track the corpus linearly
      run("chunk_docs", graft.operators.Packing.chunkDocs(
        docs, "id", "text", chunkTokens = 64, overlapTokens = 16))
      // Passage-level span dedup — the heaviest text operator: the
      // positional posting list is ≈ one row per corpus token. Probe the
      // full pipeline (postings → df-band stats → removal → cleaned
      // text) with the stop-gram cap off and on; print the posting
      // volume so SCALE.md can pin cost ∝ tokens, not docs².
      if (wanted("span")) {
        val postings = docs.select(sum(greatest(
          graft.text.TextMetrics.tokenCount(col("text")) - 7, lit(0))))
          .head().getLong(0)
        println(s"$size span_postings=$postings")
      }
      run("span_dedup",
        graft.dedup.Dedup.spanDedup(docs, "id", "text", width = 8))
      run("span_dedup_capped",
        graft.dedup.Dedup.spanDedup(docs, "id", "text", width = 8,
          maxDocFreq = 50))
      // BPE: one word-count aggregate + bounded driver fit, then the
      // scan-local memoized encode over the full corpus. DataGen words
      // are letter+digits ("w1234"), which the [a-z]+ word regex would
      // collapse to single letters — map digits to letters so the fit
      // sees a real 5k-word subword space.
      run("bpe_tokens", {
        val letters = docs.select(col("id"),
          translate(col("text"), "0123456789", "abcdefghij").as("text"))
        val merges = graft.text.Bpe.fit(letters, "text", numMerges = 30)
        letters.select(col("id"),
          graft.text.Bpe.tokenCount(col("text"), merges).as("n_bpe"))
      })
    }

    if (what == "nc" || what == "all") {
      // NetCDF distributed-scan throughput: one .nc file, slab reads over
      // the outer (time) dimension — 1 partition (a naive whole-file
      // reader's shape) vs the default min(outerDim, cores) fan-out.
      val (nt, nlat, nlon) = size match {
        case "small" => (128, 256, 256)   //  ~17M values (2 vars), ~134 MB
        case "medium" => (256, 384, 384)  //  ~75M values, ~604 MB
        case "large" => (512, 512, 512)   // ~268M values, ~2.1 GB
        case other => throw new IllegalArgumentException(s"Unknown size: $other")
      }
      val ncPath = java.nio.file.Files
        .createTempDirectory("graft_scaleprobe_nc").resolve("grid.nc").toString
      time("nc_write") {
        val slab = nlat * nlon
        val t2m = new Array[Double](nt * slab)
        val pr = new Array[Double](nt * slab)
        var i = 0
        while (i < t2m.length) {
          t2m(i) = 250.0 + (i % 97); pr(i) = (i % 13) * 0.1; i += 1
        }
        graft.ingest.NetCdf.write(ncPath,
          dims = Seq(graft.ingest.NetCdf.Dim("time", nt),
            graft.ingest.NetCdf.Dim("lat", nlat),
            graft.ingest.NetCdf.Dim("lon", nlon)),
          vars = Seq(
            (graft.ingest.NetCdf.VarDef("time", Seq("time"),
              graft.ingest.NetCdf.NcDouble,
              Seq("units" -> "hours since 2020-01-01")),
              Array.tabulate(nt)(_.toDouble)),
            (graft.ingest.NetCdf.VarDef("lat", Seq("lat"),
              graft.ingest.NetCdf.NcDouble),
              Array.tabulate(nlat)(i => i * 180.0 / nlat - 90)),
            (graft.ingest.NetCdf.VarDef("lon", Seq("lon"),
              graft.ingest.NetCdf.NcDouble),
              Array.tabulate(nlon)(i => i * 360.0 / nlon - 180)),
            (graft.ingest.NetCdf.VarDef("t2m", Seq("time", "lat", "lon"),
              graft.ingest.NetCdf.NcDouble), t2m),
            (graft.ingest.NetCdf.VarDef("pr", Seq("time", "lat", "lon"),
              graft.ingest.NetCdf.NcDouble), pr)))
      }
      println(s"$size nc_values=${nt.toLong * nlat * nlon * 2}")
      def scan(parts: Int) = graft.ingest.NetCdf
        .read(spark, ncPath, Seq("t2m", "pr"), numPartitions = parts)
        .agg(sum(col("t2m")), sum(col("pr")))
        .write.format("noop").mode("overwrite").save()
      time("nc_scan_1part")(scan(1))
      time("nc_scan_parallel")(scan(0))
      // open-time pushdown: an eighth of the time axis → an eighth of the
      // slices become tasks; the other 7/8 of the bytes are never read
      val hi = java.time.Instant.parse("2020-01-01T00:00:00Z")
        .plusSeconds((nt / 8 - 1) * 3600L).toString
      time("nc_scan_pushdown_eighth")(graft.ingest.NetCdf
        .read(spark, ncPath, Seq("t2m", "pr"),
          timeRange = Some(("2020-01-01T00:00:00Z", hi)))
        .agg(sum(col("t2m")), sum(col("pr")))
        .write.format("noop").mode("overwrite").save())
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ncPath))

      // NetCDF-4/HDF5: the same grid through the HDF5 container, chunked
      // uncompressed vs the standard shuffle→deflate→fletcher32 pipeline
      // real archives ship. Decompression is task-local, per-chunk CPU;
      // the scan plan (one task per outer slice) is identical, so the
      // delta is pure codec cost vs bytes saved. `large` is skipped: the
      // HDF5 writer is the in-memory export/fixture path (a 2.1 GB image
      // would brush the JVM array limit); medium (~600 MB) carries the
      // throughput evidence.
      if (size != "large") {
        val h5Dir = java.nio.file.Files.createTempDirectory("graft_scaleprobe_h5")
        val slab = nlat * nlon
        val t2m = new Array[Double](nt * slab)
        val pr = new Array[Double](nt * slab)
        // t2m: smooth, quantized field — the best case for shuffle+deflate
        // (repeated exponent/high-mantissa bytes); pr: full-mantissa noise
        // (sin of an irrational stride) — the worst case, where only the
        // shared sign/exponent bytes compress. Real climate archives sit
        // between; the pair bounds the regime instead of cherry-picking a
        // 400:1 synthetic.
        var i = 0
        while (i < t2m.length) {
          t2m(i) = 250.0 + (i % 97)
          pr(i) = math.sin(i * 0.6180339887498949) * 50 + 50
          i += 1
        }
        val h5Dims = Seq(graft.ingest.NetCdf.Dim("time", nt),
          graft.ingest.NetCdf.Dim("lat", nlat),
          graft.ingest.NetCdf.Dim("lon", nlon))
        val h5Vars = Seq(
          (graft.ingest.NetCdf.VarDef("time", Seq("time"),
            graft.ingest.NetCdf.NcDouble,
            Seq("units" -> "hours since 2020-01-01")),
            Array.tabulate(nt)(_.toDouble)),
          (graft.ingest.NetCdf.VarDef("lat", Seq("lat"),
            graft.ingest.NetCdf.NcDouble),
            Array.tabulate(nlat)(i => i * 180.0 / nlat - 90)),
          (graft.ingest.NetCdf.VarDef("lon", Seq("lon"),
            graft.ingest.NetCdf.NcDouble),
            Array.tabulate(nlon)(i => i * 360.0 / nlon - 180)),
          (graft.ingest.NetCdf.VarDef("t2m", Seq("time", "lat", "lon"),
            graft.ingest.NetCdf.NcDouble), t2m),
          (graft.ingest.NetCdf.VarDef("pr", Seq("time", "lat", "lon"),
            graft.ingest.NetCdf.NcDouble), pr))
        if (wanted("h5_")) {
          val h5Plain = h5Dir.resolve("grid_plain.h5").toString
          val h5Z = h5Dir.resolve("grid_z.h5").toString
          time("h5_write_chunked")(graft.ingest.Hdf5.write(
            h5Plain, h5Dims, h5Vars, chunked = true))
          time("h5_write_deflate")(graft.ingest.Hdf5.write(
            h5Z, h5Dims, h5Vars, chunked = true, deflate = 4))
          println(s"$size h5_bytes_plain=${new java.io.File(h5Plain).length()} " +
            s"h5_bytes_deflate=${new java.io.File(h5Z).length()}")
          def scanH5(p: String): Unit = graft.ingest.NetCdf
            .read(spark, p, Seq("t2m", "pr"))
            .agg(sum(col("t2m")), sum(col("pr")))
            .write.format("noop").mode("overwrite").save()
          val h5Zs = h5Dir.resolve("grid_zstd.h5").toString
          time("h5_write_zstd")(graft.ingest.Hdf5.write(
            h5Zs, h5Dims, h5Vars, chunked = true, deflate = 3,
            chunkCodec = "zstd"))
          println(s"$size h5_bytes_zstd=${new java.io.File(h5Zs).length()}")
          scanH5(h5Plain) // untimed warmup: codegen + page cache, so the
          scanH5(h5Z)     // timed scans differ only in codec work
          scanH5(h5Zs)
          time("h5_scan_chunked")(scanH5(h5Plain))
          time("h5_scan_deflate")(scanH5(h5Z))
          time("h5_scan_zstd")(scanH5(h5Zs))
          java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(h5Plain))
          java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(h5Z))
          java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(h5Zs))
        }

        // Streaming archive ingest vs batch readDir over the same files:
        // one file per outer slice, so the stream's unit of parallelism
        // (file-per-task flatMap decode) matches the batch scan's
        // (slice-per-task slab read) and the delta is pure discovery +
        // micro-batch machinery.
        if (wanted("ncstream") || wanted("ncdir")) {
          val archDir = java.nio.file.Files.createTempDirectory("graft_scaleprobe_arch")
          val perFile = slab
          (0 until nt).foreach { i =>
            graft.ingest.NetCdf.write(archDir.resolve(f"t$i%05d.nc").toString,
              dims = Seq(graft.ingest.NetCdf.Dim("time", 1),
                graft.ingest.NetCdf.Dim("lat", nlat),
                graft.ingest.NetCdf.Dim("lon", nlon)),
              vars = Seq(
                (graft.ingest.NetCdf.VarDef("time", Seq("time"),
                  graft.ingest.NetCdf.NcDouble,
                  Seq("units" -> "hours since 2020-01-01")), Array(i.toDouble)),
                (graft.ingest.NetCdf.VarDef("lat", Seq("lat"),
                  graft.ingest.NetCdf.NcDouble),
                  Array.tabulate(nlat)(j => j * 180.0 / nlat - 90)),
                (graft.ingest.NetCdf.VarDef("lon", Seq("lon"),
                  graft.ingest.NetCdf.NcDouble),
                  Array.tabulate(nlon)(j => j * 360.0 / nlon - 180)),
                (graft.ingest.NetCdf.VarDef("t2m", Seq("time", "lat", "lon"),
                  graft.ingest.NetCdf.NcDouble),
                  java.util.Arrays.copyOfRange(t2m, i * perFile, (i + 1) * perFile))))
          }
          println(s"$size ncstream_files=$nt")
          def scanDir(threshold: Int): Unit = graft.ingest.NetCdf
            .readDir(spark, archDir.toString, Seq("t2m"),
              fileGrainThreshold = threshold)
            .agg(sum(col("t2m")))
            .write.format("noop").mode("overwrite").save()
          time("ncdir_union")(scanDir(Int.MaxValue))
          time("ncdir_filegrain")(scanDir(1))
          time("ncstream_stream") {
            val sq = graft.ingest.NetCdf
              .readStream(spark, archDir.toString, Seq("t2m"))
              .writeStream.format("noop")
              .option("checkpointLocation", java.nio.file.Files
                .createTempDirectory("graft_scaleprobe_ck").toString)
              .start()
            try sq.processAllAvailable() finally sq.stop()
          }
        }
      }
    }

    if (what == "web" || what == "all") {
      val nDocs = size match {
        case "small" => 20000L
        case "medium" => 100000L
        case "large" => 400000L
        case other => throw new IllegalArgumentException(s"Unknown size: $other")
      }
      val docs = DataGen.corpus(spark, nDocs)
      println(s"$size web_docs=${docs.count()}")
      // persisted dedup index: FIT scales with the corpus; QUERY of a
      // fixed 2k-doc batch must scale with the postings SCAN only (no
      // corpus shuffle — the batch is broadcast), i.e. far sublinearly
      // vs refitting or re-deduping the whole corpus
      val idxDir = graft.util.Tmp.root("graft_probe_mhidx").toString
      time("dedup_index_fit")(
        graft.dedup.DedupIndex.write(docs, "id", "text", idxDir))
      val batch = DataGen.corpus(spark, 2000, seed = 7L)
      run("dedup_index_query2k", graft.dedup.DedupIndex.query(
        batch, "id", "text", idxDir, threshold = 0.5))
      // ingestStream fragmentation: 200 micro-appends leave 200 tiny
      // subdirectories per table (the price of batch-tagged idempotent
      // replay), so the postings scan goes metadata-bound; compact()
      // folds them into one base write in a fresh generation and the
      // query returns to fitted-store cost. Probe-only (PROBE_ONLY=
      // dedup_index_compact): the 200 appends are the fixture, the two
      // query timings + the fold cost are the evidence.
      if (wanted("dedup_index_compact")) {
        val inc = DataGen.corpus(spark, 2000, seed = 11L)
        time("dedup_index_200appends")(
          (0 until 200).foreach { i =>
            graft.dedup.DedupIndex.append(
              inc.where(col("id") % 200 === i), "id", "text", idxDir,
              tag = s"p$i")
          })
        run("dedup_index_query2k_fragmented", graft.dedup.DedupIndex.query(
          batch, "id", "text", idxDir, threshold = 0.5))
        time("dedup_index_compact")(
          graft.dedup.DedupIndex.compact(spark, idxDir))
        run("dedup_index_query2k_compacted", graft.dedup.DedupIndex.query(
          batch, "id", "text", idxDir, threshold = 0.5))
      }
      // int8-quantized brute force: fixed 100 queries × N codes — linear
      // in N with an 8×-smaller scan than the double-vector exact form
      // (knn_exact_100q in the ann section is the counterfactual)
      val emb = DataGen.vectors(spark, nDocs, 64)
      run("sq_topk_100q", graft.sim.Similarity.sqTopK(
        emb, emb.where(col("vec_id") < 100), "vec_id", "embedding", k = 10))
      // HTML extraction: pure scan-local Column pipeline over N pages
      run("html_extract", docs.select(col("id"),
        length(graft.text.HtmlExtract.mainContent(concat(
          lit("<html><head><title>t</title><style>p{}</style></head><body>" +
            "<nav><a href=\"/\">Home</a> <a href=\"/a\">Archive page</a></nav><p>"),
          col("text"),
          lit("</p><div>tail <a href=\"/m\">read much more here</a></div>" +
            "<script>var x=1;</script></body></html>")))).as("len")))
      // WARC: write n/10 response records (driver-side fixture writer),
      // then time the distributed read+parse — the operator under test
      val wDocs = docs.where(col("id") % 10 === 0)
        .select(col("id"), col("text")).collect()
      val wDir = graft.util.Tmp.root("graft_probe_warc").toString
      val parts = 8
      val cdxIndexes = scala.collection.mutable.Map.empty[Int, Seq[(Long, Long)]]
      time("warc_write")(
        (0 until parts).foreach { k =>
          val recs = wDocs.filter(r => (r.getLong(0) / 10) % parts == k).toSeq.map { r =>
            graft.ingest.Warc.WarcRecord("response",
              s"urn:probe:${r.getLong(0)}", "2026-01-01T00:00:00Z",
              graft.ingest.Warc.httpResponseBlock(200, "OK", "text/plain",
                r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)),
              targetUri = Some(s"https://h.example.com/p/${r.getLong(0)}"),
              contentType = Some("application/http;msgtype=response"))
          }
          cdxIndexes(k) = graft.ingest.Warc.write(s"$wDir/p$k.warc.gz", recs)
        })
      run("warc_read", graft.ingest.Warc.read(spark, wDir, Seq("response"))
        .select(col("warc_target_uri"), length(col("payload")).as("n")))
      // distributed WET sink: n/10 conversion records, extraction text as
      // the block, one .warc.gz per task — write cost is one scan, no
      // driver gather (the write half of the crawl loop)
      val wetDir = graft.util.Tmp.root("graft_probe_wet").toString
      time("wet_write_distributed") {
        graft.ingest.Warc.writeDistributed(
          docs.where(col("id") % 10 === 0).select(
            lit("conversion").as("warc_type"),
            concat(lit("urn:probe:wet:"), col("id")).as("warc_record_id"),
            lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
              .as("warc_date"),
            concat(lit("https://h.example.com/p/"), col("id"))
              .as("warc_target_uri"),
            lit("text/plain").as("content_type"),
            col("text").cast("binary").as("block"))
            .repartition(32, col("warc_record_id")),
          wetDir)
      }
      // O(k) indexed point-fetch (Warc.readIndexed's claim): a fixed
      // 200-record byte-range batch against the grown archive, next to
      // the full scan it short-circuits — the fetch must stay flat as
      // the archive scales while warc_read grows with it
      if (wanted("warc_fetch200")) {
        import spark.implicits._
        val slices = (0 until parts).flatMap { k =>
          val f = s"$wDir/p$k.warc.gz"
          cdxIndexes(k).map { case (off, len) => (f, off, len) }
        }
        val every = math.max(slices.size / 200, 1)
        val batch = slices.zipWithIndex.collect {
          case (s, i) if i % every == 0 => s
        }.take(200).toDF("file", "offset", "length")
        run("warc_fetch200", graft.ingest.Warc.readIndexed(spark, batch)
          .select(col("warc_record_id"), length(col("payload")).as("n")))
      }
    }

    if (what == "media" || what == "all") {
      // Multimodal decode family at scale — measured evidence for the
      // O-shapes the operators' docs claim: feature extraction / resize /
      // dHash are LINEAR in blob count (real per-blob JDK decode, memory
      // bounded by partition count); frame sampling costs the SAMPLED
      // frames, not the track length (2-of-8 vs 8-of-8 on the same GIFs);
      // audio metadata is a header parse, FLAT in payload size (same N at
      // 1 KiB vs 64 KiB PCM); BMFF metadata/sample-table walks are
      // header-sized. Fixtures are real containers built ON EXECUTORS.
      val nMedia = size match {
        case "small" => 2000L
        case "medium" => 10000L
        case "large" => 40000L
        case other => throw new IllegalArgumentException(s"Unknown size: $other")
      }
      import spark.implicits._
      import graft.multimodal.{Multimodal => mm}
      val pngs = spark.range(nMedia).as[Long].mapPartitions(_.map { id =>
        (id, mm.blockPng(3, (x, y) => ((id + x * 31 + y * 7) % 256).toInt))
      }).toDF("media_id", "content").cache()
      println(s"$size media_blobs=${pngs.count()}")
      run("image_features", mm.extractFeatures(pngs, dim = 16).toDF())
      run("image_resize", mm.resizeImages(pngs, maxDim = 8).toDF())
      run("image_dhash", mm.imageDHashes(pngs))
      // 96x96 frames: big enough that per-frame pixel decode dominates
      // the unavoidable frame-count stream scan — the regime where
      // decode-only-sampled-frames pays (at thumbnail sizes the count
      // scan is the cost and 2-of-8 ~= 8-of-8)
      val gifs = spark.range(nMedia / 4).as[Long].mapPartitions(_.map { id =>
        val frames = (0 until 8).map(f => (((id + f * 37) % 256).toInt,
          ((id * 3 + f) % 256).toInt, ((id + f * 11) % 256).toInt))
        (id, mm.animatedGif(frames, 96, 96))
      }).toDF("media_id", "content").cache()
      gifs.count()
      run("gif_sample_2of8", mm.sampleFrames(gifs, stride = 4, maxFrames = 2).toDF())
      run("gif_sample_8of8", mm.sampleFrames(gifs, stride = 1, maxFrames = 8).toDF())
      def wavs(bytesPerBlob: Int) = spark.range(nMedia).as[Long]
        .mapPartitions(_.map { id =>
          val pcm = Array.tabulate(bytesPerBlob)(i => ((id + i) % 251).toByte)
          (id, mm.wavFromPcm(pcm, 8000, 1, 8))
        }).toDF("media_id", "content")
      val wavSmall = wavs(1 << 10).cache(); wavSmall.count()
      val wavBig = wavs(1 << 16).cache(); wavBig.count()
      run("audio_meta_1k", mm.audioMeta(wavSmall).toDF())
      run("audio_meta_64k", mm.audioMeta(wavBig).toDF())
      wavSmall.unpersist(); wavBig.unpersist()
      val mp4s = spark.range(nMedia / 4).as[Long].mapPartitions(_.map { id =>
        (id, mm.mjpegMp4(16, 16, 5, (0 until 4).map(f => ((id + f * 61) % 256).toInt)))
      }).toDF("media_id", "content").cache()
      mp4s.count()
      run("video_meta", mm.videoMeta(mp4s).toDF())
      run("mp4_sample_2of4", mm.sampleMp4Frames(mp4s, stride = 2, maxFrames = 2).toDF())
      pngs.unpersist(); gifs.unpersist(); mp4s.unpersist(); ()
    }

    if (what == "cc" || what == "all") {
      // Connected-components strategy crossover (see Dedup.scala
      // connectedComponentsWithStatus): driver union-find (bounded
      // collect) vs distributed min-label propagation, on a realistic
      // near-dup edge shape — star clusters of 5 (4 edges per 5 nodes)
      // plus 1% diameter-4 chains so propagation needs >1 round.
      val nEdges = size match {
        case "small" => 1000000L
        case "medium" => 4000000L
        case "large" => 16000000L
        case other => throw new IllegalArgumentException(s"Unknown size: $other")
      }
      val n = nEdges * 5 / 4
      def pairs = spark.range(n).where(col("id") % 5 =!= 0)
        .select(col("id").as("id1"),
          when(col("id") % 500 === 499, col("id") - 1) // chain tail: 496-497-498-499
            .otherwise(col("id") - col("id") % 5).as("id2"))
      println(s"$size cc_edges=${pairs.count()}")
      time("cc_driver_unionfind") {
        val (labels, _) = Dedup.connectedComponentsWithStatus(
          pairs, driverMaxEdges = Long.MaxValue)
        labels.write.format("noop").mode("overwrite").save()
      }
      time("cc_distributed") {
        val (labels, _) = Dedup.connectedComponentsWithStatus(
          pairs, driverMaxEdges = 0)
        labels.write.format("noop").mode("overwrite").save()
      }
    }

    if (what == "asof" || what == "all") {
      // Point-in-time enrichment at stream scale: the union+window
      // composition vs the native sort-merge exec on the same inputs.
      // Left:right = 10:1, ~200 rows/key — the click/purchase shape.
      val nL = size match {
        case "small" => 2000000L
        case "medium" => 20000000L
        case "large" => 100000000L
        case other => throw new IllegalArgumentException(s"Unknown size: $other")
      }
      val nR = nL / 10
      val keys = math.max(nL / 200, 1L)
      val t0 = 1577836800L // 2020-01-01
      def facts = spark.range(nL).select(
        pmod(col("id"), lit(keys)).as("k"),
        timestamp_seconds(lit(t0) + (col("id") / keys).cast("long") * 60 +
          pmod(hash(col("id")), lit(17))).as("ts"),
        (col("id") % 1000).cast("double").as("v"))
      def quotes = spark.range(nR).select(
        pmod(col("id"), lit(keys)).as("k"),
        timestamp_seconds(lit(t0) + (col("id") / keys).cast("long") * 600).as("rts"),
        (col("id") % 997).cast("double").as("rv"))
      println(s"$size asof_left=$nL asof_right=$nR keys=$keys")
      run("asof_union_window", graft.operators.AsOfJoin.asofJoin(
        facts, quotes, Seq("k"), "ts", "rts", Seq("rv")))
      run("asof_merge_exec", graft.plans.AsOfMerge.asofMergeJoin(
        facts, quotes, Seq("k"), "ts", "rts", Seq("rv"),
        broadcast = Some(false)))
      // small-reference regime (right = 1% of facts): the broadcast form's
      // zero-shuffle plan vs the merge form still shuffling the fact side
      def quotesSmall = spark.range(math.max(nR / 100, 1)).select(
        pmod(col("id"), lit(keys)).as("k"),
        timestamp_seconds(lit(t0) + (col("id") / keys).cast("long") * 60000).as("rts"),
        (col("id") % 997).cast("double").as("rv"))
      run("asof_merge_smallref", graft.plans.AsOfMerge.asofMergeJoin(
        facts, quotesSmall, Seq("k"), "ts", "rts", Seq("rv"),
        broadcast = Some(false)))
      run("asof_broadcast_smallref", graft.plans.AsOfMerge.asofMergeJoin(
        facts, quotesSmall, Seq("k"), "ts", "rts", Seq("rv"),
        broadcast = Some(true)))
    }

    if (what == "ann" || what == "all") {
      val n = size match {
        case "small" => 20000L
        case "medium" => 100000L
        case "large" => 400000L
        case other => throw new IllegalArgumentException(s"Unknown size: $other")
      }
      val emb = DataGen.vectors(spark, n, 64)
      println(s"$size ann_vectors=${emb.count()}")
      val qs = emb.where(col("vec_id") < 100)
      // exact baseline: 100 broadcast queries × full corpus × dim mults
      run("knn_exact_100q",
        graft.sim.Similarity.knnForQueries(emb, qs, "vec_id", "embedding", 10))
      // LSH signature over the FULL corpus: the native fused kernel vs the
      // composed per-bit zip_with/aggregate chain it replaced (kept inline
      // here as the measured counterfactual — HOF lambdas are interpreted)
      run("lsh_sig_native", emb.select(
        graft.plans.Expressions.hyperplane_signature(
          transform(col("embedding"), _.cast("double")),
          graft.sim.Similarity.hyperplanes(64, 16)).as("sig")))
      run("lsh_sig_hof", {
        val v = transform(col("embedding"), _.cast("double"))
        val sig = graft.sim.Similarity.hyperplanes(64, 16).zipWithIndex.map {
          case (h, i) =>
            val dot = aggregate(zip_with(v, typedLit(h), (x, p) => x * p),
              lit(0.0), (acc, x) => acc + x)
            when(dot >= 0, lit(1L << i)).otherwise(0L)
        }.reduce(_.bitwiseOR(_))
        emb.select(sig.as("sig"))
      })
      // corpus-size-aware operating point; the FIXED 2-bit-key default
      // measured 306 s at 100k vectors (bucket occupancy n/4 → quadratic)
      run("lsh_pairs_auto", graft.sim.Similarity.lshCosinePairsAuto(
        emb, "vec_id", "embedding", threshold = 0.8, dim = 64))
      // codebook training: distributed treeAggregate Lloyd's, full corpus
      var books: Seq[Seq[Seq[Double]]] = null
      time("pq_fit_distributed") {
        books = graft.sim.Similarity.pqCodebooks(emb, "embedding", 64, 8, 16)
      }
      // the scans below need codebooks even when the fit itself is filtered out
      if (books == null && (wanted("pq_topk_100q") || wanted("ivfpq_topk_100q")))
        books = graft.sim.Similarity.pqCodebooks(emb, "embedding", 64, 8, 16)
      // SQ brute force vs SQ×IVF (r14): same int8 scoring, candidates n
      // per query vs n·nprobe/nlist — the measured counterfactual for the
      // q_sq_ivf_ann composition's sublinear scan claim. The coarse fit
      // is timed separately (fit-once/serve-many — the write-time cost),
      // so the two scan rows compare like for like.
      run("sq_topk_100q",
        graft.sim.Similarity.sqTopK(emb, qs, "vec_id", "embedding", 10))
      var sqCents: Seq[Seq[Double]] = null
      time("sq_ivf_fit") {
        sqCents = graft.sim.Similarity.pqCodebooks(emb, "embedding", 64,
          m = 1, codebookSize = 64, normalizeInput = false).head
      }
      if (sqCents == null &&
          (wanted("sq_ivf_topk_100q") || wanted("sq_ivf_serve_100q")))
        sqCents = graft.sim.Similarity.pqCodebooks(emb, "embedding", 64,
          m = 1, codebookSize = 64, normalizeInput = false).head
      run("sq_ivf_topk_100q",
        graft.sim.Similarity.sqIvfTopK(emb, qs, "vec_id", "embedding", 10,
          dim = 64, nlist = 64, nprobe = 8, centroids = Some(sqCents)))
      // the persisted-index serving shape: corpus (cell, code) encoded
      // ONCE at write time; the per-batch cost is only the pruned scan
      if (wanted("sq_ivf_serve_100q")) {
        val enc = graft.sim.Similarity.sqIvfEncode(emb, "vec_id", "embedding",
          sqCents).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        enc.count() // materialize outside the timed region
        run("sq_ivf_serve_100q",
          graft.sim.Similarity.sqIvfServe(enc, qs, "vec_id", "embedding", 10,
            sqCents, nprobe = 8))
        enc.unpersist()
        ()
      }
      // r15: the same serve answered from the PERSISTED store (open once
      // in a fresh session — per-batch cost is the cell-pruned parquet
      // scan + integer ranking, no re-encode, no cached corpus)
      if (wanted("sq_ivf_store_serve_100q")) {
        val sqDir = java.nio.file.Files
          .createTempDirectory("graft_scaleprobe_sqivf").toString
        time("sq_ivf_index_write")(
          graft.sim.Similarity.writeSqIvfIndex(emb, "vec_id", "embedding",
            sqDir, dim = 64, nlist = 64))
        val sqIdx = graft.sim.Similarity.openSqIvfIndex(spark.newSession(), sqDir)
        run("sq_ivf_store_serve_100q",
          graft.sim.Similarity.sqIvfServeIndex(sqIdx, qs, "vec_id", "embedding",
            10, nprobe = 8))
      }
      // PQ scan: encode full corpus + ADC-score 100 queries × n codes
      run("pq_topk_100q",
        graft.sim.Similarity.pqTopK(emb, "vec_id", "embedding", 10,
          dim = 64, queries = Some(qs), codebooks = Some(books)))
      // IVF-PQ: encode + cell pruning; candidates ≈ n/nlist·nprobe
      run("ivfpq_topk_100q",
        graft.sim.Similarity.ivfPqTopK(emb, "vec_id", "embedding", 10,
          dim = 64, nlist = 64, nprobe = 8, queries = Some(qs),
          codebooks = Some(books)))
      // fit-once/serve-many: the write pays the codebook fit + coarse fit
      // + full-corpus encode ONCE; each serve is just probe ranking + a
      // cell-pruned candidate join over stored m-byte codes
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft_scaleprobe_idx").toString
      time("ivfpq_index_write")(
        graft.sim.Similarity.writeIvfPqIndex(emb, "vec_id", "embedding",
          idxDir, dim = 64, nlist = 64, m = 8, codebookSize = 16))
      if (wanted("ivfpq_serve_100q")) {
        // the index may not exist when the write cell was filtered out
        // (generational layout: existence = a committed marker, not a
        // root-level meta table)
        if (graft.util.AtomicStore.currentGen(spark, idxDir).isEmpty)
          graft.sim.Similarity.writeIvfPqIndex(emb, "vec_id", "embedding",
            idxDir, dim = 64, nlist = 64, m = 8, codebookSize = 16)
        val idx = graft.sim.Similarity.openIvfPqIndex(spark.newSession(), idxDir)
        run("ivfpq_serve_100q",
          graft.sim.Similarity.ivfPqServe(idx, qs, "vec_id", "embedding",
            10, nprobe = 8))
      }
      // r17: stream-maintained extension fragmentation → fold. 100
      // micro-batches leave up to 100 × nlist (batch_id, cell) partition
      // directories in codes_stream (the price of idempotent replay);
      // serving unions base + extension across all of them.
      // compactIvfPqStreamExtension folds the rows into base in a fresh
      // generation — the serve must return to fitted-store cost.
      // Probe-only: the 100 appends are the fixture, the two serve
      // timings + the fold cost are the evidence.
      if (wanted("ivfpq_stream_fold")) {
        val sDir = java.nio.file.Files
          .createTempDirectory("graft_scaleprobe_fold").toString
        time("ivfpq_stream_fold_fit")(
          graft.sim.Similarity.writeIvfPqIndex(
            emb.where(col("vec_id") % 8 =!= 0), "vec_id", "embedding",
            sDir, dim = 64, nlist = 64, m = 8, codebookSize = 16))
        val inc = emb.where(col("vec_id") % 8 === 0)
        time("ivfpq_stream_100appends")(
          (0 until 100).foreach { i =>
            graft.sim.Similarity.appendStreamBatch(
              inc.where((col("vec_id") / 8) % 100 === i),
              "vec_id", "embedding", sDir, batchId = i.toLong)
          })
        val frag = graft.sim.Similarity.openIvfPqIndex(spark.newSession(), sDir)
        run("ivfpq_stream_serve_100q_fragmented",
          graft.sim.Similarity.ivfPqServe(frag, qs, "vec_id", "embedding",
            10, nprobe = 8))
        time("ivfpq_stream_fold")(
          graft.sim.Similarity.compactIvfPqStreamExtension(spark, sDir))
        val folded = graft.sim.Similarity.openIvfPqIndex(spark.newSession(), sDir)
        run("ivfpq_stream_serve_100q_folded",
          graft.sim.Similarity.ivfPqServe(folded, qs, "vec_id", "embedding",
            10, nprobe = 8))
      }
    }

    if (what == "stream" || what == "all") {
      import spark.implicits._
      // events, event-time slices (hours), distinct keys — at every size
      // the point is the RATIO: state must track keys (sessionize) or
      // rows-per-horizon (interval join), never total stream length
      val (nEvents, nSlices, nKeys) = size match {
        case "small" => (1000000L, 12, 10000L)
        case "medium" => (10000000L, 12, 100000L)
        case "large" => (100000000L, 24, 1000000L)
        case other => throw new IllegalArgumentException(s"Unknown size: $other")
      }
      // stage slices as files IN EVENT-TIME ORDER (4 files per slice +
      // maxFilesPerTrigger=4 → one hour of events per micro-batch), so
      // the watermark advances and evicts state every batch
      def stage(salt: String, n: Long): String = {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_stream_$salt").toString
        (0 until nSlices).foreach { s =>
          DataGen.eventSlice(spark, s, n / nSlices, nKeys, salt)
            .coalesce(4).write.mode("append").parquet(dir)
        }
        dir
      }
      def readSlices(dir: String) = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 4)
        .parquet(dir)
      // drives a query to completion and reports throughput plus the
      // state-store trajectory (max/last rows, max bytes) from progress
      def drive(tag: String, totalRows: Long)(
          start: String => org.apache.spark.sql.streaming.StreamingQuery): Unit =
        if (wanted(tag)) {
          val ckpt = java.nio.file.Files
            .createTempDirectory(s"graft_ckpt_$tag").toString
          val t0 = System.nanoTime()
          val q = start(ckpt)
          q.processAllAvailable()
          val secs = (System.nanoTime() - t0) / 1e9
          val rows = q.recentProgress.map(_.stateOperators.map(_.numRowsTotal).sum)
          val mem = q.recentProgress.map(_.stateOperators.map(_.memoryUsedBytes).sum)
          q.stop()
          println(f"$size $tag: $secs%.2f s, " +
            f"${totalRows / secs / 1e6}%.2f Mevents/s, " +
            s"state_rows max=${if (rows.isEmpty) 0L else rows.max} " +
            s"last=${if (rows.isEmpty) 0L else rows.last}, " +
            f"state_mem_max_mb=${if (mem.isEmpty) 0.0 else mem.max / 1e6}%.1f")
        }

      val evDir = stage("ev", nEvents)
      drive("stream_sessionize", nEvents) { ckpt =>
        val events = readSlices(evDir)
          .select(col("user_id").as("userId"),
            col("ts").cast("double").as("epochSec"))
          .as[graft.streaming.Streams.SessionEvent]
        // data-driven closure (deterministic); state is one row per
        // ACTIVE KEY — nKeys, independent of stream length
        graft.streaming.Streams
          .sessionizeStream(events, gapSeconds = 600, useTimeout = false)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .format("noop").start()
      }

      val clickDir = stage("click", nEvents)
      val buyDir = stage("buy", nEvents / 10)
      drive("stream_interval_join", nEvents + nEvents / 10) { ckpt =>
        val clicks = readSlices(clickDir)
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        val buys = readSlices(buyDir)
          .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
        // time-bound + both-side watermarks ⇒ Spark proves buffered rows
        // expire; state is rows within horizon+watermark of the frontier
        graft.streaming.Streams.intervalJoinStream(clicks, buys,
            "c_user", "b_user", "c_ts", "b_ts",
            horizonSeconds = 300, watermark = "10 minutes")
          .writeStream
          .option("checkpointLocation", ckpt)
          .format("noop").start()
      }
    }
    if (what == "fold" || what == "all") {
      // steady-state serve latency over a LONG-running stream (r18): the
      // r17 fold was measured at one point (100 batches, 1.8× serve
      // cost); this probe drives 200+ micro-batches through the
      // fragmentation-keyed default policy (the stream drivers' trigger:
      // fold when the extension holds >= 64 batch dirs) and samples the
      // serve latency along the way — the SCALE.md evidence that the
      // default keeps a months-long stream from going metadata-bound.
      val batches = size match {
        case "small" => 80
        case "medium" => 220
        case "large" => 500
        case other => throw new IllegalArgumentException(s"Unknown size: $other")
      }
      val perBatch = 500L
      val d = java.nio.file.Files
        .createTempDirectory("graft_fold_probe").toString + "/sqivf"
      val base = DataGen.vectors(spark, 20000L, 64)
      graft.sim.Similarity.writeSqIvfIndex(base, "vec_id", "embedding", d,
        dim = 64, nlist = 16)
      val queries = base.where(col("vec_id") < 32)
      def serveOnce(): Double = {
        val t0 = System.nanoTime()
        val idx = graft.sim.Similarity.openSqIvfIndex(spark.newSession(), d)
        graft.sim.Similarity.sqIvfServeIndex(idx, queries,
            "vec_id", "embedding", k = 10, nprobe = 4)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      if (wanted("fold_steady_state")) {
        serveOnce() // warm
        var folds = 0
        var foldSecs = 0.0
        val samples = scala.collection.mutable.ArrayBuffer[(Int, Double, Int)]()
        val t0 = System.nanoTime()
        (0 until batches).foreach { b =>
          val lo = 100000L + b * perBatch
          graft.sim.Similarity.appendSqIvfStreamBatch(
            DataGen.vectors(spark, perBatch, 64, seed = 42L + b)
              .withColumn("vec_id", col("vec_id") + lo),
            "vec_id", "embedding", d, batchId = b.toLong)
          // the stream drivers' default trigger, replicated verbatim
          // (Streams.shouldFold with foldMaxExtDirs = 64)
          if (graft.sim.Similarity.streamExtensionDirCount(spark, d) >= 64) {
            val f0 = System.nanoTime()
            graft.sim.Similarity.compactSqIvfStreamExtension(spark, d)
            foldSecs += (System.nanoTime() - f0) / 1e9
            folds += 1
          }
          if (b % 20 == 19)
            samples += ((b + 1, serveOnce(),
              graft.sim.Similarity.streamExtensionDirCount(spark, d)))
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val line = samples.map { case (b, s, dirs) =>
          f"b$b=$s%.2fs/$dirs" }.mkString(" ")
        println(f"$size fold_steady_state: batches=$batches " +
          f"folds=$folds fold_total=$foldSecs%.1f s wall=$wall%.1f s " +
          s"serve_samples(batch=serve_s/ext_dirs): $line")
      }
    }

    if (what == "serve" || what == "all") {
      // concurrent-load SERVE benchmark (r18): the HTTP layer had
      // correctness/chaos specs but no measured p99 under parallel
      // clients. Serve the size-keyed bench grid FROM PARQUET (the
      // deployment shape — a store read per cache miss, not an in-flight
      // generator), drive N concurrent clients over a mixed
      // point/stats/region workload with repeats (the cache-hit-heavy
      // production mix) and report qps + latency percentiles.
      val grid = DataGen.benchGrid(spark, size)
      val store = java.nio.file.Files
        .createTempDirectory("graft_serve_store").toString + "/grid"
      grid.write.mode("overwrite").parquet(store)
      val served = spark.read.parquet(store)
      val spec = SeriesSpec("ts", Seq("lat", "lon"), "temperature")
      val running = graft.serve.Server.start(spark,
        Map("bench" -> ((served, spec))))
      try {
        val port = running.port
        // never throws: a connection error or a body-less error response
        // returns code -1/599 — a dead client thread would silently
        // truncate the sample set and publish qps/p99 over a clean-looking
        // subset (the "no silent caps" trap)
        def get(path: String): (Int, Long) = {
          val t0 = System.nanoTime()
          try {
            val c = java.net.URI.create(s"http://127.0.0.1:$port$path")
              .toURL.openConnection()
              .asInstanceOf[java.net.HttpURLConnection]
            c.setRequestMethod("GET")
            val code = c.getResponseCode
            val in = if (code >= 400) c.getErrorStream else c.getInputStream
            if (in != null) {
              val buf = new Array[Byte](1 << 16)
              try { while (in.read(buf) != -1) () } finally in.close()
            }
            (code, System.nanoTime() - t0)
          } catch {
            case _: java.io.IOException => (599, System.nanoTime() - t0)
          }
        }
        // the workload: 24 distinct point keys + 4 stats/region shapes,
        // cycled — repeats hit the response cache, fresh keys miss and
        // pay a pruned store scan (the production mix). Warm one of each
        // shape first (plan compilation off the clock, like the bench).
        val paths: IndexedSeq[String] =
          (for (la <- -60 to 60 by 30; lo <- 0 to 120 by 40) yield
            s"/api/v1/data/datasets/bench/point?lat=$la.0&lon=$lo.0") ++
          Seq(
            "/api/v1/data/datasets/bench/stats",
            "/api/v1/data/datasets/bench/stats?min_lon=0&min_lat=0&max_lon=60&max_lat=60",
            "/api/v1/metrics/temporal/bench?metric=monthly",
            "/api/v1/data/datasets/bench")
        if (wanted("serve_concurrent")) {
          get(paths.head); get(paths(paths.size - 4)); get(paths.last)
          val clients = 16
          val perClient = 48
          val lat = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
          val errors = new java.util.concurrent.atomic.AtomicInteger(0)
          val t0 = System.nanoTime()
          val ts = (0 until clients).map { c =>
            new Thread(() => (0 until perClient).foreach { i =>
              val (code, nanos) = get(paths((c * perClient + i) % paths.size))
              if (code != 200) { errors.incrementAndGet(); () }
              lat.add(nanos); ()
            })
          }
          ts.foreach(_.start()); ts.foreach(_.join())
          val wall = (System.nanoTime() - t0) / 1e9
          import scala.jdk.CollectionConverters._
          val sorted = lat.asScala.toIndexedSeq.map(_ / 1e9).sorted
          def p(q: Double) = sorted((q * (sorted.size - 1)).toInt)
          val hits = running.cacheStats()
          println(f"$size serve_concurrent: clients=$clients " +
            f"reqs=${sorted.size} errors=${errors.get()} wall=$wall%.2f s " +
            f"qps=${sorted.size / wall}%.1f p50=${p(0.5)}%.3f s " +
            f"p95=${p(0.95)}%.3f s p99=${p(0.99)}%.3f s " +
            f"max=${sorted.last}%.3f s cache_hits=${hits.hits} " +
            f"misses=${hits.misses}")
        }
      } finally running.stop()
    }
    spark.stop()
  }
}
