package graft.queries

import graft.ingest.{GridSink, LayoutPlanner}
import graft.model.Tables
import graft.multimodal.Multimodal
import graft.pipeline.{Jobs, LazyPipeline, Pipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline composition, op-descriptor interpretation, and multimodal
  * binary plumbing as driver queries.
  */
object PipelineQ extends QueryPack {

  import TemporalQ.liSeries

  /** One converted store per (session UUID, sfDir) — q_job_convert's async
    * write runs once, not once per plan build (MetaSpec builds every
    * query's plan). Root is removed on JVM exit, like IngestQ's stores;
    * the string key keeps stopped sessions GC-able.
    */
  private val jobStores =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  private lazy val jobTmpRoot: java.nio.file.Path = graft.util.Tmp.root("graft_job")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D1/D2 + P7: the op-descriptor list interpreted onto the lineitem
    // series — slice then resample, the reference task-runner's contract.
    "q_pipeline_ops" -> ((s, dir) =>
      round6(
        Jobs.interpret(Tables.lineitem(s, dir), liSeries, Seq(
          Jobs.SliceTime("1996-01-01", "1997-12-31"),
          Jobs.Resample("annual")))
          .drop("month_end"),
        "mean_value")),
    // Pipeline composition: filter step + metric step folded via transform.
    "q_pipeline_compose" -> ((s, dir) => {
      val p = Pipeline.create("demo")
        .add("high_quantity")(_.where(col("l_quantity") >= 25))
        .add("metric")(d => Jobs.computeMetric(d, liSeries, "climatology"))
      round6(p(Tables.lineitem(s, dir)), "clim_mean", "clim_std")
    }),
    // Multimodal: binary content column + content-addressed metadata.
    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.fromText(Tables.documents(s, dir), "doc_id", "text", "text/plain")
        .select(col("media_id"), col("mime"), col("n_bytes"), col("sha256"))),
    // Real codec roundtrip: solid-colour PNGs (dims/colour arithmetic
    // functions of the id) → ImageIO decode → bilinear AWT resize → PNG
    // re-encode → decode the thumb and measure channel means. Solid colour
    // makes every step's output an integer formula DuckDB replays — the
    // oracle is fully independent of the engine while the bytes really go
    // through the JDK codec twice.
    "q_image_resize" -> ((s, dir) => {
      import s.implicits._
      val imgs = s.range(200).map { id =>
        val w = (16 + id * 13 % 48).toInt
        val h = (16 + id * 29 % 48).toInt
        val rgb = ((id * 37 % 256) << 16 | (id * 59 % 256) << 8 | (id * 83 % 256)).toInt
        (id, Multimodal.solidPng(w, h, rgb))
      }.toDF("media_id", "content")
      Multimodal.resizeImages(imgs, maxDim = 16).map { t =>
        val (r, g, b) = Multimodal.channelMeans(t.thumb).get
        (t.media_id, t.width, t.height, t.thumb_w, t.thumb_h,
          math.round(r).toInt, math.round(g).toInt, math.round(b).toInt)
      }.toDF("media_id", "width", "height", "thumb_w", "thumb_h",
        "mean_r", "mean_g", "mean_b")
    }),
    // Real multi-frame decode: deterministic animated GIFs (dims, frame
    // count and per-frame solid colour all arithmetic functions of the
    // id) → JDK GIF sequence writer → frame count + stride-sampled frame
    // decode → per-frame dims and channel means. Same fully-independent
    // oracle style as q_image_resize: the bytes really round-trip the
    // codec, and every emitted number is an integer formula DuckDB
    // replays (including the sampling arithmetic stride·s < n_frames).
    "q_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val vids = s.range(60).map { id =>
        val w = (8 + id * 7 % 24).toInt
        val h = (8 + id * 11 % 24).toInt
        val n = (1 + id % 10).toInt
        val frames = (0 until n).map { f =>
          (((id * 37 + f * 11) % 256).toInt,
           ((id * 59 + f * 23) % 256).toInt,
           ((id * 83 + f * 31) % 256).toInt)
        }
        (id, Multimodal.animatedGif(frames, w, h))
      }.toDF("media_id", "content")
      Multimodal.sampleFrames(vids, stride = 3, maxFrames = 3).map { fs =>
        (fs.media_id, fs.n_frames, fs.frame_idx, fs.width, fs.height,
          math.round(fs.mean_r).toInt, math.round(fs.mean_g).toInt,
          math.round(fs.mean_b).toInt)
      }.toDF("media_id", "n_frames", "frame_idx", "width", "height",
        "mean_r", "mean_g", "mean_b")
    }),
    // REAL MP4 frame decode (Motion-JPEG): deterministic grayscale JPEG
    // frames (quality 1.0 → all-ones quant tables → solid values
    // round-trip the DCT bit-exactly) packed into a spec-conformant MP4
    // sample table, then the engine resolves stsz×stsc×stco, slices the
    // sampled JPEGs out of mdat, and ImageIO-decodes them. Every emitted
    // number is an integer formula DuckDB replays — dims from the decoded
    // image, means from the decoded pixels, sampling from the same
    // stride arithmetic as q_frame_sample.
    "q_frame_sample_mp4" -> ((s, dir) => {
      import s.implicits._
      val vids = s.range(60).map { id =>
        val w = (16 + id * 7 % 24).toInt
        val h = (16 + id * 11 % 24).toInt
        val n = (1 + id % 10).toInt
        val grays = (0 until n).map(f => ((id * 37 + f * 29) % 256).toInt)
        (id, Multimodal.mjpegMp4(w, h, fps = 5, frameGrays = grays))
      }.toDF("media_id", "content")
      Multimodal.sampleMp4Frames(vids, stride = 3, maxFrames = 3).map { fs =>
        (fs.media_id, fs.n_frames, fs.frame_idx, fs.width, fs.height,
          math.round(fs.mean_r).toInt, math.round(fs.mean_g).toInt,
          math.round(fs.mean_b).toInt)
      }.toDF("media_id", "n_frames", "frame_idx", "width", "height",
        "mean_r", "mean_g", "mean_b")
    }),
    // D5 — per-group arbitrary transform through the typed flatMapGroups
    // surface: per ship-month exact stats (count/min/max — no float
    // summation, so the hash compare is partition-order-proof).
    "q_apply_groups" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
        .select(month(col("l_shipdate")).as("m"), col("l_quantity"))
      Pipeline.applyToGroups[Int, (Int, Long, Double, Double)](
        li, r => r.getInt(0)) { (m, rows) =>
          var n = 0L; var mn = Double.MaxValue; var mx = Double.MinValue
          rows.foreach { r =>
            n += 1; val q = r.getDouble(1)
            if (q < mn) mn = q
            if (q > mx) mx = q
          }
          Iterator.single((m, n, mn, mx))
        }.toDF("month", "n", "min_qty", "max_qty")
    }),
    // D4 — per-partition kernel with an explicit output encoder; the
    // kernel is pure per-row (ASCII class counts over the raw chars) so
    // the result cannot depend on partitioning.
    "q_map_blocks" -> ((s, dir) => {
      import s.implicits._
      Pipeline.mapBlocks[(Long, Int, Int, Int)](
        Tables.documents(s, dir).select(col("doc_id"), col("text"))) { rows =>
          rows.map { r =>
            val id = r.getLong(0); val t = r.getString(1)
            var up = 0; var dig = 0; var ws = 0; var k = 0
            while (k < t.length) {
              val c = t.charAt(k)
              if (c >= 'A' && c <= 'Z') up += 1
              else if (c >= '0' && c <= '9') dig += 1
              else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') ws += 1
              k += 1
            }
            (id, up, dig, ws)
          }
        }.toDF("doc_id", "n_upper", "n_digit", "n_space")
    }),
    // D3 — three independent metric jobs submitted concurrently from one
    // driver; the scheduler interleaves them across executor slots. Each
    // returns one exact summary row.
    "q_parallel_metrics" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val plans: Seq[(String, DataFrame)] = Seq(
        "monthly" -> li.groupBy(month(col("l_shipdate"))).agg(count(lit(1))),
        "annual" -> li.groupBy(year(col("l_shipdate"))).agg(count(lit(1))),
        "flags" -> li.groupBy(col("l_returnflag")).agg(count(lit(1))))
      val ns = Pipeline.executeParallel[Long](plans.map(_._2), _.count())
      plans.map(_._1).zip(ns).toDF("metric", "n_groups")
    }),
    // D6 — LazyPipeline: history-tracked lazy composition with a persisted
    // intermediate; the downstream metric must compute the same values
    // through the cached slice as straight SQL over the source.
    "q_lazy_pipeline" -> ((s, dir) => {
      val lp = LazyPipeline(Tables.lineitem(s, dir))
        .apply("slice")(
          _.where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")))
        .persist()
        .apply("seasonal")(d => Jobs.computeMetric(d, liSeries, "seasonal"))
      require(lp.history == Seq("slice", "seasonal"), s"history ${lp.history}")
      require(lp.graphInfo("history") == "slice -> seasonal")
      round6(lp.dataFrame, "mean_value")
    }),
    // D7/D9 — async convert-and-verify through the JobManager: a Future
    // wraps the write action under a job group (the Celery-task shape);
    // the query returns the read-back verification aggregate, so a job
    // runner that drops rows or never runs fails the oracle.
    "q_job_convert" -> ((s, dir) => {
      val back = GridSink.openStore(s, jobStores.getOrElseUpdate((graft.util.Sessions.id(s), dir), {
        import scala.concurrent.ExecutionContext.Implicits.global
        val jm = new Jobs.JobManager(s)
        val store = java.nio.file.Files.createTempDirectory(jobTmpRoot, "conv")
          .resolve("orders").toString
        val o = Tables.orders(s, dir)
          .select("o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice")
        val layout = LayoutPlanner.plan(o.schema, LayoutPlanner.Balanced,
          cellCols = Seq("o_orderpriority"), tsCol = "o_orderdate")
        val fut = jm.submit("convert-orders", {
          GridSink.writeGrid(o, store, layout)
          GridSink.openStore(s, store) // read-back: count() verifies the write
        })
        try {
          val n = scala.concurrent.Await.result(
            fut, scala.concurrent.duration.Duration.Inf)
          require(jm.status("convert-orders").contains(Jobs.Done(n)),
            s"job status ${jm.status("convert-orders")}")
        } finally jm.close() // one-shot manager: never leak its listener
        store
      }))
      round6(
        back.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            avg(col("o_totalprice")).as("avg_price"),
            min(col("o_orderdate")).cast("date").as("first_order")),
        "avg_price")
    }),
    // Multimodal audio: wrap each document's bytes as real 8-bit PCM WAV,
    // then decode BACK through javax.sound — the container build and the
    // decode are both real; only the waveform is synthetic.
    "q_audio_meta" -> ((s, dir) => {
      import s.implicits._
      val wavs = Multimodal
        .fromText(Tables.documents(s, dir), "doc_id", "text", "audio/wav")
        .select(col("media_id"), col("content")).as[(Long, Array[Byte])]
        .map { case (id, pcm) => (id, Multimodal.wavFromPcm(pcm)) }
        .toDF("media_id", "content")
      round6(Multimodal.audioMeta(wavs).toDF(), "duration_s")
    }),
    // Multimodal video: per-document ISO-BMFF (MP4) containers built with
    // doc-id-derived geometry/timing, then parsed BACK by the from-spec
    // box walk — builder and parser are independent codepaths over the
    // public 14496-12 layout, and DuckDB replays the parameter
    // arithmetic, so an offset error in either side hash-mismatches.
    "q_video_meta" -> ((s, dir) => {
      import s.implicits._
      val vids = Tables.documents(s, dir)
        .select(col("doc_id").cast("long")).as[Long]
        .map { id =>
          (id, Multimodal.mp4(
            width = (160 + (id * 13) % 320).toInt,
            height = (120 + (id * 29) % 240).toInt,
            nFrames = (8 + id % 57).toInt,
            fps = (1 + id % 29).toInt))
        }.toDF("media_id", "content")
      round6(Multimodal.videoMeta(vids).toDF(), "duration_s", "frame_rate")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_pipeline_ops" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS year, l_returnflag,
        |       round(avg(l_quantity), 6) AS mean_value
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |GROUP BY 1, 2""".stripMargin,
    "q_pipeline_compose" ->
      """SELECT CAST(month(l_shipdate) AS INTEGER) AS month, l_returnflag,
        |       round(avg(l_quantity), 6) AS clim_mean,
        |       round(stddev_pop(l_quantity), 6) AS clim_std
        |FROM lineitem WHERE l_quantity >= 25
        |GROUP BY 1, 2""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'text/plain' AS mime,
        |       octet_length(encode(text)) AS n_bytes,
        |       sha256(text) AS sha256
        |FROM documents""".stripMargin,
    "q_image_resize" ->
      """WITH t AS (
        |  SELECT range AS id,
        |         CAST(16 + (range * 13) % 48 AS INTEGER) AS w,
        |         CAST(16 + (range * 29) % 48 AS INTEGER) AS h
        |  FROM range(200))
        |SELECT id AS media_id, w AS width, h AS height,
        |  CAST(greatest(1, w * 16 // greatest(w, h)) AS INTEGER) AS thumb_w,
        |  CAST(greatest(1, h * 16 // greatest(w, h)) AS INTEGER) AS thumb_h,
        |  CAST((id * 37) % 256 AS INTEGER) AS mean_r,
        |  CAST((id * 59) % 256 AS INTEGER) AS mean_g,
        |  CAST((id * 83) % 256 AS INTEGER) AS mean_b
        |FROM t""".stripMargin,
    // frame_idx = 3·s for s in 0..2 while 3·s < n — the engine's
    // sampleFrameIndexes(n, 3, 3) replayed as a range join
    "q_frame_sample" ->
      """WITH t AS (
        |  SELECT range AS id,
        |         CAST(8 + (range * 7) % 24 AS INTEGER) AS w,
        |         CAST(8 + (range * 11) % 24 AS INTEGER) AS h,
        |         CAST(1 + range % 10 AS INTEGER) AS n
        |  FROM range(60)),
        |f AS (
        |  SELECT t.*, CAST(s.range * 3 AS INTEGER) AS frame_idx
        |  FROM t, range(0, 3) AS s(range)
        |  WHERE s.range * 3 < t.n)
        |SELECT id AS media_id, n AS n_frames, frame_idx, w AS width, h AS height,
        |  CAST((id * 37 + frame_idx * 11) % 256 AS INTEGER) AS mean_r,
        |  CAST((id * 59 + frame_idx * 23) % 256 AS INTEGER) AS mean_g,
        |  CAST((id * 83 + frame_idx * 31) % 256 AS INTEGER) AS mean_b
        |FROM f""".stripMargin,
    // grayscale frames → r = g = b = the per-frame gray formula; dims
    // and sampling arithmetic replayed exactly like q_frame_sample
    "q_frame_sample_mp4" ->
      """WITH t AS (
        |  SELECT range AS id,
        |         CAST(16 + (range * 7) % 24 AS INTEGER) AS w,
        |         CAST(16 + (range * 11) % 24 AS INTEGER) AS h,
        |         CAST(1 + range % 10 AS INTEGER) AS n
        |  FROM range(60)),
        |f AS (
        |  SELECT t.*, CAST(s.range * 3 AS INTEGER) AS frame_idx
        |  FROM t, range(0, 3) AS s(range)
        |  WHERE s.range * 3 < t.n)
        |SELECT id AS media_id, n AS n_frames, frame_idx, w AS width, h AS height,
        |  CAST((id * 37 + frame_idx * 29) % 256 AS INTEGER) AS mean_r,
        |  CAST((id * 37 + frame_idx * 29) % 256 AS INTEGER) AS mean_g,
        |  CAST((id * 37 + frame_idx * 29) % 256 AS INTEGER) AS mean_b
        |FROM f""".stripMargin,
    "q_apply_groups" ->
      """SELECT CAST(month(l_shipdate) AS INTEGER) AS month, count(*) AS n,
        |       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY 1""".stripMargin,
    // count-of-class via keep-class regex (NOT length-difference: the
    // kernel counts UTF-16 units only for ASCII classes, which match
    // 1:1 under any encoding)
    "q_map_blocks" ->
      """SELECT doc_id,
        |  CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS INTEGER) AS n_upper,
        |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS INTEGER) AS n_digit,
        |  CAST(length(regexp_replace(text, '[^ \t\n\r]', '', 'g')) AS INTEGER) AS n_space
        |FROM documents""".stripMargin,
    "q_parallel_metrics" ->
      """SELECT 'monthly' AS metric,
        |       count(DISTINCT month(l_shipdate)) AS n_groups FROM lineitem
        |UNION ALL
        |SELECT 'annual', count(DISTINCT year(l_shipdate)) FROM lineitem
        |UNION ALL
        |SELECT 'flags', count(DISTINCT l_returnflag) FROM lineitem""".stripMargin,
    "q_lazy_pipeline" ->
      """SELECT CAST(year(l_shipdate + INTERVAL 1 MONTH) AS INTEGER) AS season_year,
        |       CASE WHEN month(l_shipdate) IN (12,1,2) THEN 'DJF'
        |            WHEN month(l_shipdate) IN (3,4,5) THEN 'MAM'
        |            WHEN month(l_shipdate) IN (6,7,8) THEN 'JJA'
        |            ELSE 'SON' END AS season,
        |       l_returnflag,
        |       round(avg(l_quantity), 6) AS mean_value
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_job_convert" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       round(avg(o_totalprice), 6) AS avg_price,
        |       CAST(min(o_orderdate) AS DATE) AS first_order
        |FROM orders GROUP BY 1""".stripMargin,
    // frames = PCM payload bytes (8-bit mono, blockAlign 1); duration =
    // frames / rate, an exact IEEE division on both engines
    "q_audio_meta" ->
      """SELECT doc_id AS media_id, 'PCM_UNSIGNED' AS encoding,
        |       8000 AS sample_rate, 1 AS channels,
        |       octet_length(encode(text)) AS n_frames,
        |       round(octet_length(encode(text)) / 8000.0, 6) AS duration_s
        |FROM documents""".stripMargin,
    // movie duration = frames/fps (movie timescale = fps in the builder)
    // and frame rate = samples·timescale/total-delta — both exact IEEE
    // divisions of the same integers on both engines
    "q_video_meta" ->
      """SELECT doc_id AS media_id, 'isom' AS major_brand,
        |  round(CAST(8 + doc_id % 57 AS DOUBLE) / (1 + doc_id % 29), 6) AS duration_s,
        |  1 AS n_tracks, 'avc1' AS video_codec,
        |  CAST(160 + (doc_id * 13) % 320 AS INTEGER) AS width,
        |  CAST(120 + (doc_id * 29) % 240 AS INTEGER) AS height,
        |  CAST(8 + doc_id % 57 AS BIGINT) AS n_samples,
        |  round(CAST(1 + doc_id % 29 AS DOUBLE), 6) AS frame_rate
        |FROM documents""".stripMargin
  )
}
