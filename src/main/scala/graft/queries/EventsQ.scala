package graft.queries

import graft.model.{SeriesSpec, Tables}
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream-shaped queries over the events table: tumbling windows,
  * gap sessionization, JSON property extraction. The windowed aggregation
  * is the exact expression that runs under Structured Streaming
  * (StreamingSpec drives the same operator through readStream).
  */
object EventsQ extends QueryPack {

  private val evSpec = SeriesSpec("ts", Seq("event_type"), "value")

  private val streamSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private lazy val ckptRoot: java.nio.file.Path = graft.util.Tmp.root("graft_ckpt")

  /** The file-stream source lists a DIRECTORY; the driver tables are
    * single parquet files — stage each sfDir's events file into a temp
    * dir once (hard link when the filesystem allows, copy otherwise).
    * The memo key includes the source's mtime+size so a regenerated
    * events.parquet mid-JVM gets a fresh staging dir instead of silently
    * replaying the old inode's data through the hard link.
    */
  private val streamDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def eventsStreamDir(dir: String, copies: Int = 1): String = {
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val key = s"$src@${java.nio.file.Files.getLastModifiedTime(src).toMillis}" +
      s":${java.nio.file.Files.size(src)}:x$copies"
    streamDirs.getOrElseUpdate(key, {
      val d = java.nio.file.Files.createTempDirectory(ckptRoot, "events_src")
      (1 to copies).foreach { i =>
        val dst = d.resolve(s"events_$i.parquet")
        try java.nio.file.Files.createLink(dst, src)
        catch { case _: Exception => java.nio.file.Files.copy(src, dst) }
      }
      d.toString
    })
  }

  /** Two-file staging (events split by user parity) so a
    * maxFilesPerTrigger=1 stream processes REAL multiple micro-batches.
    */
  private def eventsSplitDir(s: SparkSession, dir: String): String = {
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val key = s"$src@${java.nio.file.Files.getLastModifiedTime(src).toMillis}" +
      s":${java.nio.file.Files.size(src)}:split"
    streamDirs.getOrElseUpdate(key, {
      val d = java.nio.file.Files.createTempDirectory(ckptRoot, "events_split")
      val ev = Tables.events(s, dir)
      Seq(0, 1).foreach { h =>
        val tmp = java.nio.file.Files.createTempDirectory(ckptRoot, s"half$h")
        ev.where(pmod(col("user_id"), lit(2)) === h).coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        val listing = java.nio.file.Files.list(tmp)
        val part =
          try {
            val found = listing
              .filter(p => p.toString.endsWith(".parquet")).findFirst()
            require(found.isPresent,
              s"eventsSplitDir: no part file written for half $h under $tmp")
            found.get()
          } finally listing.close()
        try java.nio.file.Files.createLink(d.resolve(s"half$h.parquet"), part)
        catch { case _: Exception =>
          java.nio.file.Files.copy(part, d.resolve(s"half$h.parquet")) }
      }
      d.toString
    })
  }

  /** Time-split staging for the restart query: `a.parquet` holds events
    * before the median timestamp, `b.parquet` the rest PLUS one synthetic
    * far-future `__flush__` event whose only job is to push the watermark
    * past every real window in run 2 (its own window never finalizes, so
    * it cannot appear in the sink). A TIME split — not the parity split —
    * because run 1 finalizes windows ending below its watermark; only a
    * time cut guarantees those windows already hold all their events
    * while the boundary window stays open in state across the restart.
    */
  private def eventsTimeSplitDir(s: SparkSession, dir: String): String = {
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val key = s"$src@${java.nio.file.Files.getLastModifiedTime(src).toMillis}" +
      s":${java.nio.file.Files.size(src)}:tsplit"
    streamDirs.getOrElseUpdate(key, {
      val d = java.nio.file.Files.createTempDirectory(ckptRoot, "events_tsplit")
      val ev = Tables.events(s, dir)
      val r = ev.agg(
        expr("timestamp_micros(CAST(percentile(unix_micros(ts), 0.5) AS BIGINT))"),
        max(col("ts"))).head()
      val (cutoff, maxTs) =
        (r.getAs[java.sql.Timestamp](0), r.getAs[java.sql.Timestamp](1))
      val flush = ev.limit(1).select(
        lit(-1L).as("event_id"),
        lit(new java.sql.Timestamp(maxTs.getTime + 86400L * 1000)).as("ts"),
        lit(-1L).as("user_id"), lit("__flush__").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      Seq(("a", ev.where(col("ts") < cutoff)),
          ("b", ev.where(col("ts") >= cutoff).unionByName(flush))).foreach {
        case (nm, half) =>
          val tmp = java.nio.file.Files.createTempDirectory(ckptRoot, s"t$nm")
          half.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val listing = java.nio.file.Files.list(tmp)
          val part = try {
            val found = listing.filter(p => p.toString.endsWith(".parquet")).findFirst()
            require(found.isPresent, s"no part file for time-half $nm")
            found.get()
          } finally listing.close()
          try java.nio.file.Files.createLink(d.resolve(s"$nm.parquet"), part)
          catch { case _: Exception =>
            java.nio.file.Files.copy(part, d.resolve(s"$nm.parquet")) }
      }
      d.toString
    })
  }

  /** One streaming run per (session UUID, sfDir) — repeated invocations
    * (MetaSpec plan builds, Verify, repeated suites in one JVM) reuse the
    * first run's memory-sink table instead of launching a new streaming
    * query and leaking another temp view + checkpoint each time. Keyed by
    * `sessionUUID` (a string), not the session object, so a stopped
    * session is GC-able — its stale entry is two small strings, and a new
    * session gets a new UUID and therefore a fresh run.
    */
  private val streamRuns =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_windows" -> ((s, dir) =>
      round6(Streams.windowedStats(Tables.events(s, dir), evSpec, "5 minutes"),
        "sum_value", "avg_value")),
    "q_sessions" -> ((s, dir) =>
      round6(
        Streams.sessionize(Tables.events(s, dir), "user_id", "ts",
          gapSeconds = 1800, orderCols = Seq("event_id")),
        "duration_sec")),
    // Sliding windows: 10-min length, 5-min slide — every event in 2 buckets.
    "q_sliding_windows" -> ((s, dir) =>
      round6(Streams.slidingStats(Tables.events(s, dir), evSpec,
        "10 minutes", "5 minutes"), "avg_value")),
    "q_json_props" -> ((s, dir) =>
      round6(
        Tables.events(s, dir)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy((col("k") % 10).as("k_bucket"), col("event_type"))
          .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value")),
        "avg_value")),
    // The SAME windowed expression as q_event_windows, but executed as a
    // REAL Structured Streaming job: file-stream source over the events
    // parquet, event-time windows + watermark, memory sink in complete
    // mode. Static input fully processed ⇒ the final complete result must
    // equal the batch aggregation — the batch/stream unification contract,
    // driver-checked against the same DuckDB oracle (not just spec-pinned).
    "q_stream_windows" -> ((s, dir) => {
      val table = streamRuns.getOrElseUpdate((graft.util.Sessions.id(s), dir), {
        val path = eventsStreamDir(dir)
        val schema = s.read.parquet(path).schema
        val stream = Tables.normalizeTs(s.readStream.schema(schema).parquet(path))
        val name = s"graft_stream_windows_${streamSeq.incrementAndGet()}"
        val sq = Streams.windowedStats(stream, evSpec, "5 minutes")
          .writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory(ckptRoot, "sw").toString)
          .start()
        try { sq.processAllAvailable() } finally sq.stop()
        name
      })
      round6(s.table(table), "sum_value", "avg_value")
    }),
    // Streaming dedup under real duplication: the source directory holds
    // the events file TWICE, so the stream sees every event exactly twice;
    // dropDuplicatesWithinWatermark on event_id must restore exactly-once
    // delivery — the aggregate over the deduped sink equals the plain
    // aggregate over the single-copy table. This is the streaming face of
    // exact dedup (state = one entry per key inside the watermark horizon,
    // evicted as event time advances — bounded memory at 100 TB/day rates).
    "q_stream_dedup" -> ((s, dir) => {
      val table = streamRuns.getOrElseUpdate(
        (graft.util.Sessions.id(s), s"$dir#dedup"), {
          val path = eventsStreamDir(dir, copies = 2)
          val schema = s.read.parquet(path).schema
          val stream = Tables.normalizeTs(s.readStream.schema(schema).parquet(path))
          val name = s"graft_stream_dedup_${streamSeq.incrementAndGet()}"
          val sq = Streams.dedupStream(stream, Seq("event_id"), "ts",
              watermark = "10 minutes")
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation",
              java.nio.file.Files.createTempDirectory(ckptRoot, "sd").toString)
            .start()
          try { sq.processAllAvailable() } finally sq.stop()
          name
        })
      round6(
        s.table(table).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            sum(col("value")).as("sum_value")),
        "sum_value")
    }),
    // Stream-stream interval join as a REAL streaming run: clicks and
    // purchases are two file-stream sources over the same events staging
    // dir, joined on user within a 30-minute attribution horizon, raw
    // match rows append into a memory sink, then batch-aggregated. The
    // oracle is the plain batch range join in DuckDB — the batch/stream
    // unification contract for the join operator, like q_stream_windows
    // is for windowed aggregation.
    "q_stream_join" -> ((s, dir) => {
      val table = streamRuns.getOrElseUpdate(
        (graft.util.Sessions.id(s), s"$dir#join"), {
          val path = eventsStreamDir(dir)
          val schema = s.read.parquet(path).schema
          def src() = Tables.normalizeTs(s.readStream.schema(schema).parquet(path))
          val clicks = src().where(col("event_type") === "click")
            .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
              col("event_id").as("click_id"))
          val purchases = src().where(col("event_type") === "purchase")
            .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
              col("event_id").as("purchase_id"), col("value").as("p_value"))
          val joined = Streams.intervalJoinStream(clicks, purchases,
            leftKey = "c_user", rightKey = "p_user",
            leftTs = "c_ts", rightTs = "p_ts", horizonSeconds = 1800)
          val name = s"graft_stream_join_${streamSeq.incrementAndGet()}"
          val sq = joined.writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation",
              java.nio.file.Files.createTempDirectory(ckptRoot, "sj").toString)
            .start()
          try { sq.processAllAvailable() } finally sq.stop()
          name
        })
      round6(
        s.table(table).groupBy(pmod(col("c_user"), lit(10)).as("user_bucket"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("purchase_id")).as("n_purchases"),
            sum(col("p_value")).as("sum_value")),
        "sum_value")
    }),
    // Streaming incremental aggregate maintenance: the events table split
    // into two files, streamed one file per micro-batch through
    // foreachBatch → per-batch mergeable partial states appended to a
    // state store; the merged state (TWO real batches, asserted via
    // n_batches) must equal the direct whole-table aggregate. The
    // materialized-view pattern: current stats without re-reading history.
    "q_stream_incremental" -> ((s, dir) => {
      val stateDir = streamRuns.getOrElseUpdate(
        (graft.util.Sessions.id(s), s"$dir#inc"), {
          val path = eventsSplitDir(s, dir)
          val schema = s.read.parquet(path).schema
          val stream = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(path)
          val state = java.nio.file.Files
            .createTempDirectory(ckptRoot, "incstate").toString
          val sq = Streams.incrementalStats(stream, Seq("event_type"), "value",
            state, java.nio.file.Files
              .createTempDirectory(ckptRoot, "incckpt").toString)
          try { sq.processAllAvailable() } finally sq.stop()
          state
        })
      val nBatches = s.read.parquet(stateDir)
        .agg(countDistinct(col("batch_id"))).head().getLong(0)
      round6(
        Streams.incrementalStatsRead(s, stateDir, Seq("event_type"))
          .withColumn("n_batches", lit(nBatches)),
        "mean", "std")
    }),
    // Checkpoint RESTART: the windowed aggregation runs as two separate
    // streaming queries sharing one checkpoint + append-mode parquet
    // sink. Run 1 sees only the first time-half and is stopped (the
    // "crash") after finalizing the early windows; run 2 is a NEW query
    // over the same checkpoint that must restore the watermark and the
    // open boundary-window state, absorb the second half, and finalize
    // everything (a far-future __flush__ event closes the last real
    // windows; its own window never finalizes). The union of both runs'
    // sink output must equal the batch aggregate over the whole table —
    // lost state under-counts the boundary windows, an ignored
    // checkpoint double-writes the early ones; either hash-mismatches.
    "q_stream_restart" -> ((s, dir) => {
      val sink = streamRuns.getOrElseUpdate(
        (graft.util.Sessions.id(s), s"$dir#restart"), {
          val split = eventsTimeSplitDir(s, dir)
          val srcDir = java.nio.file.Files.createTempDirectory(ckptRoot, "restart_src")
          def stage(name: String): Unit = {
            val from = java.nio.file.Paths.get(split, s"$name.parquet")
            val to = srcDir.resolve(s"$name.parquet")
            try java.nio.file.Files.createLink(to, from)
            catch { case _: Exception => java.nio.file.Files.copy(from, to) }
          }
          stage("a")
          val ckpt = java.nio.file.Files.createTempDirectory(ckptRoot, "restart_ck").toString
          val out = java.nio.file.Files.createTempDirectory(ckptRoot, "restart_out").toString
          val schema = s.read.parquet(split).schema
          def launch() = Streams.windowedStats(
              s.readStream.schema(schema).parquet(srcDir.toString), evSpec, "5 minutes")
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").start()
          val run1 = launch()
          try { run1.processAllAvailable() } finally run1.stop()
          val n1 = scala.util.Try(s.read.parquet(out).count()).getOrElse(0L)
          require(n1 > 0, "run 1 must finalize some windows before the crash")
          stage("b") // the rest of the data arrives while the query is down
          val run2 = launch()
          try { run2.processAllAvailable() } finally run2.stop()
          require(s.read.parquet(out).count() > n1,
            "run 2 must finalize the remaining windows from restored state")
          out
        })
      round6(s.read.parquet(sink), "sum_value", "avg_value")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_event_windows" ->
      """SELECT CAST(to_timestamp(floor(epoch(ts) / 300) * 300) AS TIMESTAMP)
        |         AS bucket,
        |       event_type, count(*) AS n,
        |       round(sum(value), 6) AS sum_value,
        |       round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_sessions" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch(ts) AS e,
        |         epoch(ts) - lag(epoch(ts)) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events),
        |s AS (
        |  SELECT user_id, e,
        |         CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY e, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS session_idx
        |  FROM g)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |       round(max(e) - min(e), 6) AS duration_sec
        |FROM s GROUP BY 1, 2""".stripMargin,
    "q_sliding_windows" ->
      """WITH b AS (
        |  SELECT event_type, value,
        |         CAST(to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300
        |           - 300 * k) AS TIMESTAMP) AS bucket
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k))
        |SELECT bucket, event_type, count(*) AS n,
        |       round(avg(value), 6) AS avg_value
        |FROM b GROUP BY 1, 2""".stripMargin,
    "q_json_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
        |         AS k_bucket,
        |       event_type, count(*) AS n,
        |       round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // the doubled stream deduped on event_id must equal the single-copy
    // table's aggregate — exactly-once restored
    "q_stream_dedup" ->
      """SELECT event_type, count(*) AS n,
        |       count(DISTINCT user_id) AS n_users,
        |       round(sum(value), 6) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,
    // merged per-batch states (2 real micro-batches) ≡ direct aggregate
    "q_stream_incremental" ->
      """SELECT event_type, count(value) AS n,
        |       round(avg(value), 6) AS mean,
        |       round(stddev_pop(value), 6) AS std,
        |       min(value) AS min, max(value) AS max,
        |       CAST(2 AS BIGINT) AS n_batches
        |FROM events GROUP BY 1""".stripMargin,
    // the streaming interval join's sink must equal the batch range join
    "q_stream_join" ->
      """SELECT c.user_id % 10 AS user_bucket, count(*) AS n_pairs,
        |       count(DISTINCT p.event_id) AS n_purchases,
        |       round(sum(p.value), 6) AS sum_value
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |GROUP BY 1""".stripMargin,
    // identical to q_event_windows — the streaming run must land on the
    // batch answer
    "q_stream_windows" ->
      """SELECT CAST(to_timestamp(floor(epoch(ts) / 300) * 300) AS TIMESTAMP)
        |         AS bucket,
        |       event_type, count(*) AS n,
        |       round(sum(value), 6) AS sum_value,
        |       round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // the crash-restart run must ALSO land exactly on the batch answer —
    // same oracle as q_stream_windows (the __flush__ event's window never
    // finalizes, so it is absent from the sink by construction)
    "q_stream_restart" ->
      """SELECT CAST(to_timestamp(floor(epoch(ts) / 300) * 300) AS TIMESTAMP)
        |         AS bucket,
        |       event_type, count(*) AS n,
        |       round(sum(value), 6) AS sum_value,
        |       round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin
  )
}
