package graft.streaming

import graft.SparkSpec
import graft.model.{SeriesSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {

  private val evSpec = SeriesSpec("ts", Seq("event_type"), "value")

  test("windowedStats over a stream matches the batch result") {
    val batchEvents = Tables.events(spark, sfDir)
    val batch = Streams.windowedStats(batchEvents, evSpec, "5 minutes")

    // stage the (µs-converted) events as a parquet dir the stream can read
    val dir = tmpDir() + "/events"
    batchEvents.write.parquet(dir)
    val stream = Streams.parquetStream(spark, dir, batchEvents.schema)
    val agg = Streams.windowedStats(stream, evSpec, "5 minutes")

    val q = agg.writeStream
      .outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("win_out")
    assert(streamed.count() == batch.count())
    val bSum = batch.agg(sum("n")).head.getLong(0)
    val sSum = streamed.agg(sum("n")).head.getLong(0)
    assert(bSum == sSum) // same events land in same buckets
  }

  test("checkpoint restart: a second query resumes window state and lands on the batch answer") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
    val r = ev.agg(
      expr("timestamp_micros(CAST(percentile(unix_micros(ts), 0.5) AS BIGINT))"),
      max(col("ts"))).head()
    val (cutoff, maxTs) = (r.getTimestamp(0), r.getTimestamp(1))
    val base = tmpDir()
    val srcDir = base + "/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def stage(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = base + s"/stage_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    }
    stage("a", ev.where(col("ts") < cutoff))
    val ckpt = base + "/ckpt"
    val out = base + "/out"
    def launch() = Streams.windowedStats(
        Streams.parquetStream(spark, srcDir, ev.schema), evSpec, "5 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val run1 = launch()
    try run1.processAllAvailable() finally run1.stop()
    val n1 = scala.util.Try(spark.read.parquet(out).count()).getOrElse(0L)
    assert(n1 > 0, "run 1 finalizes the early windows")
    // crash window: data keeps arriving; the flush event closes all real
    // windows once run 2 is up (its own window never finalizes)
    val flush = ev.limit(1).select(lit(-1L).as("event_id"),
      lit(new java.sql.Timestamp(maxTs.getTime + 86400L * 1000)).as("ts"),
      lit(-1L).as("user_id"), lit("__flush__").as("event_type"),
      lit(0.0).as("value"), lit("{}").as("props"))
    stage("b", ev.where(col("ts") >= cutoff).unionByName(flush))
    val run2 = launch()
    try run2.processAllAvailable() finally run2.stop()
    val got = spark.read.parquet(out)
    assert(got.count() > n1, "run 2 finalized windows from restored state")
    val batch = Streams.windowedStats(ev, evSpec, "5 minutes")
    // exact row-set equality with the batch aggregate: lost state would
    // under-count boundary windows, an ignored checkpoint double-writes
    assert(got.orderBy("bucket", "event_type").collect().toSeq ==
      batch.orderBy("bucket", "event_type").collect().toSeq)
  }

  test("stateful sessionizeStream closes sessions on gap and timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.SessionEvent]
    // data-driven closure only: processing-time timeouts make
    // processAllAvailable nondeterministic under the memory sink
    val sessions = Streams.sessionizeStream(input.toDS(), gapSeconds = 60,
      useTimeout = false)

    val q = sessions.writeStream
      .outputMode("append")
      .format("memory").queryName("sess_out")
      .start()

    // user 1: two events 10s apart, then a 300s gap → first session closes
    input.addData(
      Streams.SessionEvent(1L, 1000.0), Streams.SessionEvent(1L, 1010.0),
      Streams.SessionEvent(2L, 1000.0))
    q.processAllAvailable()
    input.addData(Streams.SessionEvent(1L, 1400.0)) // gap > 60 closes session 1
    q.processAllAvailable()

    val closed = spark.table("sess_out").as[Streams.ClosedSession].collect()
    q.stop()
    assert(closed.length == 1)
    assert(closed.head.userId == 1L)
    assert(closed.head.nEvents == 2 && closed.head.durationSec == 10.0)
  }

  test("sessionizeStream: a late cross-batch event extends the session " +
    "monotonically instead of splitting it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.SessionEvent]
    val sessions = Streams.sessionizeStream(input.toDS(), gapSeconds = 60,
      useTimeout = false)
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory").queryName("sess_late")
      .start()
    // batch 1: state (start=100, last=140) — 40 s apart, inside the gap
    input.addData(Streams.SessionEvent(7L, 100.0), Streams.SessionEvent(7L, 140.0))
    q.processAllAvailable()
    // batch 2: a LATE event t=120 — within the session; `last` must stay
    // 140 (max), not be dragged back to 120
    input.addData(Streams.SessionEvent(7L, 120.0))
    q.processAllAvailable()
    // batch 3: t=190 is 50 s after the true last (140) → SAME session;
    // the pre-fix state (last=120) would measure 70 s and wrongly split
    input.addData(Streams.SessionEvent(7L, 190.0))
    q.processAllAvailable()
    // batch 4: far future event closes the session
    input.addData(Streams.SessionEvent(7L, 9999.0))
    q.processAllAvailable()
    val closed = spark.table("sess_late").as[Streams.ClosedSession].collect()
    q.stop()
    assert(closed.length == 1, s"late event must not split: $closed")
    assert(closed.head.nEvents == 4)
    assert(closed.head.durationSec == 90.0) // 190 − 100, never negative
  }

  test("stream-stream join pairs events within the time bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp)]
    val c = clicks.toDS().toDF("cuser", "cts").withWatermark("cts", "10 minutes")
    val p = purchases.toDS().toDF("puser", "pts").withWatermark("pts", "10 minutes")
    val joined = c.join(p, expr(
      "cuser = puser AND pts BETWEEN cts - interval 5 minutes AND cts + interval 5 minutes"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_out").start()
    clicks.addData((1L, t("2024-01-01 00:10:00")), (2L, t("2024-01-01 00:10:00")))
    purchases.addData(
      (1L, t("2024-01-01 00:12:00")), // within 5 min → pairs
      (2L, t("2024-01-01 00:30:00")), // 20 min away → no pair
      (3L, t("2024-01-01 00:10:00"))) // no matching click
    q.processAllAvailable()
    val out = spark.table("ss_out").select("cuser").as[Long].collect().toSeq
    q.stop()
    assert(out == Seq(1L), s"only user 1 pairs within the bound, got $out")
  }

  test("watermark drops events later than the horizon, keeps in-horizon stragglers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = Streams.windowedStats(
      input.toDS().toDF("ts", "event_type", "value"),
      SeriesSpec("ts", Seq("event_type"), "value"),
      windowDuration = "5 minutes", watermark = "10 minutes")
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("wm_out").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((t("2024-01-01 01:00:00"), "a", 1.0))
    q.processAllAvailable() // watermark advances to 00:50
    // straggler within horizon (00:52 >= 00:50): must still be aggregated
    input.addData((t("2024-01-01 00:52:00"), "a", 1.0))
    q.processAllAvailable()
    // event far past the horizon (00:10 < 00:50): must be dropped
    input.addData((t("2024-01-01 00:10:00"), "a", 99.0))
    q.processAllAvailable()
    val out = spark.table("wm_out").groupBy("bucket").agg(max("n").as("n"))
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    q.stop()
    assert(out.contains("2024-01-01 00:50:00.0"), s"straggler bucket missing: $out")
    assert(!out.contains("2024-01-01 00:10:00.0"), s"late event must be dropped: $out")
  }

  test("native session_window agrees with the manual gap sessionization") {
    val ev = Tables.events(spark, sfDir)
    val manual = Streams.sessionize(ev, "user_id", "ts", gapSeconds = 1800,
      orderCols = Seq("event_id"))
    val native = Streams.sessionizeNative(ev, "user_id", "ts", gapSeconds = 1800)
    assert(manual.count() == native.count(), "same number of sessions")
    // same per-user session-size multiset
    val m = manual.groupBy("user_id").agg(sort_array(collect_list("n_events")).as("s"))
    val n = native.groupBy("user_id").agg(sort_array(collect_list("n_events")).as("s"))
    assert(m.join(n, Seq("user_id")).where(m("s") =!= n("s")).count() == 0)
  }

  test("stream-static enrichment join works on the windowed operator output") {
    val batchEvents = Tables.events(spark, sfDir)
    val dir = tmpDir() + "/ev"
    batchEvents.write.parquet(dir)
    val stream = Streams.parquetStream(spark, dir, batchEvents.schema)
    // static dimension: per-type mean value from the batch table
    val dim = batchEvents.groupBy("event_type")
      .agg(avg("value").as("type_mean"))
    val enriched = stream.join(dim, Seq("event_type")) // stream-static join
      .withColumn("rel", col("value") / col("type_mean"))
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("enrich_out")
    assert(out.count() == batchEvents.count())
    assert(out.where(col("rel").isNull).count() == 0)
  }

  test("streaming dedup emits each key once within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = Streams.dedupStream(
      input.toDS().toDF("k", "ts"), Seq("k"), "ts", "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    input.addData((1L, t0), (1L, t0), (2L, t0))
    q.processAllAvailable()
    input.addData((1L, t0), (3L, t0)) // 1 is a dup within the watermark
    q.processAllAvailable()
    val keys = spark.table("dedup_out").select("k").as[Long].collect().sorted
    q.stop()
    assert(keys.toSeq == Seq(1L, 2L, 3L))
    // batch fallback
    val b = Streams.dedupStream(Seq((1L, t0), (1L, t0)).toDF("k", "ts"), Seq("k"), "ts")
    assert(b.count() == 1)
  }

  test("stream-stream interval join matches inside the horizon only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val buys = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = Streams.intervalJoinStream(
      clicks.toDS().toDF("c_user", "c_ts", "click_id"),
      buys.toDS().toDF("p_user", "p_ts", "purchase_id"),
      leftKey = "c_user", rightKey = "p_user",
      leftTs = "c_ts", rightTs = "p_ts", horizonSeconds = 600)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ij_out").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    clicks.addData((1L, ts(0), 100L), (2L, ts(0), 101L))
    // user 1 buys inside the 10-min horizon, user 2 after it, user 3 never clicked
    buys.addData((1L, ts(5), 900L), (2L, ts(20), 901L), (3L, ts(5), 902L))
    q.processAllAvailable()
    val pairs = spark.table("ij_out").select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSet
    q.stop()
    assert(pairs == Set((100L, 900L)))
    // batch path: identical expression, and a purchase BEFORE the click
    // (rightTs < leftTs) never matches
    val bc = Seq((1L, ts(10), 100L)).toDF("c_user", "c_ts", "click_id")
    val bp = Seq((1L, ts(5), 900L), (1L, ts(15), 901L))
      .toDF("p_user", "p_ts", "purchase_id")
    val b = Streams.intervalJoinStream(bc, bp, "c_user", "p_user",
      "c_ts", "p_ts", horizonSeconds = 600)
    assert(b.select("purchase_id").as[Long].collect().toSeq == Seq(901L))
    // ambiguous column names are rejected up front
    intercept[IllegalArgumentException] {
      Streams.intervalJoinStream(bc, bc, "c_user", "c_user", "c_ts", "c_ts", 1)
    }
  }

  test("batch sessionize session definition: gap starts new session") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L), (1L, "2024-01-01 00:10:00", 2L),
      (1L, "2024-01-01 01:00:00", 3L), // 50 min gap > 30 min → new session
      (2L, "2024-01-01 00:00:00", 4L)
    ).toDF("user_id", "ts_s", "event_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Streams.sessionize(df, "user_id", "ts", gapSeconds = 1800,
      orderCols = Seq("event_id")).orderBy("user_id", "session_idx")
    val rows = out.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(2)).toSeq == Seq(2L, 1L, 1L)) // n_events
    assert(rows(0).getDouble(3) == 600.0) // first session spans 10 min
  }
}
