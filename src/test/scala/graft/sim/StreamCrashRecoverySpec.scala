package graft.sim

import graft.SparkSpec
import graft.util.AtomicStore
import org.apache.spark.sql.functions._

/** Kill -9 a REAL child JVM mid-stream-append ([[StreamCrashRun]]) and
  * drive the full recovery story against whatever disk state the kill
  * instant left: a half-staged `_temporary/`, a batch whose parquet
  * committed but whose sentinel never landed, and the dead holder's
  * mutation lease. The in-JVM failpoint specs enumerate NAMED stages;
  * this one exercises the genuinely arbitrary cut a process kill makes.
  */
class StreamCrashRecoverySpec extends SparkSpec {

  private def javaBin = s"${System.getProperty("java.home")}/bin/java"

  private def addOpens: Seq[String] = {
    val in = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < in.size()) {
      val a = in.get(i)
      if (a == "--add-opens" && i + 1 < in.size()) {
        buf += a += in.get(i + 1); i += 2
      } else if (a.startsWith("--add-opens=")) { buf += a; i += 1 }
      else i += 1
    }
    buf.toSeq
  }

  test("SIGKILL mid-append: store serves, dead lease breaks after grace, " +
    "fold carries the unsentineled tail, replay converges to the corpus") {
    val d = tmpDir() + "/crashstore"
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    Similarity.writeIvfPqIndex(emb.where(col("vec_id") < 40),
      "vec_id", "embedding", d, dim = 64, nlist = 8, m = 8,
      codebookSize = 16)
    val endBatch = 7L
    val cmd = Seq(javaBin, "-Xmx2g") ++ addOpens ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.sim.StreamCrashRun", d, s"$sfDir/embeddings.parquet",
      "0", endBatch.toString)
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    // SIGKILL at an arbitrary instant after the appends get going: wait
    // for the second "appended" line, then a random slice of an append's
    // duration — the cut lands wherever it lands (mid-encode, mid-stage,
    // mid-commit, between parquet and sentinel, between batches)
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val seen = new java.util.concurrent.atomic.AtomicLong(-1L)
    val pump = new Thread(() => {
      var line = out.readLine()
      while (line != null) {
        if (line.startsWith("appended "))
          seen.set(line.drop("appended ".length).trim.toLong)
        line = try out.readLine() catch { case _: java.io.IOException => null }
      }
    })
    pump.setDaemon(true); pump.start()
    val deadline = System.currentTimeMillis() + 120000L
    while (seen.get() < 1L && p.isAlive &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(seen.get() >= 1L, "child must land at least two batches")
    Thread.sleep(scala.util.Random.nextInt(900).toLong)
    p.destroyForcibly()
    assert(p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS))
    pump.join(5000) // drain lines the pipe still buffered at the kill
    val killedAfter = seen.get()
    // 1) whatever the kill left, a fresh session OPENS and SERVES the
    // store (no schema-inference brick, no torn generation)
    val fresh = spark.newSession()
    val live0 = Similarity.openIvfPqIndex(fresh, d).codes.count()
    assert(live0 >= 40L, s"base fit must always serve (saw $live0)")
    val probe = emb.where(col("vec_id") < 40)
    assert(Similarity.ivfPqServe(Similarity.openIvfPqIndex(fresh, d),
      probe, "vec_id", "embedding", k = 3, nprobe = 4).count() > 0)
    // 2) the dead child may hold the mutation lease (killed mid-append):
    // a mutation right now must either proceed (lease released/absent) or
    // REJECT on the single-writer contract — never corrupt. Then age the
    // lease past the grace (the crashed-holder regime) and the break
    // path must admit the operator.
    val leaseFile = new java.io.File(s"$d/_mutation_lease")
    if (leaseFile.exists()) {
      intercept[IllegalStateException] {
        Similarity.compactIvfPqStreamExtension(spark, d)
      }
      assert(leaseFile.setLastModified(System.currentTimeMillis()
        - 2 * AtomicStore.DefaultLeaseGraceMs))
    }
    // 3) fold: only job-committed batches fold; an unsentineled partial
    // tail is carried, never absorbed into base or the highwater
    val g0 = AtomicStore.resolve(spark, d)
    val sentineled = Option(new java.io.File(s"$g0/codes_stream").listFiles())
      .getOrElse(Array.empty).map(_.getName)
      .filter(_.startsWith("_complete_b"))
      .map(_.drop("_complete_b".length).toLong)
    val lastComplete = if (sentineled.isEmpty) -1L else sentineled.max
    assert(lastComplete <= killedAfter + 1,
      "a sentinel cannot exist for a batch the child never reported")
    // we waited for "appended 1", which prints only after batch 1's
    // sentinel landed — so at least two job-committed batches exist
    assert(lastComplete >= 1L)
    Similarity.compactIvfPqStreamExtension(spark, d)
    val g1 = AtomicStore.resolve(spark, d)
    assert(spark.read.parquet(s"$g1/codes").count()
      == 40L + 10L * (lastComplete + 1L),
      "fold merges exactly the job-committed batches into base")
    // 4) replay from the last sentinel: re-append every batch above it,
    // fold, and the store converges to the full corpus — nothing the
    // kill touched is lost or doubled
    ((lastComplete + 1L) to endBatch).foreach { b =>
      val lo = 40L + b * 10
      val dropped = Similarity.appendStreamBatch(
        emb.where(col("vec_id") >= lo && col("vec_id") < lo + 10),
        "vec_id", "embedding", d, batchId = b)
      assert(!dropped, s"replay of batch $b must not be dropped")
    }
    Similarity.compactIvfPqStreamExtension(spark, d)
    val gFinal = AtomicStore.resolve(spark, d)
    assert(spark.read.parquet(s"$gFinal/codes").count()
      == 40L + 10L * (endBatch + 1L),
      "replayed store must converge to the full corpus exactly")
    assert(!new java.io.File(s"$gFinal/codes_stream").exists())
    assert(!new java.io.File(s"$d/_mutation_lease").exists())
  }

  test("SIGKILL mid-tagged-append on the dedup index: store queries, " +
    "compact folds only job-committed tags, full replay converges with " +
    "every document searchable exactly once") {
    val d = tmpDir() + "/dedupcrash"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.dedup.DedupIndex.write(docs.where(col("doc_id") < 100),
      "doc_id", "text", d)
    val endBatch = 7L
    val cmd = Seq(javaBin, "-Xmx2g") ++ addOpens ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.dedup.DedupCrashRun", d, s"$sfDir/documents.parquet",
      "0", endBatch.toString)
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val seen = new java.util.concurrent.atomic.AtomicLong(-1L)
    val pump = new Thread(() => {
      var line = out.readLine()
      while (line != null) {
        if (line.startsWith("appended "))
          seen.set(line.drop("appended ".length).trim.toLong)
        line = try out.readLine() catch { case _: java.io.IOException => null }
      }
    })
    pump.setDaemon(true); pump.start()
    val deadline = System.currentTimeMillis() + 120000L
    while (seen.get() < 1L && p.isAlive &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(seen.get() >= 1L, "child must land at least two batches")
    Thread.sleep(scala.util.Random.nextInt(900).toLong)
    p.destroyForcibly()
    assert(p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS))
    pump.join(5000)
    // 1) whatever the cut left — a tag dir holding only _temporary/,
    // grams without bands, data files without _SUCCESS — the store
    // queries without bricking
    val probe = docs.where(col("doc_id") < 100)
      .withColumn("doc_id", col("doc_id") + 100000L)
    assert(graft.dedup.DedupIndex.query(probe, "doc_id", "text", d, 0.9,
      excludeSelf = false).count() >= 0L)
    // 2) the dead child's young lease rejects, then breaks after grace
    val leaseFile = new java.io.File(s"$d/_mutation_lease")
    if (leaseFile.exists()) {
      intercept[IllegalStateException] {
        graft.dedup.DedupIndex.compact(spark, d)
      }
      assert(leaseFile.setLastModified(System.currentTimeMillis()
        - 2 * AtomicStore.DefaultLeaseGraceMs))
    }
    // 3) compact: only job-committed tags fold (the _SUCCESS evidence);
    // an uncommitted tag stays unrecorded so its replay rewrites
    graft.dedup.DedupIndex.compact(spark, d)
    // 4) replay EVERY batch under its original tag: folded ones absorb,
    // the crashed one rewrites cleanly
    (0L to endBatch).foreach { b =>
      graft.dedup.DedupIndex.append(
        graft.dedup.DedupCrashRun.batch(docs, b),
        "doc_id", "text", d, tag = s"b$b")
    }
    // every appended document indexed EXACTLY once (nothing lost to a
    // recorded-but-uncommitted tag, nothing doubled by a replay)
    val g = AtomicStore.resolve(spark, d)
    val grams = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$g/grams")
      .where(col("id") >= 100L && col("id") < 100L + 10L * (endBatch + 1L))
      .groupBy(col("id")).count()
    assert(grams.count() == 10L * (endBatch + 1L),
      "every batch document present after replay")
    assert(grams.where(col("count") =!= 1L).count() == 0L,
      "no document indexed twice")
    // and every one is SEARCHABLE (bands complete too): self-match at
    // threshold ~1 for each batch doc
    val all = docs.where(col("doc_id") >= 100L &&
      col("doc_id") < 100L + 10L * (endBatch + 1L))
    val self = graft.dedup.DedupIndex.query(all, "doc_id", "text", d, 0.9,
        excludeSelf = false)
      .where(col("query_id") === col("index_id"))
    assert(self.count() == 10L * (endBatch + 1L),
      "every replayed document must self-match against the store")
  }
}
