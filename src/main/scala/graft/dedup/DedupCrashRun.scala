package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cross-process CRASH harness for the persisted dedup index: one child
  * JVM appending consecutive tagged batches to a shared store via the
  * real [[DedupIndex.append]] path — built to be SIGKILLed mid-append
  * by the driving spec, leaving whatever the kill instant leaves (a tag
  * dir created at job start holding only `_temporary/`, grams committed
  * but bands not, data files without `_SUCCESS`, a held mutation
  * lease). The spec then asserts the recovery story: the store still
  * opens and queries, compact folds ONLY job-committed tags and records
  * only those, and replaying every batch from the first makes all
  * documents searchable with nothing duplicated.
  *
  * Usage: DedupCrashRun <storePath> <docsParquet> <startBatch> <endBatch>
  * Batch b appends doc_ids [100+10b, 110+10b) under tag `b<b>`.
  * Prints `appended <b>` after each; exits 0 if all land (the kill
  * usually wins). Driven by StreamCrashRecoverySpec.
  */
object DedupCrashRun {
  def main(args: Array[String]): Unit = {
    val Array(store, docsPath, startS, endS) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-dedup-crash-run")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val docs = spark.read.parquet(docsPath)
      (startS.toLong to endS.toLong).foreach { b =>
        DedupIndex.append(DedupCrashRun.batch(docs, b),
          "doc_id", "text", store, tag = s"b$b")
        println(s"appended $b")
        Console.flush()
      }
    } finally spark.stop()
  }

  /** Batch b's rows — shared with the spec so the replay re-derives the
    * exact same documents the child was appending (sf0.01 documents span
    * doc_id 0..499; the fit takes < 100, batches walk 100 + 10b).
    */
  def batch(docs: org.apache.spark.sql.DataFrame,
            b: Long): org.apache.spark.sql.DataFrame = {
    val lo = 100L + b * 10
    docs.where(col("doc_id") >= lo && col("doc_id") < lo + 10)
  }
}
