package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cross-process CRASH harness for the stream-maintained ANN store: one
  * child JVM appending consecutive stream micro-batches to a shared
  * IVF-PQ store via the real [[Similarity.appendStreamBatch]] path —
  * built to be SIGKILLed mid-append by the driving spec, leaving
  * whatever the kill instant leaves (half-staged `_temporary/`, a
  * batch's parquet committed but its sentinel unwritten, a held
  * mutation lease). The spec then asserts the recovery story end to
  * end: the store still opens and serves, the crashed holder's lease
  * breaks after the grace, the fold carries any non-sentineled batch,
  * and replaying from the last sentinel converges to the full corpus.
  *
  * Usage: StreamCrashRun <storePath> <embParquet> <startBatch> <endBatch>
  * Batch b holds vec_id ∈ [40+10b, 50+10b). Prints `appended <b>` after
  * each append; exits 0 when all batches land (the kill usually wins).
  * Driven by StreamCrashRecoverySpec.
  */
object StreamCrashRun {
  def main(args: Array[String]): Unit = {
    val Array(store, embPath, startS, endS) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-crash-run")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val emb = spark.read.parquet(embPath)
      (startS.toLong to endS.toLong).foreach { b =>
        val lo = 40L + b * 10
        Similarity.appendStreamBatch(
          emb.where(col("vec_id") >= lo && col("vec_id") < lo + 10),
          "vec_id", "embedding", store, batchId = b)
        println(s"appended $b")
        Console.flush()
      }
    } finally spark.stop()
  }
}
