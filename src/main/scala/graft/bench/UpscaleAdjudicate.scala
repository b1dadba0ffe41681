package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone adjudicator for upscale-probe anomalies (the SCALE.md
  * "Round-12 driver-run anomaly" protocol, r13 edition): materializes the
  * EXACT 8× tables the bench's upscale probe builds (same key shifts, same
  * letter-substitution on documents), then runs the named queries in a
  * fresh session with stage-level attribution — tasks per stage, executor
  * run time, JVM GC time, input rows — so a breach can be pinned to
  * partition collapse, kernel cost, GC, or host interference instead of
  * being guessed at.
  *
  * Usage: runMain graft.bench.UpscaleAdjudicate q_html_extract q_sq_ann
  * Env:   SPARK_GRAFT_SF_DIR (base tables), SPARK_GRAFT_UPSCALE (factor),
  *        SPARK_GRAFT_ADJ_ITERS (timed iterations, default 3)
  */
object UpscaleAdjudicate {

  final case class StageRow(id: Int, name: String, tasks: Int,
                            runMs: Long, gcMs: Long, inRows: Long)

  def main(args: Array[String]): Unit = {
    val queries = if (args.nonEmpty) args.toSeq else Seq("q_html_extract", "q_sq_ann")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_UPSCALE", "8").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_ADJ_ITERS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- build the upscaled dir: THE bench recipe (UpscaleTables) ----
    val upDirPath = java.nio.file.Files.createTempDirectory("graft-upscale-adj")
    val upDir = upDirPath.toString
    UpscaleTables.build(spark, sfDir, upDir, factor)
    println(s"[adj] upscaled tables at $upDir (factor $factor)")
    Seq("documents", "embeddings").foreach { t =>
      val files = java.nio.file.Files.list(
          java.nio.file.Paths.get(s"$upDir/$t.parquet"))
        .filter(p => p.toString.endsWith(".parquet"))
        .toArray.map(_.asInstanceOf[java.nio.file.Path])
      val bytes = files.map(java.nio.file.Files.size(_)).sum
      println(s"[adj] $t.parquet: ${files.length} part files, $bytes bytes, " +
        s"scan partitions=${spark.read.parquet(s"$upDir/$t.parquet").rdd.getNumPartitions}")
    }

    val stages = scala.collection.mutable.ArrayBuffer[StageRow]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(60),
            si.numTasks, m.executorRunTime, m.jvmGCTime,
            m.inputMetrics.recordsRead)
        }
      }
    })

    try {
      val session = spark.newSession()
      for (q <- queries; dir <- Seq(sfDir, upDir)) {
        val tag = if (dir == sfDir) "base" else s"${factor}x"
        // warmup (footer cache + codegen at this scale)
        graft.SparkEntry.queries(q)(session, dir)
          .write.format("noop").mode("overwrite").save()
        (1 to iters).foreach { i =>
          stages.synchronized(stages.clear())
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(q)(session, dir)
            .write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(400) // let the listener bus drain stage-completed events
          val snap = stages.synchronized(stages.toList).sortBy(_.id)
          println(f"[adj] $q $tag iter$i wall=$wall%.3f s, ${snap.size} stages")
          snap.foreach { s =>
            println(f"[adj]   stage ${s.id}%4d tasks=${s.tasks}%4d " +
              f"run=${s.runMs}%6d ms gc=${s.gcMs}%5d ms inRows=${s.inRows}%9d ${s.name}")
          }
        }
      }
    } finally {
      java.nio.file.Files.walk(upDirPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      spark.stop()
    }
  }
}
