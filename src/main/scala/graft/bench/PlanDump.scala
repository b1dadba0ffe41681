package graft.bench

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for bench queries to plans/<tag>/<q>_<suffix>.txt
  * so optimization rounds can diff plan shapes (guide §1: measure first).
  *
  * Usage: runMain graft.bench.PlanDump <outDir> <suffix> [q_a,q_b,...]
  * Defaults: every Bench.headline query at $SPARK_GRAFT_SF_DIR.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r18"
    val suffix = if (args.length > 1) args(1) else "before"
    val names: Seq[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).toSeq
      else graft.Bench.headline
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      SparkEntryAccess.plan(spark, sfDir, name) match {
        case Some(txt) =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
          System.err.println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
        case None =>
          System.err.println(s"[plandump] SKIP $name (failed to build)")
      }
    }
    spark.stop()
  }
}

private object SparkEntryAccess {
  def plan(spark: SparkSession, sfDir: String, name: String): Option[String] =
    graft.SparkEntry.queries.get(name).flatMap { f =>
      try {
        val df = f(spark, sfDir)
        Some(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name threw: ${e.getMessage}")
          None
      }
    }
}
