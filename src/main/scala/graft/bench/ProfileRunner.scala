package graft.bench

import org.apache.spark.sql.SparkSession

/** Per-query cost decomposition (guide §1: decide WHERE time goes before
  * optimizing): splits each bench query's wall time into
  *
  *   plan_ms — DataFrame construction + analysis/optimization/physical
  *             planning (`queryExecution.executedPlan` forced, nothing run)
  *   exec_ms — the noop-sink execution of a PRE-BUILT plan (AQE + codegen
  *             + run), same action the bench times
  *
  * Both are medians over `iters` runs after `warmup` warmups, so codegen
  * and JIT caches are in the same steady state the bench measures. A query
  * whose plan_ms ≈ its bench median is planning-bound (optimizer passes
  * over big expression trees), not data-bound — a different fix class.
  *
  * Usage: runMain graft.bench.ProfileRunner [q_a,q_b,...]
  */
object ProfileRunner {
  def main(args: Array[String]): Unit = {
    val names: Seq[String] =
      if (args.nonEmpty) args(0).split(",").map(_.trim).toSeq
      else graft.Bench.headline
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "7").toInt
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "2").toInt
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

    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }

    println(f"${"query"}%-22s ${"plan_ms"}%9s ${"exec_ms"}%9s ${"total_ms"}%9s")
    names.foreach { name =>
      SparkEntryQ.f(name) match {
        case None => println(s"$name: unknown")
        case Some(f) =>
          try {
            (1 to warmup).foreach { _ =>
              f(spark, sfDir).write.format("noop").mode("overwrite").save()
            }
            val planT = scala.collection.mutable.ArrayBuffer[Double]()
            val execT = scala.collection.mutable.ArrayBuffer[Double]()
            (1 to iters).foreach { _ =>
              val t0 = System.nanoTime()
              val df = f(spark, sfDir)
              df.queryExecution.executedPlan // force planning
              val t1 = System.nanoTime()
              df.write.format("noop").mode("overwrite").save()
              val t2 = System.nanoTime()
              planT += (t1 - t0) / 1e6
              execT += (t2 - t1) / 1e6
            }
            println(f"$name%-22s ${med(planT.toSeq)}%9.1f ${med(execT.toSeq)}%9.1f ${med(planT.toSeq) + med(execT.toSeq)}%9.1f")
          } catch {
            case e: Throwable => println(s"$name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}

private object SparkEntryQ {
  def f(name: String): Option[(SparkSession, String) => org.apache.spark.sql.DataFrame] =
    graft.SparkEntry.queries.get(name)
}
