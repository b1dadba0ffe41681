package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Scratch profiler for q_ivfpq_served fixed cost (deleted before commit). */
object ServeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3fs  (jobs=$jobs stages=$stages tasks=$tasks)")
      r
    }

    (1 to 3).foreach { _ =>
      graft.SparkEntry.queries("q_ivfpq_served")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }

    (1 to 4).foreach { i =>
      println(s"--- iteration $i")
      jobs = 0; stages = 0; tasks = 0
      val full = time("build + plan")({
        val df = graft.SparkEntry.queries("q_ivfpq_served")(spark, sfDir)
        df.queryExecution.executedPlan // force analysis + physical planning
        df
      })
      time("execute")(full.write.format("noop").mode("overwrite").save())
    }
    println("=== physical plan ===")
    val df = graft.SparkEntry.queries("q_ivfpq_served")(spark, sfDir)
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
