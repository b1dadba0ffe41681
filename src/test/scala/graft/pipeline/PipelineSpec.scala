package graft.pipeline

import graft.SparkSpec
import graft.model.Tables
import graft.queries.TemporalQ
import org.apache.spark.sql.functions._
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.Await
import scala.concurrent.duration._

class PipelineSpec extends SparkSpec {

  private lazy val li = Tables.lineitem(spark, sfDir)

  test("pipeline composes steps lazily and executes once") {
    val p = Pipeline.create()
      .add("filter")(_.where(col("l_quantity") > 10))
      .add("agg")(_.groupBy("l_returnflag").agg(count(lit(1)).as("n")))
    assert(p.steps.map(_.name) == Vector("filter", "agg"))
    val out = p(li) // still lazy: no job has run
    assert(out.columns.toSeq == Seq("l_returnflag", "n"))
    assert(p.execute(li).length == 3)
  }

  test("lazy pipeline tracks history, persists, reports plan info") {
    val lp = LazyPipeline(li)
      .apply("filter")(_.where(col("l_quantity") > 10))
      .apply("project")(_.select("l_returnflag", "l_quantity"))
      .persist()
    assert(lp.history == Seq("filter", "project"))
    val info = lp.graphInfo
    assert(info("history") == "filter -> project")
    assert(info("logical_plan_nodes").toInt > 0)
    assert(lp.compute().nonEmpty)
    lp.dataFrame.unpersist()
  }

  test("executeParallel runs a function across datasets concurrently") {
    val parts = Seq("A", "N", "R").map(f => li.where(col("l_returnflag") === f))
    val counts = Pipeline.executeParallel[Long](parts, _.count(), maxConcurrency = 3)
    assert(counts.sum == li.count())
  }

  test("op interpreter rejects unknown descriptors") {
    val e = intercept[IllegalArgumentException] {
      Jobs.interpret(li, TemporalQ.liSeries, Seq(Jobs.Resample("hourly")))
    }
    assert(e.getMessage.contains("hourly"))
  }

  test("metric dispatch mirrors the task-runner metric names") {
    Seq("monthly", "seasonal", "annual", "climatology", "percentiles",
      "trend", "anomaly").foreach { m =>
      assert(Jobs.computeMetric(li, TemporalQ.liSeries, m).columns.nonEmpty, m)
    }
    intercept[IllegalArgumentException] {
      Jobs.computeMetric(li, TemporalQ.liSeries, "nope")
    }
  }

  test("mapBlocks applies per-partition kernels, invariant to partitioning") {
    import spark.implicits._
    val out1 = Pipeline.mapBlocks(li)(_.map(_.getAs[Double]("l_quantity") * 2))
      .agg(sum("value")).head.getDouble(0)
    val out2 = Pipeline.mapBlocks(li.repartition(13))(
      _.map(_.getAs[Double]("l_quantity") * 2)).agg(sum("value")).head.getDouble(0)
    assert(math.abs(out1 - out2) / out1 < 1e-12)
  }

  test("applyToGroups runs arbitrary per-group transforms (D5)") {
    import spark.implicits._
    // per returnflag: emit (flag, range of quantities) — not expressible as
    // a single built-in aggregate chain without the typed surface
    val ranges = Pipeline.applyToGroups[String, (String, Double)](
      li, _.getAs[String]("l_returnflag")) { (k, rows) =>
      val qs = rows.map(_.getAs[Double]("l_quantity")).toSeq
      Iterator.single((k, qs.max - qs.min))
    }.collect().toMap
    assert(ranges.keySet == Set("A", "N", "R"))
    assert(ranges.values.forall(_ > 0))
  }

  test("reduceOverTime applies caller-supplied aggregates per cell (A13)") {
    val out = graft.metrics.Temporal.reduceOverTime(li, TemporalQ.liSeries,
      max(col("l_quantity")).as("max_q"), min(col("l_quantity")).as("min_q"))
    assert(out.columns.toSeq == Seq("l_returnflag", "max_q", "min_q"))
    assert(out.count() == 3)
  }

  test("job manager tracks lifecycle and counts") {
    val jm = new Jobs.JobManager(spark)
    try {
      val f = jm.submit("job-1", li.where(col("l_quantity") > 10))
      val n = Await.result(f, 2.minutes)
      assert(n > 0)
      assert(jm.status("job-1").contains(Jobs.Done(n)))
      assert(jm.status("missing").isEmpty)
    } finally jm.close()
  }

  test("job manager streams per-stage progress into Running (Celery parity)") {
    val jm = new Jobs.JobManager(spark)
    try {
      // two stages by construction: a shuffle, then a slow result stage
      // (5 ms/row × 100 rows/partition ≈ 500 ms) — long enough that the
      // poller observes Running AFTER the first stage completed, i.e. a
      // listener-fed progress update mid-job (celery_tasks.py:111-116)
      val slow = udf((x: Long) => { Thread.sleep(5); x })
      val df = spark.range(0, 400, 1, 4).toDF("id")
        .repartition(4, col("id"))
        .select(slow(col("id")).as("id"))
      val f = jm.submit("job-progress", df)
      val seen = scala.collection.mutable.ArrayBuffer[Jobs.Progress]()
      while (!f.isCompleted) {
        jm.status("job-progress").foreach {
          case Jobs.Running(p) => seen += p
          case _ =>
        }
        Thread.sleep(5)
      }
      val n = Await.result(f, 2.minutes)
      assert(jm.status("job-progress").contains(Jobs.Done(n)))
      assert(seen.exists(_.stagesTotal >= 1),
        s"mid-job Running must carry stage totals, saw: ${seen.distinct}")
      assert(seen.exists(_.stagesDone >= 1),
        s"a completed stage must stream into Running progress, saw: ${seen.distinct}")
      val last = seen.last
      assert(last.percent >= 0.0 && last.percent <= 100.0)
      assert(last.tasksTotal >= 4, s"task totals must accumulate: $last")
    } finally jm.close()
  }
}
