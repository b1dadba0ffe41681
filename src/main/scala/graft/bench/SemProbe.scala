package graft.bench

import graft.model.Tables
import graft.sim.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe behind SCALE.md's "SemDeDup / served-index
  * steady-state cost" table: which stage of fit → assign/pairs →
  * connected components → final join (and open → serve → validate for
  * the persisted index) carries the per-call cost at bench scale, with
  * per-stage task counts/durations from a listener so scheduling
  * overhead is distinguishable from compute. Run manually, not part of
  * the driver contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.bench.SemProbe
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stageInfo = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        stageInfo.add(f"stage ${si.stageId} tasks=${si.numTasks} dur=$dur%.2fs ${si.name.take(60)}")
      }
    })
    def time[A](tag: String)(f: => A): A = {
      stageInfo.clear()
      val t0 = System.nanoTime(); val a = f
      println(f"[semprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      if (tag.contains("serve count") || tag.contains("full served")) {
        Thread.sleep(200)
        stageInfo.forEach(s => println(s"[semprobe]   $s"))
      }
      a
    }

    val emb = Tables.embeddings(spark, dir)
    println(s"[semprobe] rows=${emb.count()}")

    val cents = time("fit (semanticCentroids)")(
      Similarity.semanticCentroids(emb, "embedding", dim = 64, nlist = 8))

    (1 to 3).foreach { i =>
      time(s"emb.count it$i")(emb.count())
      val pairs = Similarity.semanticDupPairs(emb, "vec_id", "embedding",
        dim = 64, nlist = 8, threshold = 0.45, centroids = Some(cents))
      println(s"[semprobe] n_pairs=${time(s"pairs count it$i")(pairs.count())}")
      val (labels, conv) = time(s"cc it$i")(
        graft.dedup.Dedup.connectedComponentsWithStatus(pairs))
      println(s"[semprobe] labels=${labels.count()} converged=$conv")
      time(s"full semanticDedup it$i")(
        Similarity.semanticDedup(emb, "vec_id", "embedding", dim = 64,
          nlist = 8, threshold = 0.45, centroids = Some(cents))
          .write.format("noop").mode("overwrite").save())
    }

    // ---- q_ivfpq_served phase breakdown ----
    val idxDir = graft.util.Tmp.root("graft_semprobe_idx").toString
    val embQ = emb.where(col("vec_id") < 50)
    time("index write")(Similarity.writeIvfPqIndex(embQ, "vec_id", "embedding",
      idxDir, dim = 64, nlist = 8, m = 8, codebookSize = 16))
    time("pin direct")(Similarity.ivfPqTopK(embQ, "vec_id", "embedding", k = 10,
        dim = 64, nlist = 8, nprobe = 4, m = 8, codebookSize = 16)
      .write.mode("overwrite").parquet(s"$idxDir/expected/direct"))
    time("pin exact")(Similarity.knnJoin(embQ, "vec_id", "embedding", k = 10)
      .select(col("id1"), col("id2"))
      .write.mode("overwrite").parquet(s"$idxDir/expected/exact"))
    (1 to 3).foreach { i =>
      val fresh = spark.newSession()
      val e = Tables.embeddings(fresh, dir).where(col("vec_id") < 50)
      val idx = time(s"open idx it$i")(Similarity.openIvfPqIndex(fresh, idxDir))
      val served = Similarity.ivfPqServe(idx, e, "vec_id", "embedding",
        k = 10, nprobe = 4)
      time(s"serve count it$i")(served.count())
      val direct = fresh.read.parquet(s"$idxDir/expected/direct")
      val cmp = served
        .select(col("id1"), col("rank"), col("id2").as("sid2"), col("score").as("sscore"))
        .join(direct.select(col("id1"), col("rank"),
          col("id2").as("did2"), col("score").as("dscore")),
          Seq("id1", "rank"), "full")
        .groupBy(col("id1"))
        .agg(min(col("sid2") <=> col("did2") && col("sscore") <=> col("dscore"))
          .as("matches_direct"))
      time(s"cmp count it$i")(cmp.count())
      val exact = fresh.read.parquet(s"$idxDir/expected/exact")
      val full = served.join(exact.select(col("id1"), col("id2"), lit(1).as("hit")),
          Seq("id1", "id2"), "left")
        .groupBy(col("id1"))
        .agg(round(sum(coalesce(col("hit"), lit(0))) / 10.0, 6).as("recall"))
        .join(cmp, Seq("id1"))
      time(s"full served it$i")(full.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
