package graft.bench

import graft.dedup.Dedup
import graft.model.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-profiler for ngramJaccardPairs (dev tool, not driver
  * contract): times each prefix of the chain to locate the dominant cost.
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)

    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach(_ => df.write.format("noop").mode("overwrite").save())
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: median=${ts.sorted.apply(2)}%.3f min=${ts.min}%.3f max=${ts.max}%.3f")
    }

    time("1_tokenize_grams")(Dedup.ngrams(docs, "doc_id", "text", 3))
    time("2_gram_sets")(Dedup.gramHashSets(docs, "doc_id", "text", 3))
    val sets = Dedup.gramHashSets(docs, "doc_id", "text", 3)
    time("3_postings") {
      sets.select(col("doc_id").as("id"), size(col("gs")).as("sz"), explode(col("gs")).as("gh"))
        .groupBy(col("gh"))
        .agg(collect_list(struct(col("id"), col("sz"))).as("ids"))
        .where(size(col("ids")) <= 15)
    }
    time("4_full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2, 15))

    // variant: pack (id, sz) into one long so the pair aggregate groups on
    // TWO long keys instead of four columns
    time("5_packed") {
      val sets2 = Dedup.gramHashSets(docs, "doc_id", "text", 3)
      val posts2 = sets2
        .select((col("doc_id") * 4194304L + size(col("gs"))).as("idsz"),
          explode(col("gs")).as("gh"))
        .groupBy(col("gh"))
        .agg(collect_list(col("idsz")).as("ids"))
        .where(size(col("ids")).between(2, 15))
      posts2.select(explode(col("ids")).as("a"), col("ids"))
        .select(col("a"), explode(col("ids")).as("b"))
        .where(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
        .select((col("a") / 4194304L).cast("long").as("id1"),
          (col("a") % 4194304L).as("sz1"),
          (col("b") / 4194304L).cast("long").as("id2"),
          (col("b") % 4194304L).as("sz2"), col("inter"))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
        .where(col("jaccard") >= 0.2)
        .select(col("id1"), col("id2"), col("jaccard"))
    }
    // general variant: narrow 2-long group key, sizes as first() aggregates
    time("8_first_sz") {
      val sets2 = Dedup.gramHashSets(docs, "doc_id", "text", 3)
      val posts2 = sets2
        .select(struct(col("doc_id").as("id"), size(col("gs")).as("sz")).as("e"),
          explode(col("gs")).as("gh"))
        .groupBy(col("gh"))
        .agg(collect_list(col("e")).as("ids"))
        .where(size(col("ids")).between(2, 15))
      posts2.select(explode(col("ids")).as("a"), col("ids"))
        .select(col("a"), explode(col("ids")).as("b"))
        .where(col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
        .agg(count(lit(1)).as("inter"),
          first(col("a.sz")).as("sz1"), first(col("b.sz")).as("sz2"))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
        .where(col("jaccard") >= 0.2)
        .select(col("id1"), col("id2"), col("jaccard"))
    }
    println(s"docs=${docs.count()}")
    spark.stop()
  }
}
