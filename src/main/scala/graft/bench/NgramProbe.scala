package graft.bench

import graft.dedup.Dedup
import graft.model.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profiler for the ngram-Jaccard chain (dev tool, not driver
  * contract): times each prefix of the pipeline to locate the dominant
  * cost. History it informed (see SCALE.md / commit log): the fused
  * TextGramHashes kernel (gram sets scan-local, was 50%+ of the query)
  * and the packed pair keys (~15%).
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

    time("1_gram_sets")(Dedup.gramHashSets(docs, "doc_id", "text", 3))
    val sets = Dedup.gramHashSets(docs, "doc_id", "text", 3)
    time("2_postings") {
      sets.select(col("doc_id").as("id"), explode(col("gs")).as("gh"))
        .groupBy(col("gh")).agg(count(lit(1)).as("df"))
        .where(col("df").between(2, 15))
    }
    time("3_full_pairs")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2, 15))
    println(s"docs=${docs.count()}")
    spark.stop()
  }
}
