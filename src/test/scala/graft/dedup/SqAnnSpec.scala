package graft.dedup

import graft.SparkSpec
import graft.sim.Similarity
import org.apache.spark.sql.functions._

class SqAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.model.Tables.embeddings(spark, sfDir)

  test("sq codes are bounded int8 and unit-scale (max |code| = 127 on some dim)") {
    val codes = emb.select(Similarity.sqEncode(col("embedding")).as("c8"))
    val stats = codes
      .select(array_max(col("c8")).as("hi"), array_min(col("c8")).as("lo"))
      .agg(max(col("hi")).as("hi"), min(col("lo")).as("lo")).head()
    assert(stats.getByte(0) <= 127 && stats.getByte(1) >= -127)
  }

  test("sq top-5 recall vs exact cosine >= 0.9 on real embeddings") {
    val queries = emb.where(col("vec_id") % 31 === 0)
    val approx = Similarity.sqTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("id")).as[(Long, Long)].collect().toSet
    val k = 5
    val exactPairs = Similarity.knnJoin(emb, "vec_id", "embedding", k)
      .where(col("id1") % 31 === 0)
      .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
    val recall = (approx intersect exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"sq recall@5 $recall")
  }

  test("ranking deterministic across partitionings (integer scores, id ties)") {
    val q = emb.where(col("vec_id") % 31 === 0)
    val a = Similarity.sqTopK(emb.repartition(1), q, "vec_id", "embedding", 5)
      .select("query_id", "id", "rank").collect().toSet
    val b = Similarity.sqTopK(emb.repartition(13), q.repartition(3),
      "vec_id", "embedding", 5)
      .select("query_id", "id", "rank").collect().toSet
    assert(a == b)
  }
}
