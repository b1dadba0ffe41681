package graft.queries

import graft.model.Tables
import graft.sim.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table: exact brute-force paths
  * are oracle-checked; the LSH path is rows-only here and recall-checked
  * against the exact result in SimilaritySpec.
  */
object SimQ extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.where(col("vec_id") === 0)
        .select(transform(col("embedding"), _.cast("double")))
        .head().getSeq[Double](0)
      round6(
        Similarity.topKForVector(emb.where(col("vec_id") =!= 0),
          "vec_id", "embedding", q, k = 10),
        "cosine")
    }),
    "q_knn_sample" -> ((s, dir) =>
      round6(
        Similarity.knnJoin(
          Tables.embeddings(s, dir).where(col("vec_id") < 50),
          "vec_id", "embedding", k = 3),
        "cosine")),
    "q_lsh_ann" -> ((s, dir) =>
      round6(
        Similarity.lshTopK(
          Tables.embeddings(s, dir).where(col("vec_id") < 50),
          "vec_id", "embedding", k = 3, dim = 64),
        "cosine")),
    // IVF coarse-quantizer ANN (k-means cells + probing) — approximate by
    // design → rows-only; recall vs exact kNN asserted in DedupSpec.
    "q_ivf_ann" -> ((s, dir) =>
      round6(
        Similarity.ivfTopK(
          Tables.embeddings(s, dir).where(col("vec_id") < 50),
          "vec_id", "embedding", k = 3, nlist = 8, nprobe = 4),
        "cosine"))
  )

  private val cos =
    """list_dot_product(a.e, b.e)
      |    / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_ann_topk" ->
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |q AS (SELECT e FROM v WHERE vec_id = 0)
         |SELECT a.vec_id, round(list_dot_product(a.e, q.e)
         |  / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(q.e, q.e))),
         |  6) AS cosine
         |FROM v a, q WHERE a.vec_id != 0
         |ORDER BY 2 DESC, 1 LIMIT 10""".stripMargin,
    "q_knn_sample" ->
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings WHERE vec_id < 50),
         |sims AS (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2, $cos AS cosine
         |  FROM v a JOIN v b ON a.vec_id != b.vec_id),
         |ranked AS (
         |  SELECT id1, id2, cosine,
         |    CAST(row_number() OVER (PARTITION BY id1
         |      ORDER BY cosine DESC, id2) AS INTEGER) AS rank
         |  FROM sims)
         |SELECT id1, id2, round(cosine, 6) AS cosine, rank
         |FROM ranked WHERE rank <= 3""".stripMargin
  )
}
