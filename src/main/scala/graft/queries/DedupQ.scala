package graft.queries

import graft.dedup.Dedup
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup suite over documents/embeddings. The corpus has no exact dupes
  * (500 distinct texts), so the exact-dedup query unions a shifted copy of
  * the table to give the operator real duplicate groups; the Jaccard
  * queries run on the original corpus, which has 25 planted near-dup pairs
  * at Jaccard ≥ 0.2.
  */
object DedupQ extends QueryPack {

  /** documents ∪ (same texts under doc_id + 100000) — derived, not
    * synthesized: every text then appears exactly twice.
    */
  private def doubled(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.unionByName(d.withColumn("doc_id", col("doc_id") + 100000))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_exact_dedup" -> ((s, dir) =>
      Dedup.exactGroups(doubled(s, dir), "doc_id", "text")),
    "q_ngram_jaccard" -> ((s, dir) =>
      round6(
        Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 3, threshold = 0.2),
        "jaccard")),
    // LSH operating point (64 hashes, 32 bands of 2 rows): P(candidate) at
    // j=0.5 is 1-(1-0.25)^32 ≈ 0.9999 → output == exact pairs ≥ 0.5, which
    // is the oracle below (validated at sf0.01 and sf0.1).
    "q_minhash_dedup" -> ((s, dir) =>
      round6(
        Dedup.minhashDedup(Tables.documents(s, dir), "doc_id", "text",
          n = 3, numHashes = 64, bands = 32, threshold = 0.5),
        "jaccard")),
    // xxhash64-based fingerprints have no DuckDB equivalent → rows-only.
    // maxHamming 3 is the 4-band recall guarantee (see simhashPairs).
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
        maxHamming = 3)),
    "q_embedding_dedup" -> ((s, dir) =>
      round6(
        Dedup.embeddingDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding",
          threshold = 0.45),
        "cosine"))
  )

  private val norm =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))"""

  /** Shared SQL for exact word-3gram Jaccard pairs at a threshold. */
  private def jaccardSql(threshold: Double): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(
       |    $norm, ' ') AS w
       |  FROM documents),
       |grams AS (
       |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
       |  FROM toks, unnest(range(1, len(w) - 1)) AS t(i)
       |  WHERE len(w) >= 3),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
       |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id1, id2,
       |  round(i * 1.0 / (s1.sz + s2.sz - i), 6) AS jaccard
       |FROM inter
       |JOIN sizes s1 ON id1 = s1.doc_id
       |JOIN sizes s2 ON id2 = s2.doc_id
       |WHERE i * 1.0 / (s1.sz + s2.sz - i) >= $threshold""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_exact_dedup" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 100000, text FROM documents)
         |SELECT md5($norm) AS text_hash,
         |       count(*) AS n_docs, min(doc_id) AS keep_id
         |FROM all_docs GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "q_ngram_jaccard" -> jaccardSql(0.2),
    "q_minhash_dedup" -> jaccardSql(0.5),
    "q_embedding_dedup" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings)
        |SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  round(list_dot_product(a.e, b.e)
        |    / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
        |    6) AS cosine
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.e, b.e)
        |    / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
        |    >= 0.45""".stripMargin
  )
}
