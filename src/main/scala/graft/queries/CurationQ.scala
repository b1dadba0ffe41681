package graft.queries

import graft.dedup.Dedup
import graft.model.Tables
import graft.text.TextMetrics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The training-data curation pipeline, end to end in ONE composed plan —
  * what this engine exists to do at 100 TB: score → filter → near-dup
  * removal (keep the smaller doc_id of each pair) → per-source corpus
  * stats. Every stage is an operator already oracle-checked in isolation;
  * this query pins their composition.
  */
object CurationQ extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curation_pipeline" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val scored = docs
        .withColumn("quality", TextMetrics.qualityScore(col("text")))
        .withColumn("n_tokens", TextMetrics.tokenCount(col("text")))
      val kept = scored.where(col("quality") >= 0.5)
      // drop the higher doc_id of every near-dup pair (keep-first policy);
      // runs with the library's default df-cap — the oracle mirrors it
      val dupIds = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .select(col("id2").as("doc_id")).distinct()
      val deduped = kept.join(dupIds, Seq("doc_id"), "left_anti")
      round6(
        deduped.groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            avg(col("quality")).as("avg_quality"),
            sum(col("n_tokens")).as("total_tokens"))
          .withColumn("total_tokens", col("total_tokens").cast("long")),
        "avg_quality")
    })
  )

  private val toks = """string_split_regex(trim(text), '\s+')"""
  private val stopList = TextMetrics.EnStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
  private val norm =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))"""

  def oracles: Map[String, String] = Map(
    "q_curation_pipeline" ->
      s"""WITH scored AS (
         |  SELECT doc_id, source,
         |    CASE WHEN trim(text) = '' THEN 0 ELSE len($toks) END AS n_tokens,
         |    CASE WHEN trim(text) = '' THEN 0.0 ELSE greatest(0.0, least(1.0,
         |      least(log10(len($toks) + 1.0) / 3.0, 1.0) * 0.3
         |      + (1.0 - CASE WHEN len(text) = 0 THEN 0.0
         |          ELSE len(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
         |               / len(text) END) * 0.4
         |      + least((CASE WHEN len($toks) = 0 THEN 0.0
         |          ELSE len(list_filter($toks, x -> list_contains($stopList, x))) * 1.0
         |               / len($toks) END) * 4.0, 1.0) * 0.3)) END AS quality
         |  FROM documents),
         |gtoks AS (
         |  SELECT doc_id, string_split($norm, ' ') AS w FROM documents),
         |grams AS (
         |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
         |  FROM gtoks, unnest(range(1, len(w) - 1)) AS t(i)
         |  WHERE len(w) >= 3),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
         |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         |  WHERE a.g IN (SELECT g FROM grams GROUP BY g
         |                HAVING count(*) <= ${Dedup.DefaultMaxDocFreq})
         |  GROUP BY 1, 2),
         |dups AS (
         |  SELECT DISTINCT id2 AS doc_id FROM inter
         |  JOIN sizes s1 ON id1 = s1.doc_id JOIN sizes s2 ON id2 = s2.doc_id
         |  WHERE i * 1.0 / (s1.sz + s2.sz - i) >= 0.5)
         |SELECT source, count(*) AS n_docs,
         |       round(avg(quality), 6) AS avg_quality,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM scored
         |WHERE quality >= 0.5
         |  AND doc_id NOT IN (SELECT doc_id FROM dups)
         |GROUP BY 1""".stripMargin
  )
}
