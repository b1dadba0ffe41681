package graft.queries

import graft.model.Tables
import graft.operators.Sampling
import graft.text.TextMetrics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling + corpus token frequency over documents. */
object SampleQ extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ~20% eval split, reproducible across engines via md5 buckets.
    "q_hash_split" -> ((s, dir) => {
      val (train, eval_) = Sampling.trainEvalSplit(
        Tables.documents(s, dir), "doc_id", evalPct = 20)
      train.agg(count(lit(1)).as("n"), lit("train").as("split"))
        .unionByName(eval_.agg(count(lit(1)).as("n"), lit("eval").as("split")))
        .select(col("split"), col("n"))
    }),
    // corpus-level token frequency: top 20 tokens with deterministic
    // tie-break (count desc, token asc).
    "q_top_tokens" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(TextMetrics.tokens(lower(col("text")))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20))
  )

  def oracles: Map[String, String] = Map(
    "q_hash_split" ->
      """WITH b AS (
        |  SELECT CAST(concat('0x',
        |    substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    % 100 AS bucket
        |  FROM documents)
        |SELECT 'train' AS split, count(*) AS n FROM b WHERE bucket >= 20
        |UNION ALL
        |SELECT 'eval' AS split, count(*) AS n FROM b WHERE bucket < 20""".stripMargin,
    "q_top_tokens" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |      FROM documents)
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 20""".stripMargin
  )
}
