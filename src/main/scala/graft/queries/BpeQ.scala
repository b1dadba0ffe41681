package graft.queries

import graft.model.Tables
import graft.text.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer fit + encode + BPE-budget packing over documents.
  *
  * The oracle replays the ENTIRE fit in DuckDB — `NumMerges` unrolled
  * stages over the word-count table, each stage = pair counting (list
  * unnest), argmax with the deterministic tie-break, and canonical
  * greedy merge application via a gaps-and-islands parity rule (runs of
  * k consecutive match positions merge at even offsets, the exact
  * left-to-right semantics of [[Bpe.mergePair]]) — and then replays the
  * encode through the fitted `word → symbols` table, so the merge table
  * AND the per-document token stream are both engine-checked, not
  * pinned. Multiply-referenced CTEs are MATERIALIZED (DuckDB otherwise
  * inlines them, which is exponential in the stage count).
  */
object BpeQ extends QueryPack {

  private val NumMerges = 20
  private val VocabCap = 100000
  private val PackBudget = 256L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The fitted merge table itself: rank, pair, merged symbol. The
    // distributed fit is one corpus word-count aggregate + a bounded
    // driver loop (classic trainer shape); the oracle re-derives every
    // row from scratch in SQL.
    "q_bpe_merges" -> ((s, dir) =>
      Bpe.mergesDf(s, Bpe.fit(Tables.documents(s, dir), "text", NumMerges, VocabCap))),
    // Per-document BPE tokenization: word count, BPE token count, and
    // an md5 over the space-joined token stream (order-sensitive — the
    // strongest cheap parity check on the actual tokens).
    "q_bpe_tokens" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = Bpe.fit(docs, "text", NumMerges, VocabCap)
      fanDocuments(s, dir).select(
        col("doc_id"),
        Bpe.words(col("text")).as("ws"),
        Bpe.encode(col("text"), merges).as("toks"))
        .select(
          col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          size(col("toks")).cast("long").as("n_tokens"),
          md5(concat_ws(" ", col("toks"))).as("tok_md5"))
    }),
    // Training-sequence packing budgeted by BPE tokens instead of
    // whitespace tokens — the pluggable-count rewire of
    // Packing.packSummary; same md5 shard/permutation arithmetic as
    // q_pack_sequences, counts from the scan-local BPE kernel.
    "q_pack_bpe" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = Bpe.fit(docs, "text", NumMerges, VocabCap)
      graft.operators.Packing.packSummary(docs, "doc_id", "text",
        budget = PackBudget, shards = 4,
        countOf = t => Bpe.tokenCount(t, merges))
    })
  )

  // ---- oracle SQL generation (unrolled fit stages)

  /** One fit stage: count pairs over reps k−1, pick the best, apply it
    * greedily. `grp` is the island id of consecutive match positions
    * (position − running match count); within an island, matches at even
    * offset are taken (greedy left-to-right); a symbol is emitted unless
    * its predecessor was taken (it was consumed by that merge).
    */
  private def stageSql(k: Int): String = {
    val p = s"bpe_r${k - 1}"
    s"""bpe_p$k AS (SELECT l, r, sum(cnt) AS c FROM (
       |    SELECT cnt, s[i] AS l, s[i+1] AS r FROM (
       |      SELECT cnt, s, unnest(generate_series(1, len(s)-1)) AS i FROM $p))
       |  GROUP BY 1, 2),
       |bpe_b$k AS MATERIALIZED (SELECT l, r FROM bpe_p$k ORDER BY c DESC, l, r LIMIT 1),
       |bpe_e$k AS (SELECT w, cnt, i, s[i] AS sym,
       |    coalesce(s[i] = b.l AND s[i+1] = b.r, FALSE) AS m
       |  FROM (SELECT w, cnt, s, unnest(generate_series(1, len(s))) AS i FROM $p)
       |  CROSS JOIN bpe_b$k b),
       |bpe_t$k AS (SELECT w, cnt, i, sym, m,
       |    i - sum(CASE WHEN m THEN 1 ELSE 0 END) OVER (PARTITION BY w ORDER BY i) AS grp
       |  FROM bpe_e$k),
       |bpe_u$k AS (SELECT w, cnt, i, sym,
       |    CASE WHEN m THEN (row_number() OVER (PARTITION BY w, grp, m ORDER BY i) - 1) % 2 = 0
       |         ELSE FALSE END AS taken
       |  FROM bpe_t$k),
       |bpe_v$k AS (SELECT w, cnt, i, sym, taken,
       |    coalesce(lag(taken) OVER (PARTITION BY w ORDER BY i), FALSE) AS ptaken
       |  FROM bpe_u$k),
       |bpe_r$k AS MATERIALIZED (
       |  SELECT w, cnt, list(CASE WHEN taken THEN b.l || b.r ELSE sym END ORDER BY i) AS s
       |  FROM bpe_v$k CROSS JOIN bpe_b$k b
       |  WHERE taken OR NOT ptaken
       |  GROUP BY w, cnt)""".stripMargin
  }

  private def fitCtes: String = {
    val head =
      s"""bpe_wc AS (
         |  SELECT w, count(*) AS cnt FROM (
         |    SELECT unnest(regexp_extract_all(lower(text), '${Bpe.WordRe}')) AS w FROM documents)
         |  GROUP BY w ORDER BY cnt DESC, w LIMIT $VocabCap),
         |bpe_r0 AS MATERIALIZED (SELECT w, cnt, string_split(w, '') AS s FROM bpe_wc)""".stripMargin
    "WITH " + (head +: (1 to NumMerges).map(stageSql)).mkString(",\n")
  }

  /** Doc words with position + the fitted reps joined on. */
  private def encCtes: String =
    s""",
       |bpe_dw AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '${Bpe.WordRe}')) AS w,
       |    unnest(generate_series(1, len(regexp_extract_all(lower(text), '${Bpe.WordRe}')))) AS pos
       |  FROM documents),
       |bpe_enc AS (
       |  SELECT d.doc_id, d.pos, r.s FROM bpe_dw d JOIN bpe_r$NumMerges r ON d.w = r.w)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_bpe_merges" -> (fitCtes + "\n" +
      (1 to NumMerges)
        .map(k => s"SELECT $k AS merge_rank, l AS lhs, r AS rhs, l || r AS merged FROM bpe_b$k")
        .mkString(" UNION ALL ")),
    "q_bpe_tokens" -> (fitCtes + encCtes +
      """
        |SELECT d.doc_id,
        |  CAST(count(e.pos) AS BIGINT) AS n_words,
        |  CAST(coalesce(sum(len(e.s)), 0) AS BIGINT) AS n_tokens,
        |  md5(coalesce(string_agg(array_to_string(e.s, ' '), ' ' ORDER BY e.pos), '')) AS tok_md5
        |FROM documents d LEFT JOIN bpe_enc e ON d.doc_id = e.doc_id
        |GROUP BY d.doc_id""".stripMargin),
    "q_pack_bpe" -> (fitCtes + encCtes +
      s""",
         |bpe_cnt AS (
         |  SELECT d.doc_id, CAST(coalesce(sum(len(e.s)), 0) AS BIGINT) AS n_tokens
         |  FROM documents d LEFT JOIN bpe_enc e ON d.doc_id = e.doc_id
         |  GROUP BY d.doc_id),
         |bpe_pt AS (
         |  SELECT doc_id,
         |    CAST(concat('0x',
         |      substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % 4 AS shard,
         |    md5('packo:' || CAST(doc_id AS VARCHAR)) AS okey,
         |    n_tokens
         |  FROM bpe_cnt),
         |bpe_pc AS (
         |  SELECT *, CAST(coalesce(sum(n_tokens) OVER (
         |    PARTITION BY shard ORDER BY okey, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS cum_before
         |  FROM bpe_pt)
         |SELECT shard, cum_before // $PackBudget AS seq, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  CAST(sum(CASE WHEN n_tokens > 0
         |    AND (cum_before + n_tokens - 1) // $PackBudget > cum_before // $PackBudget
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling,
         |  min(doc_id) AS first_id
         |FROM bpe_pc GROUP BY 1, 2""".stripMargin)
  )
}
