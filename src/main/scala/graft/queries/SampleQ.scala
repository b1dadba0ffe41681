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
    // Weighted corpus mixing: three language slices of the documents
    // table contribute 80%/50%/20% hash-samples to one mixed corpus with
    // provenance. Per-source counts and id checksums replay in DuckDB
    // through the same md5 bucket arithmetic as q_hash_split.
    "q_weighted_mix" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val mixed = Sampling.weightedMix(Seq(
        ("en", docs.where(col("lang") === "en"), 80),
        ("de", docs.where(col("lang") === "de"), 50),
        ("rest", docs.where(col("lang") =!= "en" && col("lang") =!= "de"), 20)),
        idCol = "doc_id")
      mixed.groupBy(col("mix_source")).agg(
        count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
    }),
    // corpus-level token frequency: top 20 tokens with deterministic
    // tie-break (count desc, token asc).
    "q_top_tokens" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(TextMetrics.tokens(lower(col("text")))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)),
    // Training-sequence packing: md5 shards + a deterministic md5
    // permutation within each, token stream cut every 512 tokens. The
    // manifest (docs / tokens / straddlers per sequence) replays in
    // DuckDB through the same md5 and integer-division arithmetic.
    "q_pack_sequences" -> ((s, dir) =>
      graft.operators.Packing.packSummary(Tables.documents(s, dir),
        "doc_id", "text", budget = 512, shards = 4)),
    // Temperature rebalancing at alpha = 0.5 over the lang column (the
    // multilingual upsampling shape: rare languages keep a larger share).
    // Thresholds are sqrt-chain + sorted-order-sum arithmetic, so the
    // oracle derives them bit-for-bit from its own counts — nothing is
    // pinned from the engine.
    "q_temperature_mix" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Sampling.temperatureMix(docs, "lang", "doc_id",
          alpha = 0.5, targetFraction = 0.4)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("id_sum"))
    }),
    // RAG/embedding-style chunking: 64-token windows, 16-token overlap
    // (stride 48), forward windows with a short tail. One row per chunk
    // with its integer token range and the chunk text's md5 — the oracle
    // re-derives the chunk count (integer ceil via //), every boundary,
    // and the text itself from the shared tokenizer.
    "q_chunk_docs" -> ((s, dir) =>
      graft.operators.Packing.chunkDocs(Tables.documents(s, dir),
          "doc_id", "text", chunkTokens = 64, overlapTokens = 16)
        .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
          col("tok_from"), col("tok_to"), md5(col("chunk_text")).as("chunk_md5"))),
    // Chunking at REAL RAG parameters (512-token windows, 128 overlap,
    // stride 384) over LONG documents — each driver doc's text repeated
    // 32× (a transform both engines express exactly), so the explode
    // fan-out path (many chunks per doc, ~8+ at typical driver doc
    // lengths) is oracle-pinned, not just fuzz-pinned. Same output shape
    // as q_chunk_docs: integer ranges + the chunk text's md5.
    "q_chunk_docs_long" -> ((s, dir) =>
      graft.operators.Packing.chunkDocs(
          Tables.documents(s, dir).select(col("doc_id"),
            repeat(concat(col("text"), lit(" ")), 32).as("text")),
          "doc_id", "text", chunkTokens = 512, overlapTokens = 128)
        .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
          col("tok_from"), col("tok_to"), md5(col("chunk_text")).as("chunk_md5"))),
    // The materialized block manifest (one row per per-sequence document
    // piece), rolled up per block with its tiling invariants exposed:
    // min_seq_from must be 0 and seq_end must equal sum_span for every
    // block — pieces tile each training sequence exactly. The oracle
    // re-derives every span boundary from the same md5 + integer
    // arithmetic via generate_series.
    "q_block_spans" -> ((s, dir) =>
      graft.operators.Packing.blockSpans(Tables.documents(s, dir),
          "doc_id", "text", budget = 512, shards = 4)
        .groupBy(col("shard"), col("seq"))
        .agg(
          count(lit(1)).as("n_pieces"),
          sum(col("doc_to") - col("doc_from")).as("sum_span"),
          min(col("seq_from")).as("min_seq_from"),
          max(col("seq_from") + col("doc_to") - col("doc_from")).as("seq_end"),
          min(col("id")).as("first_id")))
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
        |FROM (SELECT unnest(regexp_extract_all(lower(text), '[^ \t\n\x0b\f\r]+')) AS token
        |      FROM documents)
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 20""".stripMargin,
    // per-source salts ("graft:<name>") and thresholds mirror weightedMix
    "q_weighted_mix" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN lang = 'en' THEN 'en'
        |         WHEN lang = 'de' THEN 'de'
        |         ELSE 'rest' END AS mix_source
        |  FROM documents),
        |k AS (
        |  SELECT mix_source, doc_id,
        |    CAST(concat('0x', substr(md5('graft:' || mix_source || ':' ||
        |      CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
        |  FROM b)
        |SELECT mix_source, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM k
        |WHERE (mix_source = 'en' AND bucket < 80)
        |   OR (mix_source = 'de' AND bucket < 50)
        |   OR (mix_source = 'rest' AND bucket < 20)
        |GROUP BY 1""".stripMargin,
    // chunk count = 1 + ceil((n - 64)/48) for n > 64 (integer ceil via
    // //), boundaries and text re-derived from the same tokenizer;
    // DuckDB list slices are 1-based end-inclusive = Spark's
    // slice(toks, from+1, len)
    "q_chunk_docs" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '[^ \t\n\x0b\f\r]+') AS toks
        |  FROM documents),
        |b AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
        |      FROM t WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, n, toks,
        |    unnest(range(0, CASE WHEN n <= 64 THEN 1
        |                       ELSE 1 + (n - 64 + 47) // 48 END)) AS chunk_idx
        |  FROM b)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, n AS n_tokens,
        |  CAST(chunk_idx * 48 AS BIGINT) AS tok_from,
        |  least(n, chunk_idx * 48 + 64) AS tok_to,
        |  md5(array_to_string(
        |    toks[CAST(chunk_idx * 48 + 1 AS BIGINT):least(n, chunk_idx * 48 + 64)],
        |    ' ')) AS chunk_md5
        |FROM c""".stripMargin,
    // same derivation at 512/384 over the 32×-repeated text: chunk count
    // = 1 + ceil((n - 512)/384) for n > 512
    "q_chunk_docs_long" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    regexp_extract_all(repeat(text || ' ', 32), '[^ \t\n\x0b\f\r]+') AS toks
        |  FROM documents),
        |b AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
        |      FROM t WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, n, toks,
        |    unnest(range(0, CASE WHEN n <= 512 THEN 1
        |                       ELSE 1 + (n - 512 + 383) // 384 END)) AS chunk_idx
        |  FROM b)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, n AS n_tokens,
        |  CAST(chunk_idx * 384 AS BIGINT) AS tok_from,
        |  least(n, chunk_idx * 384 + 512) AS tok_to,
        |  md5(array_to_string(
        |    toks[CAST(chunk_idx * 384 + 1 AS BIGINT):least(n, chunk_idx * 384 + 512)],
        |    ' ')) AS chunk_md5
        |FROM c""".stripMargin,
    // same md5 shard/order arithmetic as Packing.packAssignments; `//`
    // is DuckDB integer division = Spark's DIV
    "q_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(concat('0x',
        |      substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 4 AS shard,
        |    md5('packo:' || CAST(doc_id AS VARCHAR)) AS okey,
        |    CAST(len(regexp_extract_all(text, '[^ \t\n\x0b\f\r]+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *, CAST(coalesce(sum(n_tokens) OVER (
        |    PARTITION BY shard ORDER BY okey, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS cum_before
        |  FROM t)
        |SELECT shard, cum_before // 512 AS seq, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(sum(CASE WHEN n_tokens > 0
        |    AND (cum_before + n_tokens - 1) // 512 > cum_before // 512
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling,
        |  min(doc_id) AS first_id
        |FROM c GROUP BY 1, 2""".stripMargin,
    // the exact threshold derivation: sqrt (IEEE correctly rounded in any
    // engine), weight sum in sorted-source order (list_sum over ORDER BY),
    // then the same md5 bucket arithmetic as the engine's scan
    "q_temperature_mix" ->
      """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS ntot FROM counts),
        |w AS (SELECT lang, n, sqrt(n * 1.0 / ntot) AS w FROM counts, tot),
        |sw AS (SELECT list_sum(list(w ORDER BY lang)) AS sumw FROM w),
        |f AS (
        |  SELECT lang, n,
        |         CAST(floor(least(1.0, (0.4 * ntot) * (w / sumw) / n) * 1000000)
        |           AS BIGINT) AS thresh
        |  FROM w, sw, tot),
        |k AS (
        |  SELECT d.lang, d.doc_id
        |  FROM documents d JOIN f USING (lang)
        |  WHERE CAST(concat('0x', substr(md5('graft:' || d.lang || ':' ||
        |          CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 < thresh)
        |SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM k GROUP BY 1""".stripMargin,
    "q_block_spans" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(concat('0x',
        |      substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 4 AS shard,
        |    md5('packo:' || CAST(doc_id AS VARCHAR)) AS okey,
        |    CAST(len(regexp_extract_all(text, '[^ \t\n\x0b\f\r]+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *, CAST(coalesce(sum(n_tokens) OVER (
        |    PARTITION BY shard ORDER BY okey, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS cum_before
        |  FROM t WHERE n_tokens > 0),
        |p AS (
        |  SELECT shard, doc_id, seq,
        |    greatest(0, seq * 512 - cum_before) AS doc_from,
        |    least(n_tokens, (seq + 1) * 512 - cum_before) AS doc_to,
        |    cum_before + greatest(0, seq * 512 - cum_before) - seq * 512 AS seq_from
        |  FROM c, unnest(generate_series(cum_before // 512,
        |                 (cum_before + n_tokens - 1) // 512)) AS s(seq))
        |SELECT shard, seq,
        |  count(*) AS n_pieces,
        |  CAST(sum(doc_to - doc_from) AS BIGINT) AS sum_span,
        |  CAST(min(seq_from) AS BIGINT) AS min_seq_from,
        |  CAST(max(seq_from + doc_to - doc_from) AS BIGINT) AS seq_end,
        |  min(doc_id) AS first_id
        |FROM p GROUP BY 1, 2""".stripMargin
  )
}
