package graft.operators

import graft.text.TextMetrics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: deal documents into hash shards,
  * order each shard by a deterministic md5 permutation (the training
  * shuffle), concatenate the token stream, and cut it every `budget`
  * tokens — the pack-and-split step that turns a ragged corpus into
  * fixed-length training sequences (additive scope: the reference
  * pipeline has no training-data surface at all).
  *
  * Scale design: there is NO global sort. The only ordering is per shard
  * — one hash-partition exchange plus a per-partition sort, the same
  * physical shape as any windowed aggregate — so `shards` is the
  * parallelism dial: pack a 100 TB corpus with shards ≈ cluster cores
  * and each task owns one shard's running token sum. Both the shard
  * assignment and the within-shard order are md5 arithmetic over the
  * document id, so the exact permutation is reproducible by any engine
  * (same oracle-parity idiom as [[Sampling.hashBucket]]).
  */
object Packing {

  /** Per-document pack assignment: the shard, the deterministic order
    * key, the document's token count, the cumulative tokens before it
    * within its shard, the training sequence its first token lands in
    * (`cum_before DIV budget` — cut semantics, documents may straddle a
    * boundary), and whether it straddles one.
    *
    * `countOf` is the budget currency: whitespace tokens by default,
    * real subword counts via `Bpe.tokenCount(_, merges)` (the
    * `q_pack_bpe` wiring) — any deterministic scan-local count column
    * works, the shard/cut arithmetic is count-agnostic.
    */
  def packAssignments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Long,
      shards: Int,
      salt: String = "pack",
      countOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        TextMetrics.tokenCount
  ): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col("okey"), col("id"))
    df.select(
        col(idCol).as("id"),
        Sampling.hashBucket(col(idCol), shards, salt).as("shard"),
        md5(concat_ws(":", lit(salt + "o"), col(idCol).cast("string"))).as("okey"),
        countOf(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(
        sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("seq", expr(s"cum_before DIV $budget"))
      .withColumn("straddles", col("n_tokens") > 0 &&
        expr(s"(cum_before + n_tokens - 1) DIV $budget") > col("seq"))
  }

  /** Pack manifest: one row per (shard, seq) training sequence — how many
    * documents START in it, the tokens those documents contribute, how
    * many of them cross the cut into the next sequence, and the first
    * document id (an order spot-check). By cut semantics every sequence
    * except a shard's last carries exactly `budget` tokens; the manifest
    * is the audit of that invariant, sized in sequences (corpus tokens /
    * budget), not documents.
    */
  def packSummary(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Long,
      shards: Int,
      salt: String = "pack",
      countOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        TextMetrics.tokenCount
  ): DataFrame =
    packAssignments(df, idCol, textCol, budget, shards, salt, countOf)
      .groupBy(col("shard"), col("seq"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("straddles").cast("int")).as("n_straddling"),
        min(col("id")).as("first_id"))

  /** RAG/embedding-style document chunking: fixed-size token windows with
    * overlap — one row per chunk with its index, document-relative token
    * range `[tok_from, tok_to)` and the chunk text. Windows start every
    * `chunkTokens − overlapTokens` tokens; the final window is the tail
    * (possibly short — forward windows, not back-shifted), so every token
    * is covered and consecutive chunks share exactly `overlapTokens`
    * tokens of context. Blank documents produce no chunks.
    *
    * Scan-local by construction (tokenize → closed-form chunk count →
    * explode → slice): no shuffle, no per-doc state, output
    * O(corpus_tokens / stride) rows — the embedding-ingest front end at
    * 100 TB is a pure map. All arithmetic is integer (the chunk count is
    * an integer ceil via `div`), so an external oracle replays it
    * exactly.
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens — an " +
        "overlap >= the chunk size never advances and would chunk forever")
    val stride = chunkTokens - overlapTokens
    df.select(col(idCol), TextMetrics.tokens(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .where(col("n_tokens") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        when(col("n_tokens") <= chunkTokens, lit(0L)).otherwise(
          expr(s"(n_tokens - $chunkTokens + ${stride - 1}) div $stride")))))
      .withColumn("tok_from", col("chunk_idx") * stride)
      .withColumn("tok_to",
        least(col("n_tokens"), col("tok_from") + chunkTokens))
      .withColumn("chunk_text", concat_ws(" ",
        slice(col("toks"), (col("tok_from") + 1).cast("int"),
          (col("tok_to") - col("tok_from")).cast("int"))))
      .select(col(idCol), col("chunk_idx"), col("n_tokens"),
        col("tok_from"), col("tok_to"), col("chunk_text"))
  }

  /** The MATERIALIZED piece list a training loader actually reads: each
    * document's token range cut into per-sequence spans — one row per
    * (sequence, document piece) with the document-relative range
    * [`doc_from`, `doc_to`) and where it lands inside the sequence
    * (`seq_from`). A straddling document contributes one piece per
    * sequence it crosses; within a sequence the pieces tile it exactly
    * (every block starts at 0 and sums to `budget`, except each shard's
    * last block).
    *
    * Scale shape: [[packAssignments]]'s single windowed cumsum plus a
    * scan-local `sequence`/`explode` — the explode emits
    * ceil(n_tokens / budget) + 1 rows per document at most, so output is
    * O(docs + corpus_tokens / budget), never quadratic.
    */
  def blockSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Long,
      shards: Int,
      salt: String = "pack",
      countOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        TextMetrics.tokenCount
  ): DataFrame =
    packAssignments(df, idCol, textCol, budget, shards, salt, countOf)
      .where(col("n_tokens") > 0)
      .drop("seq", "straddles")
      .withColumn("seq", explode(sequence(
        expr(s"cum_before DIV $budget"),
        expr(s"(cum_before + n_tokens - 1) DIV $budget"))))
      .withColumn("doc_from",
        greatest(lit(0L), col("seq") * budget - col("cum_before")))
      .withColumn("doc_to",
        least(col("n_tokens"), (col("seq") + 1) * budget - col("cum_before")))
      .withColumn("seq_from",
        col("cum_before") + col("doc_from") - col("seq") * budget)
      .select(col("shard"), col("seq"), col("id"),
        col("doc_from"), col("doc_to"), col("seq_from"))
}
