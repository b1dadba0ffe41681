package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * real subword tokenizer behind the `subwordCount` proxy, for the
  * training-data pipeline scope (token budgets, packing, LM scoring all
  * key off token counts; a real pipeline packs by BPE tokens, not
  * whitespace words).
  *
  * == Shape of the computation ==
  *
  * Fit operates on the WORD-COUNT table, not the corpus — the classic
  * trainer design (Sennrich's reference implementation and every
  * production tokenizer trainer do the same): BPE merge decisions depend
  * only on `word → count`, so the corpus contributes exactly ONE
  * aggregate (`explode(words) → groupBy(word).count`, partial-aggregated
  * map-side) regardless of corpus size. The capped vocabulary (top
  * `vocabCap` by count, ties on the word — deterministic total order) is
  * then a bounded small table — 100k words × ~10 chars — and the
  * iterative merge loop runs driver-side over it, the same
  * bounded-model-fit idiom as the PQ codebooks in
  * [[graft.sim.Similarity]]. 100 TB of text changes the cost of the one
  * aggregate, not the fit loop.
  *
  * Encode is scan-local: the merge table broadcasts inside the
  * expression ([[graft.plans.Expressions.BpeEncodeWords]] /
  * [[BpeTokenCountWords]]), each word is encoded once per executor and
  * memoized (Zipf: the hot vocabulary dominates), and no token ever
  * crosses the network.
  *
  * == Merge semantics (shared with the DuckDB oracle) ==
  *
  * Words are ASCII-alphabetic runs of `lower(text)` — the regex
  * `[a-z]+`, identical in Spark and DuckDB. A word's initial
  * representation is its character sequence (no end-of-word sentinel).
  * Each fit round counts ADJACENT SYMBOL PAIRS (sliding, so `a a a`
  * contains `(a,a)` twice) weighted by word count, picks the most
  * frequent pair (ties: lexicographically smallest `(left, right)`), and
  * merges it GREEDILY LEFT-TO-RIGHT in every word — canonical BPE, where
  * a run of k consecutive match positions merges at even offsets
  * (`aaaa` + `(a,a)` → `aa aa`, `banana` + `(a,n)` → `b an an a`). The
  * oracle replays the fit stage-by-stage in SQL (pair counting via
  * list unnest, greedy overlap resolution via a gaps-and-islands parity
  * rule) and the encode via the fitted `word → symbols` table, so both
  * the merge table and the per-document encoding are engine-checked.
  */
object Bpe {

  /** The regex that defines a "word", shared verbatim with the oracle. */
  val WordRe = "[a-z]+"

  /** Lowercased ASCII-alphabetic words of `text`, in order. */
  def words(text: Column): Column =
    regexp_extract_all(lower(text), lit(WordRe), lit(0))

  /** Corpus word counts — the one corpus-sized aggregate of the fit. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** One greedy left-to-right merge pass of pair `(l, r)` over a symbol
    * sequence — canonical BPE application, the single definition shared
    * by the fit and the encode codec.
    */
  def mergePair(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Fit `numMerges` merges on the corpus' capped word-count table.
    * Deterministic: the vocabulary cap and every pair choice use total
    * orders (count desc, then lexicographic). Throws if the vocabulary
    * exhausts (no pair left to merge) before `numMerges` rounds — ask
    * for fewer merges rather than silently returning a short table.
    */
  def fit(df: DataFrame, textCol: String, numMerges: Int,
          vocabCap: Int = 100000): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be positive, got $numMerges")
    require(vocabCap >= 1, s"vocabCap must be positive, got $vocabCap")
    val wc = wordCounts(df, textCol)
      .orderBy(col("cnt").desc, col("w"))
      .limit(vocabCap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    fitOnCounts(wc.toSeq, numMerges)
  }

  /** The driver-side merge loop over an already-aggregated word-count
    * table (bounded: `vocabCap` entries).
    */
  def fitOnCounts(wordCnt: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var reps: Array[(Array[String], Long)] =
      wordCnt.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    while (k < numMerges) {
      val pc = new java.util.HashMap[(String, String), Long]()
      reps.foreach { case (s, c) =>
        var i = 0
        while (i < s.length - 1) {
          val key = (s(i), s(i + 1))
          // one lookup, no hidden null-unboxing: the get+containsKey form
          // only worked because unboxing a null Long happens to yield 0
          pc.merge(key, c, (a, b) => a + b)
          i += 1
        }
      }
      require(!pc.isEmpty,
        s"BPE vocabulary exhausted after $k merges — requested $numMerges")
      var best: (String, String) = null
      var bestC = -1L
      val it = pc.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val p = e.getKey; val c = e.getValue
        if (c > bestC || (c == bestC &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      }
      merges += best
      reps = reps.map { case (s, c) => (mergePair(s, best._1, best._2), c) }
      k += 1
    }
    merges.result()
  }

  /** The merge table as a DataFrame `(merge_rank, lhs, rhs, merged)` —
    * rank is 1-based application order.
    */
  def mergesDf(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, l + r) }
      .toDF("merge_rank", "lhs", "rhs", "merged")
  }

  /** Scan-local word encoder: applies the merge table in rank order,
    * memoizing per word (concurrent, capped — beyond the cap it computes
    * without caching; correctness never depends on the memo).
    */
  final class Codec(val merges: Seq[(String, String)]) extends Serializable {
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    private val MemoCap = 1 << 16

    def encodeWord(w: String): Array[String] = {
      val hit = memo.get(w)
      if (hit != null) return hit
      var syms = w.map(_.toString).toArray
      merges.foreach { case (l, r) =>
        // cheap guard: a merge can only fire if both sides are present
        if (syms.length > 1) syms = mergePair(syms, l, r)
      }
      if (memo.size < MemoCap) memo.put(w, syms)
      syms
    }

    def countWord(w: String): Int = encodeWord(w).length
  }

  /** BPE tokens of `text` (flattened across words), as a Column. */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    graft.plans.Expressions.bpe_encode_words(words(text), merges)

  /** BPE token count of `text`, as a Column — the packing/budget hot
    * path (no token array materialized).
    */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    graft.plans.Expressions.bpe_token_count_words(words(text), merges)
}
