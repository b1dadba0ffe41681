package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the large-scale training-data pipeline
  * scope (builder north star; additive to the reference).
  *
  * Everything here is a pure `Column` expression — whole-stage codegen,
  * no UDFs — so the operators run at scan speed over 100 TB of documents.
  */
object TextMetrics {

  /** Whitespace tokens (collapsing runs), the shared tokenizer: the
    * non-whitespace runs of the text, in order. split + empty-filter,
    * NOT split(trim(…), "\\s+") — Spark's `trim` strips SPACES only and
    * `split` keeps leading/trailing empties, so the old form produced
    * PHANTOM "" tokens for any text with edge tabs/newlines
    * (`tokens("hello\n")` read `["hello", ""]` — caught by
    * TextMetricsFuzzSpec; trailing newlines are ubiquitous in crawled
    * text). The filter drops exactly the ≤2 edge empties split can emit,
    * so blank text yields an EMPTY array, never `[""]`. (Measured ~15%
    * cheaper than the regexp_extract_all("\\S+") equivalent on the
    * token-heavy gate queries — split's matcher emits substrings
    * directly, extract_all walks a full find() loop.)
    *
    * The whitespace class is PINNED to Java's `\s` = `[ \t\n\x0B\f\r]`,
    * including `\x0B` (vertical tab). The DuckDB oracles spell that class
    * out explicitly (queries/), because RE2's `\s` EXCLUDES `\x0B` — a
    * `\x0B`-bearing document would otherwise tokenize differently
    * engine-vs-oracle (the phantom-class divergence the r15 fuzz program
    * hunted). TextMetricsFuzzSpec carries `\x0B` inputs to keep the
    * engine side of the contract honest.
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** True for empty or ANY-whitespace-only text (tabs/newlines included —
    * `trim(text) === ""` missed those; see [[tokens]]).
    */
  def isBlank(text: Column): Column = !text.rlike("\\S")

  def tokenCount(text: Column): Column =
    when(isBlank(text), 0).otherwise(size(tokens(text)))

  /** BPE-ish subword proxy: alphabetic runs, digit runs, and single
    * non-alnum marks each count as one token.
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))

  /** Fraction of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double")
        / length(text))

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** Fraction of tokens that are stopwords — high values indicate natural
    * prose, near-zero indicates keyword soup/boilerplate.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnStopwords): Column = {
    val t = tokens(text)
    when(isBlank(text), 0.0)
      .otherwise(size(filter(t, x => x.isInCollection(stopwords))).cast("double") / size(t))
  }

  /** Mean token length in characters (whitespace excluded). */
  def meanTokenLength(text: Column): Column = {
    val t = tokens(text)
    when(isBlank(text), 0.0)
      .otherwise(length(regexp_replace(text, "\\s", "")).cast("double") / size(t))
  }

  /** Composite quality score in [0,1]: length (log-scaled) + low punct +
    * healthy stopword density. Deterministic and SQL-expressible so the
    * DuckDB oracle can replicate it bit-for-bit.
    */
  def qualityScore(text: Column): Column = {
    val lengthTerm = least(log10(tokenCount(text).cast("double") + 1) / 3.0, lit(1.0))
    val punctTerm = lit(1.0) - punctRatio(text)
    val stopTerm = least(stopwordRatio(text) * 4.0, lit(1.0))
    // blank documents are worthless regardless of the component terms
    when(isBlank(text), 0.0).otherwise(
      greatest(lit(0.0), least(lit(1.0),
        lengthTerm * 0.3 + punctTerm * 0.4 + stopTerm * 0.3)))
  }

  /** Marker-word profiles for the n-gram/stopword language-ID heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "un"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不")
  )

  /** Language ID: count marker-word hits per profile, take the argmax with
    * ties broken by profile order; no hits → "und". A heuristic, not a
    * model — the point is a deterministic, cheap, scan-local classifier.
    */
  def langId(text: Column, profiles: Seq[(String, Seq[String])] = LangProfiles): Column = {
    val t = tokens(text)
    val scores = profiles.map { case (lang, words) =>
      lang -> size(filter(t, x => x.isInCollection(words)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
  }

  /** Content fingerprint: md5 over the sorted distinct token set — robust
    * to word order and duplication, the cheap exact-clustering key
    * (cf. SimHash/MinHash in [[graft.dedup.Dedup]] for near-dup keys).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(lower(text))))))

  /** Normalization used before exact dedup: lowercase, strip punctuation,
    * collapse whitespace.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** [[tokens]] over [[normalize]]d text. (Historically this carried an
    * explicit empty-array guard against the `split("") == [""]` phantom;
    * [[tokens]] is now blank-safe by construction — split + empty-filter
    * — so the composition is enough.)
    */
  def normTokens(text: Column): Column = tokens(normalize(text))

  // ---- Repetition metrics (Gopher-style quality rules): the filters a
  // training-data pipeline applies before any dedup pass — documents that
  // repeat themselves are low-value regardless of near-duplicates
  // elsewhere. All three are scan-local pure-Column arithmetic over the
  // token array: no shuffle, no UDF, no per-doc state.

  /** Fraction of word occurrences that are repeats of an earlier word:
    * `1 − |distinct| / |words|`. Blank → 0.
    */
  def dupWordFrac(text: Column): Column = {
    val t = tokens(lower(text))
    when(isBlank(text), 0.0)
      .otherwise(lit(1.0) - size(array_distinct(t)).cast("double") / size(t))
  }

  /** Same, over adjacent word bigrams — catches phrase-level loops that
    * word-level stats miss. Fewer than 2 words → 0.
    */
  def dupBigramFrac(text: Column): Column = {
    val t = tokens(lower(text))
    val n = size(t)
    val bigrams = transform(sequence(lit(1), n - 1),
      i => concat(element_at(t, i), lit(" "), element_at(t, i + 1)))
    when(isBlank(text) || n < 2, 0.0)
      .otherwise(lit(1.0) -
        size(array_distinct(bigrams)).cast("double") / (n - 1).cast("double"))
  }

  /** Share of the document taken by its single most frequent word — the
    * classic keyword-stuffing detector. Computed as the longest equal run
    * of the SORTED token array via one `aggregate` fold (still
    * scan-local; no explode/groupBy shuffle per document). Blank → 0.
    */
  def topWordFrac(text: Column): Column = {
    val t = array_sort(tokens(lower(text)))
    val best = aggregate(
      t,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val newRun = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), newRun.as("run"),
          greatest(acc.getField("best"), newRun).as("best"))
      },
      acc => acc.getField("best"))
    when(isBlank(text), 0.0).otherwise(best.cast("double") / size(t))
  }

  // ---- C4-style line-level cleaning (Raffel et al. 2020 §2.2, public):
  // the page-structure filters applied before quality scoring and dedup.
  // Pure Column expressions over the line array — scan-local at 100 TB.

  /** C4 line keep-rule: the trimmed line ends in terminal punctuation
    * (skippable via `requirePunct` for corpora without sentence structure),
    * has at least `minWords` whitespace words, and does not mention
    * javascript (case-insensitive).
    */
  def c4KeepLine(line: Column, minWords: Int = 5,
                 requirePunct: Boolean = true): Column = {
    val t = trim(line)
    val punctOk =
      if (requirePunct) substring(t, -1, 1).isin(".", "!", "?", "\"")
      else lit(true)
    // tokens(), not split(trim, "\s+"): the latter counts phantom ""
    // tokens on edge-whitespace lines (see the tokens() note above)
    punctOk && size(tokens(line)) >= minWords &&
      !lower(t).contains("javascript")
  }

  /** Lines of a page that survive [[c4KeepLine]]. */
  def c4CleanLines(text: Column, minWords: Int = 5,
                   requirePunct: Boolean = true): Column =
    filter(split(text, "\n"), l => c4KeepLine(l, minWords, requirePunct))

  /** C4 page drop-rule: fewer than `minKeptLines` surviving lines, or the
    * page mentions "lorem ipsum" (case-insensitive) or contains a curly
    * brace (code markers).
    */
  def c4DropPage(text: Column, minWords: Int = 5, minKeptLines: Int = 3,
                 requirePunct: Boolean = true): Column =
    size(c4CleanLines(text, minWords, requirePunct)) < minKeptLines ||
      lower(text).contains("lorem ipsum") || text.contains("{")

  // ---- PII detection / redaction (the Dolma/C4-style scrub step) ----
  //
  // Patterns are deliberately portable between Java's regex engine and
  // RE2 (no backrefs, no lookaround, ASCII \d and \b), so an external
  // oracle replays detection AND the redacted bytes identically.
  // Conservative by design — precision over recall: a false redaction
  // destroys training text, a miss is caught by the next pipeline stage.

  /** RFC-ish email addresses (the practical 99% form). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style phone numbers with - or . separators (555-010-0042). */
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Dotted-quad IPv4 literals. */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Match counts per PII class on the RAW text (detection runs before
    * redaction; all three are scan-local Column arithmetic).
    */
  def piiEmailCount(text: Column): Column = size(regexp_extract_all(text, lit(EmailRe), lit(0)))
  def piiPhoneCount(text: Column): Column = size(regexp_extract_all(text, lit(PhoneRe), lit(0)))
  def piiIpv4Count(text: Column): Column = size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))

  /** Corpus unigram counts over lowercased whitespace tokens — the model
    * side of [[meanTokenLogProb]]. One explode + one shuffle.
    */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    // blank docs contribute no tokens (tokens() is blank-safe) — the
    // filter just skips building explode rows for them
    df.where(!isBlank(col(textCol)))
      .select(explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))

  /** Per-document mean token log-probability under the corpus's own
    * unigram distribution — the cheap stand-in for perplexity filtering
    * (a document whose tokens are systematically improbable under the
    * corpus is boilerplate, another language, or noise; threshold on this
    * column to drop it). Plan shape: explode → join the unigram model →
    * one groupBy per doc. The model is broadcast when `broadcastVocab`
    * (right for vocabularies up to a few million entries — a
    * multi-ten-million-row model hits the driver collect and the 8 GB
    * broadcast cap at exactly the corpus scale this targets); disable it
    * to let the join shuffle for huge vocabularies, the plan stays valid.
    */
  def meanTokenLogProb(df: DataFrame, idCol: String, textCol: String,
                       broadcastVocab: Boolean = true): DataFrame = {
    val vocab = unigramCounts(df, textCol)
    val model = vocab.crossJoin(vocab.agg(sum(col("n")).as("_total")))
      .select(col("token"), log(col("n") / col("_total")).as("_logp"))
    val side = if (broadcastVocab) broadcast(model) else model
    // blank docs are EXCLUDED, not scored: a whitespace-only page has no
    // tokens, and the phantom "" token would otherwise give it n_tokens=1
    // and a plausible mean_logprob — a perplexity filter must see no row
    df.where(!isBlank(col(textCol)))
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
      .join(side, Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), avg(col("_logp")).as("mean_logprob"))
  }

  /** Corpus bigram counts over the SAME token stream as [[unigramCounts]]
    * (lowercased whitespace tokens): one row per adjacent `(prev, cur)`
    * pair occurrence, counted. The pair construction is scan-local array
    * arithmetic (no per-token row carries the whole document), then one
    * explode + one shuffle — the model side of [[interpolatedLogProb]].
    */
  def bigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(tokens(lower(col(textCol))).as("w"))
      .where(size(col("w")) >= 2)
      .select(explode(transform(sequence(lit(2), size(col("w"))),
        i => struct(element_at(col("w"), i - 1).as("prev"),
          element_at(col("w"), i).as("cur")))).as("bg"))
      .groupBy(col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      .agg(count(lit(1)).as("n"))

  /** Per-document mean token log-probability under an INTERPOLATED
    * unigram+bigram model fit on the corpus itself — the upgrade over
    * [[meanTokenLogProb]]'s pure-unigram stand-in: a document whose token
    * SEQUENCE is improbable (not just its token bag) scores low, which is
    * what separates shuffled boilerplate from coherent text.
    *
    * Model: `P(cur|prev) = λ·c(prev,cur)/c(prev,·) + (1−λ)·c(cur)/N` for
    * tokens with a predecessor; the document-initial token scores
    * `ln c(cur)/N` (no conditioning context). Fit = two groupBys
    * ([[unigramCounts]], [[bigramCounts]]); scoring = scan-local pair
    * construction + one join per model order + one groupBy per doc. Both
    * models broadcast when `broadcastModel` (same few-million-entry
    * guidance as [[meanTokenLogProb]]); disable to shuffle-join for huge
    * vocabularies.
    *
    * The model is always fit on `df` itself (there is no pre-fit-model
    * parameter), so every scored token and bigram was observed during the
    * fit: the inner unigram join never drops a token and the bigram
    * coalesce-to-zero branch is defensive, not a cross-corpus OOV
    * strategy. Scoring a different corpus against a stored model would
    * additionally need an explicit OOV floor (and `λ < 1`, or an unseen
    * bigram yields `ln 0`); that is deliberately out of scope here.
    */
  def interpolatedLogProb(df: DataFrame, idCol: String, textCol: String,
                          lambda: Double = 0.7,
                          broadcastModel: Boolean = true): DataFrame = {
    val uni = unigramCounts(df, textCol)
    val uniP = uni.crossJoin(uni.agg(sum(col("n")).as("_total")))
      .select(col("token").as("cur"), (col("n") / col("_total")).as("_puni"))
    val big = bigramCounts(df, textCol)
    val bigP = big.join(big.groupBy(col("prev")).agg(sum(col("n")).as("_np")), Seq("prev"))
      .select(col("prev"), col("cur"), (col("n") / col("_np")).as("_pbi"))
    val (u, b) = if (broadcastModel) (broadcast(uniP), broadcast(bigP)) else (uniP, bigP)
    val tok = df
      .where(!isBlank(col(textCol))) // same exclusion as meanTokenLogProb
      .select(col(idCol), tokens(lower(col(textCol))).as("w"))
      .select(col(idCol), explode(transform(sequence(lit(1), size(col("w"))),
        i => struct(element_at(col("w"), i).as("cur"),
          when(i > 1, element_at(col("w"), i - 1)).as("prev")))).as("t"))
      .select(col(idCol), col("t.cur").as("cur"), col("t.prev").as("prev"))
    tok.join(u, Seq("cur"))
      .join(b, Seq("prev", "cur"), "left")
      .withColumn("_lp",
        when(col("prev").isNull, log(col("_puni")))
          .otherwise(log(lit(lambda) * coalesce(col("_pbi"), lit(0.0))
            + lit(1 - lambda) * col("_puni"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), avg(col("_lp")).as("mean_logprob"))
  }

  /** Replace every PII match with a typed placeholder token. Emails go
    * first (an address can embed digit runs); the phone and IPv4 classes
    * cannot overlap each other (3 separators vs 2). Pure `regexp_replace`
    * chain — codegen'd, no UDF, no shuffle.
    */
  def redactPii(text: Column,
                emailToken: String = "<EMAIL>",
                phoneToken: String = "<PHONE>",
                ipToken: String = "<IP>"): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, emailToken),
        PhoneRe, phoneToken),
      Ipv4Re, ipToken)

  /** Top-k characteristic terms per document by smoothed TF-IDF
    * (`tf × (ln((N+1)/(df+1)) + 1)`, the sklearn smoothing so df = N
    * still scores positive) over the [[normalize]]d token stream —
    * keyword extraction / topic fingerprinting for corpus curation.
    * Ties break on the term itself, so the output is deterministic and
    * engine-reproducible.
    *
    * Scale: term frequencies are computed ROW-LOCALLY by the fused
    * [[graft.plans.Expressions.TokenCounts]] kernel (one char scan →
    * map(term → tf), no `groupBy(id, term)` — the token stream never
    * crosses the network); document frequencies are one partial aggregate
    * over the already-distinct (doc, term) pairs; the doc-count side is
    * one broadcast scalar; the final top-k is a rank-limited window per
    * doc, which Spark executes with partial `WindowGroupLimit` pushdown
    * (only k rows per doc survive to the shuffle — the same plan shape
    * pinned for `q_topk_docs`). The tf⋈df join shuffles distinct
    * (doc, term) pairs once; AQE converts it to broadcast when the
    * vocabulary is small.
    *
    * The single-tokenize alternative — df as `count(*) over (partition
    * by term)` on one exploded stream — was MEASURED SLOWER (13.9 s vs
    * 9.6 s at the 404k-doc probe): the window ships every (doc, term)
    * pair through one un-combinable shuffle, while this shape's second
    * tokenize feeds a map-side-combined groupBy whose result AQE
    * broadcasts. Re-scan beats re-shuffle whenever vocabulary ≪ corpus —
    * the 100 TB regime too, where shuffle volume costs network + 2× disk
    * against a column-pruned rescan.
    */
  def tfIdfTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = df.select(col(idCol).as("id"),
      explode(graft.plans.Expressions.token_counts(col(textCol)))
        .as(Seq("term", "tf")))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("tf_idf").desc, col("term"))
    tf.join(dfreq, Seq("term")).crossJoin(broadcast(nDocs))
      .withColumn("tf_idf",
        col("tf") * (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id"), col("term"), col("tf"), col("df"),
        col("tf_idf"), col("rank"))
  }
}
