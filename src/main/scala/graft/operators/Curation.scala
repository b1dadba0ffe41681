package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain-level corpus curation (builder north-star scope; no
  * counterpart in the reference) — the provenance-side half of web-scale
  * training-data cleaning, complementing the content-side operators in
  * `text/TextMetrics` and `dedup/Dedup`:
  *
  *  - [[normalizeUrl]]: canonical URL form so the same page fetched under
  *    cosmetic variants (case, default ports, tracking params, fragments,
  *    trailing slashes) keys identically for dedup and caps.
  *  - [[registeredDomain]]: the eTLD+1-style grouping key (exact label
  *    arithmetic with a built-in multi-label-suffix set — a full public
  *    suffix list drops in as data, not code).
  *  - [[domainCap]]: at most `cap` documents per registered domain,
  *    deterministically chosen — the anti-domination step (C4/RefinedWeb
  *    style) that stops one crawl-heavy site from owning the corpus.
  *  - [[blockDomains]] / [[blockDomainsDf]]: blocklist filtering, scan-
  *    local for literal lists, broadcast anti-join for table-sized ones.
  *
  * Everything is pure `Column` expressions (codegen'd, scan-local) except
  * the cap's per-domain rank, which plans partial+final WindowGroupLimit —
  * each input partition ships at most `cap` rows per domain into the one
  * shuffle, the property that keeps domain capping viable at 100 TB.
  */
object Curation {

  /** Canonical URL form. Rules (each replayable from first principles by
    * an external checker):
    *   1. scheme and host[:port] lowercase;
    *   2. default ports stripped (`:80` for http, `:443` for https);
    *   3. fragment dropped;
    *   4. tracking query params dropped (utm_*, fbclid, gclid, msclkid,
    *      ref), separators tidied, empty query dropped;
    *   5. trailing slashes of the path dropped (root included:
    *      `http://h/` → `http://h`).
    * Non-URL input (no `scheme://`) normalizes to an empty-host form and
    * is the caller's filter concern — garbage provenance should be
    * dropped by a WHERE, not crash the scan.
    */
  def normalizeUrl(url: Column): Column = {
    // r18 opt: the whole scheme+host[:port] head is ONE capture and the
    // default-port strip ONE alternation replace keyed on the scheme
    // INSIDE the captured string — the input column is referenced 3×
    // total (head twice via the garbage passthrough, rest once), down
    // from ~7×. Reference count is the cost that matters here: Catalyst
    // inlines projections, so every reference re-expands whatever
    // expression produced `url`, and a downstream domain filter squared
    // that again — q_url_curation spent 430 ms/run in the blow-up (see
    // hostOf's codegen note; measured in OPTIMIZATION_r18.md).
    val head0 = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    val head = regexp_replace(head0,
      "^(http://[^/?#]*):80$|^(https://[^/?#]*):443$", "$1$2")
    // path+query with the fragment already excluded by the capture
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    // anchored at a separator via lookbehind: an unanchored name would
    // also match the TAIL of innocent params ('href=foo' ends in 'ref=foo')
    // and path segments ('/a/ref=x?b=1' — where [^&#]* even crosses the
    // '?'), corrupting real queries; the lookbehind keeps the '?'/'&'
    // intact so the separator tidies below see the canonical shape
    val noTrack = regexp_replace(rest,
      "(?i)(?<=[?&])(?:utm_[a-z0-9_]+|fbclid|gclid|msclkid|ref)=[^&#]*&?", "")
    val tidied = regexp_replace(regexp_replace(noTrack, "\\?&", "?"), "[?&]+$", "")
    val noSlash = regexp_replace(tidied, "/+(\\?|$)", "$1")
    // non-URL input (no scheme://) has no head and keeps normalizing to
    // the historical "://" form — garbage is the caller's WHERE concern
    concat(when(head === "", lit("://")).otherwise(head), noSlash)
  }

  /** Host (without port) of an already-lowercased URL or host:port.
    * ONE regex that references its input ONCE: an optional scheme prefix,
    * then everything up to the first `/ ? # :`. Column-composition
    * discipline matters here — a when/contains form referenced the url
    * subtree three times, and because Catalyst inlines projections, a
    * composed pipeline (normalize → host → domain) multiplied those
    * references into a >64 KB codegen method that silently fell back to
    * interpreted eval (and paid a failed janino compile per stage).
    */
  def hostOf(url: Column): Column =
    // the optional userinfo group ('user[:pw]@', RFC 3986 §3.2.1) is
    // stripped BEFORE the host capture: without it 'http://foo@spam.com/'
    // grouped under 'foo@spam.com' (blocklist bypass, cap evasion) and
    // 'user:pw@host' truncated at the ':' to 'user'. The class excludes
    // '/?#' so an '@' later in the path/query can never be mistaken for
    // userinfo.
    regexp_extract(url,
      "^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?#:]*)", 1)

  /** Multi-label public suffixes the label arithmetic must not split —
    * the common core; swap in the full public suffix list as a broadcast
    * table for production crawls.
    */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tw", "co.nz", "com.sg", "com.ar", "co.za")

  /** Registered domain (eTLD+1 analog): the last two host labels, or the
    * last three when the two-label tail is a known multi-label suffix.
    * A bare or single-label host passes through unchanged.
    *
    * One anchored regex whose alternation tries the multi-label suffixes
    * before the generic label — the input is referenced ONCE (the
    * substring_index/isin form referenced it three times; see [[hostOf]]
    * for why that multiplies into a codegen blowup in composed plans),
    * with a single extra reference for the no-dot passthrough.
    */
  def registeredDomain(host: Column): Column = {
    val suffixAlt = MultiLabelSuffixes.map(_.replace(".", "\\.")).mkString("|")
    // r18 opt: the bare-host passthrough moved INTO the alternation
    // (label.multisuffix, then label.label, then bare label — leftmost
    // match picks the same value the former when(ext === "", host) did),
    // so the input is referenced ONCE. The passthrough's second host
    // reference doubled the whole upstream url expression wherever this
    // composes over an inlined normalizeUrl (see the codegen note above).
    regexp_extract(host, s"([^.]+\\.(?:$suffixAlt)|[^.]+\\.[^.]+|[^.]+)$$", 1)
  }

  /** Keep at most `cap` rows per registered domain, deterministically:
    * rank within the domain by md5(salt:tieBreaker) — content-hash order,
    * so reruns, engine changes and cluster sizes all keep the same rows
    * (`rand()` keeps none of that). Adds `domain` and `domain_rank`
    * columns. One shuffle; partial WindowGroupLimit bounds what each
    * input partition ships to `cap` rows per domain.
    */
  def domainCap(df: DataFrame, urlCol: String, tieBreaker: String,
                cap: Int, salt: String = "graft"): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val domain = registeredDomain(hostOf(lower(col(urlCol))))
    val order = md5(concat_ws(":", lit(salt), col(tieBreaker).cast("string")))
    val w = Window.partitionBy(col("domain")).orderBy(order, col(tieBreaker))
    df.withColumn("domain", domain)
      .withColumn("domain_rank", row_number().over(w))
      .where(col("domain_rank") <= cap)
  }

  /** Drop rows whose registered domain is in a LITERAL blocklist — a
    * scan-local codegen'd `IN`, zero shuffle, for the small curated lists
    * (spam/adult/SEO domains) every pipeline carries.
    */
  def blockDomains(df: DataFrame, urlCol: String,
                   blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist: nothing to filter")
    df.where(!registeredDomain(hostOf(lower(col(urlCol))))
      .isin(blocked.map(_.toLowerCase): _*))
  }

  /** Table-sized blocklists (millions of domains): broadcast LEFT ANTI
    * join on the registered domain — the corpus side never shuffles.
    */
  def blockDomainsDf(df: DataFrame, urlCol: String,
                     blocklist: DataFrame, blockCol: String): DataFrame =
    df.withColumn("__domain",
        registeredDomain(hostOf(lower(col(urlCol)))))
      .join(broadcast(blocklist.select(lower(col(blockCol)).as("__domain"))),
        Seq("__domain"), "left_anti")
      .drop("__domain")
}
