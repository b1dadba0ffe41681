package graft.queries

import graft.dedup.Dedup
import graft.model.Tables
import graft.operators.Curation
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
    }),
    // Provenance-side curation over deterministic MESSY synthetic URLs
    // (mixed-case scheme/host, default + non-default ports, tracking
    // params, fragments, trailing slashes — every rule normalizeUrl
    // owns): normalize → blocklist → per-domain cap. The oracle derives
    // the EXPECTED canonical URL from the clean construction parts — a
    // first-principles check of the normalizer, not a regex replay — and
    // the domain grouping from (source, suffix) directly, checking the
    // label-arithmetic extraction against ground truth.
    "q_url_curation" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // suffix keyed on doc_id DIV 20, NOT doc_id % 4: source is
      // doc_id % 20, so a %4 suffix would be fully correlated with it
      // (one domain per source — and the blocklist would match nothing)
      val suffix = element_at(
        typedLit(Seq("com", "co.uk", "org", "com.au")),
        (expr("doc_id DIV 20") % 4 + 1).cast("int"))
      val scheme = when(col("doc_id") % 3 === 0, lit("HTTPS")).otherwise(lit("http"))
      val port = when(col("doc_id") % 7 === 0, lit(":8080"))
        .when(col("doc_id") % 5 === 0,
          when(col("doc_id") % 3 === 0, lit(":443")).otherwise(lit(":80")))
        .otherwise(lit(""))
      val path = concat(lit("/a/"), col("doc_id") % 13,
        when(col("doc_id") % 2 === 1, lit("/")).otherwise(lit("")))
      val query = when(col("doc_id") % 3 === 0,
          concat(lit("?utm_source=x&id="), col("doc_id")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("?id="), col("doc_id"), lit("&utm_campaign=y&gclid=z")))
        .otherwise(lit(""))
      val frag = when(col("doc_id") % 4 === 0, lit("#Frag")).otherwise(lit(""))
      val withUrls = docs.select(col("doc_id"),
        concat(scheme, lit("://WWW"), col("doc_id") % 5, lit("."),
          upper(col("source")), lit("."), suffix, port, path, query, frag)
          .as("raw_url"))
        .withColumn("url", Curation.normalizeUrl(col("raw_url")))
      val blocked = Curation.blockDomains(withUrls, "url",
        Seq("src3.com", "src7.co.uk"))
      Curation.domainCap(blocked, "url", tieBreaker = "doc_id",
          cap = 3, salt = "cap")
        .select(col("domain"), col("domain_rank").cast("long").as("rank"),
          col("doc_id"), col("url"))
    })
  )

  private val toks = """regexp_extract_all(text, '[^ \t\n\x0b\f\r]+')"""
  private val stopList = TextMetrics.EnStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
  private val norm =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 \t\n\x0b\f\r]', ' ', 'g'), '[ \t\n\x0b\f\r]+', ' ', 'g'))"""

  def oracles: Map[String, String] = Map(
    "q_curation_pipeline" ->
      s"""WITH scored AS (
         |  SELECT doc_id, source,
         |    len($toks) AS n_tokens,
         |    CASE WHEN NOT regexp_matches(text, '[^ \\t\\n\\x0b\\f\\r]') THEN 0.0 ELSE greatest(0.0, least(1.0,
         |      least(log10(len($toks) + 1.0) / 3.0, 1.0) * 0.3
         |      + (1.0 - CASE WHEN len(text) = 0 THEN 0.0
         |          ELSE len(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\x0b\\f\\r]', '', 'g')) * 1.0
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
         |GROUP BY 1""".stripMargin,
    "q_url_curation" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 3 = 0 THEN 'https' ELSE 'http' END AS scheme,
        |    'www' || (doc_id % 5) || '.' || source || '.' ||
        |      CASE (doc_id // 20) % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
        |                              WHEN 2 THEN 'org' ELSE 'com.au' END AS host,
        |    CASE WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END AS keptport,
        |    '/a/' || (doc_id % 13) AS path,
        |    CASE WHEN doc_id % 3 IN (0, 1) THEN '?id=' || doc_id ELSE '' END AS q,
        |    source || '.' ||
        |      CASE (doc_id // 20) % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
        |                              WHEN 2 THEN 'org' ELSE 'com.au' END AS domain
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, domain,
        |         scheme || '://' || host || keptport || path || q AS url
        |  FROM u
        |  WHERE domain NOT IN ('src3.com', 'src7.co.uk')),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY domain
        |             ORDER BY md5('cap:' || doc_id), doc_id) AS rank
        |  FROM n)
        |SELECT domain, rank, doc_id, url FROM r WHERE rank <= 3""".stripMargin
  )
}
