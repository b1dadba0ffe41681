package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → training text: main-content extraction (builder north-star
  * scope; no counterpart in the reference) — the step between the WARC
  * front door (`ingest/Warc`) and the text-curation operators, in the
  * spirit of the public boilerplate-removal literature (jusText,
  * Arc90/readability, trafilatura): segment the page into block-level
  * chunks, score each by text length and LINK DENSITY (anchor-text chars
  * / total chars), and keep the content-dense blocks. Navigation bars,
  * footers, related-links boxes are short and anchor-heavy; body prose
  * is long and anchor-light.
  *
  * Everything is pure `Column` expressions over one input reference —
  * scan-local, zero shuffle, safe inside any composed curation plan.
  * (Single-reference discipline per `operators/Curation.hostOf`: these
  * feed pipelines that Catalyst inlines.)
  *
  * Documented limits (shared with every regex-level extractor): tags are
  * recognized syntactically (no DOM), so an `<a>` span that crosses a
  * block boundary counts its chars only in the segment holding the open
  * tag's text, and attribute values containing `>` mis-split that tag.
  * Malformed-markup pages degrade to keeping more text, never to
  * crashing the scan.
  */
object HtmlExtract {

  /** Block-level elements whose tags delimit candidate text segments. */
  val BlockTags: String =
    "p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|caption|" +
      "section|article|main|header|footer|nav|aside|blockquote|pre|" +
      "figure|figcaption|form|fieldset|hr|br"

  private val blockSplit = s"(?i)</?(?:$BlockTags)\\b[^>]*>"

  /** Remove the parts that are never content: comments, `<script>` and
    * `<style>` elements INCLUDING their bodies. Each element has its own
    * non-greedy pattern (no backreferences — replayable under RE2-class
    * engines too). Unclosed script/style bodies fall through to tag
    * stripping (degrade-to-more-text).
    */
  def dropNonContent(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript =
      regexp_replace(noComment, "(?is)<script\\b[^>]*>.*?</script>", " ")
    regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
  }

  /** Decode the entities that matter for corpus text. `&amp;` is decoded
    * LAST so `&amp;lt;` yields the literal `&lt;` (no double decode).
    */
  def decodeEntities(s: Column): Column = {
    val e1 = regexp_replace(s, "&lt;", "<")
    val e2 = regexp_replace(e1, "&gt;", ">")
    val e3 = regexp_replace(e2, "&quot;", "\"")
    val e4 = regexp_replace(e3, "&#39;", "'")
    val e5 = regexp_replace(e4, "&nbsp;", " ")
    regexp_replace(e5, "&amp;", "&")
  }

  /** Tags → nothing, entities decoded, whitespace collapsed, trimmed. */
  def stripTags(fragment: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_replace(fragment, "<[^>]*>", " ")),
      "\\s+", " "))

  /** Characters of anchor text within one segment (the link-density
    * numerator): every `<a …>…</a>` span's tag-stripped, whitespace-
    * collapsed length, summed.
    */
  def anchorChars(fragment: Column): Column =
    aggregate(
      regexp_extract_all(fragment, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)),
      lit(0),
      (acc, a) => acc + length(trim(regexp_replace(
        regexp_replace(a, "<[^>]*>", " "), "\\s+", " "))))

  /** `<title>` text, or empty string when absent. */
  def title(html: Column): Column =
    stripTags(regexp_extract(html, "(?is)<title\\b[^>]*>(.*?)</title>", 1))

  /** The kept content blocks, in document order: segments with at least
    * `minChars` of stripped text whose link density (anchor chars /
    * text chars) is at most `maxLinkDensity`.
    */
  def contentBlocks(html: Column, minChars: Int = 25,
                    maxLinkDensity: Double = 0.15): Column = {
    val segs = split(dropNonContent(html), blockSplit)
    val scored = transform(segs, seg =>
      struct(stripTags(seg).as("txt"), anchorChars(seg).as("achars")))
    val kept = filter(scored, b =>
      length(b.getField("txt")) >= minChars &&
        b.getField("achars").cast("double") <=
          length(b.getField("txt")).cast("double") * maxLinkDensity)
    transform(kept, _.getField("txt"))
  }

  /** Main content as one newline-joined string — the training-text
    * column a curation pipeline feeds into langid/quality/dedup.
    *
    * Backed by the fused kernel ([[mainContentKernel]] via a native
    * expression): the composed HOF form evaluates its density lambda
    * interpreted per segment, which made the end-to-end pipeline breach
    * the bench gate (q_web_pipeline max 2.17 s; the kernel form is the
    * same page walk in one JVM pass). [[mainContentComposed]] keeps the
    * Column-algebra twin; HtmlExtractSpec pins their equality on every
    * adversarial case.
    */
  def mainContent(html: Column, minChars: Int = 25,
                  maxLinkDensity: Double = 0.15): Column =
    graft.plans.Expressions.html_main_content(html, minChars, maxLinkDensity)

  /** The pure-Column twin of [[mainContent]] — same semantics, built only
    * from `functions._` (no custom expression); the parity reference.
    */
  def mainContentComposed(html: Column, minChars: Int = 25,
                          maxLinkDensity: Double = 0.15): Column =
    array_join(contentBlocks(html, minChars, maxLinkDensity), "\n")

  // ---- fused kernel (same regex engine, same pattern strings, same
  // operation order as the Column forms above — the spec pins equality) --

  private val PComment = java.util.regex.Pattern.compile("(?s)<!--.*?-->")
  private val PScript =
    java.util.regex.Pattern.compile("(?is)<script\\b[^>]*>.*?</script>")
  private val PStyle =
    java.util.regex.Pattern.compile("(?is)<style\\b[^>]*>.*?</style>")
  private val PBlock = java.util.regex.Pattern.compile(blockSplit)
  private val PTag = java.util.regex.Pattern.compile("<[^>]*>")
  private val PWs = java.util.regex.Pattern.compile("\\s+")
  private val PAnchor =
    java.util.regex.Pattern.compile("(?is)<a\\b[^>]*>(.*?)</a>")

  private def collapseKernel(s: String): String =
    PWs.matcher(s).replaceAll(" ").trim

  private def decodeKernel(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")

  /** stripTags as a JVM kernel: tags → space, entities, collapse, trim. */
  def stripTagsKernel(fragment: String): String =
    collapseKernel(decodeKernel(PTag.matcher(fragment).replaceAll(" ")))

  private def anchorCharsKernel(fragment: String): Int = {
    val m = PAnchor.matcher(fragment)
    var n = 0
    while (m.find()) {
      val a = collapseKernel(PTag.matcher(m.group(1)).replaceAll(" "))
      // code points, not UTF-16 units: the Column twin counts via Spark's
      // length() = UTF8String.numChars, and supplementary characters
      // (emoji, CJK-ext) occupy two UTF-16 units — String.length would
      // diverge from the pinned kernel==composed parity on such pages
      n += a.codePointCount(0, a.length)
    }
    n
  }

  /** [[mainContent]] as one JVM pass (public so generated code and specs
    * can call it).
    */
  def mainContentKernel(html: String, minChars: Int,
                        maxLinkDensity: Double): String = {
    val cleaned = PStyle.matcher(
      PScript.matcher(
        PComment.matcher(html).replaceAll(" ")).replaceAll(" "))
      .replaceAll(" ")
    val segs = PBlock.split(cleaned, -1)
    val out = new StringBuilder
    var i = 0
    while (i < segs.length) {
      val txt = stripTagsKernel(segs(i))
      // code points (see anchorCharsKernel) — parity with the Column
      // twin's length() on supplementary-character pages
      val txtLen = txt.codePointCount(0, txt.length)
      if (txtLen >= minChars &&
          anchorCharsKernel(segs(i)).toDouble <=
            txtLen.toDouble * maxLinkDensity) {
        if (out.nonEmpty) out.append('\n')
        out.append(txt)
      }
      i += 1
    }
    out.toString
  }
}
