package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String, minChars: Int = 25,
                      maxLink: Double = 0.15): String =
    Seq(html).toDF("h")
      .select(HtmlExtract.mainContent(col("h"), minChars, maxLink))
      .as[String].head()

  private def titleOf(html: String): String =
    Seq(html).toDF("h").select(HtmlExtract.title(col("h"))).as[String].head()

  private val prose =
    "The quick brown fox jumps over the lazy dog near the river bank today."

  test("prose kept, nav/footer/script/style/comments dropped") {
    val html =
      s"""<html><head><title>T</title><style>p { color: red }</style></head>
         |<body><!-- boilerplate notice -->
         |<nav><a href="/">Home</a> <a href="/a">Archive</a></nav>
         |<p>$prose</p>
         |<script>var s = "<p>fake paragraph inside script</p>";</script>
         |<footer><a href="/c">contact</a></footer></body></html>""".stripMargin
    assert(extract(html) == prose)
  }

  test("link density drops a long but anchor-heavy related-links block") {
    val links = (1 to 8).map(i => s"""<a href="/$i">related article $i</a>""")
      .mkString("<div>", " ", "</div>")
    val html = s"<body>$links<p>$prose</p></body>"
    assert(extract(html) == prose)
    // same block with the anchors unwrapped is kept (density 0)
    val plain = (1 to 8).map(i => s"related article $i")
      .mkString("<div>", " ", "</div>")
    assert(extract(s"<body>$plain<p>$prose</p></body>")
      == (1 to 8).map(i => s"related article $i").mkString(" ") + "\n" + prose)
  }

  test("minChars drops short fragments; blocks join in document order") {
    val p2 = "A second paragraph with plenty of characters to clear the bar."
    val html = s"<body><p>ok</p><p>$prose</p><h2>$p2</h2></body>"
    assert(extract(html) == prose + "\n" + p2)
  }

  test("entities decode once, &amp; last") {
    val html = s"<p>$prose Fish &amp; chips &amp;lt; tag &nbsp; &quot;q&quot; &#39;a&#39;</p>"
    assert(extract(html) ==
      s"""$prose Fish & chips &lt; tag "q" 'a'""")
  }

  test("title extraction; absent title is empty") {
    assert(titleOf("<html><head><title> My  <b>Page</b> </title></head></html>")
      == "My Page")
    assert(titleOf("<html><body>no title</body></html>") == "")
  }

  test("unclosed anchor contributes zero anchor chars (degrades to keep)") {
    val html = s"""<p>$prose <a href="/x">dangling link text</p>"""
    assert(extract(html) == prose + " dangling link text")
  }

  test("whitespace collapses; attributes with tag names don't break strip") {
    val html = s"""<p   class="a">  $prose\t\n more   words here  </p>"""
    assert(extract(html) == prose + " more words here")
  }

  test("fused kernel ≡ composed Column form on every adversarial page " +
    "and the real-document wrap") {
    val pages = Seq(
      s"<html><head><title>T</title><style>p{}</style></head><body>" +
        s"<!-- c --><nav><a href='/'>Home</a></nav><p>$prose</p>" +
        s"<script>var s = \"<p>fake</p>\";</script></body></html>",
      (1 to 8).map(i => s"""<a href="/$i">related article $i</a>""")
        .mkString("<div>", " ", "</div>") + s"<p>$prose</p>",
      s"<p>$prose Fish &amp; chips &amp;lt; tag &nbsp; &quot;q&quot;</p>",
      s"""<p>$prose <a href="/x">dangling link</p>""",
      "", "no tags at all but long enough to clear the bar easily today",
      s"<p>ok</p><p>$prose</p><h2>$prose</h2>")
    val df = pages.toDF("h").unionByName(
      graft.model.Tables.documents(spark, sfDir).select(
        concat(lit("<body><nav><a href='/'>Home nav bar</a></nav><p>"),
          col("text"), lit("</p><footer><a>c</a></footer></body>")).as("h")))
    val diff = df.select(
        HtmlExtract.mainContent(col("h")).as("fused"),
        HtmlExtract.mainContentComposed(col("h")).as("composed"))
      .where(col("fused") =!= col("composed"))
    assert(diff.count() == 0)
    // and the fused form stays inside whole-stage codegen over a scan
    val scan = graft.model.Tables.documents(spark, sfDir)
      .select(HtmlExtract.mainContent(concat(lit("<p>"), col("text"),
        lit("</p>"))).as("t"))
    scan.collect()
    assert(scan.queryExecution.executedPlan.toString.contains("*("),
      "html_main_content must codegen")
  }

  test("fused kernel ≡ composed form on supplementary characters " +
    "(code points, not UTF-16 units, drive minChars and link density)") {
    // 13 emoji = 13 code points but 26 UTF-16 units: with minChars = 20
    // a code-UNIT count keeps the block, a code-POINT count drops it —
    // the two forms must agree (on the code-point side)
    val emoji = "😀" * 13
    val pages = Seq(
      s"<p>$emoji</p>",
      // anchor text with supplementary chars near the density threshold:
      // 30 points of prose + a 5-point emoji link (density 5/35 ≈ 0.14 by
      // points, 10/40 = 0.25 by units at the anchor) — forms must agree
      s"<p>abcdefghijklmnopqrstuvwxyz1234 <a href='/x'>${"😀" * 5}</a></p>",
      s"<p>$emoji abcdefghij</p>")
    val rows = pages.toDF("h").select(
        HtmlExtract.mainContent(col("h"), 20, 0.15).as("fused"),
        HtmlExtract.mainContentComposed(col("h"), 20, 0.15).as("composed"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"kernel/composed divergence: '${r.getString(0)}' vs '${r.getString(1)}'"))
    // and the decision itself is code-point-based: 13 points < 20 → drop
    assert(extract(s"<p>$emoji</p>", minChars = 20) == "")
  }
}
