package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Generator-driven parity for the fused HTML kernel: on RANDOM tag soup
  * (unbalanced tags, stray brackets, entities, nested anchors, scripts
  * with markup inside), `HtmlMainContent` must equal the composed Column
  * form character-for-character — the two walk the page with the same
  * regexes, and this pins that no kernel shortcut diverges on inputs the
  * fixed spec cases never dreamed of.
  */
object HtmlExtractProps extends Properties("html-extract-kernel") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("HtmlExtractProps")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val words = Seq("alpha", "beta", "gamma", "delta words", "longer piece",
    "sentence with several tokens inside", "x",
    // supplementary-plane input (surrogate pairs in the JVM String): the
    // r14 code-point fix made length accounting count code points, and
    // this generator must be able to produce the class that caught it —
    // emoji, CJK Ext-B, and math alphanumerics, alone and mid-sentence
    "émoji 😀 mixed", "🤖🤖 robots",
    "cjk ext 𣀀𣀁 text", "math 𝔸𝔹",
    "日本語テキスト", "😀")
  private val entities = Seq("&amp;", "&lt;", "&gt;", "&quot;", "&#39;",
    "&nbsp;", "&amp;lt;",
    // entity directly adjacent to a surrogate pair — the boundary class
    // where byte/char/code-point confusion shows up first
    "&amp;😀", "😀&lt;")
  private val openTags = Seq("<p>", "<div class='x'>", "<li>", "<nav>",
    "<h2>", "<span>", "<b>", "<a href=\"/x\">", "<footer>", "<td >",
    "<script>", "<style>", "<!--", "<br/>")
  private val closeTags = Seq("</p>", "</div>", "</li>", "</nav>", "</h2>",
    "</span>", "</b>", "</a>", "</footer>", "</td>", "</script>",
    "</style>", "-->")
  private val strays = Seq("<", ">", "< p", "a<b", "1 > 0")

  private val fragment: Gen[String] = Gen.frequency(
    (5, Gen.oneOf(words)),
    (2, Gen.oneOf(entities)),
    (3, Gen.oneOf(openTags)),
    (3, Gen.oneOf(closeTags)),
    (1, Gen.oneOf(strays)),
    (1, Gen.oneOf(" ", "\n", "\t")))

  private val page: Gen[String] = for {
    n <- Gen.chooseNum(0, 60)
    parts <- Gen.listOfN(n, fragment)
  } yield parts.mkString(" ")

  // batched compare: one Spark job per ~sample set would be slow; compare
  // pages in groups of 20 through one DataFrame each
  property("fused kernel == composed Column form on random tag soup") =
    forAll(Gen.listOfN(20, page), Gen.chooseNum(5, 40),
        Gen.chooseNum(0.0, 0.5)) { (pages, minChars, maxLink) =>
      import spark.implicits._
      val diff = pages.toDF("h").select(
          HtmlExtract.mainContent(col("h"), minChars, maxLink).as("fused"),
          HtmlExtract.mainContentComposed(col("h"), minChars, maxLink)
            .as("composed"))
        .where(col("fused") =!= col("composed"))
      diff.count() == 0
    }

  property("kernel title/strip helpers match their Column twins") =
    forAll(Gen.listOfN(20, page)) { pages =>
      import spark.implicits._
      val diff = pages.toDF("h").select(
          HtmlExtract.stripTags(col("h")).as("col"),
          col("h")).collect().forall { r =>
        r.getString(0) == HtmlExtract.stripTagsKernel(r.getString(1))
      }
      diff
    }
}
