package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized parity for the scan-local text metrics against naive
  * references built on code-point arithmetic — the class of input the
  * driver corpus never has: blank and whitespace-only docs and edge tabs/newlines (the
  * split/trim phantom-token class this fuzz caught and the fix removed), non-BMP emoji (Spark `length` counts CODE POINTS,
  * a UTF-16 .length naive would diverge — the references here use
  * codePointCount deliberately), CJK markers (langId's zh profile),
  * punctuation runs, single tokens, heavy repetition, and mixed-case
  * stopwords (NOT stopwords — the ratio is case-sensitive by design).
  */
class TextMetricsFuzzSpec extends SparkSpec {

  private def cp(s: String): Int = s.codePointCount(0, s.length)
  private def toks(s: String): Array[String] = "\\S+".r.findAllIn(s).toArray
  private def nTokens(s: String): Int = toks(s).length
  private def blank(s: String): Boolean = toks(s).isEmpty

  private def naiveSubword(s: String): Int =
    "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]".r.findAllIn(s).length
  private def naivePunct(s: String): Double =
    if (cp(s) == 0) 0.0 else cp(s.replaceAll("[a-zA-Z0-9\\s]", "")).toDouble / cp(s)
  private def naiveMeanLen(s: String): Double =
    if (blank(s)) 0.0 else cp(s.replaceAll("\\s", "")).toDouble / nTokens(s)
  private def naiveStop(s: String): Double =
    if (blank(s)) 0.0
    else toks(s).count(TextMetrics.EnStopwords.contains).toDouble / toks(s).length
  private def naiveQuality(s: String): Double =
    if (blank(s)) 0.0
    else math.max(0.0, math.min(1.0,
      math.min(math.log10(nTokens(s).toDouble + 1) / 3.0, 1.0) * 0.3 +
        (1.0 - naivePunct(s)) * 0.4 +
        math.min(naiveStop(s) * 4.0, 1.0) * 0.3))
  private def naiveLang(s: String): String = {
    if (blank(s)) return "und"
    val t = toks(s)
    val scores = TextMetrics.LangProfiles.map { case (l, ws) =>
      l -> t.count(ws.contains)
    }
    val best = scores.map(_._2).max
    if (best == 0) "und" else scores.find(_._2 == best).get._1
  }
  private def low(s: String): String = s.toLowerCase(java.util.Locale.ROOT)
  private def naiveTop(s: String): Double =
    if (blank(s)) 0.0
    else {
      val t = toks(low(s))
      t.groupBy(identity).values.map(_.length).max.toDouble / t.length
    }
  private def naiveDupWord(s: String): Double =
    if (blank(s)) 0.0
    else { val t = toks(low(s)); 1.0 - t.distinct.length.toDouble / t.length }
  private def naiveDupBigram(s: String): Double = {
    if (blank(s)) return 0.0
    val t = toks(low(s))
    if (t.length < 2) 0.0
    else {
      val bg = t.sliding(2).map(_.mkString(" ")).toSeq
      1.0 - bg.distinct.length.toDouble / bg.length
    }
  }

  test("nine scan-local metrics match code-point-exact naive references") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val words = Seq("the", "and", "of", "The", "AND", "cat", "dog", "µzz",
      "der", "die", "und", "el", "de", "le", "的", "是", "了",
      "a1b2", "42", "x", "😀🚀", "naïve", "!!,,..", "a_b")
    // \u000B (vertical tab) is IN the pinned whitespace class
    // [ \t\n\x0B\f\r] both engine-side (Java \s) and oracle-side (the
    // explicit RE2 classes in queries/ — RE2's own \s EXCLUDES \x0B,
    // which is why the class is spelled out there)
    val texts: Seq[String] = Seq("", " ", "\t\n ", "x", "😀", ",,,", "的 的 的",
      "hello\n", "\tworld", "a b\r\n", "\n\nthe cat\t",
      "\u000B", "a\u000Bb", "the\u000Bcat\u000B", "\u000B\f x") ++
      (0 until 60).map { _ =>
        val n = rnd.nextInt(25)
        (0 until n).map { _ =>
          val w = words(rnd.nextInt(words.length))
          if (rnd.nextInt(6) == 0) w + w else w // repetition pressure
        }.mkString(rnd.nextInt(6) match {
          case 0 => "  "
          case 1 => "\u000B"
          case _ => " "
        })
      }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        TextMetrics.tokenCount(col("text")).as("n_tok"),
        TextMetrics.subwordCount(col("text")).as("n_sub"),
        TextMetrics.punctRatio(col("text")).as("punct"),
        TextMetrics.meanTokenLength(col("text")).as("mlen"),
        TextMetrics.stopwordRatio(col("text")).as("stop"),
        TextMetrics.qualityScore(col("text")).as("q"),
        TextMetrics.langId(col("text")).as("lang"),
        TextMetrics.topWordFrac(col("text")).as("top"),
        TextMetrics.dupWordFrac(col("text")).as("dw"),
        TextMetrics.dupBigramFrac(col("text")).as("db"))
    val got = df.collect().map(r => r.getLong(0) -> r).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val r = got(i.toLong)
      val tag = s"text $i '${t.take(30)}'"
      def close(g: Double, w: Double, what: String): Unit =
        assert(math.abs(g - w) < 1e-12, s"$tag: $what $g != $w")
      assert(r.getAs[Int]("n_tok") == nTokens(t), s"$tag: n_tok")
      assert(r.getAs[Int]("n_sub") == naiveSubword(t), s"$tag: n_sub")
      close(r.getAs[Double]("punct"), naivePunct(t), "punct")
      close(r.getAs[Double]("mlen"), naiveMeanLen(t), "mean_len")
      close(r.getAs[Double]("stop"), naiveStop(t), "stop")
      close(r.getAs[Double]("q"), naiveQuality(t), "quality")
      assert(r.getAs[String]("lang") == naiveLang(t), s"$tag: lang")
      close(r.getAs[Double]("top"), naiveTop(t), "top_word")
      close(r.getAs[Double]("dw"), naiveDupWord(t), "dup_word")
      close(r.getAs[Double]("db"), naiveDupBigram(t), "dup_bigram")
    }
  }
}
