package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Generator-driven parity properties for the fused [[Expressions
  * .TokenCounts]] kernel against the regex tokenize pipeline it replaces
  * (`lower → regexp_replace('[^a-z0-9\s]', ' ') → split('\s+')` →
  * per-doc counts). The kernel is a plain JVM function of the input
  * string (no Spark state), so kernel-level properties transfer to the
  * Column verbatim; ExpressionsSpec pins the Column path (codegen, null,
  * explode shape) on fixtures.
  *
  * The generated input space deliberately covers the tokenizer's edge
  * geometry: uppercase ASCII (lowercases in-token), digits, punctuation
  * and whitespace runs (boundaries), non-ASCII letters with and without
  * ASCII lowercase images (é, Σ, K → k), the İ multi-char lowercase
  * expansion, surrogate pairs (emoji), and leading/trailing/blank
  * whitespace.
  */
object TokenCountsProps extends Properties("token_counts") {

  private val kernel = Expressions.TokenCounts(Literal("x"))

  private def fused(s: String): Seq[(String, Long)] = {
    val m = kernel.compute(UTF8String.fromString(s))
    val keys = m.keyArray
    val vals = m.valueArray
    (0 until m.numElements()).map(i =>
      (keys.getUTF8String(i).toString, vals.getLong(i)))
  }

  /** The regex pipeline in plain Scala — same Java regex engine Spark's
    * `regexp_replace`/`split` run, Locale.ROOT lowercasing as Spark's
    * `lower`.
    */
  private def reference(s: String): Seq[(String, Long)] = {
    val norm = s.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9\\s]", " ").replaceAll("\\s+", " ").trim
    val toks = norm.split("\\s+").toSeq.filter(_.nonEmpty)
    // first-appearance order, like the kernel's LinkedHashMap
    val order = toks.distinct
    val counts = toks.groupBy(identity)
    order.map(t => (t, counts(t).size.toLong))
  }

  private val fragment: Gen[String] = Gen.frequency(
    6 -> Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        4 -> Gen.alphaLowerChar, 2 -> Gen.alphaUpperChar,
        2 -> Gen.numChar)).map(_.mkString)),
    2 -> Gen.oneOf(" ", "  ", "\t", "\n", " \t\n "),
    2 -> Gen.oneOf(".", ",", "!", "--", "'s", "…", "—"),
    1 -> Gen.oneOf("É", "é", "Σ", "ΑΣ", "İ", "ı", "中文", "K", "ﬁ"),
    1 -> Gen.oneOf("🙂", "👍🏽", " ", " ")
  )

  private val doc: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, fragment).map(_.mkString))

  property("matches the regex pipeline: terms, counts, AND order") =
    forAll(doc) { s => fused(s) == reference(s) }

  property("counts sum to the token count of the normalized text") =
    forAll(doc) { s =>
      fused(s).map(_._2).sum == reference(s).map(_._2).sum
    }

  property("blank and boundary-only text yield an empty map") =
    forAll(Gen.oneOf("", " ", "\t\n", "...", "—…!", "🙂")) { s =>
      fused(s).isEmpty
    }
}
