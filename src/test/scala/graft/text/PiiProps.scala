package graft.text

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Generator-driven properties for the PII patterns. The Spark operator
  * ([[TextMetrics.redactPii]]) is a `regexp_replace` chain over exactly
  * these pattern strings, and Spark's regexp functions run Java's regex
  * engine — so kernel-level properties proven here with `String
  * .replaceAll` transfer to the Column pipeline verbatim (TextSpec pins
  * the Column path on fixed fixtures; these properties cover the input
  * space).
  */
object PiiProps extends Properties("pii") {

  private def count(re: String, s: String): Int = {
    val m = java.util.regex.Pattern.compile(re).matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  private def redact(s: String): String =
    s.replaceAll(TextMetrics.EmailRe, "<EMAIL>")
      .replaceAll(TextMetrics.PhoneRe, "<PHONE>")
      .replaceAll(TextMetrics.Ipv4Re, "<IP>")

  private val word: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val email: Gen[String] = for {
    u <- Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    d <- Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    tld <- Gen.oneOf("com", "org", "io", "co", "net")
  } yield s"$u@$d.$tld"

  private val phone: Gen[String] = for {
    a <- Gen.chooseNum(100, 999)
    b <- Gen.chooseNum(100, 999)
    c <- Gen.chooseNum(1000, 9999)
    sep <- Gen.oneOf("-", ".")
  } yield s"$a$sep$b$sep$c"

  private val ip: Gen[String] =
    Gen.listOfN(4, Gen.chooseNum(0, 255)).map(_.mkString("."))

  /** Random prose with planted PII at shuffled positions (space-joined, so
    * every planted item sits on word boundaries like real text).
    */
  private val doc: Gen[(String, Int, Int, Int)] = for {
    words <- Gen.listOf(word)
    es <- Gen.resize(5, Gen.listOf(email))
    ps <- Gen.resize(5, Gen.listOf(phone))
    ips <- Gen.resize(5, Gen.listOf(ip))
    seed <- Gen.chooseNum(0, Int.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    (rnd.shuffle(words ++ es ++ ps ++ ips).mkString(" "),
      es.size, ps.size, ips.size)
  }

  property("every planted PII item is detected, nothing else is") =
    forAll(doc) { case (text, ne, np, ni) =>
      count(TextMetrics.EmailRe, text) == ne &&
        count(TextMetrics.PhoneRe, text) == np &&
        count(TextMetrics.Ipv4Re, text) == ni
    }

  property("redaction is total: no pattern matches survive") =
    forAll(doc) { case (text, _, _, _) =>
      val red = redact(text)
      count(TextMetrics.EmailRe, red) == 0 &&
        count(TextMetrics.PhoneRe, red) == 0 &&
        count(TextMetrics.Ipv4Re, red) == 0
    }

  property("redaction is idempotent") =
    forAll(doc) { case (text, _, _, _) => redact(redact(text)) == redact(text) }
}
