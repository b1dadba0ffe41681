package graft.text

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Generator-driven properties of the canonical greedy merge kernel —
  * the single definition ([[Bpe.mergePair]]) shared by the fit, the
  * encode codec, and (via the gaps-and-islands parity rule) the DuckDB
  * oracle replay. The generators bias toward pathological inputs:
  * tiny alphabets force runs of identical symbols and overlapping
  * match chains, the geometry where naive merge implementations
  * (string replace, regex sub) diverge from left-to-right greedy.
  */
object BpeProps extends Properties("bpe") {

  private val word: Gen[String] =
    Gen.chooseNum(1, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  private val wordCounts: Gen[Seq[(String, Long)]] =
    Gen.chooseNum(1, 12).flatMap(k =>
      Gen.listOfN(k, for {
        w <- word
        c <- Gen.chooseNum(1L, 50L)
      } yield (w, c)).map(_.distinctBy(_._1)))

  /** Reference greedy merge, written as the obvious recursive spec. */
  private def refMerge(s: List[String], l: String, r: String): List[String] =
    s match {
      case a :: b :: rest if a == l && b == r => (l + r) :: refMerge(rest, l, r)
      case a :: rest => a :: refMerge(rest, l, r)
      case Nil => Nil
    }

  property("mergePair equals the recursive greedy spec") =
    forAll(word, Gen.oneOf("a", "b", "c", "ab", "bc"), Gen.oneOf("a", "b", "c")) {
      (w, l, r) =>
        val syms = w.map(_.toString).toArray
        Bpe.mergePair(syms, l, r).toSeq == refMerge(syms.toList, l, r)
    }

  property("mergePair preserves the character stream") =
    forAll(word, Gen.oneOf("a", "b"), Gen.oneOf("a", "b")) { (w, l, r) =>
      Bpe.mergePair(w.map(_.toString).toArray, l, r).mkString == w
    }

  property("mergePair is idempotent (no adjacent pair survives a pass)") =
    forAll(word, Gen.oneOf("a", "b"), Gen.oneOf("a", "b")) { (w, l, r) =>
      val once = Bpe.mergePair(w.map(_.toString).toArray, l, r)
      Bpe.mergePair(once, l, r).toSeq == once.toSeq
    }

  /** `sum(len-1)` only overestimates the achievable merge count (e.g.
    * "baba" has 3 adjacent pairs but only 2 achievable merges: ba, then
    * baba) and `fitOnCounts` throws past exhaustion by contract — so back
    * off to the largest request the corpus supports.
    */
  private def fitAchievable(wc: Seq[(String, Long)], n: Int): Seq[(String, String)] =
    try Bpe.fitOnCounts(wc, n)
    catch {
      case _: IllegalArgumentException if n > 1 => fitAchievable(wc, n - 1)
    }

  property("fit is deterministic and encode reproduces the fit trajectory") =
    forAll(wordCounts) { wc =>
      val total = wc.map { case (w, _) => w.length - 1 }.sum
      (total == 0) || {
        val m1 = fitAchievable(wc, math.min(3, total))
        val m2 = Bpe.fitOnCounts(wc, m1.length)
        val codec = new Bpe.Codec(m1)
        m1 == m2 && wc.forall { case (w, _) =>
          var s = w.map(_.toString).toArray
          m1.foreach { case (l, r) => s = Bpe.mergePair(s, l, r) }
          val enc = codec.encodeWord(w)
          enc.toSeq == s.toSeq && enc.mkString == w
        }
      }
    }
}
