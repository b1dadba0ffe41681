package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized BPE parity against a naive reference trainer/encoder:
  * tiny-alphabet corpora make pair-count TIES the common case (the
  * deterministic tie-break — highest count, then lexicographic (l, r) —
  * is the part a reimplementation gets wrong first), repeated substrings
  * make merges cascade (ab + ab→abab), and the greedy left-to-right
  * application gets odd-run inputs (aaa under the (a,a) merge → [aa, a],
  * never [a, aa]). The naive side is written as list recursion over
  * immutable maps — a third implementation style next to the engine's
  * mutable arrays and the oracle's gaps-and-islands SQL.
  */
class BpeFuzzSpec extends SparkSpec {

  private def naiveWords(text: String): List[String] =
    "[a-z]+".r.findAllIn(text.toLowerCase).toList

  private def naiveMerge(s: List[String], l: String, r: String): List[String] =
    s match {
      case a :: b :: rest if a == l && b == r => (a + b) :: naiveMerge(rest, l, r)
      case a :: rest => a :: naiveMerge(rest, l, r)
      case Nil => Nil
    }

  private def naiveFit(words: Seq[String], k: Int): List[(String, String)] = {
    var reps: Map[List[String], Long] = words.groupBy(identity)
      .map { case (w, ws) => w.map(_.toString).toList -> ws.size.toLong }
    var merges = List.empty[(String, String)]
    (0 until k).foreach { _ =>
      val pc = reps.toSeq
        .flatMap { case (s, c) => s.zip(s.drop(1)).map(p => p -> c) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      assert(pc.nonEmpty, "fuzz corpus too small: vocabulary exhausted")
      val best = pc.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.head._1
      merges = merges :+ best
      reps = reps.map { case (s, c) => naiveMerge(s, best._1, best._2) -> c }
    }
    merges
  }

  private def naiveEncode(text: String, merges: Seq[(String, String)]): List[String] =
    naiveWords(text).flatMap { w =>
      merges.foldLeft(w.map(_.toString).toList) {
        case (s, (l, r)) => naiveMerge(s, l, r)
      }
    }

  test("fit, encode and tokenCount match the naive reference on tie-heavy corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    (0 until 3).foreach { round =>
      val alphabet = "abcd".take(2 + round) // 2, 3, 4 letters
      val docs: Seq[(Long, String)] = (0 until 30).map { i =>
        val words = (0 until 5 + rnd.nextInt(20)).map { _ =>
          val len = 1 + rnd.nextInt(8)
          val w = (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
          // case/digit/punct noise: WordRe must carve the same words
          if (rnd.nextInt(5) == 0) w.toUpperCase
          else if (rnd.nextInt(7) == 0) w + (rnd.nextInt(10).toString)
          else w
        }
        (i.toLong, words.mkString(" "))
      }
      val numMerges = 8 + round * 2
      val corpusWords = docs.flatMap { case (_, t) => naiveWords(t) }
      val expectMerges = naiveFit(corpusWords, numMerges)

      val df = docs.toDF("doc_id", "text")
      val merges = Bpe.fit(df, "text", numMerges)
      assert(merges.toList == expectMerges,
        s"round $round: merge table diverges\n engine: $merges\n naive: $expectMerges")

      val got = df.select(col("doc_id"),
          Bpe.encode(col("text"), merges).as("toks"),
          Bpe.tokenCount(col("text"), merges).as("n"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getSeq[String](1).toList, r.getInt(2))))
        .toMap
      docs.foreach { case (id, text) =>
        val want = naiveEncode(text, expectMerges)
        assert(got(id)._1 == want,
          s"round $round doc $id: tokens diverge\n engine: ${got(id)._1}\n naive: $want")
        assert(got(id)._2 == want.length,
          s"round $round doc $id: tokenCount ${got(id)._2} != ${want.length}")
      }
    }
  }
}
