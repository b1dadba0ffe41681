package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized span-dedup parity against a naive reference: tiny-vocab
  * random corpora force window repetition shapes the driver corpus never
  * has — the same window many times INSIDE one document, overlapping
  * removals, df exactly at the min/max bounds, docs shorter than the
  * window, punctuation/case noise riding through normalization. Both the
  * hashed and the exactVerify engine paths must reproduce the naive
  * (literal-window) labeling — for the hashed path that also re-asserts
  * 64-bit collision absence at these sizes, which exactVerify makes
  * semantic.
  */
class SpanFuzzSpec extends SparkSpec {

  private def naiveTokens(text: String): Vector[String] =
    text.toLowerCase.replaceAll("[^a-z0-9\\s]", " ")
      .replaceAll("\\s+", " ").trim
      .split(" ").filter(_.nonEmpty).toVector

  /** The documented semantics, literally: width-`w` windows per doc with
    * 0-based positions; grams with minDf <= document-frequency <= maxDf
    * keep their lowest doc; every occurrence in any other doc is removed;
    * a token survives iff no removed span covers it.
    */
  private def naiveSpanDedup(docs: Seq[(Long, String)], w: Int,
                             minDf: Int, maxDf: Int)
      : Map[Long, (Int, Int, String)] = {
    val toks = docs.map { case (id, t) => id -> naiveTokens(t) }.toMap
    val occ = for {
      (id, ts) <- toks.toSeq
      p <- 0 to ts.length - w
      if ts.length >= w
    } yield (ts.slice(p, p + w).mkString(" "), id, p)
    val byGram = occ.groupBy(_._1)
    val keepers = byGram.collect {
      case (g, os) if {
        val df = os.map(_._2).distinct.size
        df >= minDf && df <= maxDf
      } => g -> os.map(_._2).min
    }
    val removals = occ.collect {
      case (g, id, p) if keepers.get(g).exists(_ != id) => (id, p)
    }
    docs.map { case (id, _) =>
      val ts = toks(id)
      val starts = removals.collect { case (i, p) if i == id => p }
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !starts.exists(s => i >= s && i < s + w) => t
      }
      id -> ((starts.size, kept.size, kept.mkString(" ")))
    }.toMap
  }

  test("hashed and exactVerify span dedup match the naive literal-window reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    val punct = Vector("", ",", ".", "!", "  ")
    (0 until 3).foreach { round =>
      val w = 3 + round // widths 3, 4, 5
      val docs: Seq[(Long, String)] = (0 until 24).map { i =>
        val n = rnd.nextInt(3 * w + 6) // some docs shorter than the window
        val words = (0 until n).map { _ =>
          val base = vocab(rnd.nextInt(vocab.length))
          val decorated = if (rnd.nextInt(4) == 0) base.toUpperCase else base
          decorated + punct(rnd.nextInt(punct.length))
        }
        (i.toLong * 37L, words.mkString(" "))
      } ++ Seq( // pinned regression class: normalize-to-empty documents
        (9001L, ""), (9002L, " ,,, .. !!! "), (9003L, "\t \n"))
      val (minDf, maxDf) = (2, if (round == 1) 3 else Int.MaxValue)
      val expect = naiveSpanDedup(docs, w, minDf, maxDf)
      val df = docs.toDF("doc_id", "text")
      Seq(false, true).foreach { verify =>
        val got = Dedup.spanDedup(df, "doc_id", "text", width = w,
            minDocFreq = minDf, maxDocFreq = maxDf, exactVerify = verify)
          .collect()
          .map(r => r.getLong(0) ->
            ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
        assert(got.keySet == expect.keySet,
          s"round $round verify=$verify: docs not preserved")
        expect.foreach { case (id, want) =>
          assert(got(id) == want,
            s"round $round verify=$verify doc $id: got ${got(id)}, want $want")
        }
      }
    }
  }
}
