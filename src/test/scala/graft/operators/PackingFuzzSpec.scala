package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized parity for [[Packing.blockSpans]] against a naive
  * driver-side packer, under adversarial doc/budget ratios: budgets as
  * small as 1 token, documents spanning many sequences, zero-token
  * documents (excluded from spans), single-token docs landing exactly on
  * cuts, and 1..4 shards. The naive packer recomputes the md5 shard
  * assignment and the md5 order key independently (MessageDigest), walks
  * each shard's token stream, and cuts spans by hand; the materialized
  * span SET must match exactly, and the tiling invariant (every
  * non-final sequence of a shard is covered by pieces summing to
  * `budget`, starting at 0) is asserted on the engine output directly.
  */
class PackingFuzzSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunkDocs parity with a naive chunker; overlap and coverage invariants") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    (0 until 6).foreach { round =>
      val size = 2 + rnd.nextInt(8)
      val overlap = rnd.nextInt(size) // 0 .. size-1
      val docs = (0L until 40L).map { id =>
        val n = rnd.nextInt(4) match {
          case 0 => 0
          case 1 => 1 + rnd.nextInt(size)         // single chunk
          case _ => size + rnd.nextInt(5 * size)  // several, short tail
        }
        // distinct tokens so chunk text pins the exact boundaries
        (id, (0 until n).map(i => s"t${id}x$i").mkString(" "))
      }
      val got = Packing.chunkDocs(docs.toDF("doc_id", "text"), "doc_id",
          "text", size, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4),
          r.getString(5))).toSet
      val stride = size - overlap
      val want = docs.flatMap { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val n = toks.length
        if (n == 0) Nil
        else {
          val nChunks = if (n <= size) 1 else 1 + (n - size + stride - 1) / stride
          (0 until nChunks).map { k =>
            val from = k.toLong * stride
            val to = math.min(n.toLong, from + size)
            (id, k.toLong, from, to,
              toks.slice(from.toInt, to.toInt).mkString(" "))
          }
        }
      }.toSet
      assert(got == want, s"round $round (size=$size overlap=$overlap): " +
        s"${(got diff want).size} extra, ${(want diff got).size} missing")
      // invariants: consecutive chunks overlap by exactly `overlap`
      // (except against a short tail), and the windows cover every token
      want.groupBy(_._1).foreach { case (id, chunks) =>
        val sorted = chunks.toSeq.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Seq(a, b) =>
            assert(b._3 == a._3 + stride, s"doc $id: stride broken")
            assert(a._4 >= b._3, s"doc $id: coverage gap")
          case _ => ()
        }
        val n = docs.find(_._1 == id).get._2.split(" ").count(_.nonEmpty)
        assert(sorted.head._3 == 0 && sorted.last._4 == n,
          s"doc $id: windows must span [0, $n)")
      }
    }
  }

  test("blockSpans parity with a naive packer under adversarial doc/budget ratios") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    (0 until 6).foreach { round =>
      val budget = 1L + rnd.nextInt(7)
      val shards = 1 + rnd.nextInt(4)
      val salt = s"pf$round"
      val docs = (0L until (30 + rnd.nextInt(60)).toLong).map { id =>
        val n = rnd.nextInt(5) match {
          case 0 => 0                                  // excluded from spans
          case 1 => 1                                  // single token
          case 2 => (3 * budget).toInt + rnd.nextInt(10) // spans many seqs
          case _ => 1 + rnd.nextInt(2 * budget.toInt + 3)
        }
        (id, Seq.fill(n)("w").mkString(" ")) // n whitespace tokens
      }
      val got = Packing.blockSpans(docs.toDF("doc_id", "text"), "doc_id",
          "text", budget, shards, salt)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet

      // naive packer, independent md5 arithmetic
      val assigned = docs.map { case (id, text) =>
        val shard = java.lang.Long.parseLong(
          md5hex(s"$salt:$id").take(8), 16) % shards
        val okey = md5hex(s"${salt}o:$id")
        val n = text.split("\\s+").count(_.nonEmpty).toLong
        (shard, okey, id, n)
      }
      val want = assigned.groupBy(_._1).flatMap { case (shard, ds) =>
        var cum = 0L
        ds.sortBy(d => (d._2, d._3)).flatMap { case (_, _, id, n) =>
          val spans =
            if (n == 0) Nil
            else (cum / budget to (cum + n - 1) / budget).map { seq =>
              val docFrom = math.max(0L, seq * budget - cum)
              val docTo = math.min(n, (seq + 1) * budget - cum)
              (shard, seq, id, docFrom, docTo, cum + docFrom - seq * budget)
            }
          cum += n
          spans
        }
      }.toSet
      assert(got == want,
        s"round $round (budget=$budget shards=$shards): " +
          s"${(got diff want).size} extra, ${(want diff got).size} missing")

      // tiling invariant on the ENGINE output: every sequence except each
      // shard's last is covered exactly — pieces start at 0, are
      // contiguous, and sum to `budget`
      got.groupBy(t => (t._1, t._2)).foreach { case ((shard, seq), pieces) =>
        val lastSeq = got.filter(_._1 == shard).map(_._2).max
        if (seq < lastSeq) {
          val sorted = pieces.toSeq.sortBy(_._6)
          assert(sorted.head._6 == 0L, s"shard $shard seq $seq: first piece not at 0")
          assert(sorted.map(p => p._5 - p._4).sum == budget,
            s"shard $shard seq $seq: pieces do not sum to $budget")
          sorted.sliding(2).foreach {
            case Seq(a, b) =>
              assert(a._6 + (a._5 - a._4) == b._6,
                s"shard $shard seq $seq: gap between pieces")
            case _ => ()
          }
        }
      }
    }
  }
}
