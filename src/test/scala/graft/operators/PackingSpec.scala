package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, n: Int) = (id, Seq.fill(n)(s"w$id").mkString(" "))

  test("packAssignments cuts the per-shard token stream exactly at the budget") {
    val docs = (0L until 40L).map(i => doc(i, 3 + (i % 7).toInt)).toDF("doc_id", "text")
    val a = Packing.packAssignments(docs, "doc_id", "text", budget = 10, shards = 3)
      .collect().map(r => (r.getLong(r.fieldIndex("shard")),
        r.getString(r.fieldIndex("okey")), r.getLong(r.fieldIndex("id")),
        r.getLong(r.fieldIndex("n_tokens")), r.getLong(r.fieldIndex("cum_before")),
        r.getLong(r.fieldIndex("seq")), r.getBoolean(r.fieldIndex("straddles"))))
    assert(a.length == 40)
    // replay the pack independently: walk each shard in (okey, id) order
    // with a plain Scala running sum and require identical cut decisions
    a.groupBy(_._1).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(r => (r._2, r._3)).foreach {
        case (_, _, id, n, cumBefore, seq, straddles) =>
          assert(cumBefore == cum, s"doc $id: cum_before $cumBefore != $cum")
          assert(seq == cum / 10, s"doc $id: seq $seq != ${cum / 10}")
          assert(straddles == (n > 0 && (cum + n - 1) / 10 > cum / 10),
            s"doc $id: straddle flag wrong")
          cum += n
      }
    }
  }

  test("packSummary conserves docs and tokens; sequences are contiguous") {
    val docs = (0L until 100L).map(i => doc(i, 5 + (i % 11).toInt)).toDF("doc_id", "text")
    val totalTokens = docs.select(sum(graft.text.TextMetrics.tokenCount(col("text"))))
      .head().getLong(0)
    val m = Packing.packSummary(docs, "doc_id", "text", budget = 64, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(m.map(_._3).sum == 100, "every doc starts in exactly one sequence")
    assert(m.map(_._4).sum == totalTokens, "tokens are conserved")
    m.groupBy(_._1).foreach { case (shard, rows) =>
      // every doc here is far smaller than the budget, so consecutive
      // docs advance the sequence index by at most one
      val seqs = rows.map(_._2).sorted.toList
      assert(seqs.head == 0 && seqs == (0L until seqs.length).toList,
        s"shard $shard sequences not contiguous: ${seqs.mkString(",")}")
    }
  }

  test("blockSpans pieces tile every sequence exactly and reconstruct the docs") {
    // long docs (up to 3× the budget) force multi-sequence straddles
    val docs = (0L until 25L).map(i => doc(i, 10 + (i % 7).toInt * 14))
      .toDF("doc_id", "text")
    val budget = 48L
    val spans = Packing.blockSpans(docs, "doc_id", "text", budget, shards = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // 1. reconstruction: each doc's pieces cover [0, n_tokens) exactly once
    val byDoc = spans.groupBy(_._3)
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n")).as[(Long, Long)]
      .collect().foreach { case (id, n) =>
        val pieces = byDoc(id).sortBy(_._4)
        assert(pieces.head._4 == 0L && pieces.last._5 == n,
          s"doc $id pieces don't span [0, $n)")
        pieces.sliding(2).foreach {
          case Array(a, b) => assert(a._5 == b._4, s"doc $id pieces gap/overlap")
          case _ =>
        }
      }
    // 2. tiling: within every (shard, seq) the pieces start at 0, are
    //    contiguous, and fill the budget (except each shard's last block)
    spans.groupBy(s => (s._1, s._2)).foreach { case ((shard, seq), ps) =>
      val sorted = ps.sortBy(_._6)
      assert(sorted.head._6 == 0L, s"block ($shard,$seq) doesn't start at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 + (a._5 - a._4) == b._6, s"block ($shard,$seq) gap")
        case _ =>
      }
      val filled = sorted.map(p => p._5 - p._4).sum
      val lastSeq = spans.filter(_._1 == shard).map(_._2).max
      if (seq < lastSeq) assert(filled == budget,
        s"non-final block ($shard,$seq) holds $filled of $budget tokens")
    }
    // 3. a doc longer than the budget really does produce 2+ pieces
    assert(byDoc.values.exists(_.length >= 2), "no straddling pieces produced")
  }

  test("packing is deterministic across runs") {
    val docs = (0L until 30L).map(i => doc(i, 4 + (i % 5).toInt)).toDF("doc_id", "text")
    def run() = Packing.packSummary(docs, "doc_id", "text", budget = 32, shards = 2)
      .collect().map(_.toSeq).toSet
    assert(run() == run())
  }
}
