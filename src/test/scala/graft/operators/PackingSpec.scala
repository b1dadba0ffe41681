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

  test("packing is deterministic across runs") {
    val docs = (0L until 30L).map(i => doc(i, 4 + (i % 5).toInt)).toDF("doc_id", "text")
    def run() = Packing.packSummary(docs, "doc_id", "text", budget = 32, shards = 2)
      .collect().map(_.toSeq).toSet
    assert(run() == run())
  }
}
