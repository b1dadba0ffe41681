package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("banded range join equals the direct non-equi join incl. bucket edges") {
    // timestamps straddle tolerance-bucket boundaries on purpose
    val l = Seq((1L, ts("2024-01-01 00:04:59"), "l1"),
      (1L, ts("2024-01-01 00:05:00"), "l2"),
      (2L, ts("2024-01-01 00:00:00"), "l3"))
      .toDF("key", "lts", "lid")
    val r = Seq((1L, ts("2024-01-01 00:09:59"), "r1"),
      (1L, ts("2024-01-01 00:10:00"), "r2"),
      (2L, ts("2024-01-01 01:00:00"), "r3"))
      .toDF("key", "rts", "rid")
    val banded = RangeJoin.timeRangeJoin(l, r, Seq("key"), "lts", "rts", 300)
      .select("lid", "rid").collect().map(x => (x.getString(0), x.getString(1))).toSet
    val direct = l.join(r, Seq("key"))
      .where(abs(col("lts").cast("double") - col("rts").cast("double")) <= 300)
      .select("lid", "rid").collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(banded == direct)
    // exact-boundary pair (00:05:00 vs 00:10:00 = exactly 300s) included
    assert(banded.contains(("l2", "r2")))
    // out-of-tolerance and cross-key pairs excluded
    assert(!banded.exists(_._2 == "r3"))
  }
}
