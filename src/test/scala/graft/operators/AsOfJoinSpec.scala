package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (2L, ts("2024-01-01 10:01:00"), 50.0)
  ).toDF("key", "ts", "price")

  private lazy val trades = Seq(
    (1L, ts("2024-01-01 10:00:30"), 1L), // after first quote
    (1L, ts("2024-01-01 10:05:00"), 2L), // exactly at second quote → matches it
    (1L, ts("2024-01-01 09:59:00"), 3L), // before any quote → null
    (2L, ts("2024-01-01 11:00:00"), 4L), // one hour stale
    (3L, ts("2024-01-01 10:00:00"), 5L)  // key with no quotes → null
  ).toDF("key", "ts", "trade_id")

  test("asof join picks latest quote at-or-before each trade") {
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("key"), "ts", "ts", Seq("price"))
      .select("trade_id", "price").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(100.0)) // between quotes → earlier one
    assert(out(2L).contains(101.0)) // equal timestamps match (>= semantics)
    assert(out(3L).isEmpty)         // nothing before → null
    assert(out(4L).contains(50.0))  // unbounded staleness
    assert(out(5L).isEmpty)         // unseen key
  }

  test("a null value on the LATEST right row is carried as null — fields " +
    "from different right rows never mix") {
    val q = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(100.0)),
      (1L, ts("2024-01-01 10:05:00"), Option.empty[Double])
    ).toDF("key", "ts", "price")
    val t = Seq((1L, ts("2024-01-01 10:06:00"), 1L))
      .toDF("key", "ts", "trade_id")
    val row = AsOfJoin.asofJoin(t, q, Seq("key"), "ts", "ts", Seq("price"))
      .select("asof_ts", "price").head()
    // the latest right ROW (10:05, price=null) is attached whole: asof_ts
    // says 10:05 and price is null — not 10:05 with the 10:00 row's 100.0
    assert(row.getTimestamp(0) == ts("2024-01-01 10:05:00"))
    assert(row.isNullAt(1),
      "price must be the matched row's null, not an older row's value")
  }

  test("reserved working names reject loudly instead of overwriting") {
    val t = Seq((1L, ts("2024-01-01 10:00:00"), 7L))
      .toDF("key", "ts", "asof_ts")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(t, quotes, Seq("key"), "ts", "ts", Seq("price"))
    }
    assert(e.getMessage.contains("asof_ts"))
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("key"), "ts", "ts",
      Seq("price"), tolerance = Some(600)) // 10 minutes
      .select("trade_id", "price").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(100.0))
    assert(out(4L).isEmpty) // 59 min stale > tolerance
  }

  test("left rows and columns are preserved, ts exactly once") {
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("key"), "ts", "ts", Seq("price"))
    assert(out.count() == trades.count())
    assert(Seq("key", "ts", "trade_id", "price", "asof_ts").forall(out.columns.contains))
    // regression: the left ts must appear ONCE (a duplicate made any
    // downstream col("ts") reference ambiguous)
    assert(out.columns.count(_ == "ts") == 1)
    out.select("ts").collect() // must not throw AMBIGUOUS_REFERENCE
  }
}
