package graft.operators

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {

  test("salted join is row-identical to the plain join") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val salted = Salting.saltedJoin(li, o, "l_orderkey", "l_partkey", 8)
      .select("l_orderkey", "l_partkey", "o_orderpriority")
    val plain = li.join(o, Seq("l_orderkey"))
      .select("l_orderkey", "l_partkey", "o_orderpriority")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join preserves duplicate matches on the build side") {
    import spark.implicits._
    val fact = Seq((1L, 10L), (1L, 11L), (2L, 12L)).toDF("k", "tb")
    // key 1 matches TWO build rows — the salted form must emit both per
    // fact row, exactly like the plain inner join
    val build = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "tag")
    val salted = Salting.saltedJoin(fact, build, "k", "tb", 4)
      .select("k", "tb", "tag")
    val plain = fact.join(build, Seq("k")).select("k", "tb", "tag")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() == 5)
  }

  test("reserved-column collisions fail loudly instead of corrupting") {
    import spark.implicits._
    val withSalt = Seq((1L, 2L, 3L)).toDF("k", "tb", "_salt")
    val plain = Seq((1L, 2L)).toDF("k", "tb")
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(withSalt, plain, "k", "tb")
    }
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(plain, withSalt.select("k", "_salt"), "k", "tb")
    }
    intercept[IllegalArgumentException] {
      graft.ingest.ZOrder.cluster(
        Seq((1.0, 2.0, 3L)).toDF("lat", "lon", "z_key"), "lat", "lon", 2)
    }
    intercept[IllegalArgumentException] {
      Incremental.partialState(plain, Seq("p_n"), "tb")
    }
    intercept[IllegalArgumentException] {
      graft.ingest.GridSink.compact(spark, "/tmp/same", "/tmp/same")
    }
  }

  test("every salt bucket receives rows for a hot key") {
    val li = Tables.lineitem(spark, sfDir)
    val buckets = li
      .select(Salting.salt(col("l_partkey"), 8).as("s"))
      .distinct().count()
    assert(buckets == 8, s"salt must spread across all 8 buckets, got $buckets")
  }
}
