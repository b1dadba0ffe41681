package graft.ingest

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  /** Plain-Scala reference: quantize then interleave bit-by-bit. */
  private def quantizeRef(v: Double, lo: Double, hi: Double, bits: Int): Long = {
    val cells = (1L << bits).toDouble
    math.min(math.max(math.floor((v - lo) / (hi - lo) * cells), 0.0), cells - 1).toLong
  }

  private def interleaveRef(even: Long, odd: Long): Long = {
    var r = 0L; var i = 0
    while (i < 32) {
      r |= ((even >> i) & 1L) << (2 * i)
      r |= ((odd >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }

  test("zValue equals the bit-by-bit reference interleave") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180)) ++
      Seq((-90.0, -180.0), (90.0, 180.0), (0.0, 0.0), (89.999, 179.999))
    val got = pts.toDF("lat", "lon")
      .select(ZOrder.zValue(col("lat"), col("lon"), 16)).as[Long].collect()
    val want = pts.map { case (la, lo) =>
      interleaveRef(quantizeRef(la, -90, 90, 16), quantizeRef(lo, -180, 180, 16))
    }
    assert(got.toSeq == want)
  }

  test("out-of-range coordinates clamp to boundary cells, never wrap") {
    import spark.implicits._
    val got = Seq((-95.0, -200.0), (95.0, 200.0))
      .toDF("lat", "lon")
      .select(ZOrder.zValue(col("lat"), col("lon"), 8)).as[Long].collect()
    assert(got(0) == 0L)
    assert(got(1) == interleaveRef(255L, 255L))
  }

  test("clustered write produces pairwise-disjoint per-file z intervals") {
    val g = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        (col("l_partkey") % 180 - 89).cast("double").as("lat"),
        graft.functions.TimeFns.normalizeLon(col("l_extendedprice")).as("lon"))
    val path = tmpDir() + "/zgrid"
    ZOrder.cluster(g, "lat", "lon", numPartitions = 4)
      .write.option("maxRecordsPerFile", 1000L).parquet(path)
    val spans = spark.read.parquet(path)
      .withColumn("z", ZOrder.zValue(col("lat"), col("lon"), 16))
      .groupBy(input_file_name().as("f"))
      .agg(min(col("z")).as("zmin"), max(col("z")).as("zmax"))
      .orderBy(col("zmin"))
      .collect()
    assert(spans.length > 4, s"expected several files, got ${spans.length}")
    // range partitioning + in-partition sort + maxRecordsPerFile splitting
    // ⇒ each file covers a z interval at most touching its neighbor at a
    // shared boundary value — the property min-max skipping relies on
    spans.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("zmin") >= a.getAs[Long]("zmax"),
          s"overlapping z intervals: $a vs $b")
      case _ =>
    }
    // and the rewrite is lossless
    assert(spark.read.parquet(path).count() == g.count())
  }

  test("bbox read over the clustered layout matches the source exactly") {
    val g = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_partkey") % 180 - 89).cast("double").as("lat"),
        graft.functions.TimeFns.normalizeLon(col("l_extendedprice")).as("lon"))
    val path = tmpDir() + "/zgrid2"
    ZOrder.cluster(g, "lat", "lon", numPartitions = 4).write.parquet(path)
    val bbox = (df: org.apache.spark.sql.DataFrame) =>
      df.where(col("lat").between(-30, 30) && col("lon").between(20, 80))
        .select("l_orderkey", "l_linenumber")
    val a = bbox(spark.read.parquet(path))
    val b = bbox(g)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
