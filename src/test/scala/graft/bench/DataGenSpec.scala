package graft.bench

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataGenSpec extends SparkSpec {

  /** First-principles replica of DataGen.hashU: first 8 md5 hex digits of
    * the key string, +0.5, over 2^32 — what the DuckDB oracle computes.
    */
  private def md5u(s: String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"${b & 0xff}%02x").mkString
    (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
  }

  test("deterministicGrid replays from first principles (one cell)") {
    // cell (d=1, i=1, j=1) of a 3×2×2 grid: ts 2020-01-02 (doy 2),
    // lat = 1·180−90 = 90, lon = 1·180−180 = 0
    val row = DataGen.deterministicGrid(spark, days = 3, latPoints = 2, lonPoints = 2)
      .where(col("lat") === 90.0 && col("lon") === 0.0 &&
        col("ts") === lit("2020-01-02").cast("timestamp"))
      .select("temperature", "precipitation").head()
    val u1 = md5u("graft-gen:t1:1:1:1")
    val u2 = md5u("graft-gen:t2:1:1:1")
    val u3 = md5u("graft-gen:p:1:1:1")
    val z = math.sqrt(-2.0 * math.log(u1)) * math.cos(2 * math.Pi * u2)
    val expTemp = 288.0 - 40.0 * 90.0 / 90.0 +
      10.0 * math.sin(2 * math.Pi * (2 - 80) / 365.0) + 2.0 * z
    val expPrecip = -0.001 * math.log(1.0 - u3)
    assert(math.abs(row.getDouble(0) - expTemp) < 1e-9,
      s"temperature ${row.getDouble(0)} != $expTemp")
    assert(math.abs(row.getDouble(1) - expPrecip) < 1e-9)
  }

  test("deterministicGrid is partition-invariant and statistically sane") {
    val g = DataGen.deterministicGrid(spark, days = 50, latPoints = 10, lonPoints = 10)
    val a = g.orderBy("ts", "lat", "lon").collect()
    val b = g.repartition(7).orderBy("ts", "lat", "lon").collect()
    assert(a.sameElements(b), "results must not depend on partitioning")
    assert(a.length == 50 * 10 * 10)
    val precipMean = g.agg(avg("precipitation")).head().getDouble(0)
    assert(precipMean > 0.0005 && precipMean < 0.002,
      s"Exp(0.001) sample mean out of range: $precipMean")
    // noise is N(0,2) around the deterministic signal: reconstruct the
    // signal and check the residual moments
    val doy = dayofyear(col("ts"))
    val signal = lit(288.0) - lit(40.0) * abs(col("lat")) / lit(90.0) +
      lit(10.0) * sin(lit(2 * math.Pi) * (doy - 80) / lit(365.0))
    val r = g.select((col("temperature") - signal).as("resid"))
      .agg(avg("resid").as("m"), stddev_pop(col("resid")).as("s")).head()
    assert(math.abs(r.getDouble(0)) < 0.2, s"residual mean ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 2.0) < 0.2, s"residual std ${r.getDouble(1)}")
  }
}
