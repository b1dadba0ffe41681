package graft.bench

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic climate-grid generators (reference `src/arco_demo.py:36-116`
  * S13, `src/benchmark_suite.py:269-327` S14, and the pytest fixture
  * `tests/conftest.py:8-89` — see FIXTURES.md).
  *
  * Pure column expressions over `spark.range` cross joins: the generator
  * itself is partition-parallel and scales to arbitrary grid sizes without
  * driver memory (no local arrays — 100 TB of synthetic grid is just a
  * bigger range).
  */
object DataGen {

  /** The reference's workhorse fixture (`conftest.py:8-66`): daily data on
    * a 10° grid; temperature = 288 − 40·|lat|/90 + 10·sin(2π(doy−80)/365)
    * + N(0,2), precipitation ~ Exp(0.001), both seeded.
    */
  def sampleGrid(
      spark: SparkSession,
      days: Int = 731,
      startDate: String = "2020-01-01",
      latPoints: Int = 19,
      lonPoints: Int = 36,
      seed: Long = 42L
  ): DataFrame = {
    val time = spark.range(days)
      .select(date_add(lit(startDate).cast("date"), col("id").cast("int")).as("d"))
      .select(col("d").cast("timestamp").as("ts"))
    val lat = spark.range(latPoints)
      .select((col("id") * (180.0 / (latPoints - 1)) - 90.0).as("lat"))
    val lon = spark.range(lonPoints)
      .select((col("id") * (360.0 / lonPoints) - 180.0).as("lon"))
    val grid = time.crossJoin(lat).crossJoin(lon)
    val doy = dayofyear(col("ts"))
    val seasonal = lit(10.0) * sin(lit(2 * math.Pi) * (doy - 80) / lit(365.0))
    val gradient = lit(288.0) - lit(40.0) * abs(col("lat")) / lit(90.0)
    grid
      .withColumn("temperature", gradient + seasonal + randn(seed) * 2.0)
      // inverse-CDF exponential from uniform noise, scale 0.001 (units: m)
      .withColumn("precipitation", -lit(0.001) * log(lit(1.0) - rand(seed + 1)))
  }

  /** The 10-day 3×3 fixture (`conftest.py:77-89`). */
  def smallGrid(spark: SparkSession, seed: Long = 42L): DataFrame = {
    val time = spark.range(10)
      .select(date_add(lit("2020-01-01").cast("date"), col("id").cast("int"))
        .cast("timestamp").as("ts"))
    val coord = (id: org.apache.spark.sql.Column) => id * 10.0 - 10.0
    val lat = spark.range(3).select(coord(col("id")).as("lat"))
    val lon = spark.range(3).select(coord(col("id")).as("lon"))
    time.crossJoin(lat).crossJoin(lon)
      .withColumn("temperature", lit(280.0) + randn(seed) * 5.0)
  }

  /** Deterministic synthetic document corpus for dedup scale probes
    * (builder north-star scope — no reference analog): `nDocs` documents of
    * `wordsPerDoc` words drawn from a `vocab`-word vocabulary by a seeded
    * hash of (doc id, position), plus one near-duplicate twin (last
    * `perturb` words rewritten) for every `1/dupFrac`-th doc, under
    * id + nDocs. Pure column expressions over `spark.range` — the
    * generator is partition-parallel and never holds a document on the
    * driver.
    */
  def corpus(
      spark: SparkSession,
      nDocs: Long,
      wordsPerDoc: Int = 80,
      vocab: Int = 5000,
      dupEvery: Int = 100,
      perturb: Int = 8,
      seed: Long = 42L
  ): DataFrame = {
    def word(pos: Int, alt: Boolean): Column =
      if (alt) concat(lit("z"), pmod(xxhash64(col("id"), lit(pos), lit(seed + 1)), lit(vocab)))
      else concat(lit("w"), pmod(xxhash64(col("id"), lit(pos), lit(seed)), lit(vocab)))
    def text(altTail: Boolean): Column = concat_ws(" ",
      (0 until wordsPerDoc).map(p => word(p, altTail && p >= wordsPerDoc - perturb)): _*)
    val base = spark.range(nDocs).select(col("id"), text(altTail = false).as("text"))
    val twins = spark.range(nDocs).where(pmod(col("id"), lit(dupEvery)) === 0)
      .select(col("id"), text(altTail = true).as("text"))
      .withColumn("id", col("id") + nDocs)
    base.unionByName(twins)
  }

  /** Hash-uniform draw in (0,1): the first 8 md5 hex digits of
    * `"tag:k1:k2:…"` over INTEGER grid indices, +0.5 so the value is
    * strictly inside the open interval (ln(u) and ln(1−u) stay finite).
    * Unlike `rand`/`randn` (Spark-internal XORShift streams), an external
    * engine can replay this exactly — DuckDB:
    * `(CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT) + 0.5) / 4294967296.0`.
    */
  private def hashU(tag: String, keys: Column*): Column =
    (conv(substring(md5(concat_ws(":", lit(tag) +: keys.map(_.cast("string")): _*)), 1, 8),
      16, 10).cast("long") + lit(0.5)) / lit(4294967296.0)

  /** S13/S14 in a DuckDB-replayable form: the same grid and signal as
    * [[sampleGrid]] (reference `conftest.py:8-66`) but with the noise as a
    * deterministic hash draw — N(0,1) via Box-Muller over two md5
    * uniforms, Exp via inverse CDF over a third — keyed on the integer
    * grid indices `(d, i, j)`. Every value is recomputable bit-for-bit
    * before rounding by any engine with md5/ln/sqrt/cos, which is what
    * lets the generators be driver-oracle-checked rather than spec-only.
    * [[sampleGrid]] keeps Spark-native `randn`/`rand` for bench/test
    * ergonomics; this is the verification twin.
    */
  def deterministicGrid(
      spark: SparkSession,
      days: Int = 366,
      startDate: String = "2020-01-01",
      latPoints: Int = 19,
      lonPoints: Int = 36
  ): DataFrame = {
    val time = spark.range(days).select(col("id").cast("int").as("d"))
    val lat = spark.range(latPoints).select(col("id").cast("int").as("i"))
    val lon = spark.range(lonPoints).select(col("id").cast("int").as("j"))
    val keys = Seq(col("d"), col("i"), col("j"))
    val u1 = hashU("graft-gen:t1", keys: _*)
    val u2 = hashU("graft-gen:t2", keys: _*)
    val u3 = hashU("graft-gen:p", keys: _*)
    // Box-Muller; the SQL oracle parenthesizes identically (float × is not
    // associative, so 2·(sqrt·cos) must not become (2·sqrt)·cos there).
    val z = sqrt(lit(-2.0) * log(u1)) * cos(lit(2 * math.Pi) * u2)
    val grid = time.crossJoin(lat).crossJoin(lon)
      .withColumn("ts",
        date_add(lit(startDate).cast("date"), col("d")).cast("timestamp"))
      .withColumn("lat", col("i") * lit(180.0 / (latPoints - 1)) - lit(90.0))
      .withColumn("lon", col("j") * lit(360.0 / lonPoints) - lit(180.0))
    val doy = dayofyear(col("ts"))
    val seasonal = lit(10.0) * sin(lit(2 * math.Pi) * (doy - 80) / lit(365.0))
    val gradient = lit(288.0) - lit(40.0) * abs(col("lat")) / lit(90.0)
    grid
      .withColumn("temperature", gradient + seasonal + lit(2.0) * z)
      .withColumn("precipitation", lit(-0.001) * log(lit(1.0) - u3))
      .drop("d", "i", "j")
  }

  /** Synthetic embedding corpus for the ANN scale probe: dim hash-derived
    * floats in [-1, 1) per vector — deterministic (no RNG state), fully
    * generated in-flight like [[corpus]], uniform over the hypersphere-ish
    * enough to exercise the ANN plans' cost shape.
    */
  def vectors(spark: SparkSession, n: Long, dim: Int, seed: Long = 42L): DataFrame =
    spark.range(n).toDF("vec_id")
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)),
          j => pmod(xxhash64(col("vec_id"), j, lit(seed)), lit(1000000L))
            .cast("double") / 500000.0 - 1.0))

  /** One event-time slice of a synthetic stream for the streaming scale
    * probe: `n` events with keys uniform over `nKeys` and timestamps
    * uniform within hour `slice` (epoch-based, starting 2020-01-01).
    * Slices are staged to files in order, so the file stream source
    * replays them oldest-first and the event-time watermark advances one
    * hour per micro-batch — which is what lets the probe observe state
    * EVICTION, not just state growth.
    */
  def eventSlice(
      spark: SparkSession,
      slice: Int,
      n: Long,
      nKeys: Long,
      salt: String = "ev"
  ): DataFrame =
    spark.range(n).select(
      pmod(xxhash64(lit(salt), col("id") + lit(slice) * n), lit(nKeys))
        .as("user_id"),
      timestamp_seconds(lit(1577836800L) + lit(slice * 3600L) +
        pmod(xxhash64(lit(salt + "t"), col("id")), lit(3600000L))
          .cast("double") / 1000.0).as("ts"))

  /** Benchmark-scale generator (`benchmark_suite.py:269-327`): named sizes
    * small/medium/large with 3 float variables.
    */
  def benchGrid(spark: SparkSession, size: String, seed: Long = 42L): DataFrame = {
    val (t, la, lo) = size match {
      case "small" => (100, 90, 180)
      case "medium" => (365, 180, 360)
      case "large" => (730, 360, 720)
      case other => throw new IllegalArgumentException(s"Unknown size: $other")
    }
    sampleGrid(spark, days = t, latPoints = la, lonPoints = lo, seed = seed)
      .withColumn("wind_speed", abs(lit(5.0) + randn(seed + 2) * 3.0))
  }
}
