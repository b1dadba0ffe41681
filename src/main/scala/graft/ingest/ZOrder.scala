package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) spatial clustering — the multi-dimensional
  * cousin of the reference's `spatial` chunk layout
  * (`ingest/arco_converter.py:20-107`: chunks shaped so one bbox touches
  * few chunks). A single sort column can cluster only one dimension;
  * interleaving the bits of quantized lat and lon gives a key whose
  * sort order keeps BOTH dimensions local, so a bbox predicate prunes
  * parquet row groups / files on the lat/lon min-max stats instead of
  * scanning the full table.
  *
  * At 100 TB this is the difference between a bbox query reading the
  * touched tiles (~bbox_area / cell_area files) and reading everything:
  * row-group stats on lat/lon are only selective when values are
  * clustered, and z-order is what clusters two dimensions at once.
  * Everything here is pure `Column` arithmetic — codegen'd, scan-local,
  * no shuffle beyond the final range partitioning of the write.
  */
object ZOrder {

  val MaxBitsPerDim = 31

  /** Spread the low 32 bits of `c` so bit i lands at position 2i (a zero
    * bit between each) — the standard magic-number Morton spread, as five
    * shift-and-mask steps instead of a per-bit loop.
    */
  def spreadBits(c: Column): Column = {
    val s0 = c.bitwiseAND(lit(0xFFFFFFFFL))
    val s1 = s0.bitwiseOR(shiftleft(s0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val s4 = s3.bitwiseOR(shiftleft(s3, 2)).bitwiseAND(lit(0x3333333333333333L))
    s4.bitwiseOR(shiftleft(s4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Quantize a value in [lo, hi] onto a 2^bits cell index, clamped so
    * out-of-range values land on the boundary cells instead of wrapping.
    */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val cells = 1L << bits
    least(
      greatest(floor((c - lit(lo)) / lit(hi - lo) * lit(cells.toDouble)), lit(0.0)),
      lit((cells - 1).toDouble)
    ).cast("long")
  }

  /** The Morton key: quantized lat and lon bit-interleaved (lat on even
    * bits, lon on odd). `bits` per dimension ⇒ a 2^bits × 2^bits tile
    * grid; 16 bits ≈ 5.5 km tiles at the equator — finer than any
    * realistic file count, so the key never limits clustering.
    */
  def zValue(lat: Column, lon: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= MaxBitsPerDim, s"bits must be in [1, $MaxBitsPerDim]")
    spreadBits(quantize(lat, -90.0, 90.0, bits))
      .bitwiseOR(shiftleft(spreadBits(quantize(lon, -180.0, 180.0, bits)), 1))
  }

  /** Rewrite `df` clustered on the Morton key: range-partition by z (so
    * partitions cover disjoint z ranges ⇒ disjoint spatial tiles), sort
    * within partitions (so row groups inside each file are tight too).
    * With `maxRecordsPerFile` splitting a sorted task stream, every
    * produced file covers a z interval disjoint from every other —
    * exactly the property file/row-group skipping needs.
    */
  def cluster(
      df: DataFrame,
      latCol: String,
      lonCol: String,
      numPartitions: Int,
      bits: Int = 16,
      keepKey: Boolean = false
  ): DataFrame = {
    // withColumn would silently REPLACE an existing z_key column and the
    // default path would then drop the caller's data — refuse instead
    require(!df.columns.contains("z_key"),
      "ZOrder.cluster: input already has a 'z_key' column — rename it first")
    val z = df.withColumn("z_key", zValue(col(latCol), col(lonCol), bits))
      .repartitionByRange(numPartitions, col("z_key"))
      .sortWithinPartitions(col("z_key"))
    if (keepKey) z else z.drop("z_key")
  }
}
