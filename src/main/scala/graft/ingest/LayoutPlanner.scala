package graft.ingest

import org.apache.spark.sql.types._

/** Physical write-layout planning (reference `ingest/arco_converter.py:20-107`
  * + `processing/chunking.py`, SURVEY.md S7/R5/R6).
  *
  * The reference plans Zarr chunk shapes per access pattern; the Spark-native
  * analog is a parquet partition/sort/file-size plan:
  *
  *  - timeseries → hash-repartition by spatial cell, sort by time within
  *    partitions: a point's full series is co-located and row-group stats
  *    prune time ranges.
  *  - spatial → partition directories by time bucket, sort by (lat, lon):
  *    a single timestep touches one directory; dynamic partition pruning
  *    applies.
  *  - balanced → range-repartition by (cell, time), sort by both.
  *
  * File sizing targets parquet-appropriate bytes (default 128 MB, the HDFS/
  * object-store sweet spot — the reference's 4 MB is a Zarr-chunk number;
  * the equivalent skippable unit in parquet is the row group, not the file).
  */
object LayoutPlanner {

  sealed trait AccessPattern
  case object Timeseries extends AccessPattern
  case object Spatial extends AccessPattern
  case object Balanced extends AccessPattern

  final case class WriteLayout(
      partitionBy: Seq[String],
      repartitionCols: Seq[String],
      rangePartition: Boolean,
      sortWithinPartitions: Seq[String],
      maxRecordsPerFile: Long,
      compression: String = "zstd",
      /** Non-fatal plan diagnostics, mirroring the reference's chunk-plan
        * warnings (`chunking.py:226-267`): out-of-band byte targets are
        * clamped AND surfaced here; columns named in the plan but absent
        * from the schema are flagged (the reference's unknown-dim warning).
        */
      warnings: Seq[String] = Nil
  )

  /** Conservative on-disk width estimate per row (uncompressed), used to
    * turn a byte target into maxRecordsPerFile — the analog of the
    * reference's chunk-size estimator (`chunking.py:226-267`).
    */
  def estimatedRowBytes(schema: StructType): Long =
    schema.fields.map(f => f.dataType match {
      case ByteType | BooleanType => 1L
      case ShortType => 2L
      case IntegerType | FloatType | DateType => 4L
      case LongType | DoubleType | TimestampType | TimestampNTZType => 8L
      case StringType => 24L
      case BinaryType => 64L
      case ArrayType(et, _) => 16L * (et match {
        case FloatType => 4L case DoubleType => 8L case _ => 8L })
      case _ => 16L
    }).sum.max(1L)

  /** S7 — choose a layout for an access pattern. `timeBucketCol` must be a
    * low-cardinality derived column (e.g. year or year-month) when using
    * Spatial — partitioning by raw timestamps would create one directory
    * per instant.
    */
  def plan(
      schema: StructType,
      pattern: AccessPattern,
      cellCols: Seq[String],
      tsCol: String,
      timeBucketCol: Option[String] = None,
      targetFileMB: Int = 128
  ): WriteLayout = {
    val clamped = clampTargetMB(targetFileMB)
    val target = clamped * 1024L * 1024L
    val maxRecords = (target / estimatedRowBytes(schema)).max(1000L)
    val known = schema.fieldNames.toSet
    val warnings = Seq.newBuilder[String]
    if (clamped != targetFileMB)
      warnings += s"target file size ${targetFileMB} MB outside the " +
        s"[16, 1024] MB parquet band; clamped to $clamped MB"
    // the reference's unknown-dimension warning (`chunking.py:246-255`):
    // a plan column the schema lacks would fail late at write time —
    // surface it at plan time instead. timeBucketCol is usually DERIVED
    // before the write, so its absence is a warning, not an error.
    (cellCols :+ tsCol).filterNot(known).foreach(c =>
      warnings += s"plan column '$c' not in schema " +
        s"(${schema.fieldNames.take(8).mkString(", ")}...)")
    timeBucketCol.filterNot(known).foreach(c =>
      warnings += s"partition column '$c' not in schema; derive it before writeGrid")
    if (pattern == Spatial && timeBucketCol.isEmpty)
      warnings += "Spatial layout without timeBucketCol: no directory " +
        "partitioning, every timestep scan reads all files"
    val w = warnings.result()
    pattern match {
      case Timeseries => WriteLayout(
        partitionBy = Nil,
        repartitionCols = cellCols,
        rangePartition = false,
        sortWithinPartitions = cellCols :+ tsCol,
        maxRecordsPerFile = maxRecords,
        warnings = w)
      case Spatial => WriteLayout(
        partitionBy = timeBucketCol.toSeq,
        repartitionCols = timeBucketCol.toSeq,
        rangePartition = false,
        sortWithinPartitions = cellCols,
        maxRecordsPerFile = maxRecords,
        warnings = w)
      case Balanced => WriteLayout(
        partitionBy = Nil,
        repartitionCols = cellCols :+ tsCol,
        rangePartition = true,
        sortWithinPartitions = cellCols :+ tsCol,
        maxRecordsPerFile = maxRecords,
        warnings = w)
    }
  }

  /** R6 — clamp the byte target into the sane band, mirroring the
    * reference's warnings outside its [0.1, 100] MB chunk band
    * (`chunking.py:258-265`) scaled to parquet file sizes.
    */
  def clampTargetMB(mb: Int): Int = math.min(math.max(mb, 16), 1024)
}
