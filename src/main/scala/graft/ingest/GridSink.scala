package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Layout-aware parquet sink + store introspection
  * (reference `ingest/arco_converter.py:110-246`, SURVEY.md S8-S12).
  */
object GridSink {

  /** S8 — write with the planned layout: repartition (hash or range),
    * sort within partitions, optional directory partitioning, zstd by
    * default, `maxRecordsPerFile` bounding file size. `overwrite=false`
    * fails if the store exists (the reference's `w-` mode,
    * `arco_converter.py:130-136`).
    */
  def writeGrid(df: DataFrame, path: String, layout: LayoutPlanner.WriteLayout,
                overwrite: Boolean = false): Unit = {
    val repartitioned =
      if (layout.repartitionCols.isEmpty) df
      else if (layout.rangePartition)
        df.repartitionByRange(layout.repartitionCols.map(col): _*)
      else df.repartition(layout.repartitionCols.map(col): _*)
    val sorted =
      if (layout.sortWithinPartitions.isEmpty) repartitioned
      else repartitioned.sortWithinPartitions(layout.sortWithinPartitions.map(col): _*)
    var w = sorted.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .option("compression", layout.compression)
      .option("maxRecordsPerFile", layout.maxRecordsPerFile)
    if (layout.partitionBy.nonEmpty) w = w.partitionBy(layout.partitionBy: _*)
    w.parquet(path)
  }

  /** S10 — rechunk ≅ repartition to a new layout without rewriting logic
    * (`arco_converter.py:182-195`).
    */
  def rechunk(df: DataFrame, layout: LayoutPlanner.WriteLayout): DataFrame = {
    val rep =
      if (layout.repartitionCols.isEmpty) df
      else if (layout.rangePartition) df.repartitionByRange(layout.repartitionCols.map(col): _*)
      else df.repartition(layout.repartitionCols.map(col): _*)
    if (layout.sortWithinPartitions.isEmpty) rep
    else rep.sortWithinPartitions(layout.sortWithinPartitions.map(col): _*)
  }

  /** Bucketed write for co-located joins: both sides bucketed by the join
    * key into the same bucket count join WITHOUT a shuffle (each bucket
    * pairs 1:1). The cluster-scale answer to "this join shuffles 100 TB
    * every day" — pre-shuffle once at write time. Requires saveAsTable
    * (bucket metadata lives in the catalog, not parquet footers).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil,
                    overwrite: Boolean = true): Unit = {
    var w = df.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .option("compression", "zstd")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.format("parquet").saveAsTable(table)
  }

  /** Small-files compaction: rewrite a store into ≈`targetFileMB` files
    * computed from its MEASURED on-disk bytes. Streaming ingest, frequent
    * partitioned appends, and over-parallel writes accumulate files far
    * below the row-group sweet spot, and at 100 TB scan cost becomes
    * per-file overhead (open + footer + seek) instead of bytes; periodic
    * compaction is the housekeeping op every large store needs. Sorting
    * columns are preserved per-file when given so min/max skipping
    * survives the rewrite. Returns the compacted store's info.
    */
  def compact(spark: SparkSession, src: String, dest: String,
              targetFileMB: Int = 128,
              sortCols: Seq[String] = Nil): StoreInfo = {
    // overwriting the store being read would destroy it mid-scan; compare
    // fully-qualified paths so scheme/relative aliases can't slip past —
    // and reject NESTING either way: a dest that is a parent of src
    // recursively deletes the source before the scan runs, and a dest
    // inside src leaves the compacted copy polluting every later
    // openStore(src) with duplicated rows
    val hconf = spark.sparkContext.hadoopConfiguration
    val srcQ = new Path(src).getFileSystem(hconf).makeQualified(new Path(src))
    val destQ = new Path(dest).getFileSystem(hconf).makeQualified(new Path(dest))
    def contains(outer: Path, inner: Path): Boolean = {
      var p: Path = inner
      while (p != null) { if (p == outer) return true; p = p.getParent }
      false
    }
    require(srcQ != destQ, s"compact: dest must differ from src ($srcQ)")
    require(!contains(destQ, srcQ),
      s"compact: dest $destQ contains src $srcQ — the overwrite would delete the source store")
    require(!contains(srcQ, destQ),
      s"compact: dest $destQ is inside src $srcQ — later reads of src would double-count")
    val info = storeInfo(spark, src)
    val target = LayoutPlanner.clampTargetMB(targetFileMB) * 1024L * 1024L
    val nFiles = math.max(1L, (info.totalBytes + target - 1) / target).toInt
    val df = openStore(spark, src)
    val rep =
      if (sortCols.isEmpty) df.repartition(nFiles)
      else df.repartitionByRange(nFiles, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    rep.write.mode(SaveMode.Overwrite).option("compression", "zstd").parquet(dest)
    storeInfo(spark, dest)
  }

  /** S11 — open a store (parquet footers are the consolidated metadata). */
  def openStore(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  final case class StoreInfo(
      path: String, nFiles: Long, totalBytes: Long, nRows: Long, schemaDdl: String)

  /** S12 — store introspection: file count/bytes from the filesystem,
    * row count and schema from footers (`arco_converter.py:214-246`).
    */
  def storeInfo(spark: SparkSession, path: String): StoreInfo = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(path), true)
    var files = 0L; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) { files += 1; bytes += f.getLen }
    }
    val df = spark.read.parquet(path)
    StoreInfo(path, files, bytes, df.count(), df.schema.toDDL)
  }
}
