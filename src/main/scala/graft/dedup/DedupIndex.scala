package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash LSH dedup index — incremental corpus ingestion
  * (builder north-star scope; no counterpart in the reference). A corpus
  * built over months cannot re-run all-corpus dedup per batch: the index
  * is fit ONCE over the existing corpus, each arriving batch is queried
  * against it (near-dup pairs back), and survivors are APPENDED so the
  * next batch sees them. The dedup twin of the IVF-PQ index lifecycle in
  * `sim/Similarity` (fit / serve / append), sharing its store shape.
  *
  * Store layout under `path/`:
  *  - `meta`   — one row: (n, num_hashes, bands, seed)
  *  - `bands`  — (id, band, bucket): the LSH postings, corpus × bands rows
  *  - `grams`  — (id, gs): per-doc n-gram xxhash64 sets, for exact-Jaccard
  *               verification of candidates
  *
  * Determinism contract: signatures are fixed-seed universal hashes over
  * fixed-seed xxhash64 gram hashes, and buckets are fixed-seed Murmur3
  * over position-sorted minima ([[Dedup.bandBuckets]]) — so bands written
  * by any session/partitioning join exactly against bands computed by any
  * other. That equality IS the index format.
  *
  * Scale shape of [[query]]: the batch side (a daily increment, orders of
  * magnitude below the corpus) is BROADCAST to the persisted postings
  * scan, so the corpus-sized `bands` table never shuffles; candidates —
  * the only corpus rows that move — are LSH-pruned before the exact
  * verification joins. Cost tracks the batch and its candidates, not the
  * corpus.
  */
object DedupIndex {

  final case class Params(n: Int, numHashes: Int, bands: Int, seed: Long)

  /** Fit the index over the existing corpus and persist it. */
  def write(df: DataFrame, idCol: String, textCol: String, path: String,
            n: Int = 3, numHashes: Int = 64, bands: Int = 32,
            seed: Long = 42L): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, numHashes, bands, seed))
      .toDF("n", "num_hashes", "bands", "seed")
      .write.mode("overwrite").parquet(s"$path/meta")
    writeRows(df, idCol, textCol, path, Params(n, numHashes, bands, seed),
      mode = "overwrite")
  }

  def params(spark: SparkSession, path: String): Params = {
    val m = spark.read.parquet(s"$path/meta").head()
    Params(m.getAs[Int]("n"), m.getAs[Int]("num_hashes"),
      m.getAs[Int]("bands"), m.getAs[Long]("seed"))
  }

  /** Add a batch to the searchable set (postings + gram sets appended;
    * no driver-side model exists, so there is nothing to invalidate).
    * Callers typically append the SURVIVORS of [[dedupBatch]].
    */
  def append(df: DataFrame, idCol: String, textCol: String,
             path: String): Unit =
    writeRows(df, idCol, textCol, path, params(df.sparkSession, path),
      mode = "append")

  private def writeRows(df: DataFrame, idCol: String, textCol: String,
                        path: String, p: Params, mode: String): Unit = {
    val grams = Dedup.gramHashSets(df, idCol, textCol, p.n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      grams.select(col(idCol).as("id"), col("gs"))
        .write.mode(mode).parquet(s"$path/grams")
      val sigs = Dedup.minhashSignatures(grams, idCol, p.numHashes, p.seed)
      Dedup.bandBucketsLocal(sigs, idCol, p.bands)
        .select(col(idCol).as("id"), col("band"), col("bucket"))
        .write.mode(mode).parquet(s"$path/bands")
    } finally grams.unpersist()
  }

  /** Near-dup pairs between a new batch and the indexed corpus:
    * `(query_id, index_id, jaccard)` for every batch document whose exact
    * n-gram Jaccard against an indexed document reaches `threshold`,
    * LSH-pruned exactly like [[Dedup.minhashDedup]]. `excludeSelf` drops
    * `query_id == index_id` hits (a re-queried document always matches
    * its own postings).
    */
  def query(batch: DataFrame, idCol: String, textCol: String, path: String,
            threshold: Double = 0.5, excludeSelf: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    val p = params(spark, path)
    val grams = Dedup.gramHashSets(batch, idCol, textCol, p.n)
      .select(col(idCol).as("query_id"), col("gs"))
    val sigs = Dedup.minhashSignatures(grams, "query_id", p.numHashes, p.seed)
    // scan-local banding: the batch side feeds a broadcast, so there is no
    // self-join exchange to reuse — zero shuffle before the candidate join
    val qBands = Dedup.bandBucketsLocal(sigs, "query_id", p.bands)
    val ixBands = spark.read.parquet(s"$path/bands")
    // batch ≪ corpus: broadcast the batch postings — the persisted bands
    // scan stays shuffle-free, candidates are the only corpus rows moving
    val cands = ixBands
      .join(broadcast(qBands), Seq("band", "bucket"))
      .select(col("query_id"), col("id").as("index_id"))
      .distinct()
    val ixGrams = spark.read.parquet(s"$path/grams")
      .select(col("id").as("index_id"), col("gs").as("gs2"))
    val verified = cands
      .join(broadcast(grams.select(col("query_id"), col("gs").as("gs1"))),
        Seq("query_id"))
      .join(ixGrams, Seq("index_id"))
      .withColumn("inter", size(array_intersect(col("gs1"), col("gs2"))))
      .withColumn("jaccard", col("inter").cast("double")
        / (size(col("gs1")) + size(col("gs2")) - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("query_id"), col("index_id"), col("jaccard"))
    if (excludeSelf) verified.where(col("query_id") =!= col("index_id"))
    else verified
  }

  /** The batch rows with NO near-dup already in the index — the survivors
    * an ingestion pipeline appends and keeps. (Intra-batch duplicates are
    * the caller's self-dedup pass — [[Dedup.minhashDedup]] on the batch.)
    */
  def dedupBatch(batch: DataFrame, idCol: String, textCol: String,
                 path: String, threshold: Double = 0.5): DataFrame = {
    val dupIds = query(batch, idCol, textCol, path, threshold)
      .select(col("query_id").as(idCol)).distinct()
    batch.join(dupIds, Seq(idCol), "left_anti")
  }

  /** The LIVE ingestion loop: every arriving micro-batch is deduped
    * against the store, survivors are APPENDED (so the next micro-batch
    * sees them) and recorded to `survivorsPath` — the greedy keep-first
    * semantics a 100 TB corpus accretes under, as a Structured Streaming
    * sink. Survivors are MATERIALIZED (persist + count) before the
    * append: their plan reads the same store files the append mutates,
    * so laziness here would be a read-your-own-write race.
    *
    * Caller owns trigger/checkpoint via the returned writer; the result
    * is order-dependent by design (greedy over micro-batch arrival —
    * q_stream_ingest pins 4 deterministic batches against a 4-stage
    * unrolled SQL oracle).
    */
  def ingestStream(batches: DataFrame, idCol: String, textCol: String,
                   path: String, survivorsPath: String,
                   threshold: Double = 0.5)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    batches.writeStream.foreachBatch {
      (df: DataFrame, _: Long) =>
        val surv = dedupBatch(df, idCol, textCol, path, threshold)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          surv.count() // materialize BEFORE the store mutates
          append(surv, idCol, textCol, path)
          surv.select(col(idCol))
            .write.mode("append").parquet(survivorsPath)
        } finally { surv.unpersist(); () }
    }
}
