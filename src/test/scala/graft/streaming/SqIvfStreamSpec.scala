package graft.streaming

import graft.SparkSpec
import graft.sim.Similarity
import graft.util.AtomicStore
import org.apache.spark.sql.functions._

/** The stream-maintained SQ×IVF index's EXTENSION leg — the no-refit
  * regime q_stream_sq_ivf's fixture (every batch folds via refit) does
  * not leave behind: batches accumulate in `codes_stream`, serving reads
  * base ∪ extension, replay rewrites its own partitions, and the growth
  * signal sees the streamed share. (The refit leg, restart, and the
  * highwater replay guard are pinned by the q_stream_sq_ivf driver
  * fixture and its full-derivation oracle.)
  */
class SqIvfStreamSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  test("extension growth: streamed batches serve identically to a stored-model re-encode") {
    val d = tmpDir() + "/sqstream"
    Similarity.writeSqIvfIndex(emb.where(col("vec_id") < 40),
      "vec_id", "embedding", d, dim = 64, nlist = 8)
    // two streamed batches land in the extension (no refit — threshold
    // unreachable, driven via the append directly)
    Similarity.appendSqIvfStreamBatch(
      emb.where(col("vec_id") >= 40 && col("vec_id") < 50),
      "vec_id", "embedding", d, batchId = 0L)
    Similarity.appendSqIvfStreamBatch(
      emb.where(col("vec_id") >= 50 && col("vec_id") < 60),
      "vec_id", "embedding", d, batchId = 1L)
    assert(AtomicStore.currentGen(spark, d).contains(1L))
    val gdir = AtomicStore.resolve(spark, d)
    assert(new java.io.File(s"$gdir/codes_stream").exists())
    val fresh = spark.newSession()
    val idx = Similarity.openSqIvfIndex(fresh, d)
    assert(idx.codes.count() == 60, "base 40 + 2 streamed batches of 10")
    // serve parity: base ∪ extension must equal the full corpus encoded
    // with the SAME stored centroids (int8 scores are exact integers, so
    // parity is value-for-value)
    val all = emb.where(col("vec_id") < 60)
    def rows(codes: org.apache.spark.sql.DataFrame) = Similarity
      .sqIvfServe(codes, all, "vec_id", "embedding", k = 5, idx.cents,
        nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val served = rows(idx.codes)
    assert(served ==
      rows(Similarity.sqIvfEncode(all, "vec_id", "embedding", idx.cents)))
    // growth sees the streamed share: 20 streamed over 40 fitted
    assert(math.abs(Similarity.sqIvfStreamGrowth(spark, d) - 0.5) < 1e-9)
    // at-least-once replay of batch 1 (same rows, same id): dynamic
    // partition overwrite rewrites that batch's partitions — counts AND
    // served answers unchanged
    Similarity.appendSqIvfStreamBatch(
      emb.where(col("vec_id") >= 50 && col("vec_id") < 60),
      "vec_id", "embedding", d, batchId = 1L)
    val after = Similarity.openSqIvfIndex(spark.newSession(), d)
    assert(after.codes.count() == 60, "replay must not double rows")
    assert(rows(after.codes) == served, "replay must not change answers")
    // growth-triggered refit folds the extension into a fresh generation
    assert(Similarity.refitSqIvfIndex(all, "vec_id", "embedding", d,
      threshold = 0.4, streamHighwater = Some(1L)), "refit must trigger at 0.5 growth")
    assert(!Similarity.refitSqIvfIndex(all, "vec_id", "embedding", d,
      threshold = 0.4), "refit must be a no-op right after a refit")
    val g2 = AtomicStore.resolve(spark, d)
    assert(!new java.io.File(s"$g2/codes_stream").exists(),
      "a refit generation starts with no extension")
    assert(spark.read.parquet(s"$g2/codes").count() == 60)
    // the refit's highwater absorbs a replay of the folded batch
    Similarity.appendSqIvfStreamBatch(
      emb.where(col("vec_id") >= 50 && col("vec_id") < 60),
      "vec_id", "embedding", d, batchId = 1L)
    assert(!new java.io.File(s"$g2/codes_stream").exists(),
      "replay below the highwater must be skipped")
  }
}
