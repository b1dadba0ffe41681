package graft.queries

import graft.model.Tables
import graft.sim.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table: exact brute-force paths
  * are oracle-checked; the LSH path is rows-only here and recall-checked
  * against the exact result in SimilaritySpec.
  */
object SimQ extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.where(col("vec_id") === 0)
        .select(transform(col("embedding"), _.cast("double")))
        .head().getSeq[Double](0)
      round6(
        Similarity.topKForVector(emb.where(col("vec_id") =!= 0),
          "vec_id", "embedding", q, k = 10),
        "cosine")
    }),
    "q_knn_sample" -> ((s, dir) =>
      round6(
        Similarity.knnJoin(
          Tables.embeddings(s, dir).where(col("vec_id") < 50),
          "vec_id", "embedding", k = 3),
        "cosine")),
    "q_lsh_ann" -> ((s, dir) =>
      round6(
        Similarity.lshTopK(
          Tables.embeddings(s, dir).where(col("vec_id") < 50),
          "vec_id", "embedding", k = 3, dim = 64),
        "cosine")),
    // Embedding near-dup pairs via LSH buckets — the scale path whose
    // O(n²) baseline is q_embedding_dedup; same full-replay oracle style
    // as q_lsh_ann (planes inlined, buckets/candidates/cosines all
    // recomputed by DuckDB).
    "q_lsh_dup_pairs" -> ((s, dir) =>
      round6(
        Similarity.lshCosinePairs(Tables.embeddings(s, dir),
          "vec_id", "embedding", threshold = 0.45, dim = 64,
          bits = 16, bands = 4),
        "cosine")),
    // The size-aware operating point through the gate: at the gate tables'
    // corpus sizes (500 @ sf0.01, 2000 @ sf0.1) the auto sizing lands on
    // the 2-bit-per-band floor, so the oracle replays bits = 12, bands = 6
    // — the SAME constants the formula produces for any n ≤ 4096·2
    // (bitsPerBand = max(2, ceil(log2(n/1024)))). A change to the sizing
    // formula or the seeded planes hash-mismatches here.
    "q_lsh_auto_pairs" -> ((s, dir) =>
      round6(
        Similarity.lshCosinePairsAuto(Tables.embeddings(s, dir),
          "vec_id", "embedding", threshold = 0.45, dim = 64),
        "cosine")),
    // IVF coarse-quantizer ANN (k-means cells + probing): the query emits
    // per-query recall@3 against the in-engine brute-force kNN. The
    // oracle REPLAYS the entire pipeline in DuckDB — the seeded init
    // (Spark xxhash64 over the raw element bits, recomputed arithmetically),
    // all 10 Lloyd's iterations, the L2² cell assignment, the cosine
    // probe ranking, and the recall join — so nothing is pinned from the
    // engine (see [[IvfKmeansSql]]).
    "q_ivf_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).where(col("vec_id") < 50)
      val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
        k = 3, nlist = 8, nprobe = 4)
      val exact = Similarity.knnJoin(emb, "vec_id", "embedding", k = 3)
      ivf.join(exact.select(col("id1"), col("id2"), lit(1).as("hit")),
          Seq("id1", "id2"), "left")
        .groupBy(col("id1"))
        .agg(round(sum(coalesce(col("hit"), lit(0))) / 3.0, 6).as("recall"))
    }),
    // Product-quantization ANN (the compression layer: codes = m small
    // ints, ADC lookup scoring). Same pinned-recall oracle style as
    // q_ivf_ann: per-query recall@10 of the seeded deterministic run
    // against in-engine exact kNN.
    "q_pq_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).where(col("vec_id") < 50)
      val pq = Similarity.pqTopK(emb, "vec_id", "embedding",
        k = 10, dim = 64, m = 8, codebookSize = 16)
      val exact = Similarity.knnJoin(emb, "vec_id", "embedding", k = 10)
      pq.join(exact.select(col("id1"), col("id2"), lit(1).as("hit")),
          Seq("id1", "id2"), "left")
        .groupBy(col("id1"))
        .agg(round(sum(coalesce(col("hit"), lit(0))) / 10.0, 6).as("recall"))
    }),
    // IVF-PQ composition: coarse cells prune candidates, ADC scores them
    // — both scale dials engaged; recall@10 pinned as above.
    "q_ivfpq_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).where(col("vec_id") < 50)
      val ivfpq = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        k = 10, dim = 64, nlist = 8, nprobe = 4, m = 8, codebookSize = 16)
      val exact = Similarity.knnJoin(emb, "vec_id", "embedding", k = 10)
      ivfpq.join(exact.select(col("id1"), col("id2"), lit(1).as("hit")),
          Seq("id1", "id2"), "left")
        .groupBy(col("id1"))
        .agg(round(sum(coalesce(col("hit"), lit(0))) / 10.0, 6).as("recall"))
    })
    ,
    // FAISS-style residual IVF-PQ: codes quantize u − centroid(cell), the
    // score adds the ⟨q, centroid⟩ term per probed cell; recall@10 pinned
    // like the other quantizer queries (DedupSpec holds the independent
    // residual ≥ raw recall evidence).
    "q_ivfpq_residual" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).where(col("vec_id") < 50)
      val ivfpq = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        k = 10, dim = 64, nlist = 8, nprobe = 4, m = 8, codebookSize = 16,
        residual = true)
      val exact = Similarity.knnJoin(emb, "vec_id", "embedding", k = 10)
      ivfpq.join(exact.select(col("id1"), col("id2"), lit(1).as("hit")),
          Seq("id1", "id2"), "left")
        .groupBy(col("id1"))
        .agg(round(sum(coalesce(col("hit"), lit(0))) / 10.0, 6).as("recall"))
    }),
    // Persisted-index serving: the index (codebooks + centroids + cell-
    // partitioned codes) is written ONCE per session+sfDir, then a FRESH
    // session answers the batch purely from the store — no refit, no
    // corpus re-encode, no in-memory state from the build session. The
    // result must be bit-identical to the direct ivfPqTopK run, asserted
    // per query by matches_direct (null-safe over a full outer join, so a
    // missing or extra row also fails) and pinned in the oracle alongside
    // q_ivfpq_ann's recall vector.
    "q_ivfpq_served" -> ((s, dir) => {
      val idxDir = servedIndexDir(s, dir)
      // the whole comparison runs on ONE fresh session: the point is that
      // the SERVE side carries no build-session state, which the fresh
      // session proves by itself. The direct twin and the exact-kNN hit
      // set were pinned to parquet at fixture-build time (deterministic
      // functions of the same seeded fit — see servedIndexDir), so the
      // per-call plan is the true serving path, not a per-call refit.
      val fresh = s.newSession()
      val emb = Tables.embeddings(fresh, dir).where(col("vec_id") < 50)
      val idx = Similarity.openIvfPqIndex(fresh, idxDir)
      val served = Similarity.ivfPqServe(idx, emb, "vec_id", "embedding",
        k = 10, nprobe = 4)
      val direct = fresh.read.parquet(s"$idxDir/expected/direct")
      val exact = fresh.read.parquet(s"$idxDir/expected/exact")
      // both validations in ONE pass over the serve output: full-join the
      // pinned direct twin on (id1, rank), left-join the pinned exact hit
      // set on (id1, served id2), then a single groupBy computes the
      // bit-identity flag AND recall@10 — `served` executes once and the
      // timed plan is serve + 2 joins + 1 aggregate, not two parallel
      // join→agg chains over a recomputed serve
      served
        .select(col("id1"), col("rank"),
          col("id2").as("sid2"), col("score").as("sscore"))
        .join(direct.select(col("id1"), col("rank"),
          col("id2").as("did2"), col("score").as("dscore")),
          Seq("id1", "rank"), "full")
        .join(exact.select(col("id1"), col("id2").as("sid2"),
          lit(1).as("hit")), Seq("id1", "sid2"), "left")
        .groupBy(col("id1"))
        .agg(
          round(sum(coalesce(col("hit"), lit(0))) / 10.0, 6).as("recall"),
          min(col("sid2") <=> col("did2") && col("sscore") <=> col("dscore"))
            .as("matches_direct"))
        .select(col("id1"), col("recall"), col("matches_direct"))
    }),
    // Fit-once/GROW-many: the index is fit on vec_id < 40 only, then
    // vec_id 40..49 are APPENDED — encoded with the stored centroids/
    // codebooks (no refit) and written into the same cell-partitioned
    // layout. Serving the grown store must be bit-identical to serving
    // an index whose codes table is the full corpus re-encoded with the
    // SAME stored model (matches_rebuild, null-safe full-outer like
    // q_ivfpq_served) — i.e. append changes WHERE codes live, never what
    // they are. recall@10 is against the exact 50-vector kNN; it dips
    // below q_ivfpq_ann's (the quantizer never saw the appended
    // vectors — exactly the drift ivfPqCellDrift reports).
    "q_ivfpq_append" -> ((s, dir) => {
      val idxDir = appendIndexDir(s, dir)
      val fresh = s.newSession()
      val all = Tables.embeddings(fresh, dir).where(col("vec_id") < 50)
      val idx = Similarity.openIvfPqIndex(fresh, idxDir)
      val served = Similarity.ivfPqServe(idx, all, "vec_id", "embedding",
        k = 10, nprobe = 4)
      val rebuilt = idx.copy(codes =
        Similarity.encodeForIndex(idx, all, "vec_id", "embedding"))
      val direct = Similarity.ivfPqServe(rebuilt, all, "vec_id", "embedding",
        k = 10, nprobe = 4)
      val cmp = served
        .select(col("id1"), col("rank"),
          col("id2").as("sid2"), col("score").as("sscore"))
        .join(direct.select(col("id1"), col("rank"),
          col("id2").as("did2"), col("score").as("dscore")),
          Seq("id1", "rank"), "full")
        .groupBy(col("id1"))
        .agg(min(col("sid2") <=> col("did2") && col("sscore") <=> col("dscore"))
          .as("matches_rebuild"))
      val exact = Similarity.knnJoin(all, "vec_id", "embedding", k = 10)
      served.join(exact.select(col("id1"), col("id2"), lit(1).as("hit")),
          Seq("id1", "id2"), "left")
        .groupBy(col("id1"))
        .agg(round(sum(coalesce(col("hit"), lit(0))) / 10.0, 6).as("recall"))
        .join(cmp, Seq("id1"))
    }),
    // Fit-once/SHRINK-many: 7 of the 50 indexed vectors are tombstoned
    // (a cheap parquet append — no codes rewrite). Serving the live view
    // must be bit-identical to serving codes re-encoded from the
    // survivors with the same stored model (matches_filtered), serving
    // AFTER compaction must be bit-identical to serving the tombstoned
    // store (matches_compacted — compaction reclaims space, never
    // changes answers), and recall@10 is against the exact kNN over the
    // surviving corpus.
    "q_ivfpq_delete" -> ((s, dir) => {
      val delDir = deleteIndexDir(s, dir, compacted = false)
      val cmpDir = deleteIndexDir(s, dir, compacted = true)
      val fresh = s.newSession()
      val survivors = Tables.embeddings(fresh, dir)
        .where(col("vec_id") < 50 && col("vec_id") % 7 =!= 3)
      val idx = Similarity.openIvfPqIndex(fresh, delDir)
      val served = Similarity.ivfPqServe(idx, survivors, "vec_id", "embedding",
        k = 10, nprobe = 4)
      val rebuilt = idx.copy(codes =
        Similarity.encodeForIndex(idx, survivors, "vec_id", "embedding"))
      val direct = Similarity.ivfPqServe(rebuilt, survivors, "vec_id", "embedding",
        k = 10, nprobe = 4)
      val cmpF = served
        .select(col("id1"), col("rank"),
          col("id2").as("sid2"), col("score").as("sscore"))
        .join(direct.select(col("id1"), col("rank"),
          col("id2").as("did2"), col("score").as("dscore")),
          Seq("id1", "rank"), "full")
        .groupBy(col("id1"))
        .agg(min(col("sid2") <=> col("did2") && col("sscore") <=> col("dscore"))
          .as("matches_filtered"))
      val idxC = Similarity.openIvfPqIndex(fresh, cmpDir)
      val servedC = Similarity.ivfPqServe(idxC, survivors, "vec_id", "embedding",
        k = 10, nprobe = 4)
      val cmpC = served
        .select(col("id1"), col("rank"),
          col("id2").as("sid2"), col("score").as("sscore"))
        .join(servedC.select(col("id1"), col("rank"),
          col("id2").as("cid2"), col("score").as("cscore")),
          Seq("id1", "rank"), "full")
        .groupBy(col("id1"))
        .agg(min(col("sid2") <=> col("cid2") && col("sscore") <=> col("cscore"))
          .as("matches_compacted"))
      val exact = Similarity.knnJoin(survivors, "vec_id", "embedding", k = 10)
      served.join(exact.select(col("id1"), col("id2"), lit(1).as("hit")),
          Seq("id1", "id2"), "left")
        .groupBy(col("id1"))
        .agg(round(sum(coalesce(col("hit"), lit(0))) / 10.0, 6).as("recall"))
        .join(cmpF, Seq("id1"))
        .join(cmpC, Seq("id1"))
    }),
    // Drift-triggered REFIT — the last arc of the lifecycle (fit → serve
    // → append → delete → compact → drift → refit). The fixture grows a
    // fit-40 store by 10 appends, then refitIvfPqIndex fires on the
    // drift signal (and proves itself a no-op immediately after — the
    // requires in refitIndexDir are part of the gate). A refit store is
    // bit-identical to a fresh fit on today's corpus with the same seed,
    // so serving it must match servedIndexDir's pinned full-fit twin
    // row-for-row (matches_full_fit, null-safe full-outer) and its
    // recall@10 must equal q_ivfpq_served's pinned vector exactly —
    // which is the oracle.
    "q_ivfpq_refit" -> ((s, dir) => {
      val rDir = refitIndexDir(s, dir)
      val pinDir = servedIndexDir(s, dir)
      val fresh = s.newSession()
      val emb = Tables.embeddings(fresh, dir).where(col("vec_id") < 50)
      val idx = Similarity.openIvfPqIndex(fresh, rDir)
      val served = Similarity.ivfPqServe(idx, emb, "vec_id", "embedding",
        k = 10, nprobe = 4)
      val direct = fresh.read.parquet(s"$pinDir/expected/direct")
      val exact = fresh.read.parquet(s"$pinDir/expected/exact")
      served
        .select(col("id1"), col("rank"),
          col("id2").as("sid2"), col("score").as("sscore"))
        .join(direct.select(col("id1"), col("rank"),
          col("id2").as("did2"), col("score").as("dscore")),
          Seq("id1", "rank"), "full")
        .join(exact.select(col("id1"), col("id2").as("sid2"),
          lit(1).as("hit")), Seq("id1", "sid2"), "left")
        .groupBy(col("id1"))
        .agg(
          round(sum(coalesce(col("hit"), lit(0))) / 10.0, 6).as("recall"),
          min(col("sid2") <=> col("did2") && col("sscore") <=> col("dscore"))
            .as("matches_full_fit"))
        .select(col("id1"), col("recall"), col("matches_full_fit"))
    })
  )

  /** One persisted index per (application, sfDir): built lazily by the
    * first q_ivfpq_served run, reused by later iterations in the same
    * JVM (the bench loop), rebuilt per JVM — the store itself is what a
    * real deployment would keep.
    */
  private val indexDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  private def servedIndexDir(s: SparkSession, dir: String): String =
    indexDirs.getOrElseUpdate(s"${s.sparkContext.applicationId}:$dir", {
      val d = graft.util.Tmp.root("graft_ivfpq_idx").toString
      val emb = Tables.embeddings(s, dir).where(col("vec_id") < 50)
      Similarity.writeIvfPqIndex(emb, "vec_id", "embedding", d,
        dim = 64, nlist = 8, m = 8, codebookSize = 16)
      // pin the direct-path twin and the exact-kNN hit set next to the
      // index, ONCE per fixture: both are deterministic functions of the
      // same seeded fit, so recomputing them per q_ivfpq_served call
      // benchmarks the validation harness (a 20+-job KMeans refit), not
      // serving. The per-call plan stays the real serving path: open
      // store → probe → cell-pruned join → ADC rank → compare.
      Similarity.ivfPqTopK(emb, "vec_id", "embedding", k = 10,
          dim = 64, nlist = 8, nprobe = 4, m = 8, codebookSize = 16)
        .write.mode("overwrite").parquet(s"$d/expected/direct")
      Similarity.knnJoin(emb, "vec_id", "embedding", k = 10)
        .select(col("id1"), col("id2"))
        .write.mode("overwrite").parquet(s"$d/expected/exact")
      d
    })

  /** Grown index for q_ivfpq_append: fit on the first 40 vectors only,
    * then append the last 10 with the stored model — built once per
    * (application, sfDir) like [[servedIndexDir]].
    */
  private[queries] def appendStoreDir(s: SparkSession, dir: String): String =
    appendIndexDir(s, dir)

  private def appendIndexDir(s: SparkSession, dir: String): String =
    indexDirs.getOrElseUpdate(s"${s.sparkContext.applicationId}:$dir:append", {
      val d = graft.util.Tmp.root("graft_ivfpq_app").toString
      val emb = Tables.embeddings(s, dir)
      Similarity.writeIvfPqIndex(
        emb.where(col("vec_id") < 40), "vec_id", "embedding", d,
        dim = 64, nlist = 8, m = 8, codebookSize = 16)
      Similarity.appendToIvfPqIndex(
        emb.where(col("vec_id") >= 40 && col("vec_id") < 50),
        "vec_id", "embedding", d)
      d
    })

  /** Store for q_ivfpq_refit: grown like [[appendIndexDir]] (fit on 40,
    * append 10 — the quantizer never saw the appended vectors), then
    * REFIT from the full current corpus via the drift trigger. The two
    * `require`s are part of the gate: the first refit must fire (the
    * grown store is stale past the threshold) and a second must NOT
    * (refit resets the drift baseline — the cheap steady-state probe).
    * A refit store is bit-identical to a fresh fit on the same corpus
    * with the same seed, which q_ivfpq_refit asserts per query against
    * [[servedIndexDir]]'s pinned full-fit twin.
    */
  private def refitIndexDir(s: SparkSession, dir: String): String =
    indexDirs.getOrElseUpdate(s"${s.sparkContext.applicationId}:$dir:refit", {
      val d = graft.util.Tmp.root("graft_ivfpq_refit").toString
      val emb = Tables.embeddings(s, dir)
      Similarity.writeIvfPqIndex(
        emb.where(col("vec_id") < 40), "vec_id", "embedding", d,
        dim = 64, nlist = 8, m = 8, codebookSize = 16)
      Similarity.appendToIvfPqIndex(
        emb.where(col("vec_id") >= 40 && col("vec_id") < 50),
        "vec_id", "embedding", d)
      val corpus = emb.where(col("vec_id") < 50)
      require(Similarity.refitIvfPqIndex(corpus, "vec_id", "embedding", d,
        threshold = 0.1), "refit must trigger on the grown store")
      require(!Similarity.refitIvfPqIndex(corpus, "vec_id", "embedding", d,
        threshold = 0.1), "refit must be a no-op right after a refit")
      d
    })

  /** Shrunk index for q_ivfpq_delete: fit on all 50, tombstone the 7 ids
    * with vec_id ≡ 3 (mod 7); the `compacted` twin additionally folds the
    * tombstones into the cell layout. Both built once per (application,
    * sfDir) like [[servedIndexDir]] — the identical seeded fit makes the
    * two stores differ ONLY in whether the dead rows are still on disk.
    */
  private def deleteIndexDir(s: SparkSession, dir: String,
                             compacted: Boolean): String =
    indexDirs.getOrElseUpdate(
      s"${s.sparkContext.applicationId}:$dir:del:$compacted", {
        val d = graft.util.Tmp.root("graft_ivfpq_del").toString
        val emb = Tables.embeddings(s, dir).where(col("vec_id") < 50)
        Similarity.writeIvfPqIndex(emb, "vec_id", "embedding", d,
          dim = 64, nlist = 8, m = 8, codebookSize = 16)
        Similarity.deleteFromIvfPqIndex(
          emb.where(col("vec_id") % 7 === 3).select(col("vec_id")),
          "vec_id", d)
        if (compacted) Similarity.compactIvfPqIndex(s, d)
        d
      })

  private val cos =
    """list_dot_product(a.e, b.e)
      |    / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))""".stripMargin

  /** Pinned recall@10 of the seeded IVF-PQ run at the sf0.01 gate — shared
    * by the direct query and the served-from-store query, which must agree.
    */
  private val ivfPqRecallValues =
    "(0,0.6),(1,0.6),(2,0.7),(3,0.5),(4,0.5),(5,0.7),(6,0.6),(7,0.7)," +
      "(8,0.4),(9,0.5),(10,0.8),(11,0.7),(12,0.5),(13,0.3),(14,0.7)," +
      "(15,0.4),(16,0.7),(17,0.6),(18,0.7),(19,0.8),(20,0.7),(21,0.5)," +
      "(22,0.4),(23,0.8),(24,0.8),(25,0.5),(26,0.7),(27,0.7),(28,0.7)," +
      "(29,0.5),(30,0.7),(31,0.8),(32,0.6),(33,0.7),(34,0.7),(35,0.6)," +
      "(36,0.6),(37,0.6),(38,0.8),(39,0.6),(40,0.7),(41,0.6),(42,0.7)," +
      "(43,0.7),(44,0.7),(45,0.7),(46,0.5),(47,0.6),(48,0.7),(49,0.5)"

  /** Pinned recall@10 of serving the grown (fit-40 + append-10) store at
    * the sf0.01 gate — re-pin from a fresh Verify run whenever the
    * seeded fit changes (see the re-pin rule in the repo memory).
    */
  private val ivfPqAppendRecallValues =
    "(0,0.6),(1,0.5),(2,0.4),(3,0.5),(4,0.2),(5,0.8),(6,0.7),(7,0.6)," +
      "(8,0.5),(9,0.6),(10,0.8),(11,0.7),(12,0.7),(13,0.4),(14,0.7)," +
      "(15,0.5),(16,0.7),(17,0.7),(18,0.7),(19,0.7),(20,0.7),(21,0.4)," +
      "(22,0.4),(23,0.6),(24,0.6),(25,0.4),(26,0.8),(27,0.5),(28,0.5)," +
      "(29,0.4),(30,0.8),(31,0.6),(32,0.5),(33,0.8),(34,0.4),(35,0.6)," +
      "(36,0.7),(37,0.5),(38,0.7),(39,0.5),(40,0.6),(41,0.4),(42,0.8)," +
      "(43,0.7),(44,0.5),(45,0.5),(46,0.7),(47,0.6),(48,0.6),(49,0.6)"

  /** Pinned recall@10 of serving the tombstoned (fit-50 − 7 deletes)
    * store at the sf0.01 gate — re-pin from a fresh Verify run whenever
    * the seeded fit changes (see the re-pin rule in the repo memory).
    */
  private val ivfPqDeleteRecallValues =
    "(0,0.7),(1,0.6),(2,0.8),(4,0.5),(5,0.7),(6,0.5),(7,0.6),(8,0.4)," +
      "(9,0.6),(11,0.4),(12,0.6),(13,0.4),(14,0.7),(15,0.5),(16,0.7)," +
      "(18,0.7),(19,0.8),(20,0.7),(21,0.4),(22,0.5),(23,0.7),(25,0.5)," +
      "(26,0.6),(27,0.8),(28,0.7),(29,0.5),(30,0.7),(32,0.7),(33,0.8)," +
      "(34,0.6),(35,0.7),(36,0.6),(37,0.6),(39,0.4),(40,0.7),(41,0.6)," +
      "(42,0.8),(43,0.7),(44,0.8),(46,0.6),(47,0.6),(48,0.6),(49,0.5)"

  def oracles: Map[String, String] = Map(
    "q_ann_topk" ->
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |q AS (SELECT e FROM v WHERE vec_id = 0)
         |SELECT a.vec_id, round(list_dot_product(a.e, q.e)
         |  / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(q.e, q.e))),
         |  6) AS cosine
         |FROM v a, q WHERE a.vec_id != 0
         |ORDER BY 2 DESC, 1 LIMIT 10""".stripMargin,
    "q_knn_sample" ->
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings WHERE vec_id < 50),
         |sims AS (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2, $cos AS cosine
         |  FROM v a JOIN v b ON a.vec_id != b.vec_id),
         |ranked AS (
         |  SELECT id1, id2, cosine,
         |    CAST(row_number() OVER (PARTITION BY id1
         |      ORDER BY cosine DESC, id2) AS INTEGER) AS rank
         |  FROM sims)
         |SELECT id1, id2, round(cosine, 6) AS cosine, rank
         |FROM ranked WHERE rank <= 3""".stripMargin,
    // Full independent replay of the LSH pipeline: the seeded hyperplanes
    // are embedded as literals (same generator the engine uses —
    // Similarity.hyperplanes(64, 16, 42)), signatures/bands/buckets/ranking
    // all recomputed by DuckDB from scratch. Nothing is pinned except the
    // RNG draw itself.
    "q_lsh_ann" -> lshOracleSql(dim = 64, bits = 16, bands = 4, k = 3),
    "q_lsh_dup_pairs" -> lshPairsOracleSql(dim = 64, bits = 16, bands = 4,
      threshold = 0.45),
    // the auto sizing's output at gate-table corpus sizes (2-bit floor)
    "q_lsh_auto_pairs" -> lshPairsOracleSql(dim = 64, bits = 12, bands = 6,
      threshold = 0.45),
    // FULL DERIVATION of the IVF recall — nothing pinned: DuckDB replays
    // the seeded Lloyd's fit (init hash, 10 iterations), both assignment
    // metrics, the probe ranking, and the recall join from the raw
    // embeddings table. See [[IvfKmeansSql]].
    "q_ivf_ann" -> IvfKmeansSql.sql(dim = 64, nlist = 8, nprobe = 4,
      k = 3, iters = 10),
    // Deterministic recall@10 of the seeded PQ quantizer (m=8 subspaces ×
    // 16 centroids, distributed Lloyd's fit with hash-sorted init and
    // order-fixed partial merge) at the sf0.01 gate — still pinned from
    // the engine's deterministic run (the q_ivf_ann SQL replay covers the
    // m=1 fit; extending it to 8 subspaces × ADC table scoring is the
    // stated next step); the independent evidence is DedupSpec's
    // zero-quantization-error ADC-equals-cosine proof, the recall bound
    // vs in-engine exact kNN, and the bit-exact refit reproducibility
    // case.
    "q_pq_ann" ->
      ("""SELECT CAST(id1 AS BIGINT) AS id1, CAST(recall AS DOUBLE) AS recall
         |FROM (VALUES """.stripMargin +
        "(0,0.5),(1,0.6),(2,0.6),(3,0.5),(4,0.6),(5,0.7),(6,0.7),(7,0.7)," +
        "(8,0.5),(9,0.5),(10,0.8),(11,0.7),(12,0.5),(13,0.4),(14,0.6)," +
        "(15,0.5),(16,0.8),(17,0.7),(18,0.6),(19,0.8),(20,0.7),(21,0.5)," +
        "(22,0.5),(23,0.8),(24,0.7),(25,0.3),(26,0.7),(27,0.7),(28,0.7)," +
        "(29,0.7),(30,0.9),(31,0.8),(32,0.6),(33,0.6),(34,0.8),(35,0.7)," +
        "(36,0.6),(37,0.5),(38,0.8),(39,0.6),(40,0.8),(41,0.7),(42,0.8)," +
        "(43,0.6),(44,0.8),(45,0.7),(46,0.6),(47,0.6),(48,0.8),(49,0.5)" +
        ") AS t(id1, recall)"),
    // same pinned style for the IVF-PQ composition (cells + codes)
    "q_ivfpq_ann" ->
      ("""SELECT CAST(id1 AS BIGINT) AS id1, CAST(recall AS DOUBLE) AS recall
         |FROM (VALUES """.stripMargin + ivfPqRecallValues + ") AS t(id1, recall)"),
    // the served path must reproduce the direct path exactly: same recall
    // vector, and the engine-side bit-exact comparison pinned true
    "q_ivfpq_served" ->
      ("""SELECT CAST(id1 AS BIGINT) AS id1, TRUE AS matches_direct,
         |  CAST(recall AS DOUBLE) AS recall
         |FROM (VALUES """.stripMargin + ivfPqRecallValues + ") AS t(id1, recall)"),
    // a refit store is bit-identical to the fresh full fit, so its serve
    // replays q_ivfpq_served's pinned recall vector verbatim
    "q_ivfpq_refit" ->
      ("""SELECT CAST(id1 AS BIGINT) AS id1, TRUE AS matches_full_fit,
         |  CAST(recall AS DOUBLE) AS recall
         |FROM (VALUES """.stripMargin + ivfPqRecallValues + ") AS t(id1, recall)"),
    // pinned recall@10 of serving the GROWN store (fit on 40, append 10,
    // same seeded fit); matches_rebuild is the engine-side bit-parity
    // gate against re-encoding the full corpus with the stored model
    "q_ivfpq_append" ->
      ("""SELECT CAST(id1 AS BIGINT) AS id1, TRUE AS matches_rebuild,
         |  CAST(recall AS DOUBLE) AS recall
         |FROM (VALUES """.stripMargin + ivfPqAppendRecallValues + ") AS t(id1, recall)"),
    // pinned recall@10 of serving the SHRUNK store (fit on 50, tombstone
    // 7, same seeded fit) against exact kNN over the 43 survivors;
    // matches_filtered / matches_compacted are the engine-side bit-parity
    // gates (tombstoned serve ≡ survivor re-encode; compacted ≡ tombstoned)
    "q_ivfpq_delete" ->
      ("""SELECT CAST(id1 AS BIGINT) AS id1, CAST(recall AS DOUBLE) AS recall,
         |  TRUE AS matches_filtered, TRUE AS matches_compacted
         |FROM (VALUES """.stripMargin + ivfPqDeleteRecallValues + ") AS t(id1, recall)"),
    // pinned recall@10 of the seeded RESIDUAL quantizer — mean 0.672 vs
    // the raw-code path's 0.632 on the same gate table, the expected
    // FAISS-style precision win (independent evidence: DedupSpec's
    // residual ≥ raw recall case)
    "q_ivfpq_residual" ->
      ("""SELECT CAST(id1 AS BIGINT) AS id1, CAST(recall AS DOUBLE) AS recall
         |FROM (VALUES """.stripMargin +
        "(0,0.6),(1,0.7),(2,0.8),(3,0.6),(4,0.6),(5,0.6),(6,0.5)," +
        "(7,0.8),(8,0.6),(9,0.5),(10,0.8),(11,0.7),(12,0.7),(13,0.5)," +
        "(14,0.7),(15,0.8),(16,0.6),(17,0.7),(18,0.9),(19,0.8),(20,0.6)," +
        "(21,0.7),(22,0.4),(23,0.7),(24,0.9),(25,0.7),(26,0.7),(27,0.8)," +
        "(28,0.7),(29,0.6),(30,0.7),(31,0.8),(32,0.6),(33,0.8),(34,0.6)," +
        "(35,0.7),(36,0.5),(37,0.7),(38,0.6),(39,0.7),(40,0.7),(41,0.7)," +
        "(42,0.5),(43,0.8),(44,0.7),(45,0.7),(46,0.5),(47,0.7),(48,0.6)," +
        "(49,0.7)" +
        ") AS t(id1, recall)")
  )

  /** DuckDB SQL replaying the LSH pair pipeline (buckets → candidate pairs
    * → exact cosine ≥ threshold) with the seeded planes inlined — nothing
    * pinned but the RNG draw.
    */
  private def lshPairsOracleSql(dim: Int, bits: Int, bands: Int,
                                threshold: Double): String = {
    val bitsPerBand = bits / bands
    val keyMask = (1L << bitsPerBand) - 1
    val planes = Similarity.hyperplanes(dim, bits, seed = 42L)
    val sigTerms = planes.zipWithIndex.map { case (p, i) =>
      val arr = p.mkString("[", ", ", "]")
      s"CASE WHEN list_dot_product(e, $arr) >= 0 THEN ${1L << i} ELSE 0 END"
    }.mkString("\n     + ")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |sig AS (
       |  SELECT vec_id, e,
       |    ($sigTerms) AS s
       |  FROM v),
       |banded AS (
       |  SELECT vec_id, t.b AS band, (s >> (t.b * $bitsPerBand)) & $keyMask AS key
       |  FROM sig, unnest(range(0, $bands)) AS t(b)),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
       |  WHERE a.vec_id < b.vec_id)
       |SELECT c.id1, c.id2,
       |  round(list_dot_product(va.e, vb.e)
       |    / (sqrt(list_dot_product(va.e, va.e)) * sqrt(list_dot_product(vb.e, vb.e))),
       |    6) AS cosine
       |FROM cand c
       |JOIN v va ON va.vec_id = c.id1
       |JOIN v vb ON vb.vec_id = c.id2
       |WHERE list_dot_product(va.e, vb.e)
       |    / (sqrt(list_dot_product(va.e, va.e)) * sqrt(list_dot_product(vb.e, vb.e)))
       |    >= $threshold""".stripMargin
  }

  /** DuckDB SQL replaying the whole hyperplane-LSH ANN pipeline with the
    * engine's own seeded planes inlined as array literals.
    */
  private def lshOracleSql(dim: Int, bits: Int, bands: Int, k: Int): String = {
    val bitsPerBand = bits / bands
    val keyMask = (1L << bitsPerBand) - 1
    val planes = Similarity.hyperplanes(dim, bits, seed = 42L)
    val sigTerms = planes.zipWithIndex.map { case (p, i) =>
      val arr = p.mkString("[", ", ", "]")
      s"CASE WHEN list_dot_product(e, $arr) >= 0 THEN ${1L << i} ELSE 0 END"
    }.mkString("\n     + ")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings WHERE vec_id < 50),
       |sig AS (
       |  SELECT vec_id, e,
       |    ($sigTerms) AS s
       |  FROM v),
       |banded AS (
       |  SELECT vec_id, t.b AS band, (s >> (t.b * $bitsPerBand)) & $keyMask AS key
       |  FROM sig, unnest(range(0, $bands)) AS t(b)),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
       |  WHERE a.vec_id != b.vec_id),
       |sims AS (
       |  SELECT c.id1, c.id2,
       |    list_dot_product(va.e, vb.e)
       |      / (sqrt(list_dot_product(va.e, va.e)) * sqrt(list_dot_product(vb.e, vb.e))) AS cosine
       |  FROM cand c
       |  JOIN v va ON va.vec_id = c.id1
       |  JOIN v vb ON vb.vec_id = c.id2),
       |ranked AS (
       |  SELECT id1, id2, cosine,
       |    CAST(row_number() OVER (PARTITION BY id1
       |      ORDER BY cosine DESC, id2) AS INTEGER) AS rank
       |  FROM sims)
       |SELECT id1, id2, round(cosine, 6) AS cosine, rank
       |FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** DuckDB replay of the ENTIRE seeded IVF pipeline — the de-pinning of
    * q_ivf_ann. Every stage the engine runs is re-derived in SQL from the
    * raw embeddings table:
    *
    *   1. INIT: the fit seeds are the `nlist` rows with the smallest
    *      Spark `xxhash64(u, 42)` (Similarity.kmeansSubspaces). The hash
    *      is XXH64's 8-byte-lane fold over each element's IEEE-754 double
    *      bit pattern, then the literal 42 — all recomputed here: bit
    *      patterns via exponent/mantissa arithmetic (exact for the
    *      float-sourced values), the per-element `hashLong` chain via a
    *      recursive CTE with 64-bit wraparound arithmetic in HUGEINT
    *      (the same mul64/rotl/xor staging as [[DedupQ]]'s XxSql).
    *   2. FIT: `iters` unrolled Lloyd's iterations — argmin-L2² with
    *      lowest-cell tie-break (the engine's strict `<` scan), per-cell
    *      per-dimension mean, empty cells keeping their previous
    *      centroid.
    *   3. PROBE + RECALL: corpus cell assignment (L2², the
    *      NearestCentroid kernel), per-query top-`nprobe` cells by cosine
    *      (the NearestCentroids kernel ordering), candidate cosines,
    *      top-`k` (cosine DESC, id ASC), recall vs the full exact kNN.
    *
    * CTEs are MATERIALIZED: each iteration references its predecessor
    * twice, so DuckDB's default inlining would blow the plan up
    * exponentially. FP note: DuckDB's mean accumulates in a different
    * order than the engine's fixed partial merge; divergence is confined
    * to the last ulp and only observable if it flips an argmin or top-k
    * decision at an exact tie, which the recall grid (multiples of 1/k)
    * makes vanishingly unlikely — and the gate would catch.
    */
  private object IvfKmeansSql {
    private val M = "18446744073709551616::HUGEINT"
    private val P1 = "11400714785074694791::HUGEINT"
    private val P2 = "14029467366897019727::HUGEINT"
    private val P3 = "1609587929392839161::HUGEINT"
    private val P4 = "9650029242287828579::HUGEINT"
    private val P5 = "2870177450012600261::HUGEINT"
    private def p2(b: Int): String = (BigInt(1) << b).toString + "::HUGEINT"
    private def mod64(x: String) = s"((($x) % $M + $M) % $M)"
    private def mul64(a: String, b: String) = mod64(
      s"($a % ${p2(32)}) * ($b % ${p2(32)}) + " +
        mod64(s"(($a // ${p2(32)}) * ($b % ${p2(32)}) + " +
          s"($a % ${p2(32)}) * ($b // ${p2(32)})) * ${p2(32)}"))
    private def x64(a: String, b: String) =
      s"CAST(xor(CAST($a AS UBIGINT), CAST($b AS UBIGINT)) AS HUGEINT)"
    private def rotl(x: String, r: Int) =
      s"(${mod64(s"$x * ${p2(r)}")} + ($x // ${p2(64 - r)}))"
    private def shr(x: String, r: Int) = s"($x // ${p2(r)})"

    /** Lateral-alias stages computing XXH64.hashLong(`l`, `seed`) into
      * alias `<pfx>hout` — Spark's single-long shortcut (seed+P5+8,
      * one 8-byte round, fmix).
      */
    private def hashLongStages(l: String, seed: String, pfx: String): String = {
      val s = Seq.newBuilder[(String, String)]
      s += s"${pfx}h0" -> mod64(s"$seed + $P5 + 8::HUGEINT")
      s += s"${pfx}m1" -> mul64(l, P2)
      s += s"${pfx}r1" -> rotl(s"${pfx}m1", 31)
      s += s"${pfx}m2" -> mul64(s"${pfx}r1", P1)
      s += s"${pfx}x1" -> x64(s"${pfx}h0", s"${pfx}m2")
      s += s"${pfx}r2" -> rotl(s"${pfx}x1", 27)
      s += s"${pfx}a3" -> mul64(s"${pfx}r2", P1)
      s += s"${pfx}h1" -> mod64(s"${pfx}a3 + $P4")
      s += s"${pfx}f1" -> x64(s"${pfx}h1", shr(s"${pfx}h1", 33))
      s += s"${pfx}f2" -> mul64(s"${pfx}f1", P2)
      s += s"${pfx}f3" -> x64(s"${pfx}f2", shr(s"${pfx}f2", 29))
      s += s"${pfx}f4" -> mul64(s"${pfx}f3", P3)
      s += s"${pfx}hout" -> x64(s"${pfx}f4", shr(s"${pfx}f4", 32))
      s.result().map { case (n, e) => s"$e AS $n" }.mkString(",\n      ")
    }

    private val T52 = "4503599627370496" // 2^52

    def sql(dim: Int, nlist: Int, nprobe: Int, k: Int, iters: Int): String = {
      def d2(u: String, c: String) =
        s"list_sum(list_transform(range(1, ${dim + 1}), j -> ($u[j] - $c[j]) * ($u[j] - $c[j])))"
      def dot(u: String, c: String) =
        s"list_sum(list_transform(range(1, ${dim + 1}), j -> $u[j] * $c[j]))"
      def nrm(u: String) = s"sqrt(list_sum(list_transform($u, x -> x * x)))"
      def cos(u: String, c: String) = s"(${dot(u, c)} / (${nrm(u)} * ${nrm(c)}))"

      val parts = Seq.newBuilder[String]
      parts += s"""emb AS MATERIALIZED (
  SELECT CAST(vec_id AS BIGINT) AS id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS u
  FROM embeddings WHERE vec_id < 50
)"""
      parts += s"""elems AS MATERIALIZED (
  SELECT e.id, CAST(t.i AS BIGINT) AS idx, e.u[CAST(t.i AS BIGINT) + 1] AS val
  FROM emb e CROSS JOIN (SELECT UNNEST(range(0, $dim)) AS i) t
)"""
      // IEEE-754 double bit pattern per element (doubleToLongBits):
      // corrected floor(log2) exponent + exact mantissa (float-sourced
      // values have ≤ 24 significant bits, so a/2^ex · 2^52 is an integer)
      parts += s"""bits AS MATERIALIZED (
  SELECT id, idx,
    CASE WHEN val = 0 OR isnan(val) THEN
      CASE WHEN isnan(val) THEN 9221120237041090560::HUGEINT ELSE 0::HUGEINT END
    ELSE (CASE WHEN val < 0 THEN ${p2(63)} ELSE 0::HUGEINT END)
       + CAST(ex + 1023 AS HUGEINT) * $T52::HUGEINT
       + (CAST(round(a / pow(2.0, ex) * $T52.0) AS HUGEINT) - $T52::HUGEINT)
    END AS b
  FROM (
    SELECT id, idx, val,
      CASE WHEN val = 0 OR isnan(val) THEN 1.0 ELSE abs(val) END AS a,
      CAST(floor(log2(a)) AS BIGINT) AS e0,
      e0 + CASE WHEN pow(2.0, e0 + 1) <= a THEN 1
                WHEN pow(2.0, e0) > a THEN -1 ELSE 0 END AS ex
    FROM elems)
)"""
      parts += s"""fold AS (
  SELECT id, CAST(-1 AS BIGINT) AS idx, 42::HUGEINT AS h FROM emb
  UNION ALL
  SELECT q.id, q.idx, q.fhout AS h FROM (
    SELECT f.id, f.idx + 1 AS idx, b.b AS l, f.h AS hprev,
      ${hashLongStages("l", "hprev", "f")}
    FROM fold f JOIN bits b ON b.id = f.id AND b.idx = f.idx + 1
    WHERE f.idx < ${dim - 1}
  ) q
)"""
      parts += s"""hfin AS MATERIALIZED (
  SELECT id, ghout AS h FROM (
    SELECT id, h AS hprev,
      ${hashLongStages("42::HUGEINT", "hprev", "g")}
    FROM fold WHERE idx = ${dim - 1})
)"""
      parts += s"""cents0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY x.hs ASC, x.u ASC) - 1 AS BIGINT) AS cell, x.u
  FROM (
    SELECT e.u,
      CASE WHEN f.h >= ${p2(63)} THEN f.h - $M ELSE f.h END AS hs
    FROM hfin f JOIN emb e USING (id)
    ORDER BY hs ASC, u ASC LIMIT $nlist) x
)"""
      var prev = "cents0"
      (1 to iters).foreach { i =>
        parts += s"""asg$i AS MATERIALIZED (
  SELECT id, u, cell FROM (
    SELECT d.id, d.u, d.cell,
           row_number() OVER (PARTITION BY d.id ORDER BY d.d2 ASC, d.cell ASC) AS rn
    FROM (
      SELECT a.id, a.u, c.cell, ${d2("a.u", "c.u")} AS d2
      FROM emb a CROSS JOIN $prev c) d
  ) WHERE rn = 1
)"""
        parts += s"""cents$i AS MATERIALIZED (
  SELECT c.cell, COALESCE(m.mu, c.u) AS u
  FROM $prev c LEFT JOIN (
    SELECT cell, list(s ORDER BY j) AS mu FROM (
      SELECT cell, t.j AS j, sum(u[t.j]) / count(*) AS s
      FROM asg$i CROSS JOIN (SELECT UNNEST(range(1, ${dim + 1})) AS j) t
      GROUP BY cell, t.j
    ) GROUP BY cell
  ) m ON m.cell = c.cell
)"""
        prev = s"cents$i"
      }
      parts += s"""asgF AS MATERIALIZED (
  SELECT id, u, cell FROM (
    SELECT d.id, d.u, d.cell,
           row_number() OVER (PARTITION BY d.id ORDER BY d.d2 ASC, d.cell ASC) AS rn
    FROM (
      SELECT a.id, a.u, c.cell, ${d2("a.u", "c.u")} AS d2
      FROM emb a CROSS JOIN $prev c) d
  ) WHERE rn = 1
)"""
      parts += s"""probes AS MATERIALIZED (
  SELECT id AS qid, u AS qu, cell FROM (
    SELECT d.id, d.u, d.cell,
           row_number() OVER (PARTITION BY d.id ORDER BY d.cos DESC, d.cell ASC) AS rn
    FROM (
      SELECT e.id, e.u, c.cell, ${cos("e.u", "c.u")} AS cos
      FROM emb e CROSS JOIN $prev c) d
  ) WHERE rn <= $nprobe
)"""
      parts += s"""cands AS MATERIALIZED (
  SELECT DISTINCT p.qid AS id1, a.id AS id2, ${cos("p.qu", "a.u")} AS cos
  FROM probes p JOIN asgF a ON a.cell = p.cell AND a.id <> p.qid
)"""
      parts += s"""ivf AS MATERIALIZED (
  SELECT id1, id2 FROM (
    SELECT id1, id2, row_number() OVER (PARTITION BY id1 ORDER BY cos DESC, id2 ASC) AS rn
    FROM cands) WHERE rn <= $k
)"""
      parts += s"""exact AS MATERIALIZED (
  SELECT id1, id2 FROM (
    SELECT x.id1, x.id2, row_number() OVER (PARTITION BY x.id1 ORDER BY x.cos DESC, x.id2 ASC) AS rn
    FROM (
      SELECT a.id AS id1, b.id AS id2, ${cos("a.u", "b.u")} AS cos
      FROM emb a JOIN emb b ON a.id <> b.id) x
  ) WHERE rn <= $k
)"""
      "WITH RECURSIVE\n" + parts.result().mkString(",\n") + s"""
SELECT i.id1 AS id1,
       round(SUM(CASE WHEN e.id2 IS NOT NULL THEN 1 ELSE 0 END) / $k.0, 6) AS recall
FROM ivf i LEFT JOIN exact e ON e.id1 = i.id1 AND e.id2 = i.id2
GROUP BY 1"""
    }
  }
}
