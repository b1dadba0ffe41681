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
    // int8 scalar-quantized cosine top-k: integer scores are EXACT, so
    // the oracle replays the whole thing (normalize → round(x·127) →
    // integer dot → rank) value-for-value in SQL — any quantization or
    // fused-kernel defect hash-mismatches.
    "q_sq_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // the query batch is PINNED to base-table ids (< 1e6): under the
      // bench's 8x upscale (ids shifted by k*1e6 per copy) the corpus
      // grows 8x while the batch stays fixed - the serving shape, and a
      // linear (not quadratic) upscale prediction
      round6(
        Similarity.sqTopK(emb,
            emb.where(col("vec_id") % 97 === 0 && col("vec_id") < 1000000L),
            "vec_id", "embedding", k = 5)
          .withColumn("rank", col("rank").cast("long")),
        "approx_cos")
    }),
    // SQ×IVF composition (the r13-promised scale form of q_sq_ann): IVF
    // cells prune candidates — each query scores only its nprobe probed
    // cells' vectors — and int8 codes score them. Integer scores are
    // exact, so the oracle replays the WHOLE pipeline value-for-value:
    // the seeded coarse fit (IvfKmeansSql's derivation), the L2² cell
    // assignment, the cosine probe ranking, the round(x/‖x‖·127) codes,
    // and the integer-dot top-k.
    "q_sq_ivf_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).where(col("vec_id") < 50)
      round6(
        Similarity.sqIvfTopK(emb, emb, "vec_id", "embedding",
            k = 5, dim = 64, nlist = 8, nprobe = 4)
          .withColumn("rank", col("rank").cast("long")),
        "approx_cos")
    }),
    // Persisted SQ×IVF serving (r15 — the int8 tier's store): the index
    // (centroids + cell-partitioned int8 codes) is written ONCE per
    // session+sfDir, then a FRESH session answers the batch purely from
    // the store — no coarse fit, no corpus re-encode. Serving from the
    // store is bit-identical to the direct sqIvfTopK composition (same
    // deterministic fit, same encode expressions, exact integer scores),
    // so the oracle is q_sq_ivf_ann's full-replay derivation verbatim:
    // any store/open/serve defect hash-mismatches against a pipeline
    // derived from the raw parquet alone.
    "q_sq_ivf_served" -> ((s, dir) => {
      val idxDir = sqIvfIndexDir(s, dir)
      val fresh = s.newSession()
      // serving-session tuning, same rationale as q_ivfpq_served: a tiny
      // query batch gains nothing from 32-wide exchanges or AQE's
      // per-stage re-planning rounds
      fresh.conf.set("spark.sql.shuffle.partitions", "8")
      fresh.conf.set("spark.sql.adaptive.enabled", "false")
      val emb = Tables.embeddings(fresh, dir).where(col("vec_id") < 50)
      val idx = Similarity.openSqIvfIndex(fresh, idxDir)
      round6(
        Similarity.sqIvfServeIndex(idx, emb, "vec_id", "embedding",
            k = 5, nprobe = 4)
          .withColumn("rank", col("rank").cast("long")),
        "approx_cos")
    }),
    // STREAM-MAINTAINED SQ×IVF store (the int8 twin of q_stream_ann):
    // built by a REAL Streams.sqIvfIndexStream run — base fit on
    // vec_id < 40, four streamed 10-vector micro-batches with a
    // checkpoint restart between batches 1 and 2, growthThreshold = 0 so
    // EVERY batch folds via refit, and an explicit at-least-once replay
    // probe absorbed by the generation's stream highwater (require()d at
    // fixture build). The final store is therefore bit-identical to a
    // fresh fit over the 80-vector corpus, so the oracle is the same
    // full-pipeline sqSql derivation with `vec_id < 80`; a FRESH session
    // serves purely from the store, like q_sq_ivf_served.
    "q_stream_sq_ivf" -> ((s, dir) => {
      val idxDir = streamSqIvfIndexDir(s, dir)
      val fresh = s.newSession()
      fresh.conf.set("spark.sql.shuffle.partitions", "8")
      fresh.conf.set("spark.sql.adaptive.enabled", "false")
      val emb = Tables.embeddings(fresh, dir).where(col("vec_id") < 80)
      val idx = Similarity.openSqIvfIndex(fresh, idxDir)
      round6(
        Similarity.sqIvfServeIndex(idx, emb, "vec_id", "embedding",
            k = 5, nprobe = 4)
          .withColumn("rank", col("rank").cast("long")),
        "approx_cos")
    }),
    // SQ×IVF takedown path (the q_ivfpq_delete arc on the int8 store):
    // fit on 50, tombstone the 7 ids with vec_id ≡ 3 (mod 7), serve the
    // survivors from the LIVE view. The oracle re-derives the whole
    // pipeline with the fit/corpus split (fit 50, corpus 43), so a
    // single leaked dead row or a lost survivor hash-mismatches; the
    // compacted twin must serve value-identical rows (matches_compacted
    // — compaction reclaims space, never changes answers).
    "q_sq_ivf_delete" -> ((s, dir) => {
      val delDir = sqDeleteIndexDir(s, dir, compacted = false)
      val cmpDir = sqDeleteIndexDir(s, dir, compacted = true)
      val fresh = s.newSession()
      fresh.conf.set("spark.sql.shuffle.partitions", "8")
      fresh.conf.set("spark.sql.adaptive.enabled", "false")
      val survivors = Tables.embeddings(fresh, dir)
        .where(col("vec_id") < 50 && col("vec_id") % 7 =!= 3)
      val idx = Similarity.openSqIvfIndex(fresh, delDir)
      val served = Similarity.sqIvfServeIndex(idx, survivors,
          "vec_id", "embedding", k = 5, nprobe = 4)
        .withColumn("rank", col("rank").cast("long"))
      val idxC = Similarity.openSqIvfIndex(fresh, cmpDir)
      val servedC = Similarity.sqIvfServeIndex(idxC, survivors,
          "vec_id", "embedding", k = 5, nprobe = 4)
        .withColumn("rank", col("rank").cast("long"))
      round6(
        served.join(servedC.select(col("query_id"), col("rank"),
            col("id").as("cid"), col("dot").as("cdot")),
            Seq("query_id", "rank"), "full")
          .withColumn("matches_compacted",
            col("id") <=> col("cid") && col("dot") <=> col("cdot"))
          .select(col("query_id"), col("id"), col("dot"), col("approx_cos"),
            col("rank"), col("matches_compacted")),
        "approx_cos")
    }),
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
        k = 3, dim = 64, nlist = 8, nprobe = 4)
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
    // — both scale dials engaged; the oracle derives the whole pipeline
    // in SQL (see IvfPqKmeansSql).
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
    // score adds the ⟨q, centroid⟩ term per probed cell; the oracle
    // derives the full residual pipeline in SQL (DedupSpec holds the
    // independent residual ≥ raw recall evidence).
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
    // missing or extra row also fails); the oracle derives the direct
    // path's full pipeline in SQL, sharing q_ivfpq_ann's derivation.
    "q_ivfpq_served" -> ((s, dir) => {
      val idxDir = servedIndexDir(s, dir)
      // the whole comparison runs on ONE fresh session: the point is that
      // the SERVE side carries no build-session state, which the fresh
      // session proves by itself. The direct twin and the exact-kNN hit
      // set were pinned to parquet at fixture-build time (deterministic
      // functions of the same seeded fit — see servedIndexDir), so the
      // per-call plan is the true serving path, not a per-call refit.
      val fresh = s.newSession()
      // serving-session tuning, scoped to the fresh session only: a query
      // batch is tiny (k·|batch| rows), so 32 shuffle partitions only buy
      // 4× the task-scheduling overhead per exchange, and AQE's
      // stage-by-stage materialization turns the 4-exchange plan into 11
      // driver job rounds of ~1 task each — pure fixed cost at batch
      // sizes where there is nothing to re-plan. A real serving process
      // runs exactly this conf; the builder session's conf is untouched.
      fresh.conf.set("spark.sql.shuffle.partitions", "8")
      fresh.conf.set("spark.sql.adaptive.enabled", "false")
      val emb = Tables.embeddings(fresh, dir).where(col("vec_id") < 50)
      val idx = Similarity.openIvfPqIndex(fresh, idxDir)
      val served = Similarity.ivfPqServe(idx, emb, "vec_id", "embedding",
        k = 10, nprobe = 4)
      // pinned fixtures have pinned schemas: supplying them skips the
      // per-call single-task schema-inference job each read would run
      val direct = fresh.read
        .schema("id1 BIGINT, id2 BIGINT, score DOUBLE, rank INT")
        .parquet(s"$idxDir/expected/direct")
      val exact = fresh.read.schema("id1 BIGINT, id2 BIGINT")
        .parquet(s"$idxDir/expected/exact")
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
    // STREAM-MAINTAINED index (the streaming face of the lifecycle):
    // built by a REAL Streams.annIndexStream run — base fit on
    // vec_id < 40, four streamed 10-vector micro-batches with a
    // checkpoint restart ("crash") between batches 1 and 2,
    // drift-triggered refits folding every batch, and an explicit
    // at-least-once replay probe absorbed by the stream highwater (all
    // require()d at fixture build). The final store is bit-identical to
    // a fresh fit over the full 80-vector corpus, so the oracle is the
    // same full-pipeline derivation over vec_id < 80; a FRESH session
    // serves purely from the store, like q_ivfpq_served.
    "q_stream_ann" -> ((s, dir) => {
      val idxDir = streamAnnIndexDir(s, dir)
      val fresh = s.newSession()
      fresh.conf.set("spark.sql.shuffle.partitions", "8")
      fresh.conf.set("spark.sql.adaptive.enabled", "false")
      val emb = Tables.embeddings(fresh, dir).where(col("vec_id") < 80)
      val idx = Similarity.openIvfPqIndex(fresh, idxDir)
      val served = Similarity.ivfPqServe(idx, emb, "vec_id", "embedding",
        k = 10, nprobe = 4)
      val direct = fresh.read
        .schema("id1 BIGINT, id2 BIGINT, score DOUBLE, rank INT")
        .parquet(s"$idxDir/expected/direct")
      val exact = fresh.read.schema("id1 BIGINT, id2 BIGINT")
        .parquet(s"$idxDir/expected/exact")
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
    // recall@10 must equal the full-corpus derivation — which is the
    // oracle (IvfPqKmeansSql).
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

  /** SQ×IVF store for q_sq_ivf_served: fit + int8 encode of the same
    * 50-vector corpus q_sq_ivf_ann composes inline, written once per
    * (application, sfDir) like [[servedIndexDir]].
    */
  private def sqIvfIndexDir(s: SparkSession, dir: String): String =
    indexDirs.getOrElseUpdate(s"${s.sparkContext.applicationId}:$dir:sqivf", {
      val d = graft.util.Tmp.root("graft_sqivf_idx").toString
      val emb = Tables.embeddings(s, dir).where(col("vec_id") < 50)
      Similarity.writeSqIvfIndex(emb, "vec_id", "embedding", d,
        dim = 64, nlist = 8)
      d
    })

  /** Shrunk SQ×IVF store for q_sq_ivf_delete: fit on all 50, tombstone
    * the 7 ids with vec_id ≡ 3 (mod 7); the `compacted` twin folds the
    * tombstones into the cell layout ([[Similarity.compactSqIvfIndex]]).
    * Identical seeded fits — the two stores differ only in whether the
    * dead rows are physically on disk.
    */
  private def sqDeleteIndexDir(s: SparkSession, dir: String,
                               compacted: Boolean): String =
    indexDirs.getOrElseUpdate(
      s"${s.sparkContext.applicationId}:$dir:sqdel:$compacted", {
        val d = graft.util.Tmp.root("graft_sqivf_del").toString
        val emb = Tables.embeddings(s, dir).where(col("vec_id") < 50)
        Similarity.writeSqIvfIndex(emb, "vec_id", "embedding", d,
          dim = 64, nlist = 8)
        Similarity.deleteFromSqIvfIndex(
          emb.where(col("vec_id") % 7 === 3).select(col("vec_id")),
          "vec_id", d)
        if (compacted) Similarity.compactSqIvfIndex(s, d)
        d
      })

  /** Stream-MAINTAINED index for q_stream_ann: base fit on vec_id < 40,
    * then vec_id 40..79 arrive as four 10-vector parquet files through a
    * REAL Structured Streaming run of
    * [[graft.streaming.Streams.annIndexStream]], with a checkpoint
    * restart between batches 1 and 2 and driftThreshold = 0 so EVERY
    * batch folds via refit — the final store must therefore be
    * bit-identical to a fresh fit over the full corpus (the oracle's
    * derivation). The corpus callback reads the CANONICAL embeddings
    * table up to the highest arrived id — the index is derived state,
    * the table is the source of truth. The at-least-once replay guard is
    * probed explicitly: re-delivering the final batch must be absorbed
    * by the generation's stream highwater.
    */
  private def streamAnnIndexDir(s: SparkSession, dir: String): String =
    indexDirs.getOrElseUpdate(s"${s.sparkContext.applicationId}:$dir:stream", {
      val d = graft.util.Tmp.root("graft_ivfpq_stream").toString
      val emb = Tables.embeddings(s, dir)
      Similarity.writeIvfPqIndex(emb.where(col("vec_id") < 40),
        "vec_id", "embedding", d, dim = 64, nlist = 8, m = 8, codebookSize = 16)
      val src = graft.util.Tmp.root("graft_ann_src")
      val ckpt = graft.util.Tmp.root("graft_ann_ckpt").toString
      // one 10-vector single-file micro-batch per stage() call (the
      // eventsSplitDir idiom: write via a scratch dir, hardlink the part
      // file under a stable name)
      def stage(i: Int): Unit = {
        val lo = 40L + i * 10; val hi = lo + 10
        val scratch = graft.util.Tmp.root("graft_ann_stage")
        emb.where(col("vec_id") >= lo && col("vec_id") < hi)
          .coalesce(1).write.mode("overwrite").parquet(scratch.toString)
        val part = scratch.toFile.listFiles()
          .filter(_.getName.endsWith(".parquet")).head.toPath
        java.nio.file.Files.createLink(src.resolve(s"f$i.parquet"), part)
      }
      val schema = emb.schema
      def launch() = graft.streaming.Streams.annIndexStream(
        s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(src.toString),
        "vec_id", "embedding", d, ckpt,
        corpus = sess => {
          val hi = sess.read.parquet(src.toString)
            .agg(max(col("vec_id"))).head().getLong(0) + 1
          Tables.embeddings(sess, dir).where(col("vec_id") < hi)
        },
        driftThreshold = 0.0)
      val run1 = launch()
      try {
        stage(0); run1.processAllAvailable() // batch 0
        stage(1); run1.processAllAvailable() // batch 1
      } finally run1.stop() // the "crash"
      stage(2) // arrives while the query is down
      val run2 = launch() // restart from the same checkpoint
      try {
        run2.processAllAvailable()           // batch 2
        stage(3); run2.processAllAvailable() // batch 3 — final refit
      } finally run2.stop()
      // at-least-once replay of the final batch: the highwater written
      // atomically with the last refit's generation must absorb it
      Similarity.appendStreamBatch(
        emb.where(col("vec_id") >= 70 && col("vec_id") < 80),
        "vec_id", "embedding", d, batchId = 3L)
      val gdir = graft.util.AtomicStore.resolve(s, d)
      require(!new java.io.File(s"$gdir/codes_stream").exists(),
        "replayed batch must be skipped by the stream highwater")
      require(s.read.parquet(s"$gdir/codes").count() == 80,
        "final store must hold the full folded corpus")
      // pin the full-fit twin + the exact hit set once, at build time
      // (deterministic functions of the same seeded fit — the
      // servedIndexDir idiom)
      val all = emb.where(col("vec_id") < 80)
      Similarity.ivfPqTopK(all, "vec_id", "embedding", k = 10,
          dim = 64, nlist = 8, nprobe = 4, m = 8, codebookSize = 16)
        .write.mode("overwrite").parquet(s"$d/expected/direct")
      Similarity.knnJoin(all, "vec_id", "embedding", k = 10)
        .select(col("id1"), col("id2"))
        .write.mode("overwrite").parquet(s"$d/expected/exact")
      d
    })

  /** Stream-MAINTAINED SQ×IVF store for q_stream_sq_ivf — the
    * [[streamAnnIndexDir]] protocol on the int8 store: base fit on
    * vec_id < 40, four streamed micro-batches through a REAL
    * [[graft.streaming.Streams.sqIvfIndexStream]] run with a checkpoint
    * restart between batches 1 and 2, growthThreshold = 0 so every batch
    * folds via refit, then an explicit replay of the final batch that the
    * stream highwater must absorb.
    */
  private def streamSqIvfIndexDir(s: SparkSession, dir: String): String =
    indexDirs.getOrElseUpdate(s"${s.sparkContext.applicationId}:$dir:sqstream", {
      val d = graft.util.Tmp.root("graft_sqivf_stream").toString
      val emb = Tables.embeddings(s, dir)
      Similarity.writeSqIvfIndex(emb.where(col("vec_id") < 40),
        "vec_id", "embedding", d, dim = 64, nlist = 8)
      val src = graft.util.Tmp.root("graft_sqs_src")
      val ckpt = graft.util.Tmp.root("graft_sqs_ckpt").toString
      def stage(i: Int): Unit = {
        val lo = 40L + i * 10; val hi = lo + 10
        val scratch = graft.util.Tmp.root("graft_sqs_stage")
        emb.where(col("vec_id") >= lo && col("vec_id") < hi)
          .coalesce(1).write.mode("overwrite").parquet(scratch.toString)
        val part = scratch.toFile.listFiles()
          .filter(_.getName.endsWith(".parquet")).head.toPath
        java.nio.file.Files.createLink(src.resolve(s"f$i.parquet"), part)
      }
      val schema = emb.schema
      def launch() = graft.streaming.Streams.sqIvfIndexStream(
        s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(src.toString),
        "vec_id", "embedding", d, ckpt,
        corpus = sess => {
          val hi = sess.read.parquet(src.toString)
            .agg(max(col("vec_id"))).head().getLong(0) + 1
          Tables.embeddings(sess, dir).where(col("vec_id") < hi)
        },
        growthThreshold = 0.0)
      val run1 = launch()
      try {
        stage(0); run1.processAllAvailable() // batch 0
        stage(1); run1.processAllAvailable() // batch 1
      } finally run1.stop() // the "crash"
      stage(2) // arrives while the query is down
      val run2 = launch() // restart from the same checkpoint
      try {
        run2.processAllAvailable()           // batch 2
        stage(3); run2.processAllAvailable() // batch 3 — final refit
      } finally run2.stop()
      // at-least-once replay of the final batch: the highwater written
      // atomically with the last refit's generation must absorb it
      Similarity.appendSqIvfStreamBatch(
        emb.where(col("vec_id") >= 70 && col("vec_id") < 80),
        "vec_id", "embedding", d, batchId = 3L)
      val gdir = graft.util.AtomicStore.resolve(s, d)
      require(!new java.io.File(s"$gdir/codes_stream").exists(),
        "replayed batch must be skipped by the stream highwater")
      require(s.read.parquet(s"$gdir/codes").count() == 80,
        "final store must hold the full folded corpus")
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

  def oracles: Map[String, String] = Map(
    "q_sq_ann" ->
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |c AS (
         |  SELECT vec_id, list_transform(e,
         |    x -> CAST(round(x / sqrt(list_dot_product(e, e)) * 127) AS DOUBLE)) AS q8
         |  FROM v),
         |pairs AS (
         |  SELECT qc.vec_id AS query_id, cc.vec_id AS id,
         |    CAST(list_dot_product(qc.q8, cc.q8) AS BIGINT) AS dot
         |  FROM c qc JOIN c cc ON cc.vec_id <> qc.vec_id
         |  WHERE qc.vec_id % 97 = 0 AND qc.vec_id < 1000000),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |             ORDER BY dot DESC, id) AS rank
         |  FROM pairs)
         |SELECT query_id, id, dot, round(dot / 16129.0, 6) AS approx_cos, rank
         |FROM r WHERE rank <= 5""".stripMargin,
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
    // FULL DERIVATION of the SQ×IVF ranking — the same derived IVF
    // pipeline with q_sq_ann's derived int8 codes scoring the candidates;
    // every output value (dot, approx_cos, rank) recomputed in SQL.
    "q_sq_ivf_ann" -> IvfKmeansSql.sqSql(dim = 64, nlist = 8, nprobe = 4,
      k = 5, iters = 10),
    // the served path must reproduce the direct SQ×IVF path exactly —
    // same derivation (the store holds the same fit's centroids and the
    // same encode's codes, and integer scores leave no rounding slack)
    "q_sq_ivf_served" -> IvfKmeansSql.sqSql(dim = 64, nlist = 8, nprobe = 4,
      k = 5, iters = 10),
    // the stream-maintained SQ×IVF store's final state IS a fresh
    // full-corpus fit (every micro-batch folded via growth refit, replay
    // absorbed by the highwater), so its serve derives from the same
    // replay over the 80-vector corpus
    "q_stream_sq_ivf" -> IvfKmeansSql.sqSql(dim = 64, nlist = 8, nprobe = 4,
      k = 5, iters = 10, fitWhere = "vec_id < 80"),
    // SHRUNK int8 store: fit on 50, tombstone the vec_id ≡ 3 (mod 7)
    // seven, serve the 43 survivors — fit rows and live rows split
    // exactly like q_ivfpq_delete's oracle; integer scores leave no
    // rounding slack, and compaction must not change a single value
    "q_sq_ivf_delete" -> IvfKmeansSql.sqSql(dim = 64, nlist = 8, nprobe = 4,
      k = 5, iters = 10, fitWhere = "vec_id < 50",
      corpusWhere = "vec_id < 50 AND vec_id % 7 <> 3",
      extraCols = ", TRUE AS matches_compacted"),
    // FULL DERIVATION of the PQ recall — nothing pinned: DuckDB replays
    // the L2 normalization, the seeded init over the normalized arrays,
    // all 8 subspace Lloyd's fits, the PqEncode argmin, the per-query
    // ADC lookup tables, the subspace-ordered score fold, and the recall
    // join from the raw embeddings table. See [[PqKmeansSql]].
    "q_pq_ann" -> PqKmeansSql.sql(dim = 64, m = 8, codebookSize = 16,
      k = 10, iters = 10),
    // FULL DERIVATION of the IVF-PQ composition — nothing pinned: DuckDB
    // replays the coarse Lloyd's fit (raw vectors), the PQ subspace fit
    // (normalized), the stored-model cell assignment + encoding, the
    // probe ranking, the ADC scoring, and the recall join. See
    // [[IvfPqKmeansSql]].
    "q_ivfpq_ann" -> IvfPqKmeansSql.sql(dim = 64, nlist = 8, nprobe = 4,
      m = 8, codebookSize = 16, k = 10, iters = 10),
    // the served path must reproduce the direct path exactly: the SAME
    // derivation, with the engine-side bit-parity flag derived TRUE (the
    // derivation IS the direct path's definition)
    "q_ivfpq_served" -> IvfPqKmeansSql.sql(dim = 64, nlist = 8, nprobe = 4,
      m = 8, codebookSize = 16, k = 10, iters = 10,
      extraCols = ", TRUE AS matches_direct"),
    // a refit store is bit-identical to the fresh full fit, so its serve
    // derives from the same full-corpus replay
    "q_ivfpq_refit" -> IvfPqKmeansSql.sql(dim = 64, nlist = 8, nprobe = 4,
      m = 8, codebookSize = 16, k = 10, iters = 10,
      extraCols = ", TRUE AS matches_full_fit"),
    // the stream-maintained store's final state IS a fresh full-corpus
    // fit (every micro-batch folded via drift refit, replay absorbed by
    // the highwater), so its serve derives from the same replay over the
    // 80-vector corpus
    "q_stream_ann" -> IvfPqKmeansSql.sql(dim = 64, nlist = 8, nprobe = 4,
      m = 8, codebookSize = 16, k = 10, iters = 10,
      fitWhere = "vec_id < 80", corpusWhere = "vec_id < 80",
      extraCols = ", TRUE AS matches_full_fit"),
    // GROWN store: fit on vec_id < 40, serve all 50 encoded with the
    // stored model — the fit/corpus split is the derivation's parameter;
    // matches_rebuild stays the engine-side bit-parity gate
    "q_ivfpq_append" -> IvfPqKmeansSql.sql(dim = 64, nlist = 8, nprobe = 4,
      m = 8, codebookSize = 16, k = 10, iters = 10,
      fitWhere = "vec_id < 40",
      extraCols = ", TRUE AS matches_rebuild"),
    // SHRUNK store: fit on 50, serve the 43 survivors; recall vs exact
    // kNN over the survivors — all derived
    "q_ivfpq_delete" -> IvfPqKmeansSql.sql(dim = 64, nlist = 8, nprobe = 4,
      m = 8, codebookSize = 16, k = 10, iters = 10,
      corpusWhere = "vec_id < 50 AND vec_id % 7 <> 3",
      extraCols = ", TRUE AS matches_filtered, TRUE AS matches_compacted"),
    // RESIDUAL path: coarse fit on normalized vectors, codebooks fit on
    // derived-and-hashed residuals, ⟨q, cent⟩ + ADC scoring — all derived
    "q_ivfpq_residual" -> IvfPqKmeansSql.sql(dim = 64, nlist = 8, nprobe = 4,
      m = 8, codebookSize = 16, k = 10, iters = 10, residual = true)
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
  /** Shared HUGEINT wraparound arithmetic for replaying Spark's xxhash64
    * in DuckDB (the same staging as [[DedupQ]]'s XxSql, plus the
    * array-of-doubles fold every k-means oracle needs): 64-bit mul from
    * 32-bit halves, rotations as disjoint shift sums, xor through
    * UBIGINT, and the IEEE-754 double→bits decomposition. Package-shared:
    * [[SemQ]] derives its spherical-k-means and drift oracles from the
    * same pieces.
    */
  private[queries] object XxhashSql {
    val M = "18446744073709551616::HUGEINT"
    val P1 = "11400714785074694791::HUGEINT"
    val P2 = "14029467366897019727::HUGEINT"
    val P3 = "1609587929392839161::HUGEINT"
    val P4 = "9650029242287828579::HUGEINT"
    val P5 = "2870177450012600261::HUGEINT"
    def p2(b: Int): String = (BigInt(1) << b).toString + "::HUGEINT"
    def mod64(x: String) = s"((($x) % $M + $M) % $M)"
    def mul64(a: String, b: String) = mod64(
      s"($a % ${p2(32)}) * ($b % ${p2(32)}) + " +
        mod64(s"(($a // ${p2(32)}) * ($b % ${p2(32)}) + " +
          s"($a % ${p2(32)}) * ($b // ${p2(32)})) * ${p2(32)}"))
    def x64(a: String, b: String) =
      s"CAST(xor(CAST($a AS UBIGINT), CAST($b AS UBIGINT)) AS HUGEINT)"
    def rotl(x: String, r: Int) =
      s"(${mod64(s"$x * ${p2(r)}")} + ($x // ${p2(64 - r)}))"
    def shr(x: String, r: Int) = s"($x // ${p2(r)})"

    /** XXH64.hashLong(`l`, `seed`) — Spark's single-long shortcut
      * (seed+P5+8, one 8-byte round, fmix) — staged as NESTED DERIVED
      * TABLES around `baseSelect` (which must expose columns `l` and
      * `hprev`), with the result in column `shout`. Nested subqueries,
      * NOT lateral column aliases: DuckDB binds lateral aliases by
      * textual substitution, and since every mul64/rotl references its
      * argument several times, a 13-stage lateral chain explodes the
      * bound expression tree exponentially — measured 35 s for the
      * 64-step fold vs 0.3 s in this form, identical results.
      */
    def hashLongNested(baseSelect: String): String = {
      val stages = Seq(
        "sh0" -> mod64(s"hprev + $P5 + 8::HUGEINT"),
        "sm1" -> mul64("l", P2),
        "sr1" -> rotl("sm1", 31),
        "sm2" -> mul64("sr1", P1),
        "sx1" -> x64("sh0", "sm2"),
        "sr2" -> rotl("sx1", 27),
        "sa3" -> mul64("sr2", P1),
        "sh1" -> mod64(s"sa3 + $P4"),
        "sf1" -> x64("sh1", shr("sh1", 33)),
        "sf2" -> mul64("sf1", P2),
        "sf3" -> x64("sf2", shr("sf2", 29)),
        "sf4" -> mul64("sf3", P3),
        "shout" -> x64("sf4", shr("sf4", 32)))
      stages.foldLeft(baseSelect) { case (q, (n, e)) =>
        s"(SELECT *, $e AS $n FROM $q)"
      }
    }

    val T52 = "4503599627370496" // 2^52

    /** CTEs `<p>elems`→`<p>bits`→`<p>fold`→`<p>hfin` computing per-row
      * Spark `xxhash64(<hashCol>, 42)` over a `dim`-element double-array
      * column of CTE `src(id, <hashCol>)`: IEEE-754 bits per element
      * (exponent via corrected floor(log2), mantissa exact — every
      * finite double's significand fits the 2^52 scaling), then the
      * per-element hashLong chain through a recursive CTE, then the
      * trailing literal-42 fold. The `p` prefix lets one query carry
      * several independent folds (the IVF-PQ oracle hashes both the raw
      * and the normalized arrays).
      */
    def hashFoldCtes(src: String, hashCol: String, dim: Int,
                     p: String = ""): Seq[String] = Seq(
      s"""${p}elems AS MATERIALIZED (
  SELECT e.id, CAST(t.i AS BIGINT) AS idx, e.$hashCol[CAST(t.i AS BIGINT) + 1] AS val
  FROM $src e CROSS JOIN (SELECT UNNEST(range(0, $dim)) AS i) t
)""",
      s"""${p}bits AS MATERIALIZED (
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
    FROM ${p}elems)
)""",
      s"""${p}fold AS (
  SELECT id, CAST(-1 AS BIGINT) AS idx, 42::HUGEINT AS h FROM $src
  UNION ALL
  SELECT id, idx, shout AS h FROM ${hashLongNested(
        s"(SELECT f.id, f.idx + 1 AS idx, b.b AS l, f.h AS hprev " +
          s"FROM ${p}fold f JOIN ${p}bits b ON b.id = f.id AND b.idx = f.idx + 1 " +
          s"WHERE f.idx < ${dim - 1})")}
)""",
      s"""${p}hfin AS MATERIALIZED (
  SELECT id, shout AS h FROM ${hashLongNested(
        s"(SELECT id, 42::HUGEINT AS l, h AS hprev FROM ${p}fold WHERE idx = ${dim - 1})")}
)""")

    /** Full single-(sub)space k-means fit as CTEs over `src(id, <col>)`:
      * the `cv`-prefixed hash fold, seeded init (`ccents0` = the `k`
      * rows with the smallest hash), and `iters` unrolled Lloyd's
      * iterations (`casg<i>`/`ccents<i>`) with BIT-exact means
      * (ordered-list folds in ascending-id order — the engine's
      * single-partition accumulation). Returns (ctes, finalCentsCte);
      * the final CTE has columns (cell, u).
      */
    def coarseKmeansCtes(src: String, colName: String, dim: Int, k: Int,
                         iters: Int): (Seq[String], String) = {
      def d2(a: String, b: String) =
        s"list_sum(list_transform(range(1, ${dim + 1}), t -> ($a[t] - $b[t]) * ($a[t] - $b[t])))"
      val parts = Seq.newBuilder[String]
      parts ++= hashFoldCtes(src, colName, dim, p = "cv")
      parts += s"""ccents0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY x.hs ASC, x.cu ASC) - 1 AS BIGINT) AS cell, x.cu AS u
  FROM (
    SELECT e.$colName AS cu, CASE WHEN f.h >= ${p2(63)} THEN f.h - $M ELSE f.h END AS hs
    FROM cvhfin f JOIN $src e USING (id)
    ORDER BY hs ASC, cu ASC LIMIT $k) x
)"""
      var prev = "ccents0"
      (1 to iters).foreach { i =>
        parts += s"""casg$i AS MATERIALIZED (
  SELECT id, u, cell FROM (
    SELECT d.id, d.u, d.cell,
           row_number() OVER (PARTITION BY d.id ORDER BY d.d2 ASC, d.cell ASC) AS rn
    FROM (SELECT a.id, a.$colName AS u, c.cell, ${d2(s"a.$colName", "c.u")} AS d2
          FROM $src a CROSS JOIN $prev c) d
  ) WHERE rn = 1
)"""
        parts += s"""ccents$i AS MATERIALIZED (
  SELECT c.cell, COALESCE(mm.mu, c.u) AS u
  FROM $prev c LEFT JOIN (
    SELECT cell, list(s ORDER BY t) AS mu FROM (
      SELECT cell, t.t AS t, list_sum(list(u[t.t] ORDER BY id)) / count(*) AS s
      FROM casg$i CROSS JOIN (SELECT UNNEST(range(1, ${dim + 1})) AS t) t
      GROUP BY cell, t.t
    ) GROUP BY cell
  ) mm ON mm.cell = c.cell
)"""
        prev = s"ccents$i"
      }
      (parts.result(), prev)
    }
  }

  private object IvfKmeansSql {
    import XxhashSql._

    /** CTEs through the coarse fit, the final corpus cell assignment
      * (`asgF(id, u, cell)`) and the per-query probe cells
      * (`probes(qid, qu, cell)`) — the IVF pipeline both tails share:
      * [[sql]] appends the cosine-recall tail (q_ivf_ann), [[sqSql]] the
      * int8-ranking tail (q_sq_ivf_ann). `fitWhere` selects the FIT rows
      * (`emb`); `corpusWhere` the ENCODED+QUERIED rows (`embC` — the
      * live view after deletes): the delete oracle fits on 50 and serves
      * the survivors, everything else keeps the two equal.
      */
    def pipelineCtes(dim: Int, nlist: Int, nprobe: Int, iters: Int,
                     fitWhere: String = "vec_id < 50",
                     corpusWhere: String = ""): Seq[String] = {
      val where = fitWhere
      val cWhere = if (corpusWhere.nonEmpty) corpusWhere else fitWhere
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
  FROM embeddings WHERE $where
)"""
      parts += s"""embC AS MATERIALIZED (
  SELECT CAST(vec_id AS BIGINT) AS id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS u
  FROM embeddings WHERE $cWhere
)"""
      parts ++= hashFoldCtes("emb", "u", dim)
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
      SELECT cell, t.j AS j, list_sum(list(u[t.j] ORDER BY id)) / count(*) AS s
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
      FROM embC a CROSS JOIN $prev c) d
  ) WHERE rn = 1
)"""
      parts += s"""probes AS MATERIALIZED (
  SELECT id AS qid, u AS qu, cell FROM (
    SELECT d.id, d.u, d.cell,
           row_number() OVER (PARTITION BY d.id ORDER BY d.cos DESC, d.cell ASC) AS rn
    FROM (
      SELECT e.id, e.u, c.cell, ${cos("e.u", "c.u")} AS cos
      FROM embC e CROSS JOIN $prev c) d
  ) WHERE rn <= $nprobe
)"""
      parts.result()
    }

    def sql(dim: Int, nlist: Int, nprobe: Int, k: Int, iters: Int): String = {
      def dot(u: String, c: String) =
        s"list_sum(list_transform(range(1, ${dim + 1}), j -> $u[j] * $c[j]))"
      def nrm(u: String) = s"sqrt(list_sum(list_transform($u, x -> x * x)))"
      def cos(u: String, c: String) = s"(${dot(u, c)} / (${nrm(u)} * ${nrm(c)}))"

      val parts = Seq.newBuilder[String]
      parts ++= pipelineCtes(dim, nlist, nprobe, iters)
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
      FROM embC a JOIN embC b ON a.id <> b.id) x
  ) WHERE rn <= $k
)"""
      "WITH RECURSIVE\n" + parts.result().mkString(",\n") + s"""
SELECT i.id1 AS id1,
       round(SUM(CASE WHEN e.id2 IS NOT NULL THEN 1 ELSE 0 END) / $k.0, 6) AS recall
FROM ivf i LEFT JOIN exact e ON e.id1 = i.id1 AND e.id2 = i.id2
GROUP BY 1"""
    }

    /** q_sq_ivf_ann: the SAME derived IVF pipeline (fit, cell assignment,
      * probe cells), with candidates scored by the SQ int8 codes exactly
      * as q_sq_ann's oracle derives them — round(x/‖x‖·127) per dimension
      * and an integer dot. Value-for-value replay of
      * `Similarity.sqIvfTopK`, nothing pinned from the engine.
      */
    def sqSql(dim: Int, nlist: Int, nprobe: Int, k: Int, iters: Int,
              fitWhere: String = "vec_id < 50",
              corpusWhere: String = "",
              extraCols: String = ""): String = {
      val parts = Seq.newBuilder[String]
      parts ++= pipelineCtes(dim, nlist, nprobe, iters, fitWhere, corpusWhere)
      parts += s"""codes AS MATERIALIZED (
  SELECT id, list_transform(u,
    x -> CAST(round(x / sqrt(list_dot_product(u, u)) * 127) AS DOUBLE)) AS q8
  FROM embC
)"""
      parts += s"""pairs AS MATERIALIZED (
  SELECT p.qid AS query_id, a.id AS id,
    CAST(list_dot_product(qc.q8, cc.q8) AS BIGINT) AS dot
  FROM probes p
  JOIN asgF a ON a.cell = p.cell AND a.id <> p.qid
  JOIN codes qc ON qc.id = p.qid
  JOIN codes cc ON cc.id = a.id
)"""
      "WITH RECURSIVE\n" + parts.result().mkString(",\n") + s"""
SELECT query_id, id, dot, round(dot / 16129.0, 6) AS approx_cos, rank$extraCols
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY dot DESC, id) AS rank
  FROM pairs)
WHERE rank <= $k"""
    }
  }

  /** DuckDB replay of the ENTIRE seeded PQ pipeline — the de-pinning of
    * q_pq_ann, extending [[IvfKmeansSql]]'s technique from the m = 1 fit
    * to all `m` subspaces plus ADC scoring:
    *
    *   1. NORMALIZE: the PQ fit and the query LUTs run on L2-normalized
    *      vectors — replayed as x / sqrt(Σx²) with the same sequential
    *      sum the engine's L2Normalize kernel uses.
    *   2. INIT: the `codebookSize` seed rows with the smallest Spark
    *      `xxhash64(u, 42)` — over the NORMALIZED arrays this time, so
    *      the bit-pattern decomposition covers full-precision doubles
    *      (exact regardless: a/2^ex·2^52 is an integer for every finite
    *      double). Each subspace's codebook starts from the seed rows'
    *      subvectors, exactly kmeansSubspaces' init.
    *   3. FIT: `iters` unrolled Lloyd's iterations over (id, subspace)
    *      rows — per-subspace argmin-L2² with lowest-cell tie-break,
    *      per-(subspace, cell) means, empty cells carrying forward.
    *   4. ENCODE + ADC: codes = the same argmin against the final
    *      codebooks (the PqEncode kernel); per-query LUTs
    *      `⟨q_j, codebook[j][c]⟩`; score = Σ_j lut[j][code_j] summed in
    *      subspace order (list(… ORDER BY j) → list_sum, matching the
    *      PqAdc left-to-right fold); top-k by (score DESC, id ASC);
    *      recall vs exact raw-vector cosine kNN.
    */
  private object PqKmeansSql {
    import XxhashSql._

    def sql(dim: Int, m: Int, codebookSize: Int, k: Int, iters: Int): String = {
      val sub = dim / m
      require(sub * m == dim, s"dim $dim not divisible by m $m")
      def d2(a: String, b: String) =
        s"list_sum(list_transform(range(1, ${sub + 1}), t -> ($a[t] - $b[t]) * ($a[t] - $b[t])))"
      def cosRaw(a: String, b: String) = {
        def dot = s"list_sum(list_transform(range(1, ${dim + 1}), j -> $a[j] * $b[j]))"
        def nrm(u: String) = s"sqrt(list_sum(list_transform($u, x -> x * x)))"
        s"($dot / (${nrm(a)} * ${nrm(b)}))"
      }
      val parts = Seq.newBuilder[String]
      parts += s"""raw AS MATERIALIZED (
  SELECT CAST(vec_id AS BIGINT) AS id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id < 50
)"""
      parts += s"""emb AS MATERIALIZED (
  SELECT id, v,
         list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y * y)))) AS u
  FROM raw
)"""
      parts ++= hashFoldCtes("emb", "u", dim)
      parts += s"""seeds AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY x.hs ASC, x.u ASC) - 1 AS BIGINT) AS cell, x.u
  FROM (
    SELECT e.u,
      CASE WHEN f.h >= ${p2(63)} THEN f.h - $M ELSE f.h END AS hs
    FROM hfin f JOIN emb e USING (id)
    ORDER BY hs ASC, u ASC LIMIT $codebookSize) x
)"""
      parts += s"""subs AS MATERIALIZED (
  SELECT n.id, CAST(j.j AS BIGINT) AS j,
         list_transform(range(1, ${sub + 1}),
           t -> n.u[CAST(j.j AS BIGINT) * $sub + t]) AS su
  FROM emb n CROSS JOIN (SELECT UNNEST(range(0, $m)) AS j) j
)"""
      parts += s"""cents0 AS MATERIALIZED (
  SELECT CAST(j.j AS BIGINT) AS j, s.cell,
         list_transform(range(1, ${sub + 1}),
           t -> s.u[CAST(j.j AS BIGINT) * $sub + t]) AS cu
  FROM seeds s CROSS JOIN (SELECT UNNEST(range(0, $m)) AS j) j
)"""
      var prev = "cents0"
      (1 to iters).foreach { i =>
        parts += s"""asg$i AS MATERIALIZED (
  SELECT id, j, su, cell FROM (
    SELECT d.id, d.j, d.su, d.cell,
           row_number() OVER (PARTITION BY d.id, d.j ORDER BY d.d2 ASC, d.cell ASC) AS rn
    FROM (
      SELECT s.id, s.j, s.su, c.cell, ${d2("s.su", "c.cu")} AS d2
      FROM subs s JOIN $prev c ON c.j = s.j) d
  ) WHERE rn = 1
)"""
        parts += s"""cents$i AS MATERIALIZED (
  SELECT c.j, c.cell, COALESCE(mm.mu, c.cu) AS cu
  FROM $prev c LEFT JOIN (
    SELECT j, cell, list(s ORDER BY t) AS mu FROM (
      SELECT j, cell, t.t AS t, list_sum(list(su[t.t] ORDER BY id)) / count(*) AS s
      FROM asg$i CROSS JOIN (SELECT UNNEST(range(1, ${sub + 1})) AS t) t
      GROUP BY j, cell, t.t
    ) GROUP BY j, cell
  ) mm ON mm.j = c.j AND mm.cell = c.cell
)"""
        prev = s"cents$i"
      }
      parts += s"""codes AS MATERIALIZED (
  SELECT id, j, cell AS code FROM (
    SELECT d.id, d.j, d.cell,
           row_number() OVER (PARTITION BY d.id, d.j ORDER BY d.d2 ASC, d.cell ASC) AS rn
    FROM (
      SELECT s.id, s.j, c.cell, ${d2("s.su", "c.cu")} AS d2
      FROM subs s JOIN $prev c ON c.j = s.j) d
  ) WHERE rn = 1
)"""
      parts += s"""luts AS MATERIALIZED (
  SELECT s.id AS qid, s.j, c.cell,
         list_sum(list_transform(range(1, ${sub + 1}), t -> s.su[t] * c.cu[t])) AS lut
  FROM subs s JOIN $prev c ON c.j = s.j
)"""
      parts += s"""scores AS MATERIALIZED (
  SELECT l.qid AS id1, co.id AS id2,
         list_sum(list(l.lut ORDER BY l.j)) AS score
  FROM codes co JOIN luts l ON l.j = co.j AND l.cell = co.code
  WHERE l.qid <> co.id
  GROUP BY l.qid, co.id
)"""
      parts += s"""pq AS MATERIALIZED (
  SELECT id1, id2 FROM (
    SELECT id1, id2, row_number() OVER (PARTITION BY id1 ORDER BY score DESC, id2 ASC) AS rn
    FROM scores) WHERE rn <= $k
)"""
      parts += s"""exact AS MATERIALIZED (
  SELECT id1, id2 FROM (
    SELECT x.id1, x.id2, row_number() OVER (PARTITION BY x.id1 ORDER BY x.cos DESC, x.id2 ASC) AS rn
    FROM (
      SELECT a.id AS id1, b.id AS id2, ${cosRaw("a.v", "b.v")} AS cos
      FROM raw a JOIN raw b ON a.id <> b.id) x
  ) WHERE rn <= $k
)"""
      "WITH RECURSIVE\n" + parts.result().mkString(",\n") + s"""
SELECT p.id1 AS id1,
       round(SUM(CASE WHEN e.id2 IS NOT NULL THEN 1 ELSE 0 END) / $k.0, 6) AS recall
FROM pq p LEFT JOIN exact e ON e.id1 = p.id1 AND e.id2 = p.id2
GROUP BY 1"""
    }
  }

  /** DuckDB replay of the ENTIRE IVF-PQ lifecycle family — the
    * de-pinning of q_ivfpq_ann/served/refit/append/delete/residual in
    * one parameterized generator composing [[IvfKmeansSql]]'s coarse fit
    * with [[PqKmeansSql]]'s subspace fit:
    *
    *   - `fitWhere` / `corpusWhere` split the FIT rows from the
    *     ENCODED+QUERIED rows: the append oracle fits on `vec_id < 40`
    *     and serves 50 (stored-model growth), the delete oracle fits on
    *     50 and serves the 43 survivors.
    *   - `residual = true` replays the FAISS-style path: the coarse fit
    *     runs on NORMALIZED vectors, fit-row residuals `u − cent(cell)`
    *     are derived in SQL and HASHED for the codebook init (a third
    *     xxhash fold — over computed doubles, which is why every k-means
    *     mean below is an ORDERED list fold: DuckDB's unordered SUM
    *     drifts in the last ulp and a hashed residual amplifies one ulp
    *     into a different seed order), the codebooks fit residual
    *     subvectors, and the score adds the ⟨q, cent(cell)⟩ term before
    *     the ADC fold exactly as the engine does.
    *   - `extraCols` appends the engine-side bit-parity flags
    *     (matches_direct / matches_rebuild / …) that the serve queries
    *     emit — derived TRUE here because the derivation IS the direct
    *     path's definition.
    *
    * Every k-means mean is `list_sum(list(x ORDER BY id))` — the
    * engine's single-partition accumulation order (ascending vec_id, the
    * table's physical order) — so centroids are BIT-exact, which the
    * residual hash requires and every argmin tie benefits from.
    */
  private object IvfPqKmeansSql {
    import XxhashSql._

    def sql(dim: Int, nlist: Int, nprobe: Int, m: Int, codebookSize: Int,
            k: Int, iters: Int,
            fitWhere: String = "vec_id < 50",
            corpusWhere: String = "vec_id < 50",
            residual: Boolean = false,
            extraCols: String = ""): String = {
      val sub = dim / m
      require(sub * m == dim, s"dim $dim not divisible by m $m")
      def d2full(a: String, b: String) =
        s"list_sum(list_transform(range(1, ${dim + 1}), t -> ($a[t] - $b[t]) * ($a[t] - $b[t])))"
      def d2sub(a: String, b: String) =
        s"list_sum(list_transform(range(1, ${sub + 1}), t -> ($a[t] - $b[t]) * ($a[t] - $b[t])))"
      def cosl(a: String, b: String) = {
        val dot = s"list_sum(list_transform(range(1, ${dim + 1}), j -> $a[j] * $b[j]))"
        def nrm(u: String) = s"sqrt(list_sum(list_transform($u, x -> x * x)))"
        s"($dot / (${nrm(a)} * ${nrm(b)}))"
      }
      val parts = Seq.newBuilder[String]
      parts += s"""corp AS MATERIALIZED (
  SELECT CAST(vec_id AS BIGINT) AS id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE $corpusWhere
)"""
      parts += s"""corpn AS MATERIALIZED (
  SELECT id, v,
         list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y * y)))) AS u
  FROM corp
)"""
      parts += s"""fitr AS MATERIALIZED (
  SELECT CAST(vec_id AS BIGINT) AS id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE $fitWhere
)"""
      parts += s"""fitn AS MATERIALIZED (
  SELECT id, v,
         list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y * y)))) AS u
  FROM fitr
)"""
      // coarse fit: raw vectors (raw path) / normalized (residual path)
      val (ccol, csrc) = if (residual) ("u", "fitn") else ("v", "fitr")
      val (coarseCtes, coarse) = coarseKmeansCtes(csrc, ccol, dim, nlist, iters)
      parts ++= coarseCtes
      var prev = coarse
      // PQ fit input: normalized fit rows (raw) / fit-row residuals
      val (pqcol, pqsrc) =
        if (residual) {
          parts += s"""fcell AS MATERIALIZED (
  SELECT id, u, cell FROM (
    SELECT d.id, d.u, d.cell,
           row_number() OVER (PARTITION BY d.id ORDER BY d.d2 ASC, d.cell ASC) AS rn
    FROM (SELECT a.id, a.u, c.cell, ${d2full("a.u", "c.u")} AS d2
          FROM fitn a CROSS JOIN $coarse c) d
  ) WHERE rn = 1
)"""
          parts += s"""fres AS MATERIALIZED (
  SELECT f.id, list_transform(range(1, ${dim + 1}), t -> f.u[t] - c.u[t]) AS r
  FROM fcell f JOIN $coarse c ON c.cell = f.cell
)"""
          ("r", "fres")
        } else ("u", "fitn")
      parts ++= hashFoldCtes(pqsrc, pqcol, dim, p = "pv")
      parts += s"""pseeds AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY x.hs ASC, x.pu ASC) - 1 AS BIGINT) AS cell, x.pu AS u
  FROM (
    SELECT e.$pqcol AS pu, CASE WHEN f.h >= ${p2(63)} THEN f.h - $M ELSE f.h END AS hs
    FROM pvhfin f JOIN $pqsrc e USING (id)
    ORDER BY hs ASC, pu ASC LIMIT $codebookSize) x
)"""
      parts += s"""fsubs AS MATERIALIZED (
  SELECT n.id, CAST(j.j AS BIGINT) AS j,
         list_transform(range(1, ${sub + 1}), t -> n.$pqcol[CAST(j.j AS BIGINT) * $sub + t]) AS su
  FROM $pqsrc n CROSS JOIN (SELECT UNNEST(range(0, $m)) AS j) j
)"""
      parts += s"""pcents0 AS MATERIALIZED (
  SELECT CAST(j.j AS BIGINT) AS j, s.cell,
         list_transform(range(1, ${sub + 1}), t -> s.u[CAST(j.j AS BIGINT) * $sub + t]) AS cu
  FROM pseeds s CROSS JOIN (SELECT UNNEST(range(0, $m)) AS j) j
)"""
      prev = "pcents0"
      (1 to iters).foreach { i =>
        parts += s"""pasg$i AS MATERIALIZED (
  SELECT id, j, su, cell FROM (
    SELECT d.id, d.j, d.su, d.cell,
           row_number() OVER (PARTITION BY d.id, d.j ORDER BY d.d2 ASC, d.cell ASC) AS rn
    FROM (SELECT s.id, s.j, s.su, c.cell, ${d2sub("s.su", "c.cu")} AS d2
          FROM fsubs s JOIN $prev c ON c.j = s.j) d
  ) WHERE rn = 1
)"""
        parts += s"""pcents$i AS MATERIALIZED (
  SELECT c.j, c.cell, COALESCE(mm.mu, c.cu) AS cu
  FROM $prev c LEFT JOIN (
    SELECT j, cell, list(s ORDER BY t) AS mu FROM (
      SELECT j, cell, t.t AS t, list_sum(list(su[t.t] ORDER BY id)) / count(*) AS s
      FROM pasg$i CROSS JOIN (SELECT UNNEST(range(1, ${sub + 1})) AS t) t
      GROUP BY j, cell, t.t
    ) GROUP BY j, cell
  ) mm ON mm.j = c.j AND mm.cell = c.cell
)"""
        prev = s"pcents$i"
      }
      val books = prev
      // corpus cell assignment (raw v / normalized u), stored-model encode
      val acol = if (residual) "u" else "v"
      parts += s"""cellsF AS MATERIALIZED (
  SELECT id, cell FROM (
    SELECT d.id, d.cell, row_number() OVER (PARTITION BY d.id ORDER BY d.d2 ASC, d.cell ASC) AS rn
    FROM (SELECT a.id, c.cell, ${d2full(s"a.$acol", "c.u")} AS d2
          FROM corpn a CROSS JOIN $coarse c) d
  ) WHERE rn = 1
)"""
      val (encsrc, enccol) =
        if (residual) {
          parts += s"""cres AS MATERIALIZED (
  SELECT n.id, list_transform(range(1, ${dim + 1}), t -> n.u[t] - c.u[t]) AS enc
  FROM (SELECT cn.id, cn.u, cf.cell FROM corpn cn JOIN cellsF cf ON cf.id = cn.id) n
  JOIN $coarse c ON c.cell = n.cell
)"""
          ("cres", "enc")
        } else ("corpn", "u")
      parts += s"""csubs AS MATERIALIZED (
  SELECT n.id, CAST(j.j AS BIGINT) AS j,
         list_transform(range(1, ${sub + 1}), t -> n.$enccol[CAST(j.j AS BIGINT) * $sub + t]) AS su
  FROM $encsrc n CROSS JOIN (SELECT UNNEST(range(0, $m)) AS j) j
)"""
      parts += s"""qsubs AS MATERIALIZED (
  SELECT n.id, CAST(j.j AS BIGINT) AS j,
         list_transform(range(1, ${sub + 1}), t -> n.u[CAST(j.j AS BIGINT) * $sub + t]) AS su
  FROM corpn n CROSS JOIN (SELECT UNNEST(range(0, $m)) AS j) j
)"""
      parts += s"""codes AS MATERIALIZED (
  SELECT id, j, cell AS code FROM (
    SELECT d.id, d.j, d.cell, row_number() OVER (PARTITION BY d.id, d.j ORDER BY d.d2 ASC, d.cell ASC) AS rn
    FROM (SELECT s.id, s.j, c.cell, ${d2sub("s.su", "c.cu")} AS d2
          FROM csubs s JOIN $books c ON c.j = s.j) d
  ) WHERE rn = 1
)"""
      parts += s"""probes AS MATERIALIZED (
  SELECT id AS qid, cell FROM (
    SELECT d.id, d.cell, row_number() OVER (PARTITION BY d.id ORDER BY d.cos DESC, d.cell ASC) AS rn
    FROM (SELECT e.id, c.cell, ${cosl("e.u", "c.u")} AS cos
          FROM corpn e CROSS JOIN $coarse c) d
  ) WHERE rn <= $nprobe
)"""
      parts += s"""luts AS MATERIALIZED (
  SELECT s.id AS qid, s.j, c.cell,
         list_sum(list_transform(range(1, ${sub + 1}), t -> s.su[t] * c.cu[t])) AS lut
  FROM qsubs s JOIN $books c ON c.j = s.j
)"""
      if (residual)
        parts += s"""qcs AS MATERIALIZED (
  SELECT e.id AS qid, c.cell,
         list_sum(list_transform(range(1, ${dim + 1}), t -> e.u[t] * c.u[t])) AS qc
  FROM corpn e CROSS JOIN $coarse c
)"""
      val qcTerm = if (residual) "any_value(qc.qc) + " else ""
      val qcJoin =
        if (residual) "\n  JOIN qcs qc ON qc.qid = p.qid AND qc.cell = cf.cell"
        else ""
      parts += s"""scores AS MATERIALIZED (
  SELECT l.qid AS id1, co.id AS id2,
         ${qcTerm}list_sum(list(l.lut ORDER BY l.j)) AS score
  FROM codes co
  JOIN cellsF cf ON cf.id = co.id
  JOIN probes p ON p.cell = cf.cell$qcJoin
  JOIN luts l ON l.qid = p.qid AND l.j = co.j AND l.cell = co.code
  WHERE p.qid <> co.id
  GROUP BY l.qid, co.id
)"""
      parts += s"""pq AS MATERIALIZED (
  SELECT id1, id2 FROM (
    SELECT id1, id2, row_number() OVER (PARTITION BY id1 ORDER BY score DESC, id2 ASC) AS rn
    FROM scores) WHERE rn <= $k
)"""
      parts += s"""exact AS MATERIALIZED (
  SELECT id1, id2 FROM (
    SELECT x.id1, x.id2, row_number() OVER (PARTITION BY x.id1 ORDER BY x.cos DESC, x.id2 ASC) AS rn
    FROM (SELECT a.id AS id1, b.id AS id2, ${cosl("a.v", "b.v")} AS cos
          FROM corp a JOIN corp b ON a.id <> b.id) x
  ) WHERE rn <= $k
)"""
      "WITH RECURSIVE\n" + parts.result().mkString(",\n") + s"""
SELECT p.id1 AS id1,
       round(SUM(CASE WHEN e.id2 IS NOT NULL THEN 1 ELSE 0 END) / $k.0, 6) AS recall$extraCols
FROM pq p LEFT JOIN exact e ON e.id1 = p.id1 AND e.id2 = p.id2
GROUP BY 1"""
    }
  }
}
