package graft.util

import graft.SparkSpec
import graft.dedup.DedupIndex
import graft.sim.Similarity
import org.apache.spark.sql.functions._

/** Kill-mid-write coverage for the generation-directory publish protocol
  * ([[AtomicStore]]): a (re)fit interrupted before ANY of its sub-table
  * writes — or before the final marker commit — must leave every reader
  * on the previous committed generation, bit-identically. Plus the
  * protocol mechanics themselves (legacy resolve, pruning, double-commit)
  * and a concurrent open-during-refit interleaving.
  */
class AtomicStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  private def withFailpoint[A](stage: String)(body: => A): A = {
    AtomicStore.failpoint =
      l => if (l == stage) throw new RuntimeException(s"killed at $l")
    try body finally AtomicStore.failpoint = _ => ()
  }

  private def serveRows(path: String) = {
    val idx = Similarity.openIvfPqIndex(spark.newSession(), path)
    Similarity.ivfPqServe(idx, emb.where(col("vec_id") < 20),
        "vec_id", "embedding", k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("IVF-PQ refit killed before every sub-table write leaves readers on the old generation") {
    val d = tmpDir() + "/ivfpq"
    val oldCorpus = emb.where(col("vec_id") < 40)
    val newCorpus = emb.where(col("vec_id") < 80)
    Similarity.writeIvfPqIndex(oldCorpus, "vec_id", "embedding", d,
      dim = 64, nlist = 8, m = 8, codebookSize = 16)
    val before = serveRows(d)
    for (stage <- Seq("ivfpq:meta", "ivfpq:centroids", "ivfpq:codebooks",
        "ivfpq:codes", "ivfpq:cellstats", "commit")) {
      val ex = intercept[RuntimeException] {
        withFailpoint(stage) {
          Similarity.writeIvfPqIndex(newCorpus, "vec_id", "embedding", d,
            dim = 64, nlist = 8, m = 8, codebookSize = 16)
        }
      }
      assert(ex.getMessage.contains(stage))
      assert(AtomicStore.currentGen(spark, d).contains(1L),
        s"$stage: a torn write must not advance the committed generation")
      assert(serveRows(d) == before,
        s"$stage: a torn write must be invisible to readers")
    }
    // the abandoned half-generations don't block a later clean fit (each
    // torn attempt retires a CLAIMED id, so the committed id is just
    // "past the base generation", not dense)
    Similarity.writeIvfPqIndex(newCorpus, "vec_id", "embedding", d,
      dim = 64, nlist = 8, m = 8, codebookSize = 16)
    assert(AtomicStore.currentGen(spark, d).exists(_ > 1L))
    val after = serveRows(d)
    assert(after != before && after.nonEmpty)
    assert(Similarity.openIvfPqIndex(spark.newSession(), d).codes.count() == 80)
  }

  test("SQ×IVF refit killed at every stage leaves readers on the old generation") {
    val d = tmpDir() + "/sqivf"
    def serve() = {
      val idx = Similarity.openSqIvfIndex(spark.newSession(), d)
      Similarity.sqIvfServeIndex(idx, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 3, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    Similarity.writeSqIvfIndex(emb.where(col("vec_id") < 40),
      "vec_id", "embedding", d, dim = 64, nlist = 8)
    val before = serve()
    for (stage <- Seq("sqivf:meta", "sqivf:centroids", "sqivf:codes", "commit")) {
      intercept[RuntimeException] {
        withFailpoint(stage) {
          Similarity.writeSqIvfIndex(emb.where(col("vec_id") < 80),
            "vec_id", "embedding", d, dim = 64, nlist = 8)
        }
      }
      assert(AtomicStore.currentGen(spark, d).contains(1L))
      assert(serve() == before, s"$stage: torn SQ×IVF write visible to readers")
    }
    Similarity.writeSqIvfIndex(emb.where(col("vec_id") < 80),
      "vec_id", "embedding", d, dim = 64, nlist = 8)
    assert(Similarity.openSqIvfIndex(spark.newSession(), d).codes.count() == 80)
  }

  test("DedupIndex refit killed at every stage leaves params AND postings on the old generation") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota NOPE")
    ).toDF("doc_id", "text")
    val d = tmpDir() + "/dedup"
    DedupIndex.write(corpus, "doc_id", "text", d)
    def hits() = DedupIndex.query(batch, "doc_id", "text", d, 0.4)
      .select("query_id", "index_id").as[(Long, Long)].collect().toSet
    val before = hits()
    assert(before == Set((11L, 1L)))
    for (stage <- Seq("dedup:meta", "dedup:grams", "dedup:bands", "commit")) {
      intercept[RuntimeException] {
        withFailpoint(stage) {
          // a refit with DIFFERENT params — torn visibility would pair
          // new Params with old postings and break the bucket equality
          DedupIndex.write(corpus, "doc_id", "text", d,
            n = 4, numHashes = 32, bands = 16, seed = 7L)
        }
      }
      assert(DedupIndex.params(spark, d) == DedupIndex.Params(3, 64, 32, 42L),
        s"$stage: torn write must not change the served Params")
      assert(hits() == before, s"$stage: torn write visible to query()")
    }
    DedupIndex.write(corpus, "doc_id", "text", d,
      n = 4, numHashes = 32, bands = 16, seed = 7L)
    assert(DedupIndex.params(spark, d) == DedupIndex.Params(4, 32, 16, 7L))
    assert(hits() == before) // same near-dup found under the new fit
  }

  test("concurrent reader during a refit: old generation until the commit lands, new after") {
    val d = tmpDir() + "/conc"
    Similarity.writeIvfPqIndex(emb.where(col("vec_id") < 40),
      "vec_id", "embedding", d, dim = 64, nlist = 8, m = 8, codebookSize = 16)
    val before = serveRows(d)
    val refitTablesDone = new java.util.concurrent.CountDownLatch(1)
    val releaseCommit = new java.util.concurrent.CountDownLatch(1)
    AtomicStore.failpoint = l =>
      if (l == "commit") { refitTablesDone.countDown(); releaseCommit.await() }
    val writer = new Thread(() =>
      Similarity.writeIvfPqIndex(emb.where(col("vec_id") < 80),
        "vec_id", "embedding", d, dim = 64, nlist = 8, m = 8, codebookSize = 16))
    try {
      writer.start()
      refitTablesDone.await()
      // every new-generation table is fully written but uncommitted:
      // a reader opening NOW must still get the old answers
      assert(serveRows(d) == before,
        "reader during refit saw an uncommitted generation")
      releaseCommit.countDown()
      writer.join()
    } finally { AtomicStore.failpoint = _ => (); releaseCommit.countDown() }
    assert(AtomicStore.currentGen(spark, d).contains(2L))
    assert(Similarity.openIvfPqIndex(spark.newSession(), d).codes.count() == 80)
  }

  test("concurrent fits claim DISJOINT generations; the final store is one complete fit, never a mix") {
    val d = tmpDir() + "/race"
    val corpusA = emb.where(col("vec_id") < 40)
    val corpusB = emb.where(col("vec_id") >= 20 && col("vec_id") < 80)
    // expected pure results, from separate clean stores
    def pureServe(corpus: org.apache.spark.sql.DataFrame, tag: String) = {
      val p = tmpDir() + s"/pure$tag"
      Similarity.writeIvfPqIndex(corpus, "vec_id", "embedding", p,
        dim = 64, nlist = 8, m = 8, codebookSize = 16)
      serveRows(p)
    }
    val pureA = pureServe(corpusA, "A")
    val pureB = pureServe(corpusB, "B")
    assert(pureA != pureB, "fixture: the two corpora must serve differently")
    // two racing writers on the SAME store — the claim step must land
    // them on different generation directories, so whichever commit wins,
    // readers see ONE writer's complete fit (interleaved table writes
    // into a shared directory would serve a mix matching neither)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq(corpusA, corpusB).map(c => new Thread(() =>
      try Similarity.writeIvfPqIndex(c, "vec_id", "embedding", d,
        dim = 64, nlist = 8, m = 8, codebookSize = 16)
      catch { case e: Throwable => errs.add(e) }))
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(errs.isEmpty, s"racing fits must both complete: ${errs.toArray.mkString}")
    val got = serveRows(d)
    assert(got == pureA || got == pureB,
      "the committed store must be exactly one writer's fit, not a mix")
  }

  test("protocol mechanics: legacy resolve, generation retention, abandoned-dir pruning, double commit") {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    // legacy store (tables at root, no markers) resolves to the root
    val legacy = tmpDir() + "/legacy"
    Seq((1, 2)).toDF("a", "b").write.parquet(s"$legacy/meta")
    assert(AtomicStore.resolve(spark, legacy) == legacy)
    // commits retain exactly the current + previous generation (grace 0:
    // the mechanics under test are the retention rules, not the age gate)
    val p = tmpDir() + "/gens"
    for (g <- 1L to 3L) {
      fs.mkdirs(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, g)))
      AtomicStore.commit(spark, p, g, committedGraceMs = 0L, claimGraceMs = 0L)
    }
    assert(AtomicStore.currentGen(spark, p).contains(3L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, 1L))),
      "generations older than previous must be pruned")
    assert(fs.exists(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, 2L))),
      "the previous generation is retained as the reader grace window")
    // an abandoned (never-committed, claim-expired) half-write is pruned
    // by the next commit
    fs.mkdirs(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, 4L)))
    fs.mkdirs(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, 5L)))
    AtomicStore.commit(spark, p, 5L, committedGraceMs = 0L, claimGraceMs = 0L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, 4L))))
    // double-commit of the same generation fails loudly, never half-applies
    intercept[Exception] { AtomicStore.commit(spark, p, 5L) }
    // legacy root tables are superseded by gen 1 and pruned at gen 2
    val mig = tmpDir() + "/mig"
    Seq((1, 2)).toDF("a", "b").write.parquet(s"$mig/meta")
    fs.mkdirs(new org.apache.hadoop.fs.Path(AtomicStore.genDir(mig, 1L)))
    AtomicStore.commit(spark, mig, 1L, committedGraceMs = 0L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$mig/meta")),
      "gen 1 must leave the legacy tables as the reader grace window")
    assert(AtomicStore.resolve(spark, mig) == AtomicStore.genDir(mig, 1L))
    fs.mkdirs(new org.apache.hadoop.fs.Path(AtomicStore.genDir(mig, 2L)))
    AtomicStore.commit(spark, mig, 2L, committedGraceMs = 0L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$mig/meta")),
      "the second committed generation prunes the legacy root tables")
  }

  test("age-gated pruning: two commits inside one resolveCached TTL keep the generation a stale reader resolved") {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    val p = tmpDir() + "/ttl"
    // gen 1 with a real table a reader will be mid-scan on
    fs.mkdirs(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, 1L)))
    val payload = Seq((1L, "one"), (2L, "two")).toDF("id", "v")
    payload.write.parquet(s"${AtomicStore.genDir(p, 1L)}/meta")
    AtomicStore.commit(spark, p, 1L)
    // a CROSS-PROCESS reader's cached resolution (its own process cannot
    // be invalidated by our commits — modeled by pinning the resolved dir)
    val pinned = AtomicStore.resolveCached(spark, p)
    assert(pinned == AtomicStore.genDir(p, 1L))
    // two rapid refits inside one TTL window (default grace = 60 s >> TTL)
    for (g <- 2L to 3L) {
      fs.mkdirs(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, g)))
      payload.write.parquet(s"${AtomicStore.genDir(p, g)}/meta")
      AtomicStore.commit(spark, p, g)
    }
    assert(AtomicStore.currentGen(spark, p).contains(3L))
    // the gen the stale reader pinned is younger than the grace window —
    // it must still be on disk, and its scan must complete bit-identically
    assert(fs.exists(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, 1L))),
      "a generation younger than committedGraceMs must survive rapid refits")
    assert(spark.read.parquet(s"$pinned/meta").as[(Long, String)]
      .collect().toSet == Set((1L, "one"), (2L, "two")),
      "the pinned stale reader must finish its scan on the old generation")
    // once the markers are old (grace 0 simulates age-out), the next
    // commit collects them
    fs.mkdirs(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, 4L)))
    AtomicStore.commit(spark, p, 4L, committedGraceMs = 0L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, 1L))),
      "aged-out generations below previous are pruned")
    assert(fs.exists(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, 3L))),
      "the previous generation is retained regardless of age")
  }

  test("retention is by commit order, not literal gen-1: a claim gap must not let the true predecessor be pruned") {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    val p = tmpDir() + "/gap"
    // committed gen 1 (the serving generation readers have pinned)
    fs.mkdirs(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, 1L)))
    AtomicStore.commit(spark, p, 1L)
    // writer A claims gen 2 and is still writing (or crashed) — ids are
    // now non-dense around the next commit
    val (gA, dA) = AtomicStore.begin(spark, p)
    assert(gA == 2L)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dA))
    // writer B claims gen 3 and commits with the marker-age gate forced
    // expired (grace 0) — under the old `g != gen-1` rule the retained
    // slot would be the UNCOMMITTED gen 2 and the actual predecessor
    // gen 1 would be deleted out from under TTL-stale readers
    val (gB, dB) = AtomicStore.begin(spark, p)
    assert(gB == 3L)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dB))
    AtomicStore.commit(spark, p, gB, committedGraceMs = 0L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, 1L))),
      "the largest COMMITTED predecessor is the reader-grace generation")
    assert(fs.exists(new org.apache.hadoop.fs.Path(dA)),
      "the in-flight claim's directory survives too")
    // once gen 4 commits, gen 3 becomes the retained predecessor and the
    // aged-out gen 1 goes
    fs.mkdirs(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, 4L)))
    AtomicStore.commit(spark, p, 4L, committedGraceMs = 0L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, 1L))))
    assert(fs.exists(new org.apache.hadoop.fs.Path(AtomicStore.genDir(p, 3L))))
  }

  test("claim token read-back detects the loser of a NON-ATOMIC " +
    "HEAD-then-PUT double create (the object-store emulation)") {
    val d = tmpDir() + "/naclaim"
    // a pluggable double emulating S3A-style create-no-overwrite: a
    // separate exists-check then an OVERWRITING put — two racing writers
    // can both pass the check and both "succeed", last put wins. The
    // barrier pins the worst interleaving: HEAD, HEAD, PUT, PUT, then
    // both read back. Only this store's first claim is intercepted;
    // everything else stays truly atomic.
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val nonAtomic = new ExclusiveCreate {
      def create(f: org.apache.hadoop.fs.FileSystem,
                 p: org.apache.hadoop.fs.Path,
                 bytes: Array[Byte]): Unit =
        if (p.toString.startsWith(d) && p.getName == "_claim_1") {
          if (f.exists(p)) throw new java.io.IOException("exists (HEAD)")
          barrier.await(10, java.util.concurrent.TimeUnit.SECONDS)
          val out = f.create(p, true) // the non-atomic PUT: last wins
          try out.write(bytes) finally out.close()
          barrier.await(10, java.util.concurrent.TimeUnit.SECONDS)
        } else AtomicStore.HadoopExclusiveCreate.create(f, p, bytes)
    }
    AtomicStore.exclusiveCreate = nonAtomic
    try {
      val gens = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = (0 until 2).map(_ => new Thread(() =>
        try { gens.add(AtomicStore.begin(spark, d)._1); () }
        catch { case e: Throwable => errs.add(e); () }))
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(errs.isEmpty, s"begin() must not fail: ${errs.peek()}")
      // WITHOUT the read-back both writers would return generation 1 and
      // interleave table writes in one directory; the read-back makes the
      // overwritten loser retire the id and claim the next one. Two legal
      // outcomes: the common {1,2} (one writer's token survived the double
      // PUT), and {2,3} when the interleaved PUTs leave the local
      // ChecksumFileSystem's data/.crc pair mismatched so BOTH read-backs
      // fail and both retire gen 1 — still disjoint, gen 1 abandoned.
      val got = {
        import scala.jdk.CollectionConverters._
        gens.asScala.toSet
      }
      assert(got.size == 2, s"writers must land on DISJOINT gens: $got")
      assert(got == Set(1L, 2L) || got == Set(2L, 3L),
        s"one retry per overwritten token, no runaway: $got")
    } finally AtomicStore.exclusiveCreate = AtomicStore.HadoopExclusiveCreate
  }

  test("mutation lease: re-entrant per thread, independent across stores, " +
    "exclusive across threads") {
    val d1 = tmpDir() + "/lease1"
    val d2 = tmpDir() + "/lease2"
    val fs = new org.apache.hadoop.fs.Path(d1)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // re-entrant: the stream-batch shape (outer hold, inner mutations)
    val r = AtomicStore.withMutationLease(spark, d1, "outer") {
      AtomicStore.withMutationLease(spark, d1, "inner") {
        // holding d1 does not serialize an unrelated store
        AtomicStore.withMutationLease(spark, d2, "other") { 42 }
      }
    }
    assert(r == 42)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$d1/_mutation_lease")),
      "released after the outermost hold")
    // exclusive: a second THREAD is rejected while held, admitted after
    AtomicStore.withMutationLease(spark, d1, "holder") {
      val rejected = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val t = new Thread(() =>
        try AtomicStore.withMutationLease(spark, d1, "intruder") { () }
        catch { case e: Throwable => rejected.set(e); () })
      t.start(); t.join()
      assert(rejected.get().isInstanceOf[IllegalStateException])
      assert(rejected.get().getMessage.contains("holder"))
    }
    AtomicStore.withMutationLease(spark, d1, "later") { () } // admitted
  }

  test("two recoverers contending one EXPIRED lease: the break is " +
    "arbitrated, exactly one acquires, the loser cannot evict the " +
    "winner's fresh lease") {
    val d = tmpDir() + "/leasebreak"
    new java.io.File(d).mkdirs()
    val leaseFile = new java.io.File(s"$d/_mutation_lease")
    java.nio.file.Files.writeString(leaseFile.toPath, "crashed:feedface")
    assert(leaseFile.setLastModified(System.currentTimeMillis() - 60000L))
    // pin the contended interleaving: both threads reach the BREAK-MARKER
    // create together (the exact window where a bare verify-then-delete
    // let the loser leap-frog and delete the winner's fresh lease)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    AtomicStore.exclusiveCreate = new ExclusiveCreate {
      def create(f: org.apache.hadoop.fs.FileSystem,
                 p: org.apache.hadoop.fs.Path,
                 bytes: Array[Byte]): Unit = {
        if (p.getName.startsWith("_mutation_lease_break_"))
          barrier.await(10, java.util.concurrent.TimeUnit.SECONDS)
        AtomicStore.HadoopExclusiveCreate.create(f, p, bytes)
      }
    }
    try {
      val inside = new java.util.concurrent.atomic.AtomicInteger(0)
      val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val rejects = new java.util.concurrent.atomic.AtomicInteger(0)
      val ts = (0 until 2).map(i => new Thread(() =>
        try {
          AtomicStore.withMutationLease(spark, d, s"recoverer$i",
              leaseGraceMs = 10000L) {
            val n = inside.incrementAndGet()
            maxInside.getAndUpdate(m => math.max(m, n))
            Thread.sleep(50)
            inside.decrementAndGet()
            wins.incrementAndGet()
          }
          ()
        } catch {
          case _: IllegalStateException => rejects.incrementAndGet(); ()
        }))
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(maxInside.get() == 1, "critical sections must never overlap")
      assert(wins.get() == 1 && rejects.get() == 1,
        s"exactly one recoverer breaks and acquires: wins=${wins.get()} " +
          s"rejects=${rejects.get()}")
      assert(!leaseFile.exists(), "winner released its lease")
      assert(!new java.io.File(d).listFiles()
        .exists(_.getName.startsWith("_mutation_lease_break_")),
        "break marker cleaned up")
    } finally AtomicStore.exclusiveCreate = AtomicStore.HadoopExclusiveCreate
  }

  test("a crashed BREAKER's leftover break marker wedges nobody: young " +
    "marker defers to the in-flight break, aged marker is collected") {
    val d = tmpDir() + "/breakgc"
    new java.io.File(d).mkdirs()
    val stale = "crashed:cafebabe"
    val leaseFile = new java.io.File(s"$d/_mutation_lease")
    java.nio.file.Files.writeString(leaseFile.toPath, stale)
    assert(leaseFile.setLastModified(System.currentTimeMillis() - 60000L))
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(stale.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val marker = new java.io.File(s"$d/_mutation_lease_break_$digest")
    // a YOUNG marker = another recoverer is mid-break right now: reject
    // rather than double-break
    java.nio.file.Files.writeString(marker.toPath, "")
    intercept[IllegalStateException] {
      AtomicStore.withMutationLease(spark, d, "second", 10000L) { () }
    }
    // the breaker CRASHED between marker and delete: once the marker ages
    // past the grace it is garbage-collected and the break completes
    assert(marker.setLastModified(System.currentTimeMillis() - 60000L))
    val r = AtomicStore.withMutationLease(spark, d, "recoverer", 10000L) { 7 }
    assert(r == 7)
    assert(!leaseFile.exists() && !marker.exists())
  }

  test("a live claim protects a slower concurrent fit's directory from a faster commit") {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    val p = tmpDir() + "/inflight"
    // writer A begins FIRST (lower id) and is still writing its tables
    val (gA, dA) = AtomicStore.begin(spark, p)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dA))
    Seq((1, 2)).toDF("a", "b").write.parquet(s"$dA/meta") // mid-write state
    // writer B begins later (higher id) and commits first
    val (gB, dB) = AtomicStore.begin(spark, p)
    assert(gB > gA, "begin must hand out strictly increasing generations")
    fs.mkdirs(new org.apache.hadoop.fs.Path(dB))
    AtomicStore.commit(spark, p, gB)
    // A's uncommitted directory has a LIVE claim — B's commit must not
    // delete the tables A is still writing
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dA/meta")),
      "a faster commit deleted a slower in-flight fit's tables")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$p/_claim_$gA")))
    // A finishes and commits — its generation is complete and committed
    // (readers still resolve the HIGHEST marker, which is B's)
    AtomicStore.commit(spark, p, gA)
    assert(AtomicStore.currentGen(spark, p).contains(gB))
    // an EXPIRED claim no longer protects: a later commit collects it
    val (gC, dC) = AtomicStore.begin(spark, p)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dC))
    val (gD, dD) = AtomicStore.begin(spark, p)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dD))
    AtomicStore.commit(spark, p, gD, claimGraceMs = 0L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dC)),
      "an expired claim must stop protecting its abandoned directory")
  }
}
