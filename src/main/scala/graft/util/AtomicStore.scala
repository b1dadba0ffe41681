package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-atomic publish protocol for the persisted index stores
  * (`sim/Similarity` IVF-PQ + SQ×IVF, `dedup/DedupIndex`).
  *
  * A (re)fit rewrites SEVERAL parquet tables (meta, centroids, codebooks,
  * codes, …). Writing them in place as sequential independent overwrites
  * is torn by construction: a crash — or a concurrent reader — between
  * table writes observes new-generation meta with old-generation codes
  * and silently decodes garbage. The fix is the standard
  * generation-directory + single-pointer-commit protocol:
  *
  *  - every fit writes ALL its tables under a fresh `gen-N/` subdirectory
  *    of the store root — nothing under an existing generation is ever
  *    overwritten by a fit;
  *  - the commit point is the atomic CREATION of one empty marker file
  *    `_commit_N` at the store root (file creation is atomic on every
  *    filesystem Spark targets, unlike rename-over-existing, which HDFS
  *    forbids and object stores fake);
  *  - readers resolve the store to `gen-N/` for the LARGEST committed
  *    marker — a half-written generation has no marker and is invisible;
  *  - in-generation mutations (code/postings appends, tombstones) write
  *    inside the resolved generation directory; they are either pure
  *    parquet appends (crash leaves only an ignored `_temporary/`) or
  *    ordered so the last-written table is the one that activates the
  *    rows (see the callers' docs);
  *  - on commit, generations older than the immediately-previous one are
  *    pruned. The previous generation is RETAINED so a reader that
  *    resolved just before the commit can still finish its scan — the
  *    same one-generation grace object-store table formats give readers.
  *
  * Legacy stores (tables at the store root, written before this protocol)
  * resolve to the root itself; the first committed generation supersedes
  * them and the second prunes the root tables.
  *
  * Concurrent writers are safe via a CLAIM step: [[begin]] atomically
  * creates `_claim_N` (create-no-overwrite) before returning generation
  * N, so no two writers ever share a generation directory — racing fits
  * land on DIFFERENT generations, each complete, and the last commit
  * wins (the optimistic last-writer-wins of idempotent full refits).
  * A crashed claim merely retires an id; later writers skip past it.
  */
object AtomicStore {

  private val MarkerPrefix = "_commit_"
  private val ClaimPrefix = "_claim_"
  private val GenPrefix = "gen-"

  /** Tables a legacy (pre-protocol) store may have at its root; pruned
    * once two committed generations exist.
    */
  private val LegacyTables =
    Seq("meta", "centroids", "codebooks", "codes", "cellstats", "tombstones",
      "bands", "grams")

  /** Test-only failure injection: called with a stage label (e.g.
    * "ivfpq:codes") immediately BEFORE each sub-table write and before
    * the commit marker. The kill-mid-write spec throws from here to
    * simulate a crash at every stage; production never sets it.
    */
  @volatile private[graft] var failpoint: String => Unit = _ => ()

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** The largest committed generation id, if any commit marker exists. */
  def currentGen(spark: SparkSession, path: String): Option[Long] = {
    val f = fs(spark, path)
    val root = new Path(path)
    if (!f.exists(root)) None
    else f.listStatus(root).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith(MarkerPrefix))
      .flatMap(n => scala.util.Try(n.drop(MarkerPrefix.length).toLong).toOption)
      .foldLeft(Option.empty[Long])((acc, g) => Some(acc.fold(g)(math.max(_, g))))
  }

  def genDir(path: String, gen: Long): String = s"$path/$GenPrefix$gen"

  /** The directory holding the CURRENT committed generation's tables:
    * `gen-N/` for the largest marker, the store root for a legacy store,
    * or (for reads that will fail loudly anyway) the root when nothing
    * exists yet.
    */
  def resolve(spark: SparkSession, path: String): String =
    currentGen(spark, path).map(genDir(path, _)).getOrElse(path)

  /** [[resolve]] with a short per-JVM TTL cache — for HOT SERVE paths
    * only (index opens/queries), where one marker listing per request
    * becomes a metadata round-trip per query on an object store. Safe by
    * the retention rule: [[commit]] keeps the previous generation on
    * disk, so a reader whose cached resolution is up to one refit stale
    * still scans a complete, consistent generation. In-process commits
    * invalidate immediately; cross-process refits are picked up within
    * `ttlMs`. Mutation paths must use the uncached [[resolve]].
    */
  def resolveCached(spark: SparkSession, path: String,
                    ttlMs: Long = 5000L): String = {
    val now = System.nanoTime()
    resolveCache.get(path) match {
      case Some((deadline, dir)) if now < deadline => dir
      case _ =>
        val dir = resolve(spark, path)
        resolveCache.put(path, (now + ttlMs * 1000000L, dir))
        dir
    }
  }

  private val resolveCache =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** Start a new generation: atomically CLAIMS the next unused id
    * (create-no-overwrite of `_claim_N`, retried past races and crashed
    * claims) and returns it with its (not-yet-created) directory — so
    * concurrent writers can never interleave table writes inside one
    * generation directory. The caller writes every table under the
    * directory, then calls [[commit]]; on failure it simply abandons the
    * directory — uncommitted generations are invisible and pruned by
    * later commits.
    */
  def begin(spark: SparkSession, path: String): (Long, String) = {
    val f = fs(spark, path)
    val root = new Path(path)
    f.mkdirs(root)
    var attempt = 0
    while (attempt < 64) {
      val taken = f.listStatus(root).iterator.map(_.getPath.getName)
        .flatMap { n =>
          val prefix =
            if (n.startsWith(MarkerPrefix)) MarkerPrefix
            else if (n.startsWith(ClaimPrefix)) ClaimPrefix
            else ""
          if (prefix.isEmpty) None
          else scala.util.Try(n.drop(prefix.length).toLong).toOption
        }.foldLeft(0L)(math.max)
      val next = taken + 1L
      try {
        f.create(new Path(s"$path/$ClaimPrefix$next"), false).close()
        return (next, genDir(path, next))
      } catch {
        case _: java.io.IOException => attempt += 1 // raced a claim: re-list
      }
    }
    sys.error(s"AtomicStore.begin: no claimable generation under $path " +
      "after 64 attempts")
  }

  /** Atomically publish generation `gen` (marker-file creation), then
    * prune: committed generations `< gen - 1`, any abandoned uncommitted
    * generation `<= gen`, and — once a previous committed generation also
    * exists — the legacy root tables. Pruning is best-effort; a crash
    * mid-prune leaves garbage directories, never a torn reader.
    */
  def commit(spark: SparkSession, path: String, gen: Long): Unit = {
    failpoint("commit")
    val f = fs(spark, path)
    val marker = new Path(s"$path/$MarkerPrefix$gen")
    // overwrite=false: concurrent double-commit of the same id fails loudly
    f.create(marker, false).close()
    resolveCache.remove(path)
    val keep = Set(gen, gen - 1L)
    f.listStatus(new Path(path)).foreach { st =>
      val n = st.getPath.getName
      val genId =
        if (n.startsWith(MarkerPrefix))
          scala.util.Try(n.drop(MarkerPrefix.length).toLong).toOption
        else if (n.startsWith(ClaimPrefix))
          scala.util.Try(n.drop(ClaimPrefix.length).toLong).toOption
        else if (n.startsWith(GenPrefix))
          scala.util.Try(n.drop(GenPrefix.length).toLong).toOption
        else None
      genId match {
        case Some(g) if g <= gen && !keep.contains(g) =>
          f.delete(st.getPath, true); ()
        case Some(g) if g < gen && n.startsWith(GenPrefix) &&
            !f.exists(new Path(s"$path/$MarkerPrefix$g")) =>
          // abandoned (never-committed) older generation
          f.delete(st.getPath, true); ()
        case _ => ()
      }
    }
    if (gen >= 2L)
      LegacyTables.foreach { t =>
        val p = new Path(s"$path/$t")
        if (f.exists(p)) { f.delete(p, true); () }
      }
  }
}
