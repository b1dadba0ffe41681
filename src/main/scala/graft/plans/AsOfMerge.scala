package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Native sort-merge as-of join — the whole-operator Catalyst extension
  * (logical node + SparkStrategy + physical exec) for the point-in-time
  * enrichment the reference realizes as nearest-neighbour extraction
  * (`api/routes/data.py:88-127`) and [[graft.operators.AsOfJoin]] builds by
  * composition (union + window).
  *
  * Why a custom operator when the composition is already oracle-green:
  * the union+window form materializes left+right in ONE window pass, so
  * every fact row is widened with every carried column and the whole union
  * is sorted together. At 100 TB the fact side dominates; this exec instead
  * mirrors `SortMergeJoinExec`'s shape — each side shuffles once on its own
  * key, sorts `(key, ts)` within partitions, and a streaming per-partition
  * merge emits the joined rows with O(1) state (one held right row). No row
  * widening before the merge, no `_side` tag, and Catalyst's
  * EnsureRequirements provides the exchanges/sorts, so bucketing or a prior
  * shuffle on the key is reused for free.
  *
  * Semantics (ASOF `>=`, left outer): for each left row, the LATEST right
  * row with the same key and `rightTs <= leftTs` (ties on the full sort key
  * resolved to the last right row in sort order, matching the composition);
  * unmatched / out-of-tolerance left rows keep nulls on the right side.
  */
object AsOfMerge {

  /** Logical node. Children are already-analyzed plans; all expressions are
    * resolved attributes of the respective child, so the analyzer passes
    * this node through untouched and the optimizer treats it as opaque.
    */
  case class AsOfJoinNode(
      leftKeys: Seq[Attribute],
      rightKeys: Seq[Attribute],
      leftTs: Attribute,
      rightTs: Attribute,
      toleranceUnits: Option[Long],
      broadcastHint: Option[Boolean],
      left: LogicalPlan,
      right: LogicalPlan) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  /** Plans [[AsOfJoinNode]] into a physical join, choosing the physical
    * strategy the way Spark's own JoinSelection does: the broadcast form
    * when the right side's estimated size clears
    * `spark.sql.autoBroadcastJoinThreshold` (fact side keeps its layout,
    * ZERO shuffles), the shuffled sort-merge form otherwise. An explicit
    * `broadcastHint` overrides the statistics. Installed via
    * `spark.experimental.extraStrategies` (the public live-session hook) —
    * see [[install]].
    */
  object AsOfMergeStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case j: AsOfJoinNode =>
        val threshold =
          org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
        val broadcast = j.broadcastHint.getOrElse(
          threshold > 0 && j.right.stats.sizeInBytes <= threshold)
        if (broadcast)
          AsOfBroadcastJoinExec(j.leftKeys, j.rightKeys, j.leftTs, j.rightTs,
            j.toleranceUnits, planLater(j.left), planLater(j.right)) :: Nil
        else
          AsOfMergeJoinExec(j.leftKeys, j.rightKeys, j.leftTs, j.rightTs,
            j.toleranceUnits, planLater(j.left), planLater(j.right)) :: Nil
      case _ => Nil
    }
  }

  /** Optimizer rule: push deterministic filters that reference only the
    * fact side below the (otherwise opaque) as-of node. Without it a
    * `asofJoin(...).where(factPredicate)` filters AFTER the join and the
    * predicate never reaches the parquet scan — at 100 TB that is the
    * difference between pruning partitions and reading everything. Left
    * outer as-of preserves fact rows 1:1, so left-only predicates commute
    * with the join exactly.
    */
  object PushFilterThroughAsOf
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
      with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, j: AsOfJoinNode) =>
        val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
          p.deterministic && p.references.subsetOf(j.left.outputSet))
        if (push.isEmpty) f
        else {
          val pushed = j.copy(left = Filter(push.reduce(
            org.apache.spark.sql.catalyst.expressions.And), j.left))
          keep.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
            .map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
  }

  def install(spark: SparkSession): Unit = synchronized {
    val em = spark.experimental
    if (!em.extraStrategies.contains(AsOfMergeStrategy))
      em.extraStrategies = em.extraStrategies :+ AsOfMergeStrategy
    if (!em.extraOptimizations.contains(PushFilterThroughAsOf))
      em.extraOptimizations = em.extraOptimizations :+ PushFilterThroughAsOf
  }

  private val TsTypes = Seq(TimestampType, TimestampNTZType, LongType, IntegerType, DateType)

  /** Executor-level memo of built broadcast indexes — every task on an
    * executor shares one build, the way Spark's own `HashedRelation` ships
    * pre-built inside its broadcast. Keyed WEAKLY by the identity of the
    * broadcast VALUE (the deserialized array is shared executor-wide by
    * the block manager, and array equality is reference equality): a
    * broadcast id could repeat across SparkContexts in one JVM, but the
    * value object cannot, and entries vanish with the broadcast itself —
    * no LRU policy to tune, no stale-index hazard.
    */
  private val broadcastIndexCache =
    new java.util.WeakHashMap[AnyRef, AnyRef]()

  /** Per-key memoization: the global lock is held only long enough to
    * install a lazy holder, and the (potentially expensive) index build runs
    * under that holder's own lock — first tasks of DIFFERENT concurrent
    * broadcast as-of joins build in parallel instead of serializing behind
    * one global monitor.
    */
  private def cachedIndex[T <: AnyRef](key: AnyRef)(build: => T): T = {
    val holder = broadcastIndexCache.synchronized {
      val hit = broadcastIndexCache.get(key)
      if (hit != null) hit
      else { val h: AnyRef = new LazyHolder(() => build); broadcastIndexCache.put(key, h); h }
    }
    holder.asInstanceOf[LazyHolder[T]].value
  }

  /** The build closure is dropped once evaluated: it captures the Broadcast
    * handle, and holding it would strongly pin this map's weak KEY (the
    * broadcast value) through the entry's own value — the classic
    * WeakHashMap self-retention leak.
    */
  private final class LazyHolder[T](@volatile private var build: () => T) {
    lazy val value: T = { val v = build(); build = null; v }
  }

  /** Physical streaming merge. Declares `ClusteredDistribution` per child
    * and `(key, ts)` child ordering; EnsureRequirements inserts the (at
    * most) one exchange + sort per side, exactly as for a sort-merge join,
    * and AQE/ValidateRequirements see ordinary requirements it knows how to
    * satisfy and re-check.
    */
  case class AsOfMergeJoinExec(
      leftKeys: Seq[Attribute],
      rightKeys: Seq[Attribute],
      leftTs: Attribute,
      rightTs: Attribute,
      toleranceUnits: Option[Long],
      left: SparkPlan,
      right: SparkPlan) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override lazy val metrics = Map(
      "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
      (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def outputOrdering: Seq[SortOrder] =
      (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
      copy(left = newLeft, right = newRight)

    protected override def doExecute(): RDD[InternalRow] = {
      require(TsTypes.contains(leftTs.dataType) && TsTypes.contains(rightTs.dataType),
        s"as-of timestamps must be timestamp/long/int/date, got " +
          s"${leftTs.dataType} / ${rightTs.dataType}")
      val numOutputRows = longMetric("numOutputRows")
      val lKeyExprs = leftKeys
      val rKeyExprs = rightKeys
      val lOut = left.output
      val rOut = right.output
      val lTsBound = BindReferences.bindReference(leftTs: Expression, lOut)
      val rTsBound = BindReferences.bindReference(rightTs: Expression, rOut)
      val keyTypes = leftKeys.map(_.dataType)
      val tol = toleranceUnits
      val outAttrs = output

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
        // Keys project to identical schemas on both sides (validated at
        // build time), so a natural ascending ordering compares them.
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        def keyCmp(a: InternalRow, b: InternalRow): Int = keyOrd.compare(a, b)
        def tsVal(bound: Expression, row: InternalRow): java.lang.Long = {
          val v = bound.eval(row)
          if (v == null) null else v.asInstanceOf[Number].longValue()
        }
        val rBuf = rIter.buffered
        val joined = new JoinedRow
        val rNulls = new GenericInternalRow(rOut.size)
        val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
        var heldKey: UnsafeRow = null
        var heldRow: InternalRow = null
        var heldTs: Long = 0L

        lIter.map { lRow =>
          val lKey = lKeyProj(lRow)
          val lTsV = tsVal(lTsBound, lRow)
          // SQL equality semantics: a null equi-key never matches anything
          // (`l.k = r.k` is never true for NULL), so null-key left rows emit
          // the unmatched shape without touching the right cursor (they sort
          // first, so no right progress is lost), and null-key right rows are
          // dropped on sight rather than held.
          if (lKey.anyNull) {
            numOutputRows += 1
            resultProj(joined(lRow, rNulls))
          } else {
            // Advance the right side: drop rows behind the left key, consume
            // (remember) rows at the key with ts <= left ts. One pass total —
            // each right row is visited once per partition.
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val head = rBuf.head
              val hKey = rKeyProj(head)
              if (hKey.anyNull) { rBuf.next() } // null key can never match
              else {
                val c = keyCmp(hKey, lKey)
                if (c < 0) { rBuf.next() }
                else if (c == 0) {
                  val rTsV = tsVal(rTsBound, head)
                  if (rTsV == null) { rBuf.next() } // null ts can never match
                  else if (lTsV != null && rTsV.longValue() <= lTsV.longValue()) {
                    heldRow = rBuf.next().copy()
                    heldKey = lKey.copy()
                    heldTs = rTsV.longValue()
                  } else advancing = false
                } else advancing = false
              }
            }
            val matched = heldRow != null && lTsV != null &&
              heldKey != null && heldKey.equals(lKey) &&
              tol.forall(t => lTsV.longValue() - heldTs <= t)
            numOutputRows += 1
            resultProj(joined(lRow, if (matched) heldRow else rNulls))
          }
        }
      }
    }
  }

  /** Broadcast as-of join: the right side ships whole to every task
    * (`BroadcastDistribution(IdentityBroadcastMode)` — EnsureRequirements
    * inserts the BroadcastExchange), gets indexed per partition into
    * key → ts-sorted row arrays, and each left row binary-searches its
    * match. The fact side keeps its partitioning and ordering untouched —
    * ZERO shuffles — which is the only viable as-of plan at 100 TB when
    * the right side is a small reference table (the climatology-join
    * regime, `SURVEY.md` §2.3 J1).
    */
  case class AsOfBroadcastJoinExec(
      leftKeys: Seq[Attribute],
      rightKeys: Seq[Attribute],
      leftTs: Attribute,
      rightTs: Attribute,
      toleranceUnits: Option[Long],
      left: SparkPlan,
      right: SparkPlan) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override lazy val metrics = Map(
      "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

    override def requiredChildDistribution: Seq[Distribution] =
      UnspecifiedDistribution ::
        BroadcastDistribution(IdentityBroadcastMode) :: Nil

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def outputOrdering: Seq[SortOrder] = left.outputOrdering

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfBroadcastJoinExec =
      copy(left = newLeft, right = newRight)

    protected override def doExecute(): RDD[InternalRow] = {
      require(TsTypes.contains(leftTs.dataType) && TsTypes.contains(rightTs.dataType),
        s"as-of timestamps must be timestamp/long/int/date, got " +
          s"${leftTs.dataType} / ${rightTs.dataType}")
      val numOutputRows = longMetric("numOutputRows")
      val lOut = left.output
      val rOut = right.output
      val lKeyExprs = leftKeys
      val rKeyExprs = rightKeys
      val lTsBound = BindReferences.bindReference(leftTs: Expression, lOut)
      val rTsBound = BindReferences.bindReference(rightTs: Expression, rOut)
      val tol = toleranceUnits
      val outAttrs = output
      val bcast = right.executeBroadcast[Array[InternalRow]]()

      left.execute().mapPartitions { lIter =>
        // key → (ts[], row[]) with ts ascending; rows at equal ts keep
        // later-wins order to mirror the merge exec's last-consumed rule.
        // Built once per executor per broadcast (memoized), not per task.
        val index = cachedIndex(bcast.value) {
          val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
          val built = new java.util.HashMap[UnsafeRow, (Array[Long], Array[InternalRow])]()
          val grouped = new java.util.HashMap[UnsafeRow,
            scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
          bcast.value.foreach { r =>
            val tsv = rTsBound.eval(r)
            // SQL equality semantics: null-key rows can never match a probe
            // (`l.k = r.k` is never true for NULL), so they stay out of the
            // index — mirrors the merge exec dropping them on sight.
            if (tsv != null && !rKeyProj(r).anyNull) {
              val k = rKeyProj(r).copy()
              var buf = grouped.get(k)
              if (buf == null) {
                buf = scala.collection.mutable.ArrayBuffer.empty
                grouped.put(k, buf)
              }
              buf += ((tsv.asInstanceOf[Number].longValue(), r))
            }
          }
          grouped.forEach { (k, buf) =>
            val sorted = buf.sortBy(_._1) // stable
            built.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
          }
          built
        }
        val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
        val joined = new JoinedRow
        val rNulls = new GenericInternalRow(rOut.size)
        val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
        // rightmost index with ts[i] <= target, or -1
        def search(ts: Array[Long], target: Long): Int = {
          var lo = 0; var hi = ts.length - 1; var ans = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (ts(mid) <= target) { ans = mid; lo = mid + 1 } else hi = mid - 1
          }
          ans
        }
        lIter.map { lRow =>
          val lTsV = lTsBound.eval(lRow)
          var rRow: InternalRow = rNulls
          if (lTsV != null) {
            val lKey = lKeyProj(lRow)
            // Null-key probes never match (index holds no null keys either,
            // but UnsafeRow map equality would treat null==null as a hit).
            val entry = if (lKey.anyNull) null else index.get(lKey)
            if (entry != null) {
              val t = lTsV.asInstanceOf[Number].longValue()
              val i = search(entry._1, t)
              if (i >= 0 && tol.forall(tl => t - entry._1(i) <= tl))
                rRow = entry._2(i)
            }
          }
          numOutputRows += 1
          resultProj(joined(lRow, rRow))
        }
      }
    }
  }

  /** As-of join through the native exec — same surface and semantics as
    * [[graft.operators.AsOfJoin.asofJoin]] (which stays as the
    * composition-only fallback / differential-testing twin).
    *
    * @param tolerance max staleness in SECONDS for timestamp columns (raw
    *                  units for long/int/date time axes), None = unbounded
    * @param broadcast Some(true) forces the zero-shuffle broadcast form,
    *                  Some(false) forces the shuffled sort-merge form,
    *                  None lets the strategy decide from Catalyst's size
    *                  statistics (like Spark's own JoinSelection)
    */
  def asofMergeJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String],
      tolerance: Option[Long] = None,
      broadcast: Option[Boolean] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val clashes = rightVals.filter(leftCols.contains)
    require(clashes.isEmpty,
      s"Right value columns clash with left columns: ${clashes.mkString(", ")} — alias them first")
    require(rightVals.nonEmpty, "rightVals must name at least one column to carry")
    // same reserved-name guard as the composition twin
    // (operators/AsOfJoin): a left column named asof_ts would duplicate
    // the output column, and _asof_* left names make the final select's
    // col("_asof_rts") ambiguous
    val reserved = leftCols.filter(c => c == "asof_ts" || c.startsWith("_asof_"))
    require(reserved.isEmpty,
      s"asofMergeJoin reserves 'asof_ts' and the '_asof_' prefix; left " +
        s"columns ${reserved.mkString(", ")} would collide — alias them first")
    val spark = left.sparkSession
    install(spark)

    // Keys/ts on the right are re-aliased so the joined frame never carries
    // duplicate column names; fresh exprIds also keep self-joins unambiguous.
    val rightProj = right.select(
      on.map(c => col(c).as(s"_asof_k_$c")) ++
        (col(rightTs).as("_asof_rts") +: rightVals.map(col)): _*)

    val lPlan = Bridge.analyzed(left)
    var rPlan = Bridge.analyzed(rightProj)
    if (lPlan.outputSet.intersect(rPlan.outputSet).nonEmpty) {
      // Same-lineage inputs (self-join): break attribute identity with a
      // fresh-exprId projection, the same remedy DeduplicateRelations applies.
      rPlan = Project(rPlan.output.map(a => Alias(a, a.name)()), rPlan)
    }
    val rOut = rPlan.output
    def lAttr(n: String) = lPlan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"left column not found: $n"))
    def rAttr(n: String) = rOut.find(_.name == n).get
    val lKeys = on.map(lAttr)
    val rKeys = on.map(c => rAttr(s"_asof_k_$c"))
    lKeys.zip(rKeys).zip(on).foreach { case ((l, r), n) =>
      require(l.dataType == r.dataType,
        s"as-of key '$n' types differ: ${l.dataType} vs ${r.dataType}") }
    val lTsA = lAttr(leftTs)
    val rTsA = rAttr("_asof_rts")
    // The merge compares raw long values of the two time axes, and tolerance
    // unit conversion keys off the LEFT type — a TimestampType left against a
    // LongType(seconds) right would silently compare microseconds to seconds.
    // Mirror the key-type check: same dtype or nothing.
    require(lTsA.dataType == rTsA.dataType,
      s"as-of time axes must have the same type: " +
        s"$leftTs is ${lTsA.dataType}, $rightTs is ${rTsA.dataType} — cast one side first")
    val tolUnits = tolerance.map { t =>
      if (lTsA.dataType == TimestampType || lTsA.dataType == TimestampNTZType)
        t * 1000000L // seconds -> microseconds
      else t
    }

    val joined = Bridge.ofRows(spark,
      AsOfJoinNode(lKeys, rKeys, lTsA, rTsA, tolUnits, broadcast, lPlan, rPlan))
    joined.select(
      leftCols.map(col) ++ rightVals.map(col) :+ col("_asof_rts").as("asof_ts"): _*)
  }
}
