package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — the operator Spark SQL lacks that
  * cleanly implements point-in-time enrichment (SURVEY.md §2.3 notes it as
  * the clean form of P4; standard in time-series engines).
  *
  * For each left row, attach the latest right row whose timestamp is ≤ the
  * left timestamp (optionally within `tolerance` seconds), matching on
  * equi-keys.
  *
  * Implementation is the scalable union+window form, NOT a range join:
  * tag both inputs, union them, then one window pass per key ordered by
  * (ts, side) carrying the last seen right-side values forward
  * (`last(..., ignoreNulls)`). Cost = one shuffle on the key + one sort —
  * the same plan shape as any windowed aggregation, no per-row range scan
  * and no cross product, so it scales exactly like a groupBy at 100 TB.
  */
object AsOfJoin {

  /** @param left       fact rows to enrich
    * @param right      reference rows providing the as-of values
    * @param on         equi-join key columns (present in both)
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param rightVals  right columns to carry (must not clash with left)
    * @param tolerance  max staleness in seconds (None = unbounded)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String],
      tolerance: Option[Long] = None
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val clashes = rightVals.filter(leftCols.contains)
    require(clashes.isEmpty,
      s"Right value columns clash with left columns: ${clashes.mkString(", ")} — alias them first")
    require(rightVals.nonEmpty, "rightVals must name at least one column to carry")
    // the working/output names must not silently overwrite caller data
    // (withColumn REPLACES an existing column without error)
    val reserved = Seq("_ts", "_side", "_rrow", "_rlast", "asof_ts")
    val taken = leftCols.filter(reserved.contains)
    require(taken.isEmpty,
      s"asofJoin reserves column names ${reserved.mkString(", ")}; " +
        s"left columns ${taken.mkString(", ")} would be overwritten — alias them first")
    // side=0 sorts right rows BEFORE left rows at equal timestamps, so a
    // right row at exactly the left ts matches (ASOF >= semantics).
    // leftTs is carried ONLY as _ts (renamed back at the end) — carrying it
    // twice would leave a duplicate, ambiguous column in the output.
    val carryLeft = leftCols.filterNot(c => on.contains(c) || c == leftTs)
    // SQL equality semantics: a right row with a null key or null timestamp
    // can never be an as-of match (`l.k = r.k` is never true for NULL, and a
    // null timestamp has no position on the time axis). Dropping them before
    // the union keeps them out of the window carry entirely — otherwise
    // `last(..., ignoreNulls)` would carry their VALUES (which may be
    // non-null) while `_asof_ts` stays null, and null-key left rows would
    // silently match null-key right rows. Matches the native exec
    // (plans/AsOfMerge.scala) row for row.
    val matchableRight = right.where(
      (on.map(col(_).isNotNull) :+ col(rightTs).isNotNull).reduce(_ && _))
    // the right side is carried as ONE struct per row, not per-column:
    // per-column last(..., ignoreNulls) mixed FIELDS from different right
    // rows whenever the latest match carried a null value (the older
    // row's non-null value rode along under the newer row's asof_ts) —
    // "attach the latest right ROW" means the whole row or nothing, which
    // is also what the native exec (plans/AsOfMerge holds heldRow) and
    // DuckDB's ASOF JOIN do. A struct literal is non-null for every right
    // row, so null fields inside can never un-carry it; left rows get a
    // typed NULL struct so ignoreNulls skips them. One window aggregate
    // total, instead of 1 + |rightVals| passes.
    val rrowType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(
        "_rts", right.schema(rightTs).dataType) +:
        rightVals.map(c => org.apache.spark.sql.types.StructField(
          s"_r_$c", right.schema(c).dataType)))
    val taggedRight = matchableRight.select(
      (on.map(col) :+ col(rightTs).as("_ts") :+ lit(0).as("_side") :+
        struct(col(rightTs).as("_rts") +:
          rightVals.map(c => col(c).as(s"_r_$c")): _*).as("_rrow")) ++
        carryLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (on.map(col) :+ col(leftTs).as("_ts") :+ lit(1).as("_side") :+
        lit(null).cast(rrowType).as("_rrow")) ++
        carryLeft.map(col): _*)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("_rlast",
        last(when(col("_side") === 0, col("_rrow")), ignoreNulls = true).over(w))
      .withColumn("_asof_ts", col("_rlast._rts"))
    val withVals = rightVals.foldLeft(carried) { (d, c) =>
      d.withColumn(c, col(s"_rlast._r_$c"))
    }

    val tolerant = tolerance.fold(withVals) { t =>
      rightVals.foldLeft(withVals) { (d, c) =>
        d.withColumn(c,
          when(col("_ts").cast("double") - col("_asof_ts").cast("double") <= t, col(c)))
      }.withColumn("_asof_ts",
        when(col("_ts").cast("double") - col("_asof_ts").cast("double") <= t, col("_asof_ts")))
    }

    tolerant
      .where(col("_side") === 1)
      .withColumnRenamed("_ts", leftTs)
      .withColumn("asof_ts", col("_asof_ts"))
      .drop("_rrow", "_rlast", "_side", "_asof_ts")
  }
}
