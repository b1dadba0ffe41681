package graft.operators

import graft.functions.TimeFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-proximity (interval) join: pair left and right rows on equi-keys
  * whose timestamps lie within ± `toleranceSec` of each other.
  *
  * Naive SQL (`|l.ts − r.ts| <= tol` as a non-equi condition) degenerates
  * to a per-key nested loop. This implementation BINS both sides into
  * tolerance-width buckets and equi-joins on (key, bucket) with the right
  * side exploded into its bucket and both neighbors — any qualifying pair
  * shares one of those three buckets, so the join is hash-based and the
  * exact predicate only filters within small buckets. Cost:
  * 3× right-side rows shuffled, no nested loop — the standard banded
  * interval-join at scale.
  */
object RangeJoin {

  def timeRangeJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      toleranceSec: Long
  ): DataFrame = {
    require(toleranceSec > 0, s"tolerance must be positive, got $toleranceSec")
    val lsec = TimeFns.epochSeconds(col(leftTs))
    val rsec = TimeFns.epochSeconds(col(rightTs))
    val l = left.withColumn("_bucket", floor(lsec / toleranceSec))
    val r = right
      .withColumn("_rb", floor(rsec / toleranceSec))
      .withColumn("_bucket", explode(array(col("_rb") - 1, col("_rb"), col("_rb") + 1)))
      .drop("_rb")
    l.join(r, on :+ "_bucket")
      .where(abs(lsec - rsec) <= toleranceSec)
      .drop("_bucket")
  }
}
