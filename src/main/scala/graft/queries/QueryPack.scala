package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, round}

/** A named bundle of driver queries plus their DuckDB oracle SQL.
  * SparkEntry concatenates all packs.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Round double columns to 6 decimals — shared convention with the oracle
    * SQL so tiny summation-order drift can't flip the driver's hash compare.
    */
  protected def round6(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, round(col(c), 6)))
}
