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

  /** The lineitem fact spread over the cluster (optimization guide §2.5:
    * the driver fixture is ONE parquet row group = one scan task, so
    * joins/partial aggregates fused into the scan run serially). The
    * Fanout guard makes this a no-op whenever the scan already has
    * enough splits — i.e. at any real deployment scale. Key is the
    * table's primary key: deterministic, maximal cardinality.
    */
  protected def fanLineitem(s: SparkSession, dir: String): DataFrame =
    graft.operators.Fanout(graft.model.Tables.lineitem(s, dir),
      Seq("l_orderkey", "l_linenumber"))

  /** The documents corpus spread over the cluster — same rationale and
    * no-op guard as [[fanLineitem]]; the text kernels fused into a
    * single-row-group scan are the most serial work in the suite.
    */
  protected def fanDocuments(s: SparkSession, dir: String): DataFrame =
    graft.operators.Fanout(graft.model.Tables.documents(s, dir), Seq("doc_id"))
}
