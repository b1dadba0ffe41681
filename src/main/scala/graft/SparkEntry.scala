package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Tables
import graft.metrics.Temporal
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in per-domain [[graft.queries.QueryPack]]s; each binds one
  * operator of the engine (SURVEY.md §2 inventory) to the driver test
  * tables, with the equivalent DuckDB oracle SQL. Column names and
  * `round(x, 6)` are kept identical on both sides because the driver
  * hash-compares values after sorting columns by name.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    TemporalQ, PercentileQ, AnomalyQ, TrendQ, IngestQ, JoinQ, EventsQ,
    TextQ, DedupQ, SimQ, PipelineQ, ApiQ, ApproxQ, AsOfQ, CatalogQ, CurationQ,
    RangeQ, SampleQ, BpeQ, SemQ, HttpQ, NetCdfQ, WebQ)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship "monthly mean at a point"
    * (`README.md:54`, `api/routes/metrics.py:11-46`) over the lineitem
    * series.
    */
  def entry(spark: SparkSession): DataFrame = {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    Temporal.monthlyMean(li, TemporalQ.liSeries).orderBy("month", "l_returnflag")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
