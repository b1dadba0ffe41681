package graft.queries

import graft.model.Tables
import graft.multimodal.Multimodal
import graft.pipeline.{Jobs, Pipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline composition, op-descriptor interpretation, and multimodal
  * binary plumbing as driver queries.
  */
object PipelineQ extends QueryPack {

  import TemporalQ.liSeries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D1/D2 + P7: the op-descriptor list interpreted onto the lineitem
    // series — slice then resample, the reference task-runner's contract.
    "q_pipeline_ops" -> ((s, dir) =>
      round6(
        Jobs.interpret(Tables.lineitem(s, dir), liSeries, Seq(
          Jobs.SliceTime("1996-01-01", "1997-12-31"),
          Jobs.Resample("annual")))
          .drop("month_end"),
        "mean_value")),
    // Pipeline composition: filter step + metric step folded via transform.
    "q_pipeline_compose" -> ((s, dir) => {
      val p = Pipeline.create("demo")
        .add("high_quantity")(_.where(col("l_quantity") >= 25))
        .add("metric")(d => Jobs.computeMetric(d, liSeries, "climatology"))
      round6(p(Tables.lineitem(s, dir)), "clim_mean", "clim_std")
    }),
    // Multimodal: binary content column + content-addressed metadata.
    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.fromText(Tables.documents(s, dir), "doc_id", "text", "text/plain")
        .select(col("media_id"), col("mime"), col("n_bytes"), col("sha256")))
  )

  def oracles: Map[String, String] = Map(
    "q_pipeline_ops" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS year, l_returnflag,
        |       round(avg(l_quantity), 6) AS mean_value
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |GROUP BY 1, 2""".stripMargin,
    "q_pipeline_compose" ->
      """SELECT CAST(month(l_shipdate) AS INTEGER) AS month, l_returnflag,
        |       round(avg(l_quantity), 6) AS clim_mean,
        |       round(stddev_pop(l_quantity), 6) AS clim_std
        |FROM lineitem WHERE l_quantity >= 25
        |GROUP BY 1, 2""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'text/plain' AS mime,
        |       octet_length(encode(text)) AS n_bytes,
        |       sha256(text) AS sha256
        |FROM documents""".stripMargin
  )
}
