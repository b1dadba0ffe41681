package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT graft_cosine(a, b)")`
  * works next to the Column API. Install with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
object GraftExtensions {
  /** Register the functions on an already-running session (builder-time
    * extensions don't apply to an existing session).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "graft_cosine",
      children => Expressions.CosineSimilarity(children(0), children(1)))
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "graft_percentile_rank",
      children => Expressions.PercentileRank(children(0), children(1), children(2)))
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // the 3-arg ExpressionInfo ctor is (className, db, NAME) — passing usage
  // there garbles DESCRIBE FUNCTION output; use the 4-arg form where the
  // last slot really is usage (db = null for a session-scoped function)
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[Expressions.type].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two double arrays"),
      (children: Seq[Expression]) =>
        Expressions.CosineSimilarity(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("graft_percentile_rank"),
      info("graft_percentile_rank",
        "graft_percentile_rank(v, thresholds, pcts) - clamped interpolated percentile rank"),
      (children: Seq[Expression]) =>
        Expressions.PercentileRank(children(0), children(1), children(2))))
  }
}
