package graft.text

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("tokenCount matches n_chars-consistent whitespace splitting") {
    val bad = docs.select(TextMetrics.tokenCount(col("text")).as("n"))
      .where(col("n") <= 0)
    assert(bad.count() == 0)
    val one = Seq("one two  three").toDF("text")
      .select(TextMetrics.tokenCount(col("text"))).head.getInt(0)
    assert(one == 3) // run of spaces is one separator
  }

  test("quality score bounded in [0,1] and orders prose above noise") {
    val range = docs.select(TextMetrics.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).head
    assert(range.getDouble(0) >= 0.0 && range.getDouble(1) <= 1.0)
    val scored = Seq(
      "the cat sat on the mat and it is a fine day in the sun",
      "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))"
    ).toDF("text").select(TextMetrics.qualityScore(col("text")).as("q"))
      .collect().map(_.getDouble(0))
    assert(scored(0) > scored(1))
  }

  test("langId picks profile languages deterministically") {
    val out = Seq(
      "the cat and the dog of the house",
      "el perro y la casa de los gatos que es",
      "le chien et la maison des chats est un",
      "xyzzy qwerty plugh").toDF("text")
      .select(TextMetrics.langId(col("text"))).collect().map(_.getString(0))
    assert(out(0) == "en" && out(1) == "es" && out(2) == "fr" && out(3) == "und")
  }

  test("fingerprint is invariant to word order and duplication") {
    val fps = Seq("alpha beta gamma", "gamma beta alpha", "beta alpha gamma beta",
      "alpha beta delta").toDF("text")
      .select(TextMetrics.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(1) == fps(2))
    assert(fps(0) != fps(3))
  }
}
