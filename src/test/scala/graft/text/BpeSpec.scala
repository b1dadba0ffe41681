package graft.text

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("mergePair is canonical greedy left-to-right") {
    // runs merge at even offsets
    assert(Bpe.mergePair(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(Bpe.mergePair(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    // overlapping an/na chains resolve left-to-right
    assert(Bpe.mergePair(Array("b", "a", "n", "a", "n", "a"), "a", "n").toSeq ==
      Seq("b", "an", "an", "a"))
    // no match → unchanged
    assert(Bpe.mergePair(Array("x", "y"), "a", "b").toSeq == Seq("x", "y"))
  }

  test("fitOnCounts is deterministic with documented tie-break") {
    // both pairs have count 2; (a,b) < (b,a) lexicographically
    val wc = Seq(("abab", 1L), ("ba", 1L))
    val m = Bpe.fitOnCounts(wc, 1)
    assert(m == Seq(("a", "b")))
    // same input, same merges, every time
    assert(Bpe.fitOnCounts(wc, 1) == m)
  }

  test("codec encode equals fit-time representation") {
    val wc = Seq(("banana", 10L), ("bandana", 5L), ("naan", 3L))
    val merges = Bpe.fitOnCounts(wc, 6)
    val codec = new Bpe.Codec(merges)
    // replay the fit's merge application independently per word
    for ((w, _) <- wc) {
      var s = w.map(_.toString).toArray
      merges.foreach { case (l, r) => s = Bpe.mergePair(s, l, r) }
      assert(codec.encodeWord(w).toSeq == s.toSeq, s"word $w")
      assert(codec.countWord(w) == s.length)
    }
    // memo path returns the identical encoding
    assert(codec.encodeWord("banana").toSeq == codec.encodeWord("banana").toSeq)
  }

  test("fit on documents + encode expressions agree with driver-side codec") {
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.fit(docs, "text", 10)
    assert(merges.size == 10 && merges.distinct.size == 10)
    val codec = new Bpe.Codec(merges)
    val rows = docs.select(
        col("text"),
        Bpe.encode(col("text"), merges).as("toks"),
        Bpe.tokenCount(col("text"), merges).as("n"))
      .limit(50).collect()
    rows.foreach { r =>
      val words = "[a-z]+".r.findAllIn(r.getString(0).toLowerCase).toSeq
      val expect = words.flatMap(codec.encodeWord(_).toSeq)
      assert(r.getSeq[String](1) == expect)
      assert(r.getInt(2) == expect.size)
    }
  }

  test("empty and wordless text encode to zero tokens") {
    val rows = Seq("", "   ", "12345 !!!").toDF("text")
      .select(Bpe.tokenCount(col("text"), Seq(("a", "b"))).as("n"))
      .collect().map(_.getInt(0))
    assert(rows.toSeq == Seq(0, 0, 0))
  }

  test("fit refuses to run past vocabulary exhaustion") {
    intercept[IllegalArgumentException] {
      Bpe.fitOnCounts(Seq(("ab", 1L)), 5) // only one merge possible
    }
  }
}
