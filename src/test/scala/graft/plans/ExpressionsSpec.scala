package graft.plans

import graft.SparkSpec
import graft.functions.StatsFns
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine matches the composed-expression form exactly") {
    val df = Seq(
      (Seq(1.0, 0.0, 1.0), Seq(1.0, 1.0, 0.0)),
      (Seq(0.3, -0.7, 2.1), Seq(-1.1, 0.4, 0.9)),
      (Seq(1e-8, 1e8, 3.0), Seq(2.0, -1e-8, 5.5))
    ).toDF("a", "b")
    val composed = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) => {
      def dot(p: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) =
        aggregate(zip_with(p, q, (u, v) => u * v), lit(0.0), (acc, v) => acc + v)
      dot(x, y) / (sqrt(dot(x, x)) * sqrt(dot(y, y)))
    }
    val rows = df.select(
      Expressions.cosine_similarity(col("a"), col("b")).as("native"),
      composed(col("a"), col("b")).as("composed")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // bitwise equal
  }

  test("native percentile rank matches the Scala kernel on a value sweep") {
    val thr = Seq(2.0, 4.0, 4.0, 8.0, 16.0)
    val pct = Seq(10.0, 25.0, 50.0, 75.0, 90.0)
    val values = Seq(-1.0, 2.0, 3.0, 4.0, 5.0, 8.0, 12.0, 16.0, 99.0)
    val df = values.toDF("v")
      .withColumn("thr", typedLit(thr)).withColumn("pct", typedLit(pct))
    val native = df.select(
      Expressions.percentile_rank(col("v"), col("thr"), col("pct"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val kernel = values.map(v => StatsFns.percentileRankKernel(v, thr, pct))
    assert(native.toSeq == kernel)
    // null value propagates
    val n = Seq[Option[Double]](None).toDF("v")
      .withColumn("thr", typedLit(thr)).withColumn("pct", typedLit(pct))
      .select(Expressions.percentile_rank(col("v"), col("thr"), col("pct"))).head
    assert(n.isNullAt(0))
  }

  test("native PQ LUTs match the composed slice/zip_with/aggregate form exactly") {
    val m = 4; val k = 3; val sub = 2
    val rnd = new scala.util.Random(7)
    val books: Seq[Seq[Seq[Double]]] =
      Seq.fill(m)(Seq.fill(k)(Seq.fill(sub)(rnd.nextGaussian())))
    val df = Seq.fill(6)(Seq.fill(m * sub)(rnd.nextGaussian())).toDF("u")
    // the pre-round-13 composed form, kept here as the semantic oracle:
    // luts[j][c] = aggregate(zip_with(slice(u, j·sub+1, sub), book), +)
    def dot(a: org.apache.spark.sql.Column, b: Seq[Double]) =
      aggregate(zip_with(a, typedLit(b), (x, y) => x * y), lit(0.0), _ + _)
    val composed = array((0 until m).map { j =>
      array(books(j).map(c => dot(slice(col("u"), j * sub + 1, sub), c)): _*)
    }: _*)
    val rows = df.select(
      Expressions.pq_luts(col("u"), books).as("native"),
      composed.as("composed")).collect()
    rows.foreach { r =>
      val nat = r.getSeq[scala.collection.Seq[Double]](0).map(_.toSeq)
      val cmp = r.getSeq[scala.collection.Seq[Double]](1).map(_.toSeq)
      assert(nat.size == m && nat.head.size == k)
      // bitwise equality: left-to-right summation must be preserved
      assert(nat == cmp, s"native $nat != composed $cmp")
    }
    // pairs with PqAdc: score of a code vector equals manual lookup sum
    val withCodes = df.withColumn("codes", typedLit(Seq(0, 2, 1, 0)))
    val scored = withCodes.select(
      Expressions.pq_adc(Expressions.pq_luts(col("u"), books), col("codes"))
        .as("score"),
      Expressions.pq_luts(col("u"), books).as("luts")).collect()
    scored.foreach { r =>
      val luts = r.getSeq[scala.collection.Seq[Double]](1).map(_.toSeq)
      val expect = luts(0)(0) + luts(1)(2) + luts(2)(1) + luts(3)(0)
      assert(r.getDouble(0) == expect)
    }
    // null vector propagates
    val n = Seq[Option[Seq[Double]]](None).toDF("u")
      .select(Expressions.pq_luts(col("u"), books)).head
    assert(n.isNullAt(0))
  }

  test("expressions run inside whole-stage codegen (no fallback)") {
    // a parquet scan input prevents constant folding from evaluating the
    // expression at optimization time
    val emb = graft.model.Tables.embeddings(spark, sfDir)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
    val df = emb.select(
      Expressions.cosine_similarity(col("v"), col("v")).as("c"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "cosine must codegen, not fall back to interpreted eval")
  }

  test("token counts: explode shape matches the regex pipeline; null text drops; codegen") {
    import graft.text.TextMetrics
    val docs = graft.model.Tables.documents(spark, sfDir).limit(100)
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (9001L, "The  quick,  QUICK fox!"),
        (9002L, "  "),
        (9003L, null.asInstanceOf[String]),
        (9004L, "naïve café İstanbul 42 42")
      ).toDF("doc_id", "text"))
    val fused = docs.select(col("doc_id"),
      explode(Expressions.token_counts(col("text"))).as(Seq("term", "tf")))
    val regex = docs.select(col("doc_id"),
        explode(TextMetrics.tokens(TextMetrics.normalize(col("text")))).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    assert(fused.count() == regex.count())
    assert(fused.exceptAll(regex).isEmpty && regex.exceptAll(fused).isEmpty)
    // null and blank docs contribute no rows
    assert(fused.where(col("doc_id") >= 9002L && col("doc_id") <= 9003L).isEmpty)
    fused.collect()
    assert(fused.queryExecution.executedPlan.toString.contains("*("),
      "token_counts must run inside whole-stage codegen")
  }

  test("nearest centroid: argmin, low-id tie-break, nulls, codegen") {
    import spark.implicits._
    val cents = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(0.0, 10.0))
    val rows = Seq(
      (1L, Some(Seq(1.0, 1.0))),   // nearest origin -> 0
      (2L, Some(Seq(9.0, 0.5))),   // -> 1
      (3L, Some(Seq(0.5, 9.0))),   // -> 2
      (4L, Some(Seq(5.0, 0.0))),   // equidistant to 0 and 1 -> lowest id 0
      (5L, None)                   // null vector -> null cell
    ).toDF("id", "v")
    val out = rows.select(col("id"),
      Expressions.nearest_centroid(col("v"), cents).as("cell"))
      .orderBy("id").collect()
    assert(out.map(r => if (r.isNullAt(1)) -1 else r.getInt(1)).toSeq ==
      Seq(0, 1, 2, 0, -1))
    // and it stays inside whole-stage codegen over a real scan
    val emb = graft.model.Tables.embeddings(spark, sfDir)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
    val df = emb.select(Expressions.nearest_centroid(col("v"),
      Seq.fill(4)(Seq.fill(64)(0.5))).as("cell"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "nearest_centroid must codegen")
  }

  test("int8 dot: fused kernel matches the composed form, codegens, handles nulls") {
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(50)((
      Seq.fill(16)((rnd.nextInt(255) - 127).toByte),
      Seq.fill(16)((rnd.nextInt(255) - 127).toByte)))
    val df = data.toDF("a", "b")
    val rows = df.select(
      Expressions.int8_dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("long") * y.cast("long")), lit(0L), _ + _).as("composed"))
    rows.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // codegen check needs a real scan (a local Seq plans as LocalTableScan)
    val scan = graft.model.Tables.embeddings(spark, sfDir)
      .select(graft.sim.Similarity.sqEncode(col("embedding")).as("c8"))
      .select(Expressions.int8_dot(col("c8"), col("c8")).as("d"))
    scan.collect()
    assert(scan.queryExecution.executedPlan.toString.contains("*("),
      "int8_dot must codegen")
    // fused Sq8Encode ≡ composed l2_normalize → round(x·127) per element,
    // byte-for-byte over real embeddings (+ a zero vector)
    val v = transform(col("embedding"), _.cast("double"))
    val parity = graft.model.Tables.embeddings(spark, sfDir)
      .select(col("embedding"))
      .unionByName(Seq(Seq.fill(64)(0f)).toDF("embedding"))
      .select(
        Expressions.sq8_encode(v).as("fused"),
        transform(Expressions.l2_normalize(v),
          x => round(x * lit(127)).cast("byte")).as("composed"))
      .where(col("fused") =!= col("composed"))
    assert(parity.count() == 0, "Sq8Encode must equal the composed form")
    // extremes: (-127)·(-127)·16 and null propagation
    val ext = Seq((Seq.fill(16)((-127).toByte), Seq.fill(16)((-127).toByte)))
      .toDF("a", "b")
      .select(Expressions.int8_dot(col("a"), col("b"))).head()
    assert(ext.getLong(0) == 127L * 127L * 16L)
    val n = Seq((Option.empty[Seq[Byte]], Option(Seq(1.toByte))))
      .toDF("a", "b")
      .select(Expressions.int8_dot(col("a"), col("b"))).head()
    assert(n.isNullAt(0))
    // dimension mismatch rejects LOUDLY (both the interpreted eval and
    // the codegen'd loop) — truncating to min(len) would quietly
    // mis-score mixed-dimension codes
    val mm = intercept[Exception] {
      Seq((Seq.fill(16)(1.toByte), Seq.fill(8)(1.toByte))).toDF("a", "b")
        .select(Expressions.int8_dot(col("a"), col("b"))).collect()
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(mm).contains("dimension mismatch"))
    val mmScan = intercept[Exception] {
      graft.model.Tables.embeddings(spark, sfDir)
        .select(graft.sim.Similarity.sqEncode(col("embedding")).as("c8"))
        .select(Expressions.int8_dot(col("c8"), slice(col("c8"), 1, 8)))
        .collect()
    }
    assert(chain(mmScan).contains("dimension mismatch"))
  }

  test("SQL registration on a live session") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
      "graft_percentile_rank(3.0d, array(2.0d, 4.0d), array(10.0d, 90.0d)) AS p")
      .head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 50.0)
  }
}
