package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exhaustive interpreted ≡ codegen parity over EVERY native expression in
  * [[Expressions]] (r15 — the r14 Int8Dot silent-truncation bug lived in
  * exactly this gap: eval and doGenCode are two implementations of each
  * kernel and can drift independently). Each case runs the same input
  * frame twice — once with codegen FORCED (factoryMode=CODEGEN_ONLY, so a
  * silent fallback can't fake parity) and once FORBIDDEN (NO_CODEGEN) —
  * and asserts row-for-row equality, over null/edge inputs as well as the
  * happy path. Loud-reject guards are asserted to fire in BOTH modes.
  */
class CodegenParitySpec extends SparkSpec {
  import spark.implicits._

  /** Collect `df` under forced-codegen and forbidden-codegen expression
    * factories; wholeStage tracks the factory mode so the codegen run
    * really exercises the generated code path end to end.
    */
  private def bothModes(df: => DataFrame): (Seq[Row], Seq[Row]) = {
    def collectWith(ws: String, fm: String): Seq[Row] = {
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", fm)
      try df.collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    (collectWith("true", "CODEGEN_ONLY"), collectWith("false", "NO_CODEGEN"))
  }

  private def assertParity(name: String)(df: => DataFrame): Unit = {
    val (gen, interp) = bothModes(df)
    assert(gen == interp,
      s"$name: codegen ${gen.mkString("; ")} != interpreted ${interp.mkString("; ")}")
  }

  /** The guard must fire identically in both modes. */
  private def assertLoudBoth(name: String, needle: String)(df: => DataFrame): Unit = {
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    Seq(("true", "CODEGEN_ONLY"), ("false", "NO_CODEGEN")).foreach { case (ws, fm) =>
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", fm)
      try {
        val e = intercept[Exception] { df.collect() }
        assert(chain(e).contains(needle), s"$name [$fm]: got ${chain(e)}")
      } finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
  }

  private val rnd = new scala.util.Random(17)
  private def vec(n: Int): Seq[Double] = Seq.fill(n)(rnd.nextGaussian())

  test("cosine: values, null element -> null, zero-norm -> NaN, mismatch loud") {
    // data hoisted OUT of the by-name builder: assertParity re-runs the
    // builder per mode, so in-builder randomness would compare two
    // different inputs instead of two modes
    val (a1, b1, b2, b3) = (vec(8), vec(8), vec(8), vec(8))
    assertParity("cosine") {
      Seq(
        (Some(a1), Some(b1)),
        (Some(Seq.fill(8)(0.0)), Some(b2)), // zero norm -> NaN
        (None, Some(b3)) // top-level null
      ).toDF("a", "b").select(Expressions.cosine_similarity(col("a"), col("b")))
    }
    assertParity("cosine null element") {
      Seq(1).toDF("x").select(Expressions.cosine_similarity(
        array(lit(1.0), lit(null).cast("double")), array(lit(1.0), lit(1.0))))
    }
    // the null-element result IS null (the composed zip_with/aggregate
    // semantics — an unsafe slot would otherwise silently read 0.0)
    assert(Seq(1).toDF("x").select(Expressions.cosine_similarity(
      array(lit(1.0), lit(null).cast("double")), array(lit(1.0), lit(1.0))))
      .head.isNullAt(0))
    val (m8, m4) = (vec(8), vec(4))
    assertLoudBoth("cosine mismatch", "dimension mismatch") {
      Seq((m8, m4)).toDF("a", "b")
        .select(Expressions.cosine_similarity(col("a"), col("b")))
    }
  }

  test("int8 dot: values, extremes, null, mismatch loud") {
    val ra = Seq.fill(16)((rnd.nextInt(255) - 127).toByte)
    val rb = Seq.fill(16)((rnd.nextInt(255) - 127).toByte)
    assertParity("int8_dot") {
      Seq(
        (Some(ra), Some(rb)),
        (Some(Seq.fill(16)((-127).toByte)), Some(Seq.fill(16)((-127).toByte))),
        (None, Some(Seq.fill(16)(1.toByte)))
      ).toDF("a", "b").select(Expressions.int8_dot(col("a"), col("b")))
    }
    assertLoudBoth("int8 mismatch", "dimension mismatch") {
      Seq((Seq.fill(16)(1.toByte), Seq.fill(8)(1.toByte))).toDF("a", "b")
        .select(Expressions.int8_dot(col("a"), col("b")))
    }
  }

  test("sq8 encode: values, zero vector, null") {
    val v16 = vec(16)
    assertParity("sq8_encode") {
      Seq(Some(v16), Some(Seq.fill(16)(0.0)), None).toDF("v")
        .select(Expressions.sq8_encode(col("v")))
    }
  }

  test("percentile rank: sweep, NaN, empty thresholds, level mismatch loud") {
    val thr = Seq(2.0, 4.0, 4.0, 8.0)
    val pct = Seq(10.0, 25.0, 50.0, 90.0)
    assertParity("percentile_rank") {
      Seq(-1.0, 2.0, 3.0, 4.0, 8.0, 99.0, Double.NaN).toDF("v")
        .withColumn("thr", typedLit(thr)).withColumn("pct", typedLit(pct))
        .select(Expressions.percentile_rank(col("v"), col("thr"), col("pct")))
    }
    assertParity("percentile_rank empty") {
      Seq(1.0).toDF("v")
        .withColumn("thr", typedLit(Seq.empty[Double]))
        .withColumn("pct", typedLit(Seq.empty[Double]))
        .select(Expressions.percentile_rank(col("v"), col("thr"), col("pct")))
    }
    assertLoudBoth("percentile_rank mismatch", "percentile levels") {
      Seq(3.0).toDF("v")
        .withColumn("thr", typedLit(Seq(1.0, 2.0, 3.0)))
        .withColumn("pct", typedLit(Seq(50.0)))
        .select(Expressions.percentile_rank(col("v"), col("thr"), col("pct")))
    }
  }

  test("minhash signature: values, empty set -> null, null input") {
    val a = Seq(3L, 5L, 7L); val b = Seq(11L, 13L, 17L)
    assertParity("minhash_signature") {
      Seq(Some(Seq(42L, -9L, 1L << 40)), Some(Seq.empty[Long]), None).toDF("gs")
        .select(Expressions.minhash_signature(col("gs"), a, b, 2147483647L))
    }
  }

  test("gram hashes (token + text + seq forms): unicode, nulls, short input") {
    assertParity("gram_hashes") {
      Seq(Some(Seq("a", "b", "c", "d")), Some(Seq("x")), None).toDF("t")
        .select(Expressions.gram_hashes(col("t"), 3))
    }
    assertParity("gram_hashes null token") {
      Seq(1).toDF("x").select(Expressions.gram_hashes(
        array(lit("a"), lit(null).cast("string"), lit("b"), lit("c"), lit("d")), 3))
    }
    assertParity("text_gram_hashes") {
      Seq(Some("the quick brown fox jumps"), Some("naïve café 😀 words here"),
        Some("  "), None).toDF("t")
        .select(Expressions.text_gram_hashes(col("t"), 3))
    }
    assertParity("text_gram_hash_seq") {
      Seq(Some("one two three four five six"), Some("short"), None).toDF("t")
        .select(Expressions.text_gram_hash_seq(col("t"), 3))
    }
  }

  test("token counts: unicode case folding, blanks, null") {
    assertParity("token_counts") {
      Seq(Some("The  quick,  QUICK fox!"), Some("naïve İstanbul 42 42"),
        Some("  "), None).toDF("t")
        .select(Expressions.token_counts(col("t")))
    }
  }

  test("pq encode/luts/adc: values, null, short-vector and stale-code loud") {
    val m = 4; val k = 3; val sub = 2
    val books: Seq[Seq[Seq[Double]]] =
      Seq.fill(m)(Seq.fill(k)(Seq.fill(sub)(rnd.nextGaussian())))
    val u1 = vec(m * sub); val u2 = vec(m * sub)
    val uShort = vec(m * sub - 2); val u3 = vec(m * sub)
    assertParity("pq_encode") {
      Seq(Some(u1), Some(Seq.fill(m * sub)(0.0)), None).toDF("v")
        .select(Expressions.pq_encode(col("v"), books))
    }
    assertParity("pq_encode residual (normalize=false)") {
      Seq(Some(u2), None).toDF("v")
        .select(Expressions.pq_encode(col("v"), books, normalize = false))
    }
    assertLoudBoth("pq_encode short vector", "malformed embedding") {
      Seq(uShort).toDF("v")
        .select(Expressions.pq_encode(col("v"), books))
    }
    assertParity("pq_luts + pq_adc") {
      Seq(Some(u3), None).toDF("u")
        .withColumn("codes", typedLit(Seq(0, 2, 1, 0)))
        .select(Expressions.pq_adc(
          Expressions.pq_luts(col("u"), books), col("codes")))
    }
    val u4 = vec(m * sub)
    assertLoudBoth("pq_adc m mismatch", "mismatched codebooks") {
      Seq(u4).toDF("u")
        .withColumn("codes", typedLit(Seq(0, 1)))
        .select(Expressions.pq_adc(
          Expressions.pq_luts(col("u"), books), col("codes")))
    }
    val u5 = vec(m * sub)
    assertLoudBoth("pq_adc stale code", "stale codes") {
      Seq(u5).toDF("u")
        .withColumn("codes", typedLit(Seq(0, 2, 1, k))) // k is out of range
        .select(Expressions.pq_adc(
          Expressions.pq_luts(col("u"), books), col("codes")))
    }
  }

  test("l2 normalize: values, zero vector passthrough, null") {
    val v8 = vec(8)
    assertParity("l2_normalize") {
      Seq(Some(v8), Some(Seq.fill(8)(0.0)), None).toDF("v")
        .select(Expressions.l2_normalize(col("v")))
    }
  }

  test("hyperplane signature: values, float input, mismatch loud, >64 planes reject") {
    val planes = graft.sim.Similarity.hyperplanes(8, 16)
    val hv = vec(8)
    val hf = Seq.fill(8)(rnd.nextFloat())
    val h4 = vec(4)
    assertParity("hyperplane_signature") {
      Seq(Some(hv), Some(Seq.fill(8)(0.0)), None).toDF("v")
        .select(Expressions.hyperplane_signature(col("v"), planes))
    }
    assertParity("hyperplane_signature float") {
      Seq(hf).toDF("v")
        .select(Expressions.hyperplane_signature(col("v"), planes))
    }
    assertLoudBoth("hyperplane mismatch", "malformed embedding") {
      Seq(h4).toDF("v")
        .select(Expressions.hyperplane_signature(col("v"), planes))
    }
    // > 64 planes alias onto bits 0..63 (1L << 64 == 1L << 0): reject at
    // construction, before any signature is computed
    val e = intercept[IllegalArgumentException] {
      Expressions.hyperplane_signature(col("v"),
        Seq.fill(65)(Seq.fill(8)(1.0)))
    }
    assert(e.getMessage.contains("64-bit"))
  }

  test("nearest centroid(s): argmin, ties, null; k-probe distinctness") {
    val cents = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(0.0, 10.0))
    assertParity("nearest_centroid") {
      Seq(Some(Seq(1.0, 1.0)), Some(Seq(5.0, 0.0)), None).toDF("v")
        .select(Expressions.nearest_centroid(col("v"), cents))
    }
    assertParity("nearest_centroids k=2") {
      Seq(Some(Seq(1.0, 1.0)), Some(Seq(5.0, 0.0)), None).toDF("v")
        .select(Expressions.nearest_centroids(col("v"), cents, 2))
    }
  }

  test("bloom might-contain: long and string keys, null -> false") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq(1L, 2L, 3L).foreach(bf.putLong)
    assertParity("bloom long") {
      Seq(Some(1L), Some(99L), None).toDF("k")
        .select(Expressions.bloom_might_contain(col("k"), bf))
    }
    val bfs = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq("a", "b").foreach(bfs.putString)
    assertParity("bloom string") {
      Seq(Some("a"), Some("zz"), None).toDF("k")
        .select(Expressions.bloom_might_contain(col("k"), bfs))
    }
  }

  test("bpe encode/count words: values, null element skipped, null input") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    assertParity("bpe_encode_words") {
      Seq(Some(Seq("abc", "xyz")), Some(Seq.empty[String]), None).toDF("ws")
        .select(Expressions.bpe_encode_words(col("ws"), merges))
    }
    assertParity("bpe null element") {
      Seq(1).toDF("x").select(
        Expressions.bpe_encode_words(
          array(lit("abc"), lit(null).cast("string"), lit("ab")), merges),
        Expressions.bpe_token_count_words(
          array(lit("abc"), lit(null).cast("string"), lit("ab")), merges))
    }
    // a null WORD contributes nothing (the GramHashes guard) — and the
    // count agrees with the encode length
    val r = Seq(1).toDF("x").select(
      Expressions.bpe_encode_words(
        array(lit("abc"), lit(null).cast("string")), merges).as("toks"),
      Expressions.bpe_token_count_words(
        array(lit("abc"), lit(null).cast("string")), merges).as("n")).head
    assert(r.getSeq[String](0).length == r.getInt(1))
    assertParity("bpe_token_count_words") {
      Seq(Some(Seq("abc", "ababc")), None).toDF("ws")
        .select(Expressions.bpe_token_count_words(col("ws"), merges))
    }
  }

  test("html main content: tag soup + entities + non-BMP") {
    assertParity("html_main_content") {
      Seq(
        Some("<p>hello world this is long enough to keep around here</p>"),
        Some("<nav>menu</nav><p>short</p>"),
        Some("<p>émoji 😀 content with enough words to pass the filter ok</p>"),
        None).toDF("h")
        .select(Expressions.html_main_content(col("h"), 10, 0.5))
    }
  }
}
