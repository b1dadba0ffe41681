package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot paths (SURVEY.md §7.3: "custom
  * `Expression` with codegen later" — this is later).
  *
  * Both beat their composed-expression/UDF equivalents by avoiding
  * intermediate array allocation (`zip_with` + `aggregate` materializes a
  * zipped array per row) and boxing (Scala UDFs convert ArrayData →
  * Seq[Double] per call). Semantics are IDENTICAL to the previous
  * implementations — left-to-right summation, same clamped interpolation —
  * so the DuckDB oracles are unaffected.
  */
object Expressions {

  /** Cosine similarity of two double arrays in one fused loop.
    * Null (top-level) → null; a NULL ELEMENT → null (what the composed
    * `aggregate(zip_with(...))` form yields — an UnsafeArrayData slot
    * would otherwise silently read 0.0); zero-norm input → NaN (matches
    * the division semantics of the composed form). Mixed dimensions
    * reject loudly (repo-wide policy — see Int8Dot): a dot over min(len)
    * quietly mis-scores vectors from different embedding models.
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[Bridge.AbstractType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) throw new IllegalArgumentException(
        s"graft_cosine: vector dimension mismatch ($n vs ${y.numElements()})")
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xv = x.getDouble(i); val yv = y.getDouble(i)
        dot += xv * yv; nx += xv * xv; ny += yv * yv
        i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  throw new IllegalArgumentException(
           |    "graft_cosine: vector dimension mismatch (" + $n + " vs " +
           |      $b.numElements() + ")");
           |}
           |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
           |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  double xv = $a.getDouble($i);
           |  double yv = $b.getDouble($i);
           |  $dot += xv * yv; $nx += xv * xv; $ny += yv * yv;
           |}
           |if (!${ev.isNull}) {
           |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSimilarity =
      copy(left = newLeft, right = newRight)
  }

  /** Integer dot product of two int8 code arrays (scalar-quantized
    * embeddings) in one fused loop — the scoring kernel of
    * `sim/Similarity.sqTopK`. Long output: overflow-proof for any
    * realistic dim (127² · dim). Null (top-level) → null.
    */
  case class Int8Dot(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[Bridge.AbstractType] =
      Seq(ArrayType(ByteType), ArrayType(ByteType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_int8_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      // loud reject, not silent truncation: a dot over min(len) quietly
      // mis-scores mixed-dimension codes (repo-wide loud-reject policy)
      if (n != y.numElements()) throw new IllegalArgumentException(
        s"graft_int8_dot: code dimension mismatch ($n vs ${y.numElements()})")
      var dot = 0L
      var i = 0
      while (i < n) {
        dot += x.getByte(i).toLong * y.getByte(i).toLong
        i += 1
      }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  throw new IllegalArgumentException(
           |    "graft_int8_dot: code dimension mismatch (" + $n + " vs " +
           |      $b.numElements() + ")");
           |}
           |long $dot = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += (long) $a.getByte($i) * (long) $b.getByte($i);
           |}
           |${ev.value} = $dot;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Int8Dot =
      copy(left = newLeft, right = newRight)
  }

  /** Fused int8 scalar quantization: l2-normalize a double array and
    * round each dimension to `round(x·127)` (BigDecimal HALF_UP — the
    * exact semantics of Spark's `round`, so codes match the composed
    * `transform(l2_normalize(v), x -> round(x*127))` form bit-for-bit and
    * stay replayable by the oracle) in ONE pass over the array — the
    * composed form evaluates its lambda interpreted per element, which
    * measured SLOWER than the exact double-vector scan it is meant to
    * beat (16.1 s vs 6.8 s at 400k×100; see SCALE.md web section).
    * Zero-norm input → all-zero codes (0/0 = NaN rounds to 0 in the
    * composed form too). Null (top-level) → null.
    */
  case class Sq8Encode(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def prettyName: String = "graft_sq8_encode"

    protected def kernel(a: ArrayData): ArrayData = {
      val n = a.numElements()
      var ss = 0.0
      var i = 0
      while (i < n) { val v = a.getDouble(i); ss += v * v; i += 1 }
      val norm = math.sqrt(ss)
      val out = new Array[Byte](n)
      i = 0
      while (i < n) {
        val u = a.getDouble(i) / norm * 127.0
        out(i) =
          if (java.lang.Double.isNaN(u)) 0.toByte
          else java.math.BigDecimal.valueOf(u)
            .setScale(0, java.math.RoundingMode.HALF_UP).byteValue()
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }

    override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("sq8", this, classOf[Sq8Encode].getName)
      defineCodeGen(ctx, ev, a => s"$self.kernel($a)")
    }

    override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
      copy(child = newChild)
  }

  /** HTML main-content extraction as one fused kernel call — see
    * `text/HtmlExtract` for the algorithm and the Column-algebra twin the
    * spec compares against. The kernel walks the page once per row inside
    * whole-stage codegen; the composed form paid an interpreted HOF
    * lambda per block segment. Null → null.
    */
  case class HtmlMainContent(child: Expression, minChars: Int,
                             maxLinkDensity: Double)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_html_main_content"

    /** Row kernel — public so generated code can call it. */
    def kernel(html: org.apache.spark.unsafe.types.UTF8String)
        : org.apache.spark.unsafe.types.UTF8String =
      org.apache.spark.unsafe.types.UTF8String.fromString(
        graft.text.HtmlExtract.mainContentKernel(
          html.toString, minChars, maxLinkDensity))

    override def nullSafeEval(a: Any): Any =
      kernel(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("htmlMain", this,
        classOf[HtmlMainContent].getName)
      defineCodeGen(ctx, ev, a => s"$self.kernel($a)")
    }

    override protected def withNewChildInternal(newChild: Expression): HtmlMainContent =
      copy(child = newChild)
  }

  /** F-UDF1 as a native expression: clamped piecewise-linear interpolation
    * of `value` against a sorted `thresholds` vector with matching `pcts`
    * levels (reference `metrics/anomalies.py:162-170`). NaN value or empty
    * thresholds → null, like the kernel it replaces.
    */
  case class PercentileRank(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[Bridge.AbstractType] =
      Seq(DoubleType, ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_percentile_rank"

    override def nullSafeEval(v: Any, thrAny: Any, pcAny: Any): Any = {
      val value = v.asInstanceOf[Double]
      val thr = thrAny.asInstanceOf[ArrayData]
      val pct = pcAny.asInstanceOf[ArrayData]
      val n = thr.numElements()
      // loud on a levels/thresholds length mismatch: pct.getDouble(n-1)
      // on a shorter UnsafeArrayData has no bounds check and would return
      // an arbitrary adjacent-memory double
      if (pct.numElements() < n) throw new IllegalArgumentException(
        s"graft_percentile_rank: ${pct.numElements()} percentile levels " +
          s"for $n thresholds")
      if (value.isNaN || n == 0) null
      else if (value <= thr.getDouble(0)) pct.getDouble(0)
      else if (value >= thr.getDouble(n - 1)) pct.getDouble(n - 1)
      else {
        var i = 0
        while (i < n - 1 && value > thr.getDouble(i + 1)) i += 1
        val t0 = thr.getDouble(i); val t1 = thr.getDouble(i + 1)
        val p0 = pct.getDouble(i); val p1 = pct.getDouble(i + 1)
        if (t1 == t0) p0 else p0 + (p1 - p0) * (value - t0) / (t1 - t0)
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, thr, pct) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |int $n = $thr.numElements();
           |if ($pct.numElements() < $n) {
           |  throw new IllegalArgumentException(
           |    "graft_percentile_rank: " + $pct.numElements() +
           |      " percentile levels for " + $n + " thresholds");
           |}
           |if (Double.isNaN($v) || $n == 0) {
           |  ${ev.isNull} = true;
           |} else if ($v <= $thr.getDouble(0)) {
           |  ${ev.value} = $pct.getDouble(0);
           |} else if ($v >= $thr.getDouble($n - 1)) {
           |  ${ev.value} = $pct.getDouble($n - 1);
           |} else {
           |  int $i = 0;
           |  while ($i < $n - 1 && $v > $thr.getDouble($i + 1)) $i++;
           |  double t0 = $thr.getDouble($i);
           |  double t1 = $thr.getDouble($i + 1);
           |  double p0 = $pct.getDouble($i);
           |  double p1 = $pct.getDouble($i + 1);
           |  ${ev.value} = (t1 == t0) ? p0 : p0 + (p1 - p0) * ($v - t0) / (t1 - t0);
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression, newThird: Expression): PercentileRank =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** MinHash signature of a gram-hash set in one fused pass: for each of k
    * seeded universal-hash permutations h_i(x) = (a_i·pmod(x,p) + b_i) mod p,
    * the minimum over the set — all k minima maintained in a single scan of
    * the array. Replaces the explode → k min-aggregates pipeline in
    * [[graft.dedup.Dedup.minhashSignatures]] (k·|gs| aggregate updates plus
    * the row explosion) with a per-row loop inside whole-stage codegen.
    * Identical arithmetic → identical signatures. Empty/null set → null
    * (the agg form dropped such docs; callers filter nulls).
    */
  case class MinHashSignature(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
      extends UnaryExpression with ExpectsInputTypes {
    require(a.length == b.length && a.nonEmpty, "coefficient vectors must match")

    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_minhash_signature"

    @transient private lazy val aArr: Array[Long] = a.toArray
    @transient private lazy val bArr: Array[Long] = b.toArray

    override def nullSafeEval(gsAny: Any): Any = {
      val gs = gsAny.asInstanceOf[ArrayData]
      val n = gs.numElements()
      if (n == 0) null
      else {
        val k = aArr.length
        val mins = Array.fill(k)(Long.MaxValue)
        var i = 0
        while (i < n) {
          val h = java.lang.Math.floorMod(gs.getLong(i), p) // pmod semantics
          var j = 0
          while (j < k) {
            val v = (h * aArr(j) + bArr(j)) % p // h,a < p=2^31-1: no overflow
            if (v < mins(j)) mins(j) = v
            j += 1
          }
          i += 1
        }
        UnsafeArrayData.fromPrimitiveArray(mins)
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, gs => {
        val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
        val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val j = ctx.freshName("j"); val h = ctx.freshName("h")
        val v = ctx.freshName("v"); val mins = ctx.freshName("mins")
        s"""
           |int $n = $gs.numElements();
           |if ($n == 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  int k = $aRef.length;
           |  long[] $mins = new long[k];
           |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |  for (int $i = 0; $i < $n; $i++) {
           |    long $h = java.lang.Math.floorMod($gs.getLong($i), ${p}L);
           |    for (int $j = 0; $j < k; $j++) {
           |      long $v = ($h * $aRef[$j] + $bRef[$j]) % ${p}L;
           |      if ($v < $mins[$j]) $mins[$j] = $v;
           |    }
           |  }
           |  ${ev.value} =
           |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)
  }

  /** Distinct word-n-gram hash set of a token array, computed scan-locally
    * in one pass: hash each token once (XXH64 over its UTF-8 bytes), chain
    * n consecutive token hashes into an order-sensitive gram hash, then
    * sort + dedupe in place. Replaces the former
    * tokens → per-gram `slice`/`concat_ws` (interpreted HOF lambdas) →
    * `array_distinct` → `explode` → `xxhash64` → `collect_set` pipeline —
    * i.e. it deletes BOTH the per-gram string materialization and the
    * groupBy(id) SHUFFLE that only existed to reassemble per-doc sets the
    * scan already had. Gram-hash VALUES differ from the old string-xxhash64
    * scheme; nothing observable depends on them (only intersection counts
    * and minhash permutations of the set, with collision probability
    * ~2⁻⁶⁴ either way).
    *
    * Fewer than n tokens → empty set (such docs simply share nothing).
    */
  case class GramHashes(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(n >= 1, s"gram width must be positive, got $n")

    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_gram_hashes"

    /** Row kernel — public so generated code can call it (one virtual call
      * per row; the loops inside are JIT-compiled bytecode).
      */
    def compute(toksAny: ArrayData): ArrayData = {
      val nTok = toksAny.numElements()
      val m = nTok - n + 1
      if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
      val th = new Array[Long](nTok)
      var i = 0
      while (i < nTok) {
        val s = toksAny.getUTF8String(i)
        th(i) =
          if (s == null) 0L
          else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        i += 1
      }
      val g = new Array[Long](m)
      i = 0
      while (i < m) {
        var acc = 42L
        var j = 0
        while (j < n) { acc = XXH64.hashLong(th(i + j), acc); j += 1 }
        g(i) = acc
        i += 1
      }
      java.util.Arrays.sort(g)
      var w = 1
      i = 1
      while (i < m) {
        if (g(i) != g(w - 1)) { g(w) = g(i); w += 1 }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(
        if (w == m) g else java.util.Arrays.copyOf(g, w))
    }

    override def nullSafeEval(toksAny: Any): Any =
      compute(toksAny.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, toks => {
        val ref = ctx.addReferenceObj("gramHashes", this, classOf[GramHashes].getName)
        s"${ev.value} = $ref.compute($toks);"
      })

    override protected def withNewChildInternal(newChild: Expression): GramHashes =
      copy(child = newChild)
  }

  /** Raw text → distinct word-n-gram hash set in ONE character scan,
    * fusing normalize (lowercase, non-alphanumeric → boundary, collapse
    * whitespace) + tokenize + [[GramHashes]] — i.e. it replaces three
    * regexp passes, a split and a token-array materialization per row with
    * a single loop. Boundary semantics are IDENTICAL to
    * `lower → regexp_replace('[^a-z0-9\\s]', ' ') → split('\\s+')`:
    * every kept character is ASCII `[a-z0-9]` after per-char lowercasing,
    * and any character that is not is a token boundary — so multi-char
    * lowercase expansions (the İ case) and supplementary-plane units
    * land on the same tokens as the regex pipeline.
    *
    * Token hashes are 64-bit FNV-1a over the kept chars; gram hashes chain
    * n consecutive token hashes through XXH64. The VALUES differ from
    * [[GramHashes]] — nothing observable depends on them (intersection
    * counts and minhash permutations only; collisions ~2⁻⁶⁴).
    */
  /** Shared char-scan tokenizer kernel for [[TextGramHashes]] /
    * [[TextGramHashSeq]]: one pass over the string, FNV-1a 64 hash per
    * token, boundary semantics identical to
    * `lower → regexp_replace('[^a-z0-9\\s]', ' ') → split('\\s+')`
    * (see [[TextGramHashes]]'s scaladoc for the İ caveat). Returns the
    * token hashes in document order, exactly sized.
    */
  def fnvTokenHashes(tAny: org.apache.spark.unsafe.types.UTF8String): Array[Long] = {
    val s = tAny.toString
    val len = s.length
    var tok = new Array[Long](32)
    var nTok = 0
    val basis = -3750763034362895579L // FNV-1a 64 offset basis
    var h = basis
    var inTok = false
    var i = 0
    while (i < len) {
      val c0 = s.charAt(i)
      if (c0 == 'İ') {
        // İ is Unicode's ONLY unconditional multi-char lowercase mapping
        // (i + combining dot above): the regex pipeline keeps the i and
        // turns the combining mark into a boundary — mirror that exactly
        h = (h ^ 'i') * 1099511628211L
        if (nTok == tok.length) tok = java.util.Arrays.copyOf(tok, nTok * 2)
        tok(nTok) = h; nTok += 1
        h = basis; inTok = false
      } else {
        val c = Character.toLowerCase(c0)
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
          h = (h ^ c) * 1099511628211L // FNV-1a 64 prime
          inTok = true
        } else if (inTok) {
          if (nTok == tok.length) tok = java.util.Arrays.copyOf(tok, nTok * 2)
          tok(nTok) = h; nTok += 1
          h = basis; inTok = false
        }
      }
      i += 1
    }
    if (inTok) {
      if (nTok == tok.length) tok = java.util.Arrays.copyOf(tok, nTok + 1)
      tok(nTok) = h; nTok += 1
    }
    if (nTok == tok.length) tok else java.util.Arrays.copyOf(tok, nTok)
  }

  case class TextGramHashes(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(n >= 1, s"gram width must be positive, got $n")

    override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_text_gram_hashes"

    /** Row kernel — public so generated code can call it. */
    def compute(tAny: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val tok = fnvTokenHashes(tAny)
      val nTok = tok.length
      val m = nTok - n + 1
      if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
      val g = new Array[Long](m)
      var i = 0
      while (i < m) {
        var acc = 42L
        var j = 0
        while (j < n) { acc = XXH64.hashLong(tok(i + j), acc); j += 1 }
        g(i) = acc
        i += 1
      }
      java.util.Arrays.sort(g)
      var w = 1
      i = 1
      while (i < m) {
        if (g(i) != g(w - 1)) { g(w) = g(i); w += 1 }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(
        if (w == m) g else java.util.Arrays.copyOf(g, w))
    }

    override def nullSafeEval(tAny: Any): Any =
      compute(tAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        val ref = ctx.addReferenceObj("textGramHashes", this, classOf[TextGramHashes].getName)
        s"${ev.value} = $ref.compute($t);"
      })

    override protected def withNewChildInternal(newChild: Expression): TextGramHashes =
      copy(child = newChild)
  }

  /** POSITIONAL word-n-gram hashes: element `i` of the output is the hash
    * of the gram starting at token position `i` (0-based), in document
    * order, duplicates kept — `posexplode` over it yields `(pos, gh)`
    * pairs, which is what span-level dedup needs ([[TextGramHashes]]'s
    * sorted distinct set serves the set-similarity family instead).
    * Same fused single-scan tokenizer ([[fnvTokenHashes]]), same gram
    * hash chain, so the two expressions agree on which grams exist.
    * Fewer than `n` tokens → empty array. Null text → null.
    */
  case class TextGramHashSeq(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(n >= 1, s"gram width must be positive, got $n")

    override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_text_gram_hash_seq"

    /** Row kernel — public so generated code can call it. */
    def compute(tAny: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val tok = fnvTokenHashes(tAny)
      val m = tok.length - n + 1
      if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
      val g = new Array[Long](m)
      var i = 0
      while (i < m) {
        var acc = 42L
        var j = 0
        while (j < n) { acc = XXH64.hashLong(tok(i + j), acc); j += 1 }
        g(i) = acc
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(g)
    }

    override def nullSafeEval(tAny: Any): Any =
      compute(tAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        val ref = ctx.addReferenceObj("textGramHashSeq", this, classOf[TextGramHashSeq].getName)
        s"${ev.value} = $ref.compute($t);"
      })

    override protected def withNewChildInternal(newChild: Expression): TextGramHashSeq =
      copy(child = newChild)
  }

  /** Raw text → map(term → count) in ONE character scan, fusing normalize
    * (lowercase, non-alphanumeric → boundary) + tokenize + per-document
    * term counting. Replaces the `explode(split(normalize(text)))` +
    * `groupBy(id, term)` shape with a row-LOCAL kernel: term frequencies
    * never cross the network because they never leave the row — at corpus
    * scale that deletes the largest shuffle of the TF-IDF pipeline (the
    * exploded token stream) outright. Boundary semantics are identical to
    * `lower → regexp_replace('[^a-z0-9\\s]', ' ') → split('\\s+')` (see
    * [[TextGramHashes]] for the İ caveat), so the term STRINGS — which are
    * part of the output here, unlike the hash kernels — replay exactly in
    * the SQL oracles. Keys surface in first-appearance order
    * (deterministic); blank text → empty map; null → null.
    */
  case class TokenCounts(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
    override def dataType: DataType =
      MapType(StringType, LongType, valueContainsNull = false)
    override def prettyName: String = "graft_token_counts"

    /** Row kernel — public so generated code can call it. */
    def compute(tAny: org.apache.spark.unsafe.types.UTF8String): ArrayBasedMapData = {
      val s = tAny.toString
      val len = s.length
      val counts = new java.util.LinkedHashMap[String, java.lang.Long]()
      val sb = new java.lang.StringBuilder(16)
      def flush(): Unit = if (sb.length > 0) {
        val k = sb.toString
        val c = counts.get(k)
        counts.put(k, if (c == null) 1L else c + 1L)
        sb.setLength(0)
      }
      var i = 0
      while (i < len) {
        val c0 = s.charAt(i)
        if (c0 == 'İ') {
          // mirror the regex pipeline: lowercase keeps the i, the combining
          // dot above becomes a boundary (see fnvTokenHashes)
          sb.append('i'); flush()
        } else {
          val c = Character.toLowerCase(c0)
          if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
          else flush()
        }
        i += 1
      }
      flush()
      val n = counts.size
      val keys = new Array[Any](n)
      val vals = new Array[Long](n)
      var w = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        keys(w) = org.apache.spark.unsafe.types.UTF8String.fromString(e.getKey)
        vals(w) = e.getValue.longValue()
        w += 1
      }
      new ArrayBasedMapData(
        new GenericArrayData(keys), UnsafeArrayData.fromPrimitiveArray(vals))
    }

    override def nullSafeEval(tAny: Any): Any =
      compute(tAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        val ref = ctx.addReferenceObj("tokenCounts", this, classOf[TokenCounts].getName)
        s"${ev.value} = $ref.compute($t);"
      })

    override protected def withNewChildInternal(newChild: Expression): TokenCounts =
      copy(child = newChild)
  }

  /** Product-quantization encoder in one fused pass: L2-normalize the
    * vector, then per subspace pick the nearest codebook centroid —
    * `m·k·(dim/m)` multiplies per row with zero intermediate arrays. The
    * composed `transform`/`zip_with`/`aggregate` form this replaces is
    * interpreted (higher-order functions don't codegen) and re-evaluated
    * the normalize subtree per centroid — ~100× slower at corpus scale.
    * Arithmetic is bit-identical to the composed form (division by the
    * norm, left-to-right sums, first-wins argmin), so results and the
    * pinned oracles are unchanged.
    */
  case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]],
                      normalize: Boolean = true)
      extends UnaryExpression with ExpectsInputTypes {
    require(books.nonEmpty && books.head.nonEmpty && books.head.head.nonEmpty,
      "codebooks must be m × k × sub, all non-empty")

    private val m = books.size
    private val k = books.head.size
    private val sub = books.head.head.size

    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_pq_encode"

    // flattened [(j*k + c)*sub + t] for branch-free indexed access
    @transient private lazy val flat: Array[Double] =
      books.flatten.flatten.toArray

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val dim = m * sub
      // loud reject like PqLuts/NearestCentroid: UnsafeArrayData.getDouble
      // has no bounds check, so a short vector would encode adjacent row
      // bytes into plausible-looking garbage codes
      if (v.numElements() != dim) throw new IllegalArgumentException(
        s"graft_pq_encode: vector has ${v.numElements()} elements, " +
          s"codebooks expect m×sub = $dim — malformed embedding")
      var ss = 0.0
      var i = 0
      while (i < dim) { val x = v.getDouble(i); ss += x * x; i += 1 }
      // Branch on `normalize` itself, never on nrm == 0.0: residual encoding
      // (normalize=false) must NOT rescale its input, while an all-zero
      // vector under normalize=true divides 0/0 → NaN distances → code 0 in
      // every subspace, bit-identical to the composed normalize subtree.
      val nrm = math.sqrt(ss)
      val codes = new Array[Int](m)
      var j = 0
      while (j < m) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val base = (j * k + c) * sub
          var d = 0.0; var t = 0
          while (t < sub) {
            val u = if (normalize) v.getDouble(j * sub + t) / nrm
                    else v.getDouble(j * sub + t)
            val x = u - flat(base + t)
            d += x * x; t += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        codes(j) = best
        j += 1
      }
      UnsafeArrayData.fromPrimitiveArray(codes)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val fRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
        val ss = ctx.freshName("ss"); val nrm = ctx.freshName("nrm")
        val codes = ctx.freshName("codes"); val i = ctx.freshName("i")
        val j = ctx.freshName("j"); val c = ctx.freshName("c")
        val t = ctx.freshName("t"); val d = ctx.freshName("d")
        val u = ctx.freshName("u"); val x = ctx.freshName("x")
        val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
        val base = ctx.freshName("base")
        val vv = ctx.freshName("vv")
        s"""
           |if ($v.numElements() != ${m * sub}) {
           |  throw new IllegalArgumentException(
           |    "graft_pq_encode: vector has " + $v.numElements() +
           |      " elements, codebooks expect m×sub = ${m * sub} — malformed embedding");
           |}
           |double $ss = 0.0;
           |for (int $i = 0; $i < ${m * sub}; $i++) {
           |  double $vv = $v.getDouble($i); $ss += $vv * $vv;
           |}
           |double $nrm = java.lang.Math.sqrt($ss);
           |int[] $codes = new int[$m];
           |for (int $j = 0; $j < $m; $j++) {
           |  int $best = 0; double $bestD = Double.MAX_VALUE;
           |  for (int $c = 0; $c < $k; $c++) {
           |    int $base = ($j * $k + $c) * $sub;
           |    double $d = 0.0;
           |    for (int $t = 0; $t < $sub; $t++) {
           |      double $u = $normalize ? $v.getDouble($j * $sub + $t) / $nrm
           |                             : $v.getDouble($j * $sub + $t);
           |      double $x = $u - $fRef[$base + $t];
           |      $d += $x * $x;
           |    }
           |    if ($d < $bestD) { $bestD = $d; $best = $c; }
           |  }
           |  $codes[$j] = $best;
           |}
           |${ev.value} =
           |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): PqEncode =
      copy(child = newChild)
  }

  /** ADC lookup score: `Σ_j luts[j][codes[j]]` — the per-candidate cost of
    * a PQ similarity scan, fused so the hot cross-join pair loop does m
    * array reads and adds instead of interpreted zip_with/aggregate
    * allocations. Left-to-right sum, identical to the composed form.
    */
  case class PqAdc(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[Bridge.AbstractType] =
      Seq(ArrayType(ArrayType(DoubleType)), ArrayType(IntegerType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_pq_adc"

    override def nullSafeEval(lutsAny: Any, codesAny: Any): Any = {
      val luts = lutsAny.asInstanceOf[ArrayData]
      val codes = codesAny.asInstanceOf[ArrayData]
      // a subspace-count mismatch means the LUTs and codes came from
      // DIFFERENT codebooks (e.g. stale codes after retraining with a new
      // m) — summing a truncated prefix would be quietly wrong scores
      if (luts.numElements() != codes.numElements())
        throw new IllegalArgumentException(
          s"graft_pq_adc: ${luts.numElements()} LUTs vs " +
            s"${codes.numElements()} codes — mismatched codebooks")
      val m = codes.numElements()
      var s = 0.0
      var j = 0
      while (j < m) {
        val lut = luts.getArray(j)
        val code = codes.getInt(j)
        // same stale-codebook class as the m check: codes written with a
        // larger k than the LUTs were built with would read out of bounds
        // (no UnsafeArrayData bounds check) — quietly wrong scores
        if (code < 0 || code >= lut.numElements())
          throw new IllegalArgumentException(
            s"graft_pq_adc: code $code outside LUT of ${lut.numElements()} " +
              "entries — stale codes for a retrained codebook")
        s += lut.getDouble(code)
        j += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, c) => {
        val j = ctx.freshName("j"); val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val lut = ctx.freshName("lut"); val code = ctx.freshName("code")
        s"""
           |if ($l.numElements() != $c.numElements()) {
           |  throw new IllegalArgumentException(
           |    "graft_pq_adc: " + $l.numElements() + " LUTs vs " +
           |    $c.numElements() + " codes — mismatched codebooks");
           |}
           |int $n = $c.numElements();
           |double $s = 0.0;
           |for (int $j = 0; $j < $n; $j++) {
           |  org.apache.spark.sql.catalyst.util.ArrayData $lut = $l.getArray($j);
           |  int $code = $c.getInt($j);
           |  if ($code < 0 || $code >= $lut.numElements()) {
           |    throw new IllegalArgumentException(
           |      "graft_pq_adc: code " + $code + " outside LUT of " +
           |        $lut.numElements() + " entries — stale codes for a retrained codebook");
           |  }
           |  $s += $lut.getDouble($code);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqAdc =
      copy(left = newLeft, right = newRight)
  }

  /** Per-query ADC lookup tables in one fused pass:
    * `luts[j][c] = ⟨u_j, books[j][c]⟩` over the (already normalized) query
    * vector — the companion of [[PqAdc]] on the probe side. The composed
    * form this replaces was an m × k tree of
    * `aggregate(zip_with(slice(u), lit(book)), …)` subexpressions —
    * ~2,000 interpreted expression nodes that the analyzer re-walked on
    * EVERY serve call (a measured 0.3–0.5 s of driver planning per batch
    * in q_ivfpq_served) and that allocated a zipped array per dot product
    * at eval time. Summation is left-to-right per subspace, bit-identical
    * to the composed form, so every derived oracle replay is unchanged.
    */
  case class PqLuts(child: Expression, books: Seq[Seq[Seq[Double]]])
      extends UnaryExpression with ExpectsInputTypes {
    require(books.nonEmpty && books.head.nonEmpty && books.head.head.nonEmpty,
      "codebooks must be m × k × sub, all non-empty")

    private val m = books.size
    private val k = books.head.size
    private val sub = books.head.head.size

    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType =
      ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
    override def prettyName: String = "graft_pq_luts"

    // flattened [(j*k + c)*sub + t], same layout as PqEncode
    @transient private lazy val flat: Array[Double] =
      books.flatten.flatten.toArray

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      // UnsafeArrayData.getDouble has no bounds check: a short vector
      // would read adjacent row memory into garbage LUTs — reject loudly
      if (v.numElements() != m * sub)
        throw new IllegalArgumentException(
          s"graft_pq_luts: vector of ${v.numElements()} dims, codebooks " +
            s"expect ${m * sub}")
      val rows = new Array[AnyRef](m)
      var j = 0
      while (j < m) {
        val row = new Array[Double](k)
        var c = 0
        while (c < k) {
          val base = (j * k + c) * sub
          var s = 0.0
          var t = 0
          while (t < sub) {
            s += v.getDouble(j * sub + t) * flat(base + t)
            t += 1
          }
          row(c) = s
          c += 1
        }
        rows(j) = UnsafeArrayData.fromPrimitiveArray(row)
        j += 1
      }
      new GenericArrayData(rows)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val fRef = ctx.addReferenceObj("pqLutBooks", flat, "double[]")
        val rows = ctx.freshName("rows"); val row = ctx.freshName("row")
        val j = ctx.freshName("j"); val c = ctx.freshName("c")
        val t = ctx.freshName("t"); val s = ctx.freshName("s")
        val base = ctx.freshName("base")
        s"""
           |if ($v.numElements() != ${m * sub}) {
           |  throw new IllegalArgumentException(
           |    "graft_pq_luts: vector of " + $v.numElements() +
           |    " dims, codebooks expect ${m * sub}");
           |}
           |Object[] $rows = new Object[$m];
           |for (int $j = 0; $j < $m; $j++) {
           |  double[] $row = new double[$k];
           |  for (int $c = 0; $c < $k; $c++) {
           |    int $base = ($j * $k + $c) * $sub;
           |    double $s = 0.0;
           |    for (int $t = 0; $t < $sub; $t++) {
           |      $s += $v.getDouble($j * $sub + $t) * $fRef[$base + $t];
           |    }
           |    $row[$c] = $s;
           |  }
           |  $rows[$j] =
           |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($row);
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): PqLuts =
      copy(child = newChild)
  }

  /** Nearest-centroid assignment (`argmin_c ‖v − c‖²`) as a fused codegen
    * expression — the IVF cell assignment for the whole corpus without
    * detouring every row through an MLlib `Vector` conversion and model
    * transform. Centroids inline as one flat double[] reference (nlist ×
    * dim doubles — tiny). Ties resolve to the lowest cell id (strict <),
    * matching the probe-side ordering. Null vector → null.
    */
  /** L2 normalization of a float/double vector in one fused loop —
    * replaces the composed `transform`/`aggregate` higher-order-function
    * form, whose lambda re-evaluates the full norm subtree PER ELEMENT
    * (O(dim²) interpreted, boxed ops: measured ~0.5 ms/row at dim 64,
    * which made the 2000-row SemDeDup assignment projection the dominant
    * cost of the whole query — see SCALE.md). Semantics identical to the
    * HOF form: left-to-right Σx² accumulation from 0.0, then x/√Σ per
    * element in order; zero-norm input returns the vector unchanged
    * (as doubles). Null array → null.
    */
  case class L2Normalize(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[Bridge.AbstractType] =
      Seq(Bridge.typeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_l2_normalize"

    @transient private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    /** Row kernel — public so generated code can call it. */
    def compute(v: ArrayData): ArrayData = {
      val n = v.numElements()
      val out = new Array[Double](n)
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        out(i) = x; s += x * x; i += 1
      }
      val norm = math.sqrt(s)
      if (norm != 0.0) {
        i = 0
        while (i < n) { out(i) = out(i) / norm; i += 1 }
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val ref = ctx.addReferenceObj("l2normalize", this,
          classOf[L2Normalize].getName)
        s"${ev.value} = $ref.compute($v);"
      })

    override protected def withNewChildInternal(newChild: Expression): L2Normalize =
      copy(child = newChild)
  }

  /** All `bits` hyperplane sign tests in ONE fused loop over the vector —
    * replaces a per-bit `zip_with`+`aggregate` chain (bits × dim
    * interpreted boxed ops per corpus row; the LSH signature runs over the
    * ENTIRE corpus, so this was the same O(dim²)-class cost L2Normalize
    * had). Bit `i` is set iff `dot(vec, planes(i)) >= 0`, with the same
    * left-to-right accumulation from 0.0 as the composed form, so the
    * signatures — and the SQL-replayed LSH oracles — are bit-identical.
    */
  case class HyperplaneSignature(child: Expression, planes: Seq[Seq[Double]])
      extends UnaryExpression with ExpectsInputTypes {
    require(planes.nonEmpty && planes.forall(_.size == planes.head.size),
      "HyperplaneSignature: planes must be non-empty and rectangular")
    // the signature packs one bit per plane into a Long: 1L << b for
    // b >= 64 silently aliases onto bits 0..63 — plane 64 would OR into
    // bit 0 and LSH buckets would merge unrelated vectors with no error
    require(planes.size <= 64,
      s"HyperplaneSignature: ${planes.size} planes exceed the 64-bit " +
        "signature word — split into multiple signatures")

    override def inputTypes: Seq[Bridge.AbstractType] =
      Seq(Bridge.typeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hyperplane_signature"

    private val bits = planes.size
    private val dim = planes.head.size
    @transient private lazy val flat: Array[Double] = planes.flatten.toArray
    @transient private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    /** Row kernel — public so generated code can call it. A dimension
      * mismatch fails loudly like [[NearestCentroid]]: a prefix-dot sign
      * on a malformed embedding yields a plausible-looking wrong bucket.
      */
    def compute(v: ArrayData): Long = {
      if (v.numElements() != dim)
        throw new IllegalArgumentException(
          s"graft_hyperplane_signature: vector has ${v.numElements()} " +
            s"elements, planes have $dim — malformed embedding")
      val n = dim
      var sig = 0L
      var b = 0
      while (b < bits) {
        val off = b * dim
        var dot = 0.0
        var i = 0
        while (i < n) {
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          dot += x * flat(off + i)
          i += 1
        }
        if (dot >= 0) sig |= 1L << b
        b += 1
      }
      sig
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val ref = ctx.addReferenceObj("hyperplaneSig", this,
          classOf[HyperplaneSignature].getName)
        s"${ev.value} = $ref.compute($v);"
      })

    override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
      copy(child = newChild)
  }

  case class NearestCentroid(child: Expression, cents: Seq[Seq[Double]])
      extends UnaryExpression with ExpectsInputTypes {
    require(cents.nonEmpty && cents.forall(_.size == cents.head.size),
      "NearestCentroid: centroids must be non-empty and rectangular")

    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_nearest_centroid"

    private val k = cents.size
    private val dim = cents.head.size
    @transient private lazy val flat: Array[Double] = cents.flatten.toArray

    /** Row kernel — public so generated code can call it. A dimension
      * mismatch fails loudly: a prefix-distance assignment on a malformed
      * embedding would produce a plausible-looking wrong cell.
      */
    def compute(v: ArrayData): Int = {
      if (v.numElements() != dim)
        throw new IllegalArgumentException(
          s"graft_nearest_centroid: vector has ${v.numElements()} elements, " +
            s"centroids have $dim — malformed embedding")
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = c * dim
        var d = 0.0; var t = 0
        while (t < dim) { val x = v.getDouble(t) - flat(off + t); d += x * x; t += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val ref = ctx.addReferenceObj("nearestCentroid", this,
          classOf[NearestCentroid].getName)
        s"${ev.value} = $ref.compute($v);"
      })

    override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
      copy(child = newChild)
  }

  /** Top-`k` nearest cells by COSINE similarity in one fused scan — the
    * probe-side counterpart of [[NearestCentroid]]: returns the `k` best
    * cell ids ordered (similarity desc, cell asc), so `explode` over it
    * replaces the crossJoin(broadcast(centroids)) + row_number Window that
    * previously ranked probe cells — an nlist× row amplification plus a
    * whole shuffle of the query side, deleted.
    *
    * Arithmetic is bit-identical to ranking with [[CosineSimilarity]]:
    * per-variable accumulators run left-to-right over the same elements
    * (the query norm once per row, centroid norms once at construction —
    * each variable's FP addition chain is unchanged), and the final score
    * is the same `dot / (√nx · √ny)` expression. Ties keep the lower cell
    * (strict-> displacement while scanning cells in ascending order),
    * matching the Window's `(sim desc, cell)` ordering. NaN similarities
    * (a zero-norm query or centroid) sort GREATEST, exactly like Spark's
    * descending double ordering (`nanSafeCompareDoubles`): the insertion
    * comparison treats NaN as +∞, so a degenerate centroid lands at the
    * front of the slot array — the same cell set and order the Window
    * emits — instead of squatting in the tail and blocking later real
    * scores. Dimension mismatches fail loudly, like [[NearestCentroid]].
    */
  case class NearestCentroids(child: Expression, cents: Seq[Seq[Double]], k: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(cents.nonEmpty && cents.forall(_.size == cents.head.size),
      "NearestCentroids: centroids must be non-empty and rectangular")
    require(k >= 1 && k <= cents.size,
      s"NearestCentroids: k=$k must be in [1, ${cents.size}]")

    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_nearest_centroids"

    private val nlist = cents.size
    private val dim = cents.head.size
    @transient private lazy val flat: Array[Double] = cents.flatten.toArray
    @transient private lazy val cnorm: Array[Double] = cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.size) { val x = c(i); s += x * x; i += 1 }
      math.sqrt(s)
    }.toArray

    /** Row kernel — public so generated code can call it. */
    def compute(v: ArrayData): ArrayData = {
      if (v.numElements() != dim)
        throw new IllegalArgumentException(
          s"graft_nearest_centroids: vector has ${v.numElements()} elements, " +
            s"centroids have $dim — malformed embedding")
      var nx = 0.0
      var i = 0
      while (i < dim) { val x = v.getDouble(i); nx += x * x; i += 1 }
      val snx = math.sqrt(nx)
      val simTop = new Array[Double](k)
      val cellTop = new Array[Int](k)
      var filled = 0
      var c = 0
      while (c < nlist) {
        val off = c * dim
        var dot = 0.0
        i = 0
        while (i < dim) { dot += v.getDouble(i) * flat(off + i); i += 1 }
        val sim = dot / (snx * cnorm(c))
        // insert position: first slot strictly beaten. Equal sims keep the
        // earlier (lower) cell; NaN counts as +∞ (Spark's descending double
        // ordering), so it displaces every real score but ties with other
        // NaNs — matching the Window ordering even on degenerate centroids.
        val simIsNaN = java.lang.Double.isNaN(sim)
        var p = filled
        while (p > 0 && (sim > simTop(p - 1) ||
            (simIsNaN && !java.lang.Double.isNaN(simTop(p - 1))))) p -= 1
        if (p < k) {
          val last = math.min(filled, k - 1)
          var q = last
          while (q > p) { simTop(q) = simTop(q - 1); cellTop(q) = cellTop(q - 1); q -= 1 }
          simTop(p) = sim; cellTop(p) = c
          if (filled < k) filled += 1
        }
        c += 1
      }
      UnsafeArrayData.fromPrimitiveArray(
        if (filled == k) cellTop else java.util.Arrays.copyOf(cellTop, filled))
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val ref = ctx.addReferenceObj("nearestCentroids", this,
          classOf[NearestCentroids].getName)
        s"${ev.value} = $ref.compute($v);"
      })

    override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
      copy(child = newChild)
  }

  /** Codegen'd bloom-filter membership probe over a pre-built
    * `org.apache.spark.util.sketch.BloomFilter` — replaces the Scala UDF in
    * [[graft.operators.BloomPrune]] so the probe stays inside whole-stage
    * codegen (a UDF forces boxing + a codegen boundary right where the
    * 100 TB fact scan is hottest). The filter travels as its serialized
    * bytes (the expression is part of the plan, which Spark broadcasts to
    * executors once) and is deserialized lazily per JVM.
    *
    * Accepts LongType (integral keys pre-cast by the caller, probed via
    * `mightContainLong`) and StringType (probed via the UTF-8 bytes —
    * exactly what `mightContainString` hashes, minus the String detour).
    * Null keys probe false, like the UDF it replaces (a null key can never
    * match the exact semi join that follows).
    */
  case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
      extends UnaryExpression {

    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case LongType | StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_bloom_might_contain needs a long or string key, got $other")
      }
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_bloom_might_contain"

    // Array[Byte] equality is reference-based by default, which would make
    // two semantically identical probes never compare equal — defeating plan
    // canonicalization and subexpression elimination. Compare the bytes.
    override def equals(other: Any): Boolean = other match {
      case BloomMightContain(otherChild, otherBytes) =>
        child == otherChild && java.util.Arrays.equals(filterBytes, otherBytes)
      case _ => false
    }
    override def hashCode(): Int =
      31 * child.hashCode() + java.util.Arrays.hashCode(filterBytes)

    @transient private lazy val bf: org.apache.spark.util.sketch.BloomFilter =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(filterBytes))

    /** Row kernels — public so generated code can call them. */
    def testLong(v: Long): Boolean = bf.mightContainLong(v)
    def testString(s: org.apache.spark.unsafe.types.UTF8String): Boolean =
      bf.mightContainBinary(s.getBytes)

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) false
      else child.dataType match {
        case LongType => testLong(v.asInstanceOf[Long])
        case _ => testString(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
      val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
      val c = child.genCode(ctx)
      val probe = child.dataType match {
        case LongType => s"$ref.testLong(${c.value})"
        case _ => s"$ref.testString(${c.value})"
      }
      ev.copy(
        code = code"""
          ${c.code}
          boolean ${ev.value} = false;
          if (!${c.isNull}) { ${ev.value} = $probe; }""",
        isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
      copy(child = newChild)
  }

  /** BPE-encode an array of words into the flattened token stream —
    * the scan-local half of [[graft.text.Bpe]]: the merge table rides
    * inside the expression (the plan broadcasts it once per executor),
    * each word encodes via the canonical greedy merge loop, and a
    * per-JVM-instance memo makes the Zipf-heavy hot vocabulary
    * amortize to a hash lookup. Null input → null; empty array →
    * empty array.
    */
  case class BpeEncodeWords(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_bpe_encode"

    @transient private lazy val codec = new graft.text.Bpe.Codec(merges)

    /** Row kernel — public so generated code can call it. A null array
      * ELEMENT contributes no tokens (the deliberate GramHashes guard —
      * getUTF8String would return null and NPE on .toString).
      */
    def compute(ws: ArrayData): ArrayData = {
      val n = ws.numElements()
      val out = new scala.collection.mutable.ArrayBuffer[Any](n * 2)
      var i = 0
      while (i < n) {
        if (!ws.isNullAt(i)) {
          val toks = codec.encodeWord(ws.getUTF8String(i).toString)
          var j = 0
          while (j < toks.length) {
            out += org.apache.spark.unsafe.types.UTF8String.fromString(toks(j))
            j += 1
          }
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncodeWords].getName)
        s"${ev.value} = $ref.compute($v);"
      })

    override protected def withNewChildInternal(newChild: Expression): BpeEncodeWords =
      copy(child = newChild)
  }

  /** BPE token COUNT of an array of words — [[BpeEncodeWords]] without
    * materializing the token array, for the packing/budget hot path
    * (counts are what 100 TB of packing arithmetic consumes; the
    * per-word count memoizes through the same codec).
    */
  case class BpeTokenCountWords(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_bpe_token_count"

    @transient private lazy val codec = new graft.text.Bpe.Codec(merges)

    /** Row kernel — public so generated code can call it. Null array
      * elements count zero tokens, mirroring [[BpeEncodeWords]].
      */
    def compute(ws: ArrayData): Int = {
      val n = ws.numElements()
      var total = 0
      var i = 0
      while (i < n) {
        if (!ws.isNullAt(i)) total += codec.countWord(ws.getUTF8String(i).toString)
        i += 1
      }
      total
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val ref = ctx.addReferenceObj("bpeCount", this, classOf[BpeTokenCountWords].getName)
        s"${ev.value} = $ref.compute($v);"
      })

    override protected def withNewChildInternal(newChild: Expression): BpeTokenCountWords =
      copy(child = newChild)
  }

  // ---- Column wrappers (the library-facing surface)

  def cosine_similarity(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(
      Bridge.expression(a), Bridge.expression(b)))

  def percentile_rank(value: Column, thresholds: Column, pcts: Column): Column =
    Bridge.column(PercentileRank(
      Bridge.expression(value),
      Bridge.expression(thresholds),
      Bridge.expression(pcts)))

  def minhash_signature(gramSet: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    Bridge.column(MinHashSignature(Bridge.expression(gramSet), a, b, p))

  def gram_hashes(tokens: Column, n: Int): Column =
    Bridge.column(GramHashes(Bridge.expression(tokens), n))

  def text_gram_hashes(text: Column, n: Int): Column =
    Bridge.column(TextGramHashes(Bridge.expression(text), n))

  def text_gram_hash_seq(text: Column, n: Int): Column =
    Bridge.column(TextGramHashSeq(Bridge.expression(text), n))

  def token_counts(text: Column): Column =
    Bridge.column(TokenCounts(Bridge.expression(text)))

  def nearest_centroids(vec: Column, cents: Seq[Seq[Double]], k: Int): Column =
    Bridge.column(NearestCentroids(Bridge.expression(vec), cents, k))

  def pq_encode(vec: Column, books: Seq[Seq[Seq[Double]]],
                normalize: Boolean = true): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), books, normalize))

  def pq_adc(luts: Column, codes: Column): Column =
    Bridge.column(PqAdc(Bridge.expression(luts), Bridge.expression(codes)))

  def pq_luts(u: Column, books: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqLuts(Bridge.expression(u), books))

  def nearest_centroid(vec: Column, cents: Seq[Seq[Double]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(vec), cents))

  def l2_normalize(vec: Column): Column =
    Bridge.column(L2Normalize(Bridge.expression(vec)))

  def int8_dot(a: Column, b: Column): Column =
    Bridge.column(Int8Dot(Bridge.expression(a), Bridge.expression(b)))

  def sq8_encode(vec: Column): Column =
    Bridge.column(Sq8Encode(Bridge.expression(vec)))

  def html_main_content(html: Column, minChars: Int,
                        maxLinkDensity: Double): Column =
    Bridge.column(HtmlMainContent(Bridge.expression(html), minChars, maxLinkDensity))

  def hyperplane_signature(vec: Column, planes: Seq[Seq[Double]]): Column =
    Bridge.column(HyperplaneSignature(Bridge.expression(vec), planes))

  def bpe_encode_words(words: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncodeWords(Bridge.expression(words), merges))

  def bpe_token_count_words(words: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeTokenCountWords(Bridge.expression(words), merges))

  def bloom_might_contain(key: Column, filter: org.apache.spark.util.sketch.BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    Bridge.column(BloomMightContain(Bridge.expression(key), out.toByteArray))
  }
}
