package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
    * Null (top-level) → null; zero-norm input → NaN (matches the division
    * semantics of the composed form).
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[Bridge.AbstractType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
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
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double xv = $a.getDouble($i);
           |  double yv = $b.getDouble($i);
           |  $dot += xv * yv; $nx += xv * xv; $ny += yv * yv;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSimilarity =
      copy(left = newLeft, right = newRight)
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
}
