package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** `nBits`-bit random-hyperplane LSH signature of an `array<float>`
  * embedding, as ONE native codegen expression.
  *
  * This retires the per-row ScalaUDF closures that previously computed
  * the signature ([[graft.ann.Ann.lshSignature]] /
  * [[graft.ann.Ann.lshSignatureQuantized]]) — the corpus-side
  * one-pass-over-every-vector stage of the LSH top-k and LSH pair
  * pipelines, i.e. the hottest map stage of those operators. The two
  * designs this replaces, and why:
  *
  *  - A per-row ScalaUDF: correct and compact, but an interpreted hop —
  *    every row pays Seq[Float] deserialization + closure dispatch, and
  *    it fences whole-stage codegen around the signature projection.
  *  - An unrolled `element_at` expression tree (nBits × dims terms):
  *    codegen'd, but Catalyst PLANNING cost scales with the tree
  *    (measured ~3 s per query at sf0.1, nearly all planning).
  *
  * This expression is the best of both: constant planning cost (one
  * node; the plane matrix is a reference object, not an expression
  * tree) and a `doGenCode` loop inlined into whole-stage codegen with
  * zero per-row allocation.
  *
  * Arithmetic is EXACTLY the retired closures' (their outputs are
  * verification-pinned at four scale factors, so a single flipped
  * near-zero sign bit would move hash-checked results):
  *
  *  - float path (`quantized = false`): `s += (double) v(d) * w(p,d)`
  *    — float element widened to double, multiplied by the ±1.0 double
  *    plane weight, accumulated SEQUENTIALLY in double; bit is
  *    `s > 0`.
  *  - quantized path (`quantized = true`): `s += sign(p,d) *
  *    (long) floor((double) v(d) * 1024.0)` — integer arithmetic end
  *    to end, so any engine (the DuckDB oracle included) reproduces
  *    the bit pattern exactly; bit is `s > 0`.
  *
  * Plane weights are the deterministic seed-free
  * [[graft.ann.Ann.planeWeight]] function of (plane, dim) — the same
  * source of truth the oracle twins embed as SQL literals. Dimensions
  * beyond `dims` are ignored; vectors shorter than `dims` contribute
  * only their `v.length` elements (the closures' `min(dims, v.length)`
  * bound). NULL input → NULL; NULL on non-float element types is an
  * analysis error instead (a silent wrong-width read would produce
  * garbage signatures).
  */
case class HyperplaneSig(child: Expression, nBits: Int, dims: Int, quantized: Boolean)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 30, "nBits must be in [1, 30]")
  require(dims >= 1, "dims must be >= 1")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  // NULL in → NULL out (nullSafeEval/nullSafeCodeGen): declaring it lets
  // the optimizer turn an inferred isnotnull(hyperplane_sig(v)) join-key
  // constraint into isnotnull(v) AT THE SCAN instead of evaluating the
  // whole signature a second time inside a pushed-down Filter (the
  // bucket join in Ann.bucketTopK/cosineNearDupsWith infers exactly
  // that constraint).
  override def nullIntolerant: Boolean = true
  override def prettyName: String =
    if (quantized) "hyperplane_sig_q" else "hyperplane_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.catalogString}")
  }

  /** Flattened plane matrix, row-major: weight(p, d) = planes(p*dims + d).
    * Derived (not stored) so case-class equality over (child, nBits,
    * dims, quantized) stays structural — an Array field would compare
    * by reference and defeat subexpression elimination. Recomputed
    * lazily per JVM; nBits × dims mix64 calls, negligible. */
  private lazy val planesD: Array[Double] =
    Array.tabulate(nBits * dims)(i => graft.ann.Ann.planeWeight(i / dims, i % dims))
  private lazy val planesL: Array[Long] =
    Array.tabulate(nBits * dims)(i =>
      if (graft.ann.Ann.planeWeight(i / dims, i % dims) > 0) 1L else -1L)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dims, v.numElements())
    var sig = 0
    var p = 0
    if (quantized) {
      val w = planesL
      while (p < nBits) {
        var s = 0L
        var d = 0
        val base = p * dims
        while (d < n) {
          s += w(base + d) * math.floor(v.getFloat(d).toDouble * 1024.0).toLong
          d += 1
        }
        if (s > 0L) sig |= (1 << p)
        p += 1
      }
    } else {
      val w = planesD
      while (p < nBits) {
        var s = 0.0
        var d = 0
        val base = p * dims
        while (d < n) {
          s += v.getFloat(d).toDouble * w(base + d)
          d += 1
        }
        if (s > 0.0) sig |= (1 << p)
        p += 1
      }
    }
    Integer.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("lshN"); val sig = ctx.freshName("lshSig")
      val p = ctx.freshName("lshP"); val s = ctx.freshName("lshS")
      val d = ctx.freshName("lshD"); val base = ctx.freshName("lshBase")
      if (quantized) {
        val w = ctx.addReferenceObj("lshPlanesQ", planesL, "long[]")
        s"""
           |int $n = java.lang.Math.min($dims, $a.numElements());
           |int $sig = 0;
           |for (int $p = 0; $p < $nBits; $p++) {
           |  long $s = 0L; int $base = $p * $dims;
           |  for (int $d = 0; $d < $n; $d++) {
           |    $s += $w[$base + $d] *
           |      (long) java.lang.Math.floor(((double) $a.getFloat($d)) * 1024.0);
           |  }
           |  if ($s > 0L) $sig |= (1 << $p);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      } else {
        val w = ctx.addReferenceObj("lshPlanes", planesD, "double[]")
        s"""
           |int $n = java.lang.Math.min($dims, $a.numElements());
           |int $sig = 0;
           |for (int $p = 0; $p < $nBits; $p++) {
           |  double $s = 0.0; int $base = $p * $dims;
           |  for (int $d = 0; $d < $n; $d++) {
           |    $s += ((double) $a.getFloat($d)) * $w[$base + $d];
           |  }
           |  if ($s > 0.0) $sig |= (1 << $p);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      }
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
