package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native-expression harness for the ANN index kernels
  * ([[graft.ann.AnnKernels]]) — the machinery that retired the PQ /
  * IVF-PQ / SQ8 per-row ScalaUDF closures (round-14 verdict item 3).
  *
  * Why a kernel object reference instead of a `doGenCode` loop like
  * [[HyperplaneSig]]: these kernels carry TRAINED state (sample-learned
  * codebooks — data, not a deterministic (p,d) function) and return
  * nested arrays; the win over ScalaUDF does not come from inlining the
  * arithmetic but from killing the per-row conversion layer. A ScalaUDF
  * pays ArrayData → CatalystTypeConverters → Seq[Float] boxing on input,
  * the closure call, then result → ArrayData conversion, and fences
  * whole-stage codegen into an interpreted Project. This expression is
  * codegen-participating: the generated code makes ONE virtual call on
  * the kernel (a reference object, same mechanism StaticInvoke uses for
  * the inet family), which reads UnsafeArrayData primitives directly
  * and returns catalyst-native values. Zero boxing, zero encoder, plans
  * inside the WholeStageCodegen span, constant planning cost.
  *
  * The per-PAIR hot path of the PQ pipelines (ADC scoring inside the
  * bucket join) is NOT a kernel — [[AdcSum]] below is a full
  * `doGenCode` loop, because it runs per candidate pair, orders of
  * magnitude hotter than the per-row encode/table stages.
  */
abstract class AnnKernel extends Serializable {
  def name: String
  def dataType: DataType
  /** null result = "no value" (malformed input row; callers filter). */
  def apply(v: ArrayData): Any
}

/** Binary kernel: (vector, cell id). */
abstract class AnnKernel2 extends Serializable {
  def name: String
  def dataType: DataType
  def apply(v: ArrayData, cell: Int): Any
}

/** One kernel call over an `array<float>` column.
  *
  * NOTE on equality: `kernel` is compared by reference, so two
  * structurally-identical kernel expressions are not `semanticEquals` —
  * fine here (each operator instantiates its kernels once and reuses
  * the Column), documented because it forfeits subexpression
  * elimination across separately-built kernels. */
case class AnnKernelExpr(child: Expression, kernel: AnnKernel)
    extends UnaryExpression {
  override def dataType: DataType = kernel.dataType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true // NULL in -> NULL out (nullSafeEval)
  override def prettyName: String = kernel.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val k = ctx.addReferenceObj("annKernel", kernel, classOf[AnnKernel].getName)
      val tmp = ctx.freshName("kernelOut")
      val javaT = CodeGenerator.javaType(dataType)
      val boxedT = CodeGenerator.boxedType(dataType)
      s"""
         |Object $tmp = $k.apply($a);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ($javaT) (($boxedT) $tmp);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One kernel call over (`array<float>`, `int` cell). */
case class AnnKernelExpr2(left: Expression, right: Expression, kernel: AnnKernel2)
    extends BinaryExpression {
  override def dataType: DataType = kernel.dataType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true // NULL in -> NULL out (nullSafeEval)
  override def prettyName: String = kernel.name

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, int), got ${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[ArrayData], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, c) => {
      val k = ctx.addReferenceObj("annKernel2", kernel, classOf[AnnKernel2].getName)
      val tmp = ctx.freshName("kernelOut")
      val javaT = CodeGenerator.javaType(dataType)
      val boxedT = CodeGenerator.boxedType(dataType)
      s"""
         |Object $tmp = $k.apply($a, $c);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ($javaT) (($boxedT) $tmp);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 over two BIGINT arrays, truncated to the SHORTER length —
  * exactly the retired sq8 `d2` closure's semantics. Distinct from
  * [[LongL2Sq]] (NULL on length mismatch) deliberately: sq8 codes keep
  * each vector's own length (no trained dimensionality exists to
  * enforce), and a NULL distance would rank FIRST in the ascending
  * top-k window — a ragged pair must score by its common prefix, as the
  * closure did, not float to the top. */
case class LongL2SqMin(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true // NULL in -> NULL out (nullSafeEval)
  override def prettyName: String = "long_l2sq_min"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0L
    while (i < n) { val d = a.getLong(i) - b.getLong(i); s += d * d; i += 1 }
    java.lang.Long.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("l2n"); val i = ctx.freshName("l2i")
      val s = ctx.freshName("l2s"); val d = ctx.freshName("l2d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ADC score: `sum over s of tab[s][codes[s]]` — the asymmetric-distance
  * lookup at the heart of every PQ scorer, executed PER CANDIDATE PAIR
  * inside the bucket join (the hottest loop of the PQ family, which is
  * why this is a full `doGenCode` loop and not a kernel call).
  * `longMode` selects the integer twins' BIGINT sum; otherwise the
  * trained-float path's sequential double sum — both exactly the
  * arithmetic of the retired `adcUdf` closures, in subspace order. */
case class AdcSum(left: Expression, right: Expression, longMode: Boolean)
    extends BinaryExpression {
  override def dataType: DataType = if (longMode) LongType else DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true // NULL in -> NULL out (nullSafeEval)
  override def prettyName: String = if (longMode) "adc_sum_q" else "adc_sum"

  private def elemType: DataType = if (longMode) LongType else DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(e, _), _), ArrayType(IntegerType, _)) if e == elemType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<array<${elemType.catalogString}>>, array<int>), " +
          s"got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val tab = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (longMode) {
      var s = 0
      var sum = 0L
      while (s < m) { sum += tab.getArray(s).getLong(codes.getInt(s)); s += 1 }
      java.lang.Long.valueOf(sum)
    } else {
      var s = 0
      var sum = 0.0
      while (s < m) { sum += tab.getArray(s).getDouble(codes.getInt(s)); s += 1 }
      java.lang.Double.valueOf(sum)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tab, codes) => {
      val m = ctx.freshName("adcM"); val s = ctx.freshName("adcS")
      val sum = ctx.freshName("adcSum")
      if (longMode) {
        s"""
           |int $m = $codes.numElements();
           |long $sum = 0L;
           |for (int $s = 0; $s < $m; $s++) {
           |  $sum += $tab.getArray($s).getLong($codes.getInt($s));
           |}
           |${ev.value} = $sum;
         """.stripMargin
      } else {
        s"""
           |int $m = $codes.numElements();
           |double $sum = 0.0;
           |for (int $s = 0; $s < $m; $s++) {
           |  $sum += $tab.getArray($s).getDouble($codes.getInt($s));
           |}
           |${ev.value} = $sum;
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
