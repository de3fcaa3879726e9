package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math.
  *
  * The composable formulation (`aggregate(zip_with(a, b, ...))`) walks the
  * arrays three times and allocates an intermediate array per row; these
  * expressions do one fused pass with zero allocation and participate in
  * whole-stage codegen (`doGenCode` emits the loop inline) — the
  * difference is material when scoring 10^10 corpus vectors.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true // NULL in -> NULL out (nullSafeEval)

  protected def compute(a: ArrayData, b: ArrayData, n: Int, aF: Boolean, bF: Boolean): Any

  /** Java source for the loop body; receives element-getter snippets.
    * Implementations MUST name every local via `ctx.freshName` — two
    * instances of the same expression in one generated function (a
    * predicate with two scores, a fused projection) otherwise collide
    * ("Redefinition of local variable") and Janino silently drops the
    * WHOLE predicate/projection to interpreted mode. */
  protected def loopCode(ctx: CodegenContext, a: String, b: String, n: String,
      getA: String => String, getB: String => String, result: String,
      isNull: String): String

  private def floatElem(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _)  => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _                        => None
  }

  /** Each side independently array<float> or array<double>; anything else
    * (array<int>, scalar, ...) is an analysis error — the element getters
    * are width-specific, so a wrong-width read would silently return
    * garbage numbers instead of failing. */
  override def checkInputDataTypes(): TypeCheckResult =
    (floatElem(left.dataType), floatElem(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  protected lazy val leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected lazy val rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null // dimension mismatch → NULL, not silent truncation
    else compute(a, b, a.numElements(), leftIsFloat, rightIsFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getterA = if (leftIsFloat) "getFloat" else "getDouble"
    val getterB = if (rightIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${loopCode(ctx, a, b, n, i => s"(double) $a.$getterA($i)",
                i => s"(double) $b.$getterB($i)", ev.value.toString, ev.isNull.toString)}
         |}
       """.stripMargin
    })
  }
}

/** cosine_sim(array<float|double>, array<float|double>) → double; NULL on
  * zero-norm input or dimension mismatch. */
case class CosineSim(left: Expression, right: Expression) extends VectorBinaryExpression {
  override protected def compute(a: ArrayData, b: ArrayData, n: Int, aF: Boolean, bF: Boolean): Any = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
  override protected def loopCode(ctx: CodegenContext, a: String, b: String, n: String,
      getA: String => String, getB: String => String, result: String, isNull: String): String = {
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
    val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    s"""
       |double $dot = 0.0, $na = 0.0, $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $x = ${getA(i)}; double $y = ${getB(i)};
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |if ($na == 0.0 || $nb == 0.0) { $isNull = true; }
       |else { $result = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** dot_product(array<float|double>, array<float|double>) → double. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override protected def compute(a: ArrayData, b: ArrayData, n: Int, aF: Boolean, bF: Boolean): Any = {
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }
  override protected def loopCode(ctx: CodegenContext, a: String, b: String, n: String,
      getA: String => String, getB: String => String, result: String, isNull: String): String = {
    val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
    s"""
       |double $dot = 0.0;
       |for (int $i = 0; $i < $n; $i++) { $dot += ${getA(i)} * ${getB(i)}; }
       |$result = $dot;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** l2_distance(array<float|double>, array<float|double>) → double. */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override protected def compute(a: ArrayData, b: ArrayData, n: Int, aF: Boolean, bF: Boolean): Any = {
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(s))
  }
  override protected def loopCode(ctx: CodegenContext, a: String, b: String, n: String,
      getA: String => String, getB: String => String, result: String, isNull: String): String = {
    val s0 = ctx.freshName("s"); val i = ctx.freshName("i"); val d = ctx.freshName("d")
    s"""
       |double $s0 = 0.0;
       |for (int $i = 0; $i < $n; $i++) { double $d = ${getA(i)} - ${getB(i)}; $s0 += $d * $d; }
       |$result = java.lang.Math.sqrt($s0);
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "l2_distance"
}

/** long_dot(array<bigint>, array<bigint>) → bigint — the fused scorer
  * for the floor(v·1024)-quantized integer pipelines (kNN graph,
  * NN-descent, incremental maintenance). The composable
  * `aggregate(zip_with(...))` form is a non-codegen higher-order
  * function chain that allocates an intermediate array per pair; this
  * is one inline loop inside whole-stage codegen. Exact 64-bit sums —
  * bit-identical to the fold it replaces. NULL on dimension mismatch. */
case class LongDot(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.LongType
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true // NULL in -> NULL out (nullSafeEval)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"long_dot requires array<bigint> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var s = 0L
      var i = 0
      while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
      java.lang.Long.valueOf(s)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) { $s += $a.getLong($i) * $b.getLong($i); }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "long_dot"
}

/** long_l2sq(array<bigint>, array<bigint>) → bigint — squared L2 in one
  * fused codegen loop (the Lloyd's-assignment / farthest-first scorer);
  * exact 64-bit sums, NULL on dimension mismatch. */
case class LongL2Sq(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.LongType
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true // NULL in -> NULL out (nullSafeEval)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"long_l2sq requires array<bigint> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var s = 0L
      var i = 0
      while (i < n) { val d = a.getLong(i) - b.getLong(i); s += d * d; i += 1 }
      java.lang.Long.valueOf(s)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val i = ctx.freshName("i"); val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) { long $d = $a.getLong($i) - $b.getLong($i); $s += $d * $d; }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "long_l2sq"
}

/** float_l2sq(array<float>, array<float>) → double — squared L2 with the
  * per-element subtract and multiply performed in FLOAT precision and
  * only the accumulation in double: bit-for-bit the arithmetic of a
  * scalar `Array[Float]` loop (`val d = a(i) - b(i); s += d * d`). This
  * exists so the IVF cell-assignment argmin, moved from a per-row
  * ScalaUDF over the broadcast centroid array into whole-stage codegen,
  * ranks centroids by EXACTLY the distances the trainer's scalar loop
  * produced — a double-precision subtract could flip a near-tie
  * assignment and change e08's candidate set. Strict array<float> only
  * (a double input would silently change precision); NULL on dimension
  * mismatch. */
case class FloatL2Sq(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true // NULL in -> NULL out (nullSafeEval)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"float_l2sq requires array<float> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = a.getFloat(i) - b.getFloat(i) // float subtract
        s += (d * d).toDouble                 // float multiply, double sum
        i += 1
      }
      java.lang.Double.valueOf(s)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val i = ctx.freshName("i"); val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    float $d = $a.getFloat($i) - $b.getFloat($i);
         |    $s += (double) ($d * $d);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "float_l2sq"
}

object VectorExpressions {
  /** Register SQL functions cosine_sim / dot_product / l2_distance / long_dot. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def binary(name: String, f: (Expression, Expression) => Expression)(es: Seq[Expression]): Expression = {
      if (es.length != 2)
        throw new IllegalArgumentException(s"$name requires exactly 2 arguments, got ${es.length}")
      f(es(0), es(1))
    }
    reg.createOrReplaceTempFunction("cosine_sim", binary("cosine_sim", CosineSim.apply), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product", binary("dot_product", DotProduct.apply), "scala_udf")
    reg.createOrReplaceTempFunction("l2_distance", binary("l2_distance", L2Distance.apply), "scala_udf")
    reg.createOrReplaceTempFunction("long_dot", binary("long_dot", LongDot.apply), "scala_udf")
    reg.createOrReplaceTempFunction("long_l2sq", binary("long_l2sq", LongL2Sq.apply), "scala_udf")
    reg.createOrReplaceTempFunction("float_l2sq", binary("float_l2sq", FloatL2Sq.apply), "scala_udf")
  }

  /** Column helper for [[LongDot]]; registers on demand like
    * [[graft.ann.Ann]]'s fastCosine. */
  def longDot(spark: SparkSession)(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    registerAll(spark)
    org.apache.spark.sql.functions.call_function("long_dot", a, b)
  }
}
