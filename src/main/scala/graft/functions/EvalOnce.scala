package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that pins an expensive projection to a SINGLE
  * evaluation per row.
  *
  * Catalyst's predicate pushdown substitutes a projected alias into any
  * filter above it — including filters the optimizer itself infers from
  * join-key constraints — so a pattern like
  *
  *   df.withColumn("code", expensive(v)).filter(col("code").isNotNull)
  *
  * becomes `Filter isnotnull(expensive(v)) + Project expensive(v)`: the
  * kernel runs TWICE per row (the guide-§4.4 duplicated-expensive-
  * expression shape; whole-stage codegen does not eliminate
  * subexpressions across operator boundaries). Where the filter can be
  * rewritten onto the raw input column that is always the better fix
  * (it reaches the parquet scan); EvalOnce is for the cases where it
  * cannot — null also encodes a runtime condition (the ANN kernels'
  * drop-on-mismatch), or the predicate is inferred by the optimizer
  * rather than written by us (bucket-join IsNotNull constraints).
  *
  * Mechanics: value, nullability, type and generated code all delegate
  * to the child — the column is bit-identical with or without the
  * wrapper. The ONLY behavioral declaration is `deterministic = false`,
  * which (exactly as the optimization guide prescribes for expensive
  * UDFs) forbids the optimizer from duplicating, reordering or
  * substituting the expression: pushed/inferred predicates stay ABOVE
  * the projection and test the already-computed column. The child IS
  * deterministic, so evaluation order never changes the value — the
  * flag is purely an "evaluate once" pin. Trade-off per the guide: other
  * filters cannot be pushed through the wrapping projection either, so
  * apply it to expensive kernels at the TOP of their pipelines (scan →
  * project shapes), not blanket.
  */
case class EvalOnce(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "eval_once"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EvalOnce {
  import org.apache.spark.sql.Column

  /** Column-level wrapper: `evalOnce(expensiveCol)`. */
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.GraftSql.column(
      EvalOnce(org.apache.spark.sql.graft.GraftSql.expression(c)))
}
