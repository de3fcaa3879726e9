package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

/** Runtime entry points for the exact fixed-point sum family, invoked
  * from generated code via `StaticInvoke`. */
object ExactSumRuntime {
  /** `CAST(x AS DECIMAL(_, scale))`'s unscaled value as a long.
    * Spark's double→decimal cast goes through the double's SHORTEST
    * DECIMAL representation (`BigDecimal.valueOf`, i.e.
    * `Double.toString`), not the exact binary expansion — so "1.115"
    * (binary ≈ 1.114999…) rounds HALF_UP to 112 cents. Reproduced here
    * verbatim (pinned against the real cast in `ExactSumSpec`,
    * including such ties). NULL on non-finite input or a value whose
    * unscaled form exceeds Long (mirrors the cast's NULL-on-overflow
    * under non-ANSI semantics). */
  private val Pow10 = Array(1d, 10d, 100d, 1000d, 10000d, 100000d, 1000000d)

  def cents(x: Double, scale: Int): java.lang.Long = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return null
    // Fast path — pure double arithmetic, no toString/BigDecimal: when
    // x·10^scale sits clearly away from a .5 rounding boundary, the
    // exact-binary value, the shortest-decimal value, and the computed
    // double all round to the SAME integer (they differ by ~1 ulp,
    // the guard demands a gap of max(1e-6, 8 ulp)). Anything near a
    // boundary — the 1.115-style ties where naive rounding and the
    // cast disagree — falls through to the exact slow path, so the
    // result is ALWAYS the cast's.
    if (scale < Pow10.length) {
      val y = x * Pow10(scale)
      if (Math.abs(y) < 4.0e18) {
        val n = Math.round(y)
        val gap = Math.abs(y - Math.floor(y) - 0.5)
        if (gap > 1e-6 && gap > 8 * Math.ulp(y)) return java.lang.Long.valueOf(n)
      }
    }
    try java.lang.Long.valueOf(
      java.math.BigDecimal.valueOf(x)
        .setScale(scale, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact())
    catch { case _: ArithmeticException => null }
  }

  /** Exact total of a base-2^31 split state, scaled back and cast to
    * double (round-to-nearest, the same as Spark's decimal→double).
    * Allocation-free while the total fits 2^53 (exact in double, and
    * IEEE division by 10^scale is then the correctly-rounded exact
    * quotient — identical to the BigDecimal path): running-window
    * frames re-evaluate the aggregate after EVERY row, so this fast
    * path is what keeps exact running totals window-viable. */
  def splitToDouble(hi: Long, lo: Long, scale: Int): Double = {
    if (hi > -2097152L && hi < 2097152L) { // |hi·2^31 + lo| < 2^52 + 2^32 < 2^53
      val t = (hi << 31) + lo
      if (scale < Pow10.length) return t / Pow10(scale)
    }
    new java.math.BigDecimal(
      java.math.BigInteger.valueOf(hi).shiftLeft(31)
        .add(java.math.BigInteger.valueOf(lo)))
      .movePointLeft(scale).doubleValue()
  }

  /** Exact total of a split state as DECIMAL(38,0) units — for
    * pre-aggregation shapes whose outer aggregate re-sums the partial
    * totals exactly. */
  def splitToDecimal(hi: Long, lo: Long): org.apache.spark.sql.types.Decimal =
    org.apache.spark.sql.types.Decimal(
      scala.math.BigDecimal(new java.math.BigDecimal(
        java.math.BigInteger.valueOf(hi).shiftLeft(31)
          .add(java.math.BigInteger.valueOf(lo)))), 38, 0)
}

/** Exact sum of pre-scaled long units with 94-bit capacity at long-add
  * speed — the scale-out replacement for `SUM(CAST(x AS DECIMAL))` in
  * hot aggregates.
  *
  * Spark's decimal SUM pays a per-row Decimal allocation + overflow
  * check even on the compact (long-backed) path — measured 6× slower
  * than a long sum over 60M rows. A plain `SUM(BIGINT)` is long-fast
  * but silently wraps past 2^63 (~10^12 rows × 10^7-cent values at the
  * 100-TB target). This aggregate keeps pure long arithmetic per row
  * AND survives that scale: the state is `sum = hi·2^31 + lo`, each
  * update/merge re-normalizes `lo` into [0, 2^32), so `hi` would need
  * Σ|units| ≥ 2^93 to overflow — five orders of magnitude past the
  * target. Evaluation reconstructs the exact integer via BigInteger
  * and divides by 10^scale exactly; the double result is bit-identical
  * to `CAST(SUM(decimal) AS DOUBLE)` (property-pinned in
  * `ExactSumSpec`, exercised by q01/q06/q19's oracles).
  *
  * All update/merge expressions are bitwise/add ops on longs →
  * whole-stage-codegen'd inside HashAggregateExec (a
  * TypedImperativeAggregate would force the non-codegen
  * ObjectHashAggregate path). */
case class SumSplit128(child: Expression, scale: Int, rawDecimal: Boolean = false)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType =
    if (rawDecimal) DecimalType(38, 0) else DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sum_split128"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sum_split128 requires a bigint argument (pre-scaled units), got ${other.catalogString}")
  }

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, cnt)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  private val M = Literal((1L << 31) - 1) // low-31-bit mask
  private def low(e: Expression): Expression = BitwiseAnd(e, M)
  private def high(e: Expression): Expression = ShiftRight(e, Literal(31))

  // x = (x >> 31)·2^31 + (x & M) holds for every long (two's
  // complement, arithmetic shift), so the split is exact for negative
  // units too; lo stays in [0, 2^32) because both addends are < 2^31.
  override lazy val updateExpressions: Seq[Expression] = {
    val x = child
    Seq(
      If(IsNull(x), hi, Add(Add(hi, high(x)), high(lo))),
      If(IsNull(x), lo, Add(low(lo), low(x))),
      If(IsNull(x), cnt, Add(cnt, Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(Add(hi.left, hi.right), Add(high(lo.left), high(lo.right))),
    Add(low(lo.left), low(lo.right)),
    Add(cnt.left, cnt.right))

  // SQL SUM semantics: no non-null inputs → NULL
  override lazy val evaluateExpression: Expression = If(
    EqualTo(cnt, Literal(0L)),
    Literal(null, dataType),
    if (rawDecimal)
      StaticInvoke(ExactSumRuntime.getClass, DecimalType(38, 0), "splitToDecimal",
        Seq(hi, lo), inputTypes = Seq(LongType, LongType),
        propagateNull = false, returnNullable = false)
    else
      StaticInvoke(ExactSumRuntime.getClass, DoubleType, "splitToDouble",
        Seq(hi, lo, Literal(scale)),
        inputTypes = Seq(LongType, LongType, IntegerType),
        propagateNull = false, returnNullable = false))

  override protected def withNewChildInternal(newChild: Expression): SumSplit128 =
    copy(child = newChild)
}

object ExactSum {
  import org.apache.spark.sql.graft.GraftSql

  /** exact_cents(x, scale): the unscaled long of
    * `CAST(x AS DECIMAL(_, scale))` — codegen StaticInvoke, NULL on
    * non-finite/overflow. */
  def cents(c: Column, scale: Int): Column =
    GraftSql.column(centsExpr(GraftSql.expression(c), scale))

  def centsExpr(e: Expression, scale: Int): Expression =
    StaticInvoke(ExactSumRuntime.getClass, LongType, "cents",
      Seq(e, Literal(scale)), inputTypes = Seq(DoubleType, IntegerType),
      propagateNull = true, returnNullable = true)

  /** Exact double total of pre-scaled long units (see [[SumSplit128]]). */
  def sumUnits(units: Column, scale: Int): Column =
    GraftSql.column(
      SumSplit128(GraftSql.expression(units), scale).toAggregateExpression())

  /** Exact DECIMAL(38,0) total of pre-scaled long units — for
    * pre-aggregated lattice bases whose outer sum re-aggregates the
    * exact partials. */
  def sumUnitsRaw(units: Column): Column =
    GraftSql.column(
      SumSplit128(GraftSql.expression(units), 0, rawDecimal = true)
        .toAggregateExpression())

  /** `CAST(SUM(CAST(x AS DECIMAL(_, scale))) AS DOUBLE)` — exact, at
    * long speed, overflow-safe to 2^93 summed units. */
  def sumExact(c: Column, scale: Int): Column = sumUnits(cents(c, scale), scale)
}
