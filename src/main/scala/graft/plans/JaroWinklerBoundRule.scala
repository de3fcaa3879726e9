package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Optimizer rule: a fuzzy-match filter `jaro_winkler(a, b) >= t`
  * implies a cheap LENGTH-RATIO bound, because the Jaro similarity of
  * two strings cannot exceed (2 + min/max)/3 (at most min(|a|,|b|)
  * characters can match, and each of the two per-string match ratios is
  * bounded by min/|s|), and Winkler's prefix boost lifts a score by at
  * most 0.4·(1−j), so
  *
  *   jw ≥ t  ⟹  jaro ≥ (t − 0.4)/0.6  ⟹  min/max ≥ 5t − 4
  *   jaro ≥ t                         ⟹  min/max ≥ 3t − 2
  *
  * The rule ADDS the implied conjunct in front (conjuncts short-circuit
  * left-to-right in codegen), so a record-linkage scan skips the
  * O(len²)-ish Jaro kernel for every pair whose lengths already rule it
  * out — at a 0.9 threshold that is every pair where one string is
  * less than half the other's length. Thresholds at or below the
  * useful range (jw ≤ 0.8, jaro ≤ 2/3) produce a vacuous bound and are
  * left untouched. The ratio literal is slackened by 1e-9 so boundary
  * float rounding can only widen the kept set, never drop a true match.
  * Idempotent via semanticEquals dedup, same as
  * [[LevenshteinBoundRule]]. */
class JaroWinklerBoundRule extends Rule[LogicalPlan] with PredicateHelper {

  /** (a, b, minRatio) for a jaro/jaro-winkler threshold worth bounding. */
  private def simArgs(e: Expression, t: Double): Option[(Expression, Expression, Double)] =
    e match {
      case si: StaticInvoke if si.staticObject == graft.functions.StringSimRuntime.getClass &&
          si.arguments.length == 2 && si.arguments.forall(_.deterministic) =>
        si.functionName match {
          case "jaroWinkler" if t > 0.8 =>
            Some((si.arguments(0), si.arguments(1), 5.0 * t - 4.0 - 1e-9))
          case "jaro" if t > 2.0 / 3.0 =>
            Some((si.arguments(0), si.arguments(1), 3.0 * t - 2.0 - 1e-9))
          case _ => None
        }
      case _ => None
    }

  /** length(e), literal-folded for idempotence (see LevenshteinBoundRule). */
  private def lengthOf(e: Expression): Expression = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) if s != null =>
      Literal(s.numChars())
    case _ => Length(e)
  }

  private def bound(a: Expression, b: Expression, ratio: Double): Expression =
    GreaterThanOrEqual(
      Cast(Least(Seq(lengthOf(a), lengthOf(b))), DoubleType),
      Multiply(Literal(ratio),
        Cast(Greatest(Seq(lengthOf(a), lengthOf(b))), DoubleType)))

  private def impliedPredicate(e: Expression): Option[Expression] = e match {
    case GreaterThanOrEqual(sim, Literal(t: Double, DoubleType)) =>
      simArgs(sim, t).map { case (a, b, r) => bound(a, b, r) }
    case GreaterThan(sim, Literal(t: Double, DoubleType)) =>
      simArgs(sim, t).map { case (a, b, r) => bound(a, b, r) }
    case LessThanOrEqual(Literal(t: Double, DoubleType), sim) =>
      simArgs(sim, t).map { case (a, b, r) => bound(a, b, r) }
    case LessThan(Literal(t: Double, DoubleType), sim) =>
      simArgs(sim, t).map { case (a, b, r) => bound(a, b, r) }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extra = conjuncts.flatMap(impliedPredicate)
        .foldLeft(Seq.empty[Expression]) { (acc, p) =>
          if ((conjuncts ++ acc).exists(_.semanticEquals(p))) acc else acc :+ p
        }
      if (extra.isEmpty) f
      else Filter((extra ++ conjuncts).reduce(And), child)
  }
}
