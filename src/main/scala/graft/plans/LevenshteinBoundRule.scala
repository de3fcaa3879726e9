package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: a filter `levenshtein(a, b) <= k` implies the far
  * cheaper bound `abs(length(a) - length(b)) <= k` — every edit changes
  * the length by at most one, so the length gap is a lower bound on the
  * edit distance. The rule ADDS the implied conjunct (keeping the
  * original), and conjuncts short-circuit left-to-right in generated
  * code, so rows whose lengths already disagree by more than `k` skip
  * the O(len²) Levenshtein kernel entirely. On a fuzzy-match filter at
  * corpus scale that is most rows.
  *
  * Matches `<=`/`<` with the distance on either side of an integer
  * literal (`k >= lev` included). Neither argument needs to be a
  * literal: the bound only compares the two lengths. Idempotent via
  * semanticEquals dedup, like [[InetContainsPrefixRule]]. */
class LevenshteinBoundRule extends Rule[LogicalPlan] with PredicateHelper {

  /** The (a, b) of a levenshtein call, ignoring the optional threshold
    * argument Spark 4 accepts. */
  private def levArgs(e: Expression): Option[(Expression, Expression)] = e match {
    // duplicating a NON-deterministic argument into the bound would
    // evaluate it twice with different draws — only rewrite pure args
    case l: Levenshtein if l.left.deterministic && l.right.deterministic =>
      Some((l.left, l.right))
    case _ => None
  }

  /** length(e), pre-folded for string literals: the optimizer's constant
    * folding would rewrite Length(Literal) on the next pass, and the
    * folded form no longer semanticEquals the freshly generated one —
    * the dedup check would miss and the fixed-point batch would add the
    * conjunct once per pass. Emitting the folded form directly keeps the
    * rule idempotent. */
  private def lengthOf(e: Expression): Expression = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) if s != null =>
      Literal(s.numChars())
    case _ => Length(e)
  }

  private def lengthGap(a: Expression, b: Expression): Expression =
    Abs(Subtract(lengthOf(a), lengthOf(b)))

  private def impliedPredicate(e: Expression): Option[Expression] = e match {
    case LessThanOrEqual(lev, k @ Literal(_, IntegerType)) =>
      levArgs(lev).map { case (a, b) => LessThanOrEqual(lengthGap(a, b), k) }
    case LessThan(lev, k @ Literal(_, IntegerType)) =>
      levArgs(lev).map { case (a, b) => LessThan(lengthGap(a, b), k) }
    case GreaterThanOrEqual(k @ Literal(_, IntegerType), lev) =>
      levArgs(lev).map { case (a, b) => LessThanOrEqual(lengthGap(a, b), k) }
    case GreaterThan(k @ Literal(_, IntegerType), lev) =>
      levArgs(lev).map { case (a, b) => LessThan(lengthGap(a, b), k) }
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
      // implied bounds go FIRST: conjuncts evaluate left-to-right, and
      // the whole point is skipping the expensive kernel
      else Filter((extra ++ conjuncts).reduce(And), child)
  }
}
