package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.inet.{InetFunctions, InetRuntime}

/** Optimizer rule: a filter `inet_contains('<literal v4 CIDR>', addr)`
  * implies a plain string predicate on the address TEXT — for an
  * octet-aligned prefix, `addr` must literally start with the network's
  * dotted prefix (`'10.1.0.0/16'` ⇒ `addr LIKE '10.1.%'`; `/32` ⇒
  * equality with the canonical form). The rule ADDS that conjunct and
  * keeps the original predicate, so semantics never change — but the
  * implied `StartsWith`/`EqualTo` is a plain source Filter that
  * V2ScanRelationPushDown can push into the zeek scan (S20 accepts
  * prefix predicates), where rows are skipped BEFORE field parsing. The
  * containment test itself is a black-box invoke no source can push.
  *
  * Soundness rests on [[InetFunctions.parseV4]] being strict: it accepts
  * only canonical dotted-quad text (no leading zeros, no whitespace), so
  * every address string the containment predicate accepts is canonical
  * and therefore carries the literal prefix. v6 (zero compression makes
  * text non-positional) and non-octet-aligned prefixes produce nothing.
  * Idempotent: a conjunct already present (semantically) is not re-added,
  * so the optimizer's fixed-point batch converges. */
class InetContainsPrefixRule extends Rule[LogicalPlan] with PredicateHelper {

  /** (cidr, addr) argument pair when `e` is our containment predicate —
    * the codegen StaticInvoke form, which since round 13 is the ONLY
    * shape the library emits (SQL registration, extension registration,
    * and the Column API all build [[graft.inet.InetExpressions]]'
    * StaticInvoke; the Column-API ScalaUDF wrapper is retired). */
  private def containsArgs(e: Expression): Option[(Expression, Expression)] = e match {
    case si: StaticInvoke
        if si.staticObject == InetRuntime.getClass &&
          si.functionName == "contains" && si.arguments.length == 2 =>
      Some((si.arguments.head, si.arguments(1)))
    case _ => None
  }

  private def impliedPredicate(e: Expression): Option[Expression] =
    containsArgs(e).flatMap {
      case (Literal(c: UTF8String, StringType), addr) =>
        val cidr = c.toString
        val slash = cidr.indexOf('/')
        val (net, prefix) =
          if (slash < 0) (cidr, 32) // bare address = host route
          else (cidr.substring(0, slash),
            try cidr.substring(slash + 1).toInt
            catch { case _: NumberFormatException => return None })
        InetFunctions.parseV4(net).flatMap { b =>
          prefix match {
            case 32 =>
              Some(EqualTo(addr,
                Literal(UTF8String.fromString(InetFunctions.render(b)), StringType)))
            case 8 | 16 | 24 =>
              val p = (0 until prefix / 8).map(i => b(i) & 0xff).mkString("", ".", ".")
              Some(StartsWith(addr, Literal(UTF8String.fromString(p), StringType)))
            case _ => None
          }
        }
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
      else Filter((conjuncts ++ extra).reduce(And), child)
  }
}
