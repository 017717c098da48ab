package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Whole-plan extension (SURVEY "custom operators" tier (c)): a Catalyst
  * optimizer rule that rewrites a pure range-predicate inner join
  * (`p >= lo AND p <= hi`, no equi conjunct — what a user's natural
  * BETWEEN join produces) into the binned equi-join shape of
  * [[graft.ops.RangeJoin]]: bin the point side, explode the interval
  * side to its overlapping bins, equi-join on the bin, re-apply the
  * exact predicate. Without the rewrite Spark can only plan
  * broadcast-nested-loop or cartesian-filter for such a join —
  * quadratic, and forbidden by this repo's plan audits.
  *
  * Correctness does not depend on the bin width: binning by integral
  * division is monotone, so every point in [lo, hi] lands in a bin
  * between bin(lo) and bin(hi), each (interval, point) pair meets
  * exactly once (in the point's single bin), and the original predicate
  * is re-applied verbatim above the join. The width — set via
  * `spark.graft.rangeJoin.binWidth` — only tunes replication
  * (len/width + 1 rows per interval) against bin selectivity.
  *
  * Scope guards: inner joins only; both bounds integral; every
  * condition conjunct must stay on one side or be one of the two range
  * bounds; any cross-side equality conjunct disables the rewrite (the
  * equi join already shuffles/broadcasts fine with the range as a
  * residual — e.g. the q31 per-key range join).
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.binWidth"
  val EnabledKey = "spark.graft.rangeJoin.enabled"

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** (point, lo, hi) with point on one side and both bounds on the
    * other, from two >= / <= conjuncts. */
  private def rangeTriple(c1: Expression, c2: Expression,
      left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    // normalize each comparison to (small, big) meaning small <= big
    def le(c: Expression): Option[(Expression, Expression)] = c match {
      case LessThanOrEqual(a, b) => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case _ => None
    }
    (le(c1), le(c2)) match {
      case (Some((lo, p1)), Some((p2, hi))) if p1.semanticEquals(p2) =>
        val p = p1
        def from(side: LogicalPlan, e: Expression) =
          e.references.nonEmpty && e.references.subsetOf(side.outputSet)
        if (integral(p) && integral(lo) && integral(hi)) {
          if (from(left, p) && from(right, lo) && from(right, hi))
            Some((p, lo, hi, true)) // point on left
          else if (from(right, p) && from(left, lo) && from(left, hi))
            Some((p, lo, hi, false)) // point on right
          else None
        } else None
      case _ => None
    }
  }

  private def crossSide(e: Expression, l: LogicalPlan, r: LogicalPlan): Boolean =
    e.references.intersect(l.outputSet).nonEmpty &&
      e.references.intersect(r.outputSet).nonEmpty

  /** Bin width, validated HERE (at the rewrite site) rather than at the
    * top of apply(): the rule is registered session-wide, so a malformed
    * conf value must at worst disable this rewrite (fall back to Spark's
    * own plan), never fail unrelated queries' optimization. */
  private def binWidth: Option[Long] =
    try {
      val w = conf.getConfString(WidthKey, "1000").toLong
      if (w > 0) Some(w) else { logWarning(s"$WidthKey must be positive, got $w — rewrite disabled"); None }
    } catch {
      case _: NumberFormatException =>
        logWarning(s"$WidthKey is not a number — rewrite disabled"); None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val cross = conjuncts.filter(c => crossSide(c, left, right))
        // no equi conjunct (Spark would already plan an equi join), and
        // the cross-side part must be exactly one >= / <= pair
        val hasEqui = cross.exists {
          case EqualTo(a, b) => crossSide(EqualTo(a, b), left, right)
          case EqualNullSafe(a, b) => crossSide(EqualNullSafe(a, b), left, right)
          case _ => false
        }
        if (hasEqui || cross.size != 2) j
        else {
          val triple = rangeTriple(cross(0), cross(1), left, right)
            .orElse(rangeTriple(cross(1), cross(0), left, right))
          triple.flatMap(t => binWidth.map(t -> _)) match {
            case Some(((p, lo, hi, pointOnLeft), width)) =>
              val w = Literal(width)
              def bin(e: Expression) = IntegralDivide(Cast(e, LongType), w)
              val (pointSide, intervalSide) =
                if (pointOnLeft) (left, right) else (right, left)
              val binAlias = Alias(bin(p), "__bin_p")()
              val pointPlan = Project(pointSide.output :+ binAlias, pointSide)
              val binAttr = AttributeReference("__bin_iv", LongType,
                nullable = true)()
              // Sequence is TimeZoneAwareExpression: without an explicit
              // timeZoneId it reports unresolved and plan validation
              // rejects the rewrite (optimizer rules run post-analysis,
              // nothing re-resolves for us)
              val gen = Generate(
                Explode(Sequence(bin(lo), bin(hi), None,
                  Some(conf.sessionLocalTimeZone))),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(binAttr), child = intervalSide)
              val (newLeft, newRight) =
                if (pointOnLeft) (pointPlan, gen) else (gen, pointPlan)
              val binnedJoin = Join(newLeft, newRight, Inner,
                Some(EqualTo(binAlias.toAttribute, binAttr)), hint)
              // re-apply the ORIGINAL condition (range bounds + any
              // other cross-side residue) above the equi join
              Project(j.output, Filter(cond, binnedJoin))
            case None => j
          }
        }
    }
  }
}
