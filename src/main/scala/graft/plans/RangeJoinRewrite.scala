package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrites an inner join whose ONLY cross-side predicates
  * are a half-open range test — `pt >= lo AND pt < hi` with `pt` from one
  * side and `lo`/`hi` from the other — into the bucketed equi-join +
  * refine of [[graft.operators.IntervalJoin]]. Without an equi key
  * Catalyst can only plan such a join as a (broadcast) nested loop,
  * O(|points|·|intervals|) comparisons; with the rewrite the user keeps
  * writing the natural BETWEEN predicate and gets the
  * O(points + intervals·spread + matches) plan: interval rows explode
  * into the buckets they cover, points compute one bucket scan-side, the
  * join runs on the bucket id and the original predicate survives as the
  * exact refine (so the rewrite is correctness-preserving by
  * construction — each point lives in exactly one bucket, so no
  * duplicate pairs can appear).
  *
  * Gated by `spark.graft.intervalJoin.bucketSize` (a positive long in the
  * unit of the range columns; 0 = disabled, the default). Pick it near
  * the typical interval length — the same guidance as the manual
  * operator. The rule never re-matches its own output: the rewritten
  * join has a cross-side equality conjunct, which disqualifies it.
  *
  * Columns must already be LongType (the operator's integral-domain
  * contract; epoch-µs longs must not pass through double division).
  * Installed by [[graft.GraftExtensions]] (`injectOptimizerRule`) or via
  * `spark.experimental.extraOptimizations`.
  */
class RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def bucketSize: Long =
    conf.getConfString("spark.graft.intervalJoin.bucketSize", "0").toLong

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val b = bucketSize
    if (b <= 0) plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(j, left, right, cond, hint, b).getOrElse(j)
    }
  }

  private def rewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, b: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    def fromLeft(e: Expression) = e.references.subsetOf(left.outputSet)
    def fromRight(e: Expression) = e.references.subsetOf(right.outputSet)
    def oneSided(e: Expression) = fromLeft(e) || fromRight(e)
    def crossSide(e: Expression) = !fromLeft(e) && !fromRight(e)

    // an existing cross-side equality means Catalyst already has an equi
    // key (and also marks our own rewritten output) — leave those joins be
    val crossConjuncts = conjuncts.filter(crossSide)
    if (crossConjuncts.exists {
        case EqualTo(_, _) | EqualNullSafe(_, _) => true
        case _ => false
      }) return None

    // normalize: (pt, lo) from >=-shaped conjuncts, (pt, hi) from <-shaped
    val gePairs = crossConjuncts.collect {
      case GreaterThanOrEqual(pt, lo) => (pt, lo)
      case LessThanOrEqual(lo, pt) => (pt, lo)
    }
    val ltPairs = crossConjuncts.collect {
      case LessThan(pt, hi) => (pt, hi)
      case GreaterThan(hi, pt) => (pt, hi)
    }
    val ranges = for {
      (pt1, lo) <- gePairs
      (pt2, hi) <- ltPairs
      if pt1.semanticEquals(pt2)
      if pt1.dataType == LongType && lo.dataType == LongType && hi.dataType == LongType
      if oneSided(pt1) && oneSided(lo) && oneSided(hi)
      if fromLeft(lo) == fromLeft(hi) && fromLeft(pt1) != fromLeft(lo)
    } yield (pt1, lo, hi)

    ranges.headOption.map { case (pt, lo, hi) =>
      val ptOnLeft = fromLeft(pt)
      val ptSide = if (ptOnLeft) left else right
      val ivSide = if (ptOnLeft) right else left
      val ptBkt = Alias(IntegralDivide(pt, Literal(b)), "graft_pt_bkt")()
      val ptPlan = Project(ptSide.output :+ ptBkt, ptSide)
      // Sequence is TimeZoneAwareExpression: the analyzer's ResolveTimeZone
      // has already run, so an optimizer-built instance must set it itself
      // or the plan flips back to unresolved
      val seq = new Sequence(
        IntegralDivide(lo, Literal(b)),
        IntegralDivide(Subtract(hi, Literal(1L)), Literal(b)),
        None).withTimeZone(conf.sessionLocalTimeZone)
      // an inverted interval (hi <= lo) would make Sequence DESCEND —
      // up to (lo-hi)/b spurious bucket rows per bad row; null the cover
      // instead (Explode drops null) so such rows vanish, matching the
      // original predicate which they could never satisfy
      val guardedSeq = If(GreaterThan(hi, lo), seq,
        Literal.create(null, seq.dataType))
      val bktAttr = AttributeReference("graft_iv_bkt", LongType, nullable = false)()
      val ivPlan = Generate(Explode(guardedSeq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
        generatorOutput = Seq(bktAttr), child = ivSide)
      val eq = EqualTo(ptBkt.toAttribute, bktAttr)
      val (newLeft, newRight) =
        if (ptOnLeft) (ptPlan, ivPlan) else (ivPlan, ptPlan)
      Project(j.output, Join(newLeft, newRight, Inner, Some(And(eq, cond)), hint))
    }
  }
}
