package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrites a naive point-in-interval theta-join into the
  * binned [[graft.operators.RangeJoin]] shape, so the declarative form
  *
  *   points.join(intervals, p >= s && p <= e [&& k1 == k2 …])
  *
  * — which Spark plans as a BroadcastNestedLoopJoin (or as a hash join on
  * the equi keys alone, with every same-key pair evaluated against the
  * range) — becomes a HASH join on (equiKeys…, bin) followed by the exact
  * original predicate. Semantics are identical: integer `div` binning is
  * monotonic, so s ≤ p ≤ e implies bin(s) ≤ bin(p) ≤ bin(e); the bin join
  * only removes pairs that cannot match, and the re-applied original
  * condition decides exactly.
  *
  * Opt-in: inert unless `spark.graft.rangeJoin.binWidth` is set to a
  * positive long (the bin width in the range column's own units — pick it
  * near the typical interval length: too-small widths make wide intervals
  * explode to huge bin arrays, and `Sequence` hard-errors past the array
  * limit rather than silently degrading). Enable per session via
  * `spark.experimental.extraOptimizations ++= Seq(RangeJoinRule)` or the
  * `graft.expressions.GraftExtensions` config-time extension. The rule
  * never matches its own rewrite: the output join condition references
  * `__graft_bin*` attributes, which is the skip marker — this holds even
  * inside the fixed-point operator-optimization batch, where
  * PushPredicateThroughJoin folds the re-applied range filter straight
  * back into the join condition (without the marker the two rules would
  * ping-pong until the iteration limit; caught by RangeJoinRuleSpec's
  * extension-path test).
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  private def binWidth: Option[Long] =
    try {
      val w = SQLConf.get.getConfString(BinWidthKey, "0").toLong
      if (w > 0) Some(w) else None
    } catch { case _: NumberFormatException => None }

  private def isRangeType(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (point, bound) when `ge` is point-from-one-side >= bound-from-other. */
  private def asLowerBound(left: LogicalPlan, right: LogicalPlan,
                           p: Expression, b: Expression): Boolean =
    p.references.nonEmpty && b.references.nonEmpty &&
      ((p.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (p.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet)))

  /** The rewrite marker: any join whose condition already references a
    * bin attribute is our own output (possibly with the range filter
    * pushed back down by PushPredicateThroughJoin when the rule runs
    * inside the fixed-point operator-optimization batch) — matching it
    * again would ping-pong with pushdown forever.
    */
  private val BinPrefix = "__graft_bin"

  private def alreadyRewritten(cond: Expression): Boolean =
    cond.references.exists(_.name.startsWith(BinPrefix))

  override def apply(plan: LogicalPlan): LogicalPlan = binWidth match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if !alreadyRewritten(cond) =>
        val conjuncts = splitConjunctivePredicates(cond)
        // find p >= s and p <= e over the same point expression, with the
        // point on one side and both bounds on the other
        val lowers = conjuncts.collect {
          case c @ GreaterThanOrEqual(p, s) if asLowerBound(left, right, p, s) => (c, p, s)
          case c @ LessThanOrEqual(s, p) if asLowerBound(left, right, p, s) => (c, p, s)
        }
        val uppers = conjuncts.collect {
          case c @ LessThanOrEqual(p, e) if asLowerBound(left, right, p, e) => (c, p, e)
          case c @ GreaterThanOrEqual(e, p) if asLowerBound(left, right, p, e) => (c, p, e)
        }
        val pair = (for {
          (lc, p1, s) <- lowers
          (uc, p2, e) <- uppers
          if p1.semanticEquals(p2) && isRangeType(p1) && isRangeType(s) && isRangeType(e)
          // both bounds must come from the SAME side, opposite the point
          if s.references.subsetOf(left.outputSet) == e.references.subsetOf(left.outputSet)
          if s.references.subsetOf(left.outputSet) != p1.references.subsetOf(left.outputSet)
        } yield (lc, uc, p1, s, e)).headOption
        pair match {
          case None => j
          case Some((lc, uc, p, s, e)) =>
            val width = Literal(w, LongType)
            def div(x: Expression) =
              IntegralDivide(Cast(x, LongType), width)
            val pointOnLeft = p.references.subsetOf(left.outputSet)
            val (pointPlan, ivPlan) = if (pointOnLeft) (left, right) else (right, left)
            // point side: one bin column
            val pBinAlias = Alias(div(p), "__graft_bin_p")()
            val pointBinned = Project(pointPlan.output :+ pBinAlias, pointPlan)
            // interval side: explode the covered bin range
            val ivBinAttr = AttributeReference("__graft_bin_iv", LongType, nullable = true)()
            // Sequence is TimeZoneAware: without an explicit zone it stays
            // unresolved and fails post-rule plan validation. Inverted
            // intervals (s > e) match nothing but would make Sequence
            // enumerate the whole descending span — emit zero bins instead.
            val seq = Sequence(div(s), div(e), None,
              Some(SQLConf.get.sessionLocalTimeZone))
            val bins = If(LessThanOrEqual(div(s), div(e)), seq,
              Literal.create(Array.emptyLongArray, seq.dataType))
            val ivBinned = Generate(Explode(bins),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(ivBinAttr), child = ivPlan)
            val binEq = EqualTo(pBinAlias.toAttribute, ivBinAttr)
            val others = conjuncts.filterNot(c => c.fastEquals(lc) || c.fastEquals(uc))
            val (newL, newR) = if (pointOnLeft) (pointBinned, ivBinned) else (ivBinned, pointBinned)
            val newJoin = Join(newL, newR, Inner,
              Some((others :+ binEq).reduce(And)), hint)
            // re-apply the exact range predicates, restore the output
            Project(j.output, Filter(And(lc, uc), newJoin))
        }
    }
  }
}
