package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite point-in-interval inequality joins into
  * bucketed equi-joins.
  *
  * Spark plans a join whose only condition is an inequality as a
  * BroadcastNestedLoopJoin — O(n·m) compares and a full broadcast of one
  * side, a scale-killer for the common "event inside a constant-width
  * time window" join. But a point-in-interval condition with constant
  * width W,
  *
  *   p > s  AND  p <= s + W        (p from one side, s from the other)
  *
  * implies `p div W ∈ { s div W, s div W + 1 }`, so the interval side
  * can be exploded to its (at most two) W-buckets and the join becomes
  * an EQUI-join on the bucket, with the original predicates kept as an
  * exact refine — the same rewrite `TimeSeries.rangeJoin` performs by
  * hand, applied automatically to any SQL/DataFrame inequality join of
  * this shape (all four comparison spellings and both operand orders
  * are recognized; `>=`/`<` bounds keep their exact semantics via the
  * retained refine).
  *
  * Domain note: the containment proof is written for non-negative
  * operands (the epoch-time case this targets); a seeded randomized
  * test (RangeJoinRuleSpec) shows the ≤2-bucket cover also holds under
  * truncating division on negative domains. Both `p` and `s` must be
  * BIGINT; `W` a positive literal.
  *
  * Registered by [[GraftExtensions]] (injectOptimizerRule) or via
  * `spark.experimental.extraOptimizations`. The rule runs inside a
  * fixpoint batch, so rewritten joins are tagged (the generated bucket
  * attribute name) and skipped on re-visit.
  */
object BucketizeRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val bucketPrefix = "__graft_bucket"

  /** A recognized interval condition: point `p`, interval start `s`,
    * width literal `w` (the lower/upper conjuncts themselves stay in the
    * join condition as the exact refine). */
  private case class RangeCond(p: Expression, s: Expression, w: Long)

  /** Normalize a conjunct to a lower bound `p > s` / `p >= s` → (p, s). */
  private def asLower(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThan(p, s) => Some((p, s))
    case GreaterThanOrEqual(p, s) => Some((p, s))
    case LessThan(s, p) => Some((p, s))
    case LessThanOrEqual(s, p) => Some((p, s))
    case _ => None
  }

  /** Normalize a conjunct to an upper bound `p < s + w` / `p <= s + w`
    * → (p, s, w). */
  private def asUpper(e: Expression): Option[(Expression, Expression, Long)] = {
    def fromAdd(p: Expression, add: Expression): Option[(Expression, Expression, Long)] =
      add match {
        case Add(s, Literal(w: Long, LongType), _) if w > 0 => Some((p, s, w))
        case Add(Literal(w: Long, LongType), s, _) if w > 0 => Some((p, s, w))
        case _ => None
      }
    e match {
      case LessThan(p, add) => fromAdd(p, add)
      case LessThanOrEqual(p, add) => fromAdd(p, add)
      case GreaterThan(add, p) => fromAdd(p, add)
      case GreaterThanOrEqual(add, p) => fromAdd(p, add)
      case _ => None
    }
  }

  /** An equality conjunct whose references span both sides: the join
    * already has an equi key, Spark will hash/sort-merge it, and the
    * rewrite would only double one side's volume (e.g. re-exploding a
    * hand-bucketed range join). The rule's mission is narrower: prevent
    * the nested-loop plan a PURE inequality join gets. */
  private def hasInterSideEquality(conjuncts: Seq[Expression],
                                   left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
      case EqualNullSafe(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
      case _ => false
    }

  private def findRangeCond(conjuncts: Seq[Expression],
                            left: LogicalPlan, right: LogicalPlan): Option[RangeCond] = {
    val lowers = conjuncts.flatMap(asLower)
    val uppers = conjuncts.flatMap(asUpper)
    (for {
      (pl, sl) <- lowers
      (pu, su, w) <- uppers
      if pl.semanticEquals(pu) && sl.semanticEquals(su)
      if pl.dataType == LongType && sl.dataType == LongType
      // p and s must come from opposite sides, each from exactly one
      if (pl.references.subsetOf(left.outputSet) && sl.references.subsetOf(right.outputSet)) ||
         (pl.references.subsetOf(right.outputSet) && sl.references.subsetOf(left.outputSet))
      if pl.references.nonEmpty && sl.references.nonEmpty
      if pl.deterministic && sl.deterministic
    } yield RangeCond(pl, sl, w)).headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !j.output.exists(_.name.startsWith(bucketPrefix)) &&
           !left.output.exists(_.name.startsWith(bucketPrefix)) &&
           !right.output.exists(_.name.startsWith(bucketPrefix)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasInterSideEquality(conjuncts, left, right)) j
      else findRangeCond(conjuncts, left, right) match {
        case Some(RangeCond(p, s, w)) =>
          val wLit = Literal(w, LongType)
          // interval side (s) explodes to its two candidate buckets
          val b0 = IntegralDivide(s, wLit)
          val bucketAttr = AttributeReference(
            s"${bucketPrefix}_s", LongType, nullable = true)()
          val gen = Generate(
            Explode(CreateArray(Seq(b0, Add(b0, Literal(1L, LongType))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bucketAttr),
            child = if (s.references.subsetOf(left.outputSet)) left else right)
          val pointBucket = IntegralDivide(p, wLit)
          val newCond = And(cond, EqualTo(bucketAttr, pointBucket))
          val newJoin =
            if (s.references.subsetOf(left.outputSet))
              Join(gen, right, Inner, Some(newCond), hint)
            else
              Join(left, gen, Inner, Some(newCond), hint)
          // restore the original output (drop the bucket column)
          Project(j.output, newJoin)
        case None => j
      }
  }
}
