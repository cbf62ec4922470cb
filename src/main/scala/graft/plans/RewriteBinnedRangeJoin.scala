package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, Add, Alias, And, Attribute, AttributeReference, Cast, EqualTo, Explode, Expression, IntegralDivide, LessThan, LessThanOrEqual, Literal, Pmod, Sequence, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer extension: automatically rewrite the naive band (range)
  * join idiom
  *
  *   a JOIN b ON abs(x - y) <= W          -- x from a, y from b, W literal
  *
  * into the interval-binned equi join that q60 writes by hand. Spark has
  * no range-join operator, so the naive form — the way users naturally
  * WRITE a proximity join — plans a BroadcastNestedLoopJoin: O(|a|*|b|)
  * condition evaluations and one side fully broadcast, a scale-killer on
  * two fact tables. The rewrite quantizes the join axis into buckets
  * exactly one window wide:
  *
  *   bucket(v)    = floor(v / W)                 -- exact integer floor
  *   left  probes buckets bucket(x)-1 .. bucket(x)+1   (explode, 3 rows)
  *   right owns   bucket(y)                            (1 row)
  *   JOIN ON leftBucket = rightBucket AND <original condition>
  *
  * Soundness: |x - y| <= W implies floor(y/W) is within 1 of floor(x/W)
  * (monotonicity of floor over a shift of at most one whole bucket), so
  * every qualifying pair shares a generated bucket; each right row owns
  * exactly ONE bucket, so no pair can meet twice — no dedup pass. The
  * original predicate rides along as the residual filter, so same-bucket
  * pairs outside the band are still dropped and the rewrite is exactly
  * output-equivalent. The bucket ids are derived with floor division
  * built from `Pmod` (`(v - pmod(v, W)) div W`) rather than `div` alone,
  * which truncates toward zero and would misalign buckets for negative
  * values.
  *
  * The match is deliberately narrow, in the AutoLocalTopK mold:
  *  - INNER join only. (An outer join through the exploded side would
  *    emit one null-extended row per probed bucket — 3x the unmatched
  *    rows — so outer shapes keep Spark's plan.)
  *  - the ENTIRE condition is one `abs(l - r) <= W` / `< W` predicate
  *    over integral operands, one side per table. If the condition also
  *    carries an equi conjunct, Spark already plans a hash/merge join
  *    with the band as residual — binning would only add work.
  *  - W a positive integral literal. The 3-probe window is constant,
  *    so the exploded side grows by exactly 3x its row count (of the
  *    two join columns only, after column pruning) — bounded and
  *    predictable regardless of W.
  * Assumes the join axis stays within Long.MaxValue - W (epoch micros
  * and every realistic measure qualify); beyond that the wraparound
  * cases the residual would filter are undefined in the original
  * predicate too.
  *
  * q61 runs the NAIVE idiom with this rule active and hash-matches the
  * DuckDB theta-join oracle; `BinnedRangeJoinSpec` asserts the rewritten
  * plan contains no nested-loop node and that non-matching shapes (outer
  * join, non-literal bound) are left untouched. */
object RewriteBinnedRangeJoin extends Rule[LogicalPlan] {

  /** Pull (x, y, w) out of `abs(x - y) <= w` / `< w`, in either
    * argument order, where both operands are int/long. */
  private def asBand(cond: Expression): Option[(Expression, Expression, Long)] = {
    def integral(e: Expression): Boolean =
      e.dataType == LongType || e.dataType == IntegerType
    def longOf(l: Literal): Option[Long] = l.value match {
      case i: java.lang.Integer => Some(i.longValue)
      case i: java.lang.Long => Some(i.longValue)
      case _ => None
    }
    val parts = cond match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), w: Literal) => Some((x, y, w))
      case LessThan(Abs(Subtract(x, y, _), _), w: Literal) => Some((x, y, w))
      case _ => None
    }
    parts.collect {
      case (x, y, w) if integral(x) && integral(y) => longOf(w).map(v => (x, y, v))
    }.flatten.filter(_._3 > 0)
  }

  /** floor(v / w) in exact integer arithmetic (IntegralDivide truncates
    * toward zero; subtracting the positive pmod first makes the dividend
    * an exact multiple, so truncation IS floor). */
  private def floorDiv(v: Expression, w: Literal): Expression = {
    val vl = if (v.dataType == LongType) v else Cast(v, LongType)
    IntegralDivide(Subtract(vl, Pmod(vl, w)), w)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && asBand(cond).isDefined =>
      val (x, y, w) = asBand(cond).get
      // Orient the predicate: which operand belongs to which side.
      val oriented =
        if (x.references.subsetOf(left.outputSet) &&
            y.references.subsetOf(right.outputSet)) Some((x, y))
        else if (y.references.subsetOf(left.outputSet) &&
            x.references.subsetOf(right.outputSet)) Some((y, x))
        else None
      oriented.fold(j: LogicalPlan) { case (lx, ry) =>
        val wLit = Literal(w, LongType)
        val lb = floorDiv(lx, wLit)
        val probeAttr =
          AttributeReference("__graft_band_bucket_l", LongType, nullable = false)()
        val probes = Generate(
          // Sequence is TimeZoneAwareExpression: it only counts as
          // resolved once a zone is pinned, even for pure long ranges.
          Explode(Sequence(
            Subtract(lb, Literal(1L)), Add(lb, Literal(1L)), Some(Literal(1L)),
            Some(conf.sessionLocalTimeZone))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(probeAttr), child = left)
        val ownAlias = Alias(floorDiv(ry, wLit), "__graft_band_bucket_r")()
        val owners = Project(right.output :+ ownAlias, right)
        val binned = Join(probes, owners, Inner,
          Some(And(EqualTo(probeAttr, ownAlias.toAttribute), cond)), hint)
        // Restore the original join schema (drop both bucket columns).
        Project(j.output, binned)
      }
  }
}
