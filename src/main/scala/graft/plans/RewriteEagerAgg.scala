package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, Coalesce, Divide, EqualTo, EvalMode, Expression, GreaterThan, If, IsNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DecimalType, DoubleType, IntegerType, LongType, ShortType}

/** Optimizer extension: EAGER AGGREGATION (Yan & Larson, VLDB 1995) —
  * push a decomposable aggregate through an inner equi join:
  *
  *   Aggregate(G, sum/count/min/max(e), L JOIN R ON lk = rk)
  *     — G references only L, every aggregate input only R —
  *   ==>
  *   Aggregate(G, merge(partial),
  *     L JOIN (Aggregate(rk, partial(e), R)) ON lk = rk)
  *
  * Soundness (per output group g): the original value folds f(e(r))
  * over all (l, r) join pairs; grouping the pairs by r's join key first
  * and folding per key is the same multiset fold because every l
  * matches a key's WHOLE group or none of it (equi join) —
  * sum ↦ sum of per-key sums, count ↦ sum of per-key counts,
  * min/max ↦ min/max of per-key minima/maxima. Inner-join row drops
  * (null keys, unmatched keys) happen identically in both forms; a
  * global aggregate (G = ∅) still emits its single row, with
  * count = coalesce(sum(partial), 0) preserving COUNT's 0-on-empty.
  *
  * Why this is a 100 TB rule: the naive plan shuffles EVERY surviving
  * fact row twice — once into the join, once into the final aggregate —
  * while the rewritten plan map-side-combines the fact table down to
  * one row per join key BEFORE anything moves; the join then processes
  * |keys| rows instead of |facts|, and the partial-agg shuffle and the
  * join shuffle share the same key, so AQE/exchange reuse pays once.
  * When the dimension side qualifies for broadcast the fact table now
  * never shuffles at all. The reduction factor is |facts| / |keys| —
  * at a billion rows per million keys, 1000x less exchange volume.
  * Worst case (near-unique keys) the pre-agg is a no-op pass-through
  * over the shuffle the join needed anyway — bounded downside, same
  * reasoning Spark applies to its always-on partial aggregation.
  *
  * COST-GUARDED: the rewrite only fires when the group side exceeds
  * the broadcast threshold. In the broadcast regime the naive plan
  * already shuffles just ~|G| partial-aggregated rows (the join itself
  * is exchange-free), so pre-aggregating would ADD a join-key exchange
  * — strictly worse, and `EagerAggSpec` measures exactly that. In the
  * shuffle-join regime — the only regime a 100 TB fact-to-fact query
  * lives in — the rewrite converts the fact side's join exchange into
  * one carrying a row per join key.
  *
  * The match is deliberately narrow (AutoLocalTopK's philosophy):
  *  - INNER join, condition EXACTLY a conjunction of simple
  *    `leftCol = rightCol` attribute equalities (no residual, no
  *    null-safe =, no expressions — rewriting under a residual that
  *    references non-key right columns would be unsound);
  *  - group expressions reference ONE side only, every aggregate
  *    input the OTHER side only (both orientations handled);
  *  - aggregate functions from the decomposable set sum/count/min/max/
  *    avg, non-DISTINCT, un-FILTERed; SUM over DecimalType re-sums the
  *    widened per-key partials and casts the total back to the original
  *    Sum's type — lossless whenever the naive plan's total was
  *    representable. The subtlety is a PER-KEY partial overflowing where
  *    the grand total would not: the re-sum would silently skip that
  *    null partial and drop its contribution, so each decimal sum also
  *    pushes a count partial and the merge returns null if any key has
  *    (sum IS NULL, count > 0) — null sums from genuinely all-null keys
  *    (count = 0) stay skippable, matching naive semantics. That guard
  *    is CONSERVATIVE, a one-sided divergence from the naive plan: if a
  *    per-key partial overflows but the keys cancel so the naive grand
  *    total was representable, rule-on returns null where rule-off
  *    returned a number (never the converse, and never a wrong number).
  *    The only regime where a per-key overflow without a total overflow
  *    is plausible is a saturated widening — child precision + 10 >= 38
  *    leaves under 10 digits of headroom — so pushable() excludes
  *    decimal sums in that regime entirely; below it a per-key overflow
  *    needs ~1e10 max-magnitude rows on one key and the conservative
  *    null is a practically unreachable fail-safe. AVG
  *    decomposes as (sum, count) partials merged to sum/count above the
  *    join, restricted to integral inputs where that is bit-exact (see
  *    decompose()); decimal/double AVG stays excluded (double would
  *    re-associate FP, decimal AVG's internal divide precision depends
  *    on the input precision it sees);
  *  - aggregate-side join keys are bare attributes (their exprIds
  *    survive into the pre-aggregate's output, so the join condition
  *    transfers verbatim).
  *
  * q66 runs the naive user shape with this rule active and hash-matches
  * its oracle; `EagerAggSpec` asserts the pre-aggregate lands BELOW the
  * join, that rule-off rows match rule-on rows, and that non-conforming
  * shapes (outer join, distinct agg, mixed-side groups) are untouched. */
object RewriteEagerAgg extends Rule[LogicalPlan] {

  /** cond must be a pure conjunction of attr = attr, one side each. */
  private def equiKeys(
      cond: Expression,
      left: LogicalPlan,
      right: LogicalPlan): Option[Seq[(Attribute, Attribute)]] = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(a, b) => split(a) ++ split(b)
      case other => Seq(other)
    }
    val pairs = split(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if left.outputSet.contains(a) && right.outputSet.contains(b) =>
        Some((a, b))
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if left.outputSet.contains(a) && right.outputSet.contains(b) =>
        Some((a, b))
      case _ => None
    }
    if (pairs.forall(_.isDefined)) Some(pairs.flatten) else None
  }

  /** Decomposable, pushable aggregate call over `side`'s columns only. */
  private def pushable(ae: AggregateExpression, side: LogicalPlan): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      // int128 fixed-point sum: per-key partials are unconditionally
      // exact (no overflow regime at feasible scales — see Sum128's
      // scaladoc), so unlike widened-decimal Sum it decomposes with no
      // guard and no precision ceiling.
      case s: graft.functions.Sum128 => s.references.subsetOf(side.outputSet)
      case s: Sum => (s.child.dataType match {
        // Saturated decimal widening (result precision capped at 38)
        // leaves < 10 digits of per-key headroom — the one regime where
        // a per-key partial can overflow while the naive grand total
        // fits, turning the conservative null guard from unreachable
        // fail-safe into a plausible divergence. Skip it (see scaladoc).
        case d: DecimalType => d.precision + 10 < DecimalType.MAX_PRECISION
        case _ => true
      }) && s.references.subsetOf(side.outputSet)
      // AVG decomposes as (sum, count) — but only over INTEGRAL inputs,
      // where the partial long sums are exact and the final sum/count
      // division is the one correctly-rounded FP op, so rule-on output
      // is bit-identical to rule-off. A double input would re-associate
      // the FP summation (ulp drift vs the naive plan); decimal AVG
      // widens precision like decimal SUM.
      case a: Average => (a.child.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }) && a.references.subsetOf(side.outputSet)
      case f @ (_: Count | _: Min | _: Max) => f.references.subsetOf(side.outputSet)
      case _ => false
    })

  /** One pushed-down decomposition: partial aggregates computed per
    * join key BELOW the join, and the expression re-assembling the
    * original aggregate's value from their merged (re-aggregated)
    * attributes ABOVE it. */
  private case class Decomp(partials: Seq[Alias], merged: Expression)

  private def decompose(ae: AggregateExpression): Decomp = {
    def total(p: Alias) = AggregateExpression(Sum(p.toAttribute), Complete, isDistinct = false)
    ae.aggregateFunction match {
      case avg: Average =>
        // exact long partial sums (input is integral per pushable());
        // count partial mirrors AVG's non-null semantics. Merge is
        // sum/count with AVG's own null-on-empty: If guards the LEGACY
        // divide so an all-null group yields NULL, never an ANSI error.
        val sumP = Alias(
          AggregateExpression(Sum(Cast(avg.child, LongType)), Complete, isDistinct = false),
          s"__graft_ea_s_${ae.resultId.id}")()
        val cntP = Alias(
          AggregateExpression(Count(Seq(avg.child)), Complete, isDistinct = false),
          s"__graft_ea_c_${ae.resultId.id}")()
        val cntTot = Coalesce(Seq(total(cntP), Literal(0L, LongType)))
        Decomp(Seq(sumP, cntP),
          If(EqualTo(cntTot, Literal(0L, LongType)),
            Literal(null, DoubleType),
            Divide(Cast(total(sumP), DoubleType), Cast(cntTot, DoubleType),
              EvalMode.LEGACY)))
      case s128: graft.functions.Sum128 =>
        // per-key int128 partials below the join are EXACT decimals
        // (decimal(38,s)); the merge re-sums those few-per-key rows with
        // the stock decimal Sum — above the join, off the per-row hot
        // path. Total overflow (> 38 digits) surfaces the same way the
        // un-rewritten Sum128 would surface it: loudly.
        val p = Alias(ae, s"__graft_ea_${ae.resultId.id}")()
        Decomp(Seq(p), Cast(total(p), s128.dataType))
      case sm: Sum if sm.child.dataType.isInstanceOf[DecimalType] =>
        // re-summing the widened per-key partials widens precision once
        // more; cast back so the output schema matches the naive plan.
        // Overflow guard (see scaladoc): a null partial with count > 0
        // is a per-key overflow the re-sum would otherwise skip.
        val sumP = Alias(ae, s"__graft_ea_${ae.resultId.id}")()
        val cntP = Alias(
          AggregateExpression(Count(Seq(sm.child)), Complete, isDistinct = false),
          s"__graft_ea_n_${ae.resultId.id}")()
        val overflowed = And(
          IsNull(sumP.toAttribute),
          GreaterThan(cntP.toAttribute, Literal(0L, LongType)))
        val anyOverflow = Coalesce(Seq(
          AggregateExpression(Max(overflowed), Complete, isDistinct = false),
          Literal(false)))
        Decomp(Seq(sumP, cntP),
          If(anyOverflow,
            Literal(null, ae.dataType),
            // session-mode cast: ANSI throws on a total overflow like
            // Sum itself would in the naive plan; non-ANSI nulls like
            // Sum's null-on-overflow. (Under ANSI the If-guard is
            // unreachable — the per-key partial throws first, the same
            // exposure vanilla two-phase Sum has when a partition-local
            // partial overflows a total that would have fit.)
            Cast(total(sumP), ae.dataType)))
      case _: Sum =>
        val p = Alias(ae, s"__graft_ea_${ae.resultId.id}")()
        Decomp(Seq(p), total(p))
      case _: Count =>
        val p = Alias(ae, s"__graft_ea_${ae.resultId.id}")()
        Decomp(Seq(p), Coalesce(Seq(total(p), Literal(0L, LongType))))
      case _: Min =>
        val p = Alias(ae, s"__graft_ea_${ae.resultId.id}")()
        Decomp(Seq(p), AggregateExpression(Min(p.toAttribute), Complete, isDistinct = false))
      case _: Max =>
        val p = Alias(ae, s"__graft_ea_${ae.resultId.id}")()
        Decomp(Seq(p), AggregateExpression(Max(p.toAttribute), Complete, isDistinct = false))
      case other =>
        throw new IllegalStateException(s"unpushable aggregate reached decompose: $other")
    }
  }

  private def tryRewrite(
      agg: Aggregate,
      join: Join,
      groupSide: LogicalPlan,
      aggSide: LogicalPlan,
      aggSideKeys: Seq[Attribute],
      buildJoin: LogicalPlan => Join): Option[LogicalPlan] = {
    val aggCalls = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    val groupRefsOk = agg.groupingExpressions.forall(
      _.references.subsetOf(groupSide.outputSet))
    // attrs used OUTSIDE aggregate calls (grouping output columns etc.)
    val outsideRefs = agg.aggregateExpressions.flatMap { ne =>
      var inside = Set.empty[Attribute]
      ne.foreach {
        case ae: AggregateExpression => inside ++= ae.references
        case _ => ()
      }
      ne.references.filterNot(inside.contains)
    }
    if (!groupRefsOk || aggCalls.isEmpty ||
        !aggCalls.forall(pushable(_, aggSide)) ||
        !outsideRefs.forall(groupSide.outputSet.contains) ||
        !aggSideKeys.forall(k => k.isInstanceOf[AttributeReference]) ||
        // never stack pre-aggregates: an agg-side Aggregate means either
        // this rule already fired (the batch runs to fixpoint) or the
        // user pre-aggregated — both already reduced
        aggSide.isInstanceOf[Aggregate]) return None
    // COST GUARD: if the group side fits the broadcast threshold, the
    // naive plan is broadcast-join + partial-aggregate — ZERO join
    // shuffle, final exchange ~|G| rows — and the rewrite would ADD a
    // join-key exchange (measured: 1483 vs 10 records on exactly this
    // shape). Eager aggregation only pays in the shuffle-join regime,
    // where it converts the fact side's join exchange into a
    // pre-aggregated one. threshold < 0 (broadcast disabled) means the
    // shuffle regime unconditionally.
    val thr = conf.autoBroadcastJoinThreshold
    if (thr >= 0 && groupSide.stats.sizeInBytes <= thr) return None

    // one decomposition per distinct aggregate call, in stable catalog
    // order (a Map's value order would make the pre-aggregate's column
    // order nondeterministic across runs); duplicated identical calls
    // share one decomposition via the lookup map
    val decompSeq = aggCalls.distinct.map(ae => ae -> decompose(ae))
    val decompFor = decompSeq.toMap
    val preAgg = Aggregate(
      aggSideKeys,
      (aggSideKeys: Seq[NamedExpression]) ++ decompSeq.flatMap(_._2.partials),
      aggSide, None)
    // transformUp: a top-down transform would descend into the freshly
    // built replacement and re-match its inner Sum-over-partial node
    val merged = agg.aggregateExpressions.map(_.transformUp {
      case ae: AggregateExpression if decompFor.contains(ae) => decompFor(ae).merged
    }.asInstanceOf[NamedExpression])
    Some(agg.copy(aggregateExpressions = merged, child = buildJoin(preAgg)))
  }

  /** By the time extraOptimizations run, ColumnPruning has usually
    * interposed a pruning-only Project between the Aggregate and the
    * Join (the ADVICE-r6 interposition case). Attribute exprIds pass
    * through such a Project unchanged, so it is safe to look through it
    * and drop it in the rewrite — the final Aggregate and the
    * pre-aggregate reference exactly the columns they need, and the
    * physical planner re-projects. Aliasing Projects are NOT skipped. */
  private def unwrapJoin(p: LogicalPlan): Option[Join] = p match {
    case j: Join => Some(j)
    case Project(list, j: Join) if list.forall(_.isInstanceOf[AttributeReference]) =>
      Some(j)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(_, _, child, _)
        // a pre-aggregate below a stream-stream or stream-static join
        // would insert an extra stateful operator mid-stream — batch only
        if agg.resolved && !agg.isStreaming && unwrapJoin(child).exists(j =>
          j.resolved && j.joinType == Inner && j.condition.isDefined) =>
      val join = unwrapJoin(child).get
      val (left, right, cond, hint) =
        (join.left, join.right, join.condition.get, join.hint)
      equiKeys(cond, left, right).flatMap { keys =>
        // orientation 1: group over LEFT, aggregate over RIGHT
        tryRewrite(agg, join, left, right, keys.map(_._2),
          pre => Join(left, pre, Inner, Some(cond), hint))
          // orientation 2: group over RIGHT, aggregate over LEFT
          .orElse(tryRewrite(agg, join, right, left, keys.map(_._1),
            pre => Join(pre, right, Inner, Some(cond), hint)))
      }.getOrElse(agg)
  }
}
