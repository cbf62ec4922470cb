package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, CurrentRow, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** AUTOMATIC insertion of the LocalTopKPerGroup prune (VERDICT r5 #1):
  * recognizes the rank-filter idiom a user actually writes —
  *
  *   Filter(rn <= k)
  *     +- Window [row_number() OVER (PARTITION BY g ORDER BY o) AS rn]
  *        +- child
  *
  * — and plants the bounded-heap prune under the Window (hence under the
  * exchange the Window requires), so the shuffle moves
  * O(partitions x groups x k) rows instead of every row. With this rule
  * installed the custom operator is real engine behavior, not a library
  * call: q48 writes the naive idiom and gets the pruned plan.
  *
  * Narrowness (the conditions that make the rewrite lossless):
  *  - `row_number` ONLY. rank()/dense_rank() keep ALL rows tied with the
  *    k-th — a k-heap cut would drop ties and change the answer. (For
  *    row_number a tie cut is indistinguishable from row_number's own
  *    arbitrary tie-break, so any heap choice yields a valid answer; a
  *    DETERMINISTIC answer additionally needs a total order, exactly as
  *    the bare window query does — same contract, see LocalTopK
  *    scaladoc.)
  *  - the Window hosts exactly ONE window expression — a sibling
  *    lag/sum-over needs the unpruned partition.
  *  - the frame is row_number's entire-partition row frame.
  *  - k is a positive literal bounded by MAX_K (heap holds k rows per
  *    group), extracted from any `rn <= k` / `rn < k` / `rn = 1`
  *    conjunct of the filter (casts stripped: q46-style
  *    `cast(rn AS bigint) <= 3` matches).
  *
  * Interaction with Spark's own InferWindowGroupLimit (3.5+): that rule
  * runs in the main optimizer batches and inserts a sort-based
  * WindowGroupLimit below the Window for the same idiom. This rule runs
  * in the User Provided Optimizers batch (after it) and REPLACES the
  * WindowGroupLimit node — substituting the heap cost model
  * (O(n log k) per partition, no sort buffer, memory bounded by
  * maxGroups with lossless pass-through overflow) for the sort-based
  * partial limit. When the built-in rule is disabled (threshold conf),
  * the bare Filter+Window shape is matched directly.
  */
object AutoLocalTopK extends Rule[LogicalPlan] with PredicateHelper {

  /** Heap width bound: mirrors the built-in rule's default
    * windowGroupLimitThreshold — past this, per-group heaps stop paying. */
  val MAX_K = 1000

  /** Per-partition heap-map cap for auto-inserted nodes: beyond this many
    * distinct group keys the exec streams rows through unpruned, so an
    * automatic rewrite can never blow memory on a high-cardinality group
    * column (it just stops helping — the regime where WindowGroupLimit's
    * sort doesn't help either). */
  val MAX_GROUPS = 1 << 16

  /** Strip only WIDENING integral casts (the `cast(rn AS bigint)` the
    * q46 idiom produces). A NARROWING cast must not be stripped: with
    * ANSI off, `CAST(rn AS TINYINT) <= 3` is also satisfied by
    * wrap-around rows (rn = 257, 258, ...) that a k=3 prune would make
    * unproducible — Spark's own InferWindowGroupLimit matches only the
    * bare attribute for the same reason. */
  private def stripWideningCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == LongType &&
        c.child.dataType == org.apache.spark.sql.types.IntegerType =>
      stripWideningCast(c.child)
    case other => other
  }

  private def isRn(e: Expression, rn: Attribute): Boolean = stripWideningCast(e) match {
    case a: Attribute => a.semanticEquals(rn)
    case _ => false
  }

  /** Int-valued literal (row_number is int; a long literal appears after
    * cast-to-bigint comparisons are constant-widened). */
  private object KLit {
    def unapply(e: Expression): Option[Int] = e match {
      case IntegerLiteral(v) => Some(v)
      case Literal(v: Long, LongType) if v >= Int.MinValue && v <= Int.MaxValue =>
        Some(v.toInt)
      case _ => None
    }
  }

  /** Smallest k implied by the filter's conjuncts on `rn`, if any. */
  private def limitFor(cond: Expression, rn: Attribute): Option[Int] = {
    val ks = splitConjunctivePredicates(cond).flatMap {
      case LessThanOrEqual(l, KLit(v)) if isRn(l, rn) => Some(v)
      case LessThan(l, KLit(v)) if isRn(l, rn) => Some(v - 1)
      case EqualTo(l, KLit(1)) if isRn(l, rn) => Some(1)
      case EqualTo(KLit(1), r) if isRn(r, rn) => Some(1)
      case GreaterThanOrEqual(KLit(v), r) if isRn(r, rn) => Some(v)
      case GreaterThan(KLit(v), r) if isRn(r, rn) => Some(v - 1)
      case _ => None
    }
    if (ks.isEmpty) None else Some(ks.min).filter(k => k > 0 && k <= MAX_K)
  }

  /** The single row_number alias of `w`, if that is all the Window does. */
  private def rowNumberAttr(w: Window): Option[Attribute] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(_: RowNumber,
        WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _))
        if w.orderSpec.nonEmpty =>
      Some(a.toAttribute)
    case _ => None
  }

  /** True when a prune is already planted below `p`, looking through any
    * column-pruning Projects: in the injectOptimizerRule path this rule
    * runs inside the fixed-point operator-optimization batch, where
    * ColumnPruning can interpose a Project between the Window and the
    * prune planted on a previous iteration — a bare instanceOf check
    * would miss it and stack a second, redundant heap pass (ADVICE r6).
    * Lossless either way, but the inner heap's work would be repeated. */
  private def hasPrune(p: LogicalPlan): Boolean = p match {
    case Project(_, child) => hasPrune(child)
    case _: LocalTopKPerGroup => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window) =>
      (for {
        rn <- rowNumberAttr(w)
        k <- limitFor(cond, rn)
      } yield w.child match {
        // Take over Spark's sort-based partial limit with the heap prune.
        case wgl: WindowGroupLimit if !hasPrune(wgl.child) =>
          f.copy(child = w.copy(child = LocalTopKPerGroup(
            math.min(k, wgl.limit), w.partitionSpec, w.orderSpec, wgl.child, MAX_GROUPS)))
        case c if !hasPrune(c) && !c.isInstanceOf[WindowGroupLimit] =>
          f.copy(child = w.copy(child = LocalTopKPerGroup(
            k, w.partitionSpec, w.orderSpec, c, MAX_GROUPS)))
        case _ => f // already rewritten: fixed-point stable
      }).getOrElse(f)
  }
}

/** One-call engine install: the custom planner strategy plus the
  * automatic top-k rewrite. Every session entry point (Verify, Bench,
  * Explain, tests) calls this so the catalog runs against the SAME
  * engine the production `spark.sql.extensions` flag configures. */
object GraftEngine {
  def install(spark: SparkSession): Unit = {
    LocalTopK.register(spark)
    AsofJoin.register(spark)
    // Same rule set as GraftPlanExtensions — including the HOF dot
    // rewrite, so plan parity between the two install paths never
    // depends on which catalog entry happens to register it first.
    RewriteHofDotProduct.register(spark)
    if (!spark.experimental.extraOptimizations.contains(RewriteBinnedRangeJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteBinnedRangeJoin
    if (!spark.experimental.extraOptimizations.contains(AutoLocalTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AutoLocalTopK
    if (!spark.experimental.extraOptimizations.contains(RewriteEagerAgg))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteEagerAgg
    RewriteBitmapDistinct.register(spark)
    RewriteSelfJoinAgg.register(spark)
    RewriteOrExpansion.register(spark)
    TableConstraints.registerStarSchema()
    RewriteJoinElimination.register(spark)
    RewriteTopKThroughJoin.register(spark)
    RewriteDistinctByKey.register(spark)
    RewriteNotInToAnti.register(spark)
  }
}
