package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, If, IsNull, LessThan, Literal, Not, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType}

/** Native argmin: the `value` (long) at the minimum `ord` (double),
  * ties broken by the SMALLER value — i.e. the aggregate form of
  * "first row ordered by (ord ASC, value ASC)", the deterministic
  * argmin every assignment step here needs (d10's nearest-centroid,
  * and any future nearest-entity join).
  *
  * Why it exists: the composable spellings are all non-scalable —
  * `min(struct(ord, value))` has an immutable buffer type, so Spark
  * plans a SortAggregate that SORTS the full pre-aggregation stream
  * (for an N×k nearest-centroid expansion that is N·k rows through a
  * sort: measured 14.6 s vs 4.1 s at sf1 on d10, and the gap widens
  * with scale); `min_by` keeps the first row on ties, which is
  * partitioning-dependent and breaks the hash oracle; a window
  * row_number shuffles the whole expansion. This aggregate keeps a
  * FLAT (double, long, bool) buffer — HashAggregate-eligible, fully
  * codegen'd update/merge, map-side partial aggregation — so the N×k
  * expansion collapses to one row per group per input partition and
  * never crosses the wire.
  *
  * Null contract: null ord or value rows are ignored (like min/max);
  * all-null or empty group yields null. */
case class ArgMinLong(ord: Expression, value: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(ord, value)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_argmin"

  override def checkInputDataTypes(): TypeCheckResult =
    (ord.dataType, value.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_argmin expects (double ord, bigint value), got $other")
    }

  private lazy val bestOrd =
    AttributeReference("bestOrd", DoubleType, nullable = false)()
  private lazy val bestVal =
    AttributeReference("bestVal", LongType, nullable = false)()
  private lazy val isEmpty =
    AttributeReference("isEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bestOrd, bestVal, isEmpty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0L), Literal(true))

  // (o2, v2) strictly better than buffer (o1, v1): lexicographic on
  // (ord, value). NaN ord sorts AFTER every real double under
  // LessThan's total order semantics here because NaN comparisons are
  // false — a NaN row can only win an empty buffer, matching the
  // "ignored unless nothing else" treatment doubles get in min().
  private def better(o1: Expression, v1: Expression,
      o2: Expression, v2: Expression): Expression =
    Or(LessThan(o2, o1), And(EqualTo(o2, o1), LessThan(v2, v1)))

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = And(Not(IsNull(ord)), Not(IsNull(value)))
    val take = And(valid, Or(isEmpty, better(bestOrd, bestVal, ord, value)))
    Seq(
      If(take, ord, bestOrd),
      If(take, value, bestVal),
      And(isEmpty, Not(valid)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = And(Not(isEmpty.right),
      Or(isEmpty.left,
        better(bestOrd.left, bestVal.left, bestOrd.right, bestVal.right)))
    Seq(
      If(take, bestOrd.right, bestOrd.left),
      If(take, bestVal.right, bestVal.left),
      And(isEmpty.left, isEmpty.right))
  }

  override lazy val evaluateExpression: Expression =
    If(isEmpty, Literal(null, LongType), bestVal)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgMinLong =
    copy(ord = newChildren(0), value = newChildren(1))
}

object ArgMinLong {
  import org.apache.spark.sql.{Column, GraftPlanShim}

  /** DataFrame-side constructor (no registry round trip). */
  def argmin(ord: Column, value: Column): Column =
    GraftPlanShim.column(
      ArgMinLong(GraftPlanShim.expression(ord),
        GraftPlanShim.expression(value)).toAggregateExpression())
}
