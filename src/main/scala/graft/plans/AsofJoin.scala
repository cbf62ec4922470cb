package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** As-of join as a WHOLE-OPERATOR Catalyst extension (VERDICT r5 #4) —
  * the long-term shape SURVEY §2.2 names, replacing the union+window
  * trick (q29) with a real range-merge physical operator:
  *
  *   for each left row, the matching right row is the one with the
  *   greatest rightTime <= leftTime among equal keys (LEFT OUTER: no
  *   match => nulls) — the standard "latest quote before each trade"
  *   semantics.
  *
  * Physical strategy: both sides hash-co-partitioned on the key
  * (ClusteredDistribution, exactly like a shuffled join) and sorted by
  * (key, time) (requiredChildOrdering, so EnsureRequirements plants the
  * sorts/exchanges), then ONE STREAMING MERGE PASS per partition with a
  * single remembered candidate row — O(|L|+|R|) time and O(1) state
  * beyond the sort. Versus the union+window form this never widens rows
  * to the union schema, never runs a window buffer, and keeps each
  * side's columns pruned to what it actually carries; versus a range
  * join it never materializes the (left x candidate-window) blowup.
  * At 100 TB both sides shuffle once on the key — the minimum any
  * key-matched join pays — and the merge is a single forward cursor.
  */
case class AsofJoinPlan(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: LogicalPlan,
    right: LogicalPlan)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Same contract as a shuffled equi-join: both children clustered on
  // their keys; EnsureRequirements makes the two partitionings
  // compatible (or plants exchanges).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val (lOut, rOut) = (left.output, right.output)
    val (lKeys, rKeys, lTime, rTime) = (leftKeys, rightKeys, leftTime, rightTime)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // Merge state: the left key group the candidate belongs to, and the
      // best (= latest-so-far) right row within it. O(1) rows held.
      var groupKey: InternalRow = null
      var candidate: InternalRow = null
      lIter.map { l =>
        val lk = lKeyProj(l)
        if (lk.anyNull || lTimeProj(l).isNullAt(0)) {
          // SQL semantics: a null key/time satisfies no comparison.
          joined(l, nullRight)
        } else {
          val lt = lTimeProj(l) // stable until the next left row
          if (groupKey == null || keyOrd.compare(lk, groupKey) != 0) {
            groupKey = lk.copy(); candidate = null
          }
          var advancing = rBuf.hasNext
          while (advancing) {
            val r = rBuf.head
            val rk = rKeyProj(r)
            // Null right keys sort first under NULLS FIRST and match
            // nothing — skip past them like a key below the current one.
            val cmp = if (rk.anyNull) -1 else keyOrd.compare(rk, lk)
            if (cmp < 0 || (cmp == 0 && rTimeProj(r).isNullAt(0))) {
              // below the current key, or an equal-key row with null time
              // (sorted first in its group, matches nothing): skip past.
              rBuf.next(); advancing = rBuf.hasNext
            } else if (cmp == 0 && timeOrd.compare(rTimeProj(r), lt) <= 0) {
              candidate = r.copy(); rBuf.next(); advancing = rBuf.hasNext
            } else advancing = false
          }
          joined(l, if (candidate != null) candidate else nullRight)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(lk, rk, lt, rt, l, r) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsofJoin {
  /** Install the strategy once per session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy

  /** Library API: LEFT OUTER as-of join — for each `left` row, the
    * `right` row with the greatest `rightTime <= leftTime` among equal
    * keys, or nulls. Output columns = left's then right's (keep the two
    * sides' names disjoint). */
  def asof(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    import org.apache.spark.sql.GraftPlanShim._
    val (lk, rk) = (leftKeys.map(expression), rightKeys.map(expression))
    val (lt, rt) = (expression(leftTime), expression(rightTime))
    // Unlike a real Join there is no analyzer type coercion here, and the
    // exec's comparators are built from the LEFT side's types — a dtype
    // mismatch would read wrong bytes and emit garbage matches silently.
    // Fail loudly instead; callers cast explicitly.
    require(lk.length == rk.length,
      s"asof: ${lk.length} left keys vs ${rk.length} right keys")
    lk.zip(rk).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"asof: key type mismatch ${l.dataType} vs ${r.dataType} — cast explicitly")
    }
    require(lt.dataType == rt.dataType,
      s"asof: time type mismatch ${lt.dataType} vs ${rt.dataType} — cast explicitly")
    ofRows(spark, AsofJoinPlan(lk, rk, lt, rt, logicalPlan(left), logicalPlan(right)))
  }
}
