package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Shared by interpreted eval and generated code (generated classes call
  * it by fqn — graft classes ride the executor classpath). */
object SortedSearch {
  def contains(arr: ArrayData, v: Long): Boolean = {
    var lo = 0
    var hi = arr.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val m = arr.getLong(mid)
      if (m == v) return true
      if (m < v) lo = mid + 1 else hi = mid - 1
    }
    false
  }

  def contains(arr: Array[Long], v: Long): Boolean =
    java.util.Arrays.binarySearch(arr, v) >= 0

  /** Value aligned with the sorted key array, 0 when absent. */
  def lookup(keys: Array[Long], vals: Array[Long], v: Long): Long = {
    val i = java.util.Arrays.binarySearch(keys, v)
    if (i >= 0) vals(i) else 0L
  }

  /** Number of elements <= v in an ascending-sorted double array
    * (upper-bound binary search; ties count every equal element). */
  def rankLe(arr: Array[Double], v: Double): Long = {
    var lo = 0
    var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}

/** O(log n) membership test against a SORTED long array — the broadcast
  * blocklist probe `array_contains` can't be: array_contains is a linear
  * scan, so a per-row probe against a corpus-derived set costs
  * O(rows × |set|) and took d16's rewrite pass to 77 s at sf0.1 the
  * moment the synthetic corpus's 40-word vocabulary made the hot-span
  * set corpus-proportional (~50k entries) instead of boilerplate-sized.
  * Binary search makes the same plan O(rows × log |set|) — 16
  * comparisons against the pathological 50k set — while keeping the
  * zero-shuffle broadcast-HOF shape.
  *
  * Contract: the array argument is sorted ascending with no nulls (build
  * it with sort_array over an agg of non-null longs); elements are probed
  * with exact long equality. Inside a higher-order filter() this runs in
  * eval mode (HOFs don't codegen) — the win here is algorithmic, not
  * codegen; doGenCode is provided for flat-projection callers. */
case class SortedLongContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_contains expects (array<bigint>, bigint), got ($l, $r)")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_sorted_contains"

  override def nullSafeEval(arr: Any, v: Any): Any =
    SortedSearch.contains(arr.asInstanceOf[ArrayData], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, v) =>
      s"${ev.value} = graft.functions.SortedSearch.contains($a, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongContains =
    copy(left = newLeft, right = newRight)
}

/** [[SortedLongContains]] with the set OFF-ROW: the sorted array lives in
  * a Spark broadcast, not in a column. Carrying a corpus-derived set as a
  * (broadcast-joined) COLUMN puts it in the row schema, and any plan
  * boundary that materializes rows then memcpys the whole set PER ROW —
  * d16's rewrite measured 207 s at sf10 because the HOF condition blocks
  * codegen, so the nested-loop join's interpreted path wrote each doc row
  * with its 21 MB hotset attached (rows × |set| bytes, the array_contains
  * disease reborn as memcpy). A broadcast handle serializes in bytes, the
  * value is fetched once per executor, and the probe stays O(log n).
  *
  * The driver materializes the array once to create the broadcast, so
  * callers must BOUND it (d16 gates this path on a size budget and falls
  * back to an anti-join form beyond it). */
case class BroadcastSortedContains(
    bc: org.apache.spark.broadcast.Broadcast[Array[Long]],
    child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bc_sorted_contains expects bigint, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bc_sorted_contains"

  // Broadcast.value() pays assertValid + a soft-ref lookup per call;
  // hoist the unwrapped array so per-row work is the binary search alone
  // (interpreted path: once per deserialized task instance).
  @transient private lazy val arr: Array[Long] = bc.value

  override def nullSafeEval(v: Any): Any =
    SortedSearch.contains(arr, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("hotsetBc", bc,
      "org.apache.spark.broadcast.Broadcast<long[]>")
    val arrTerm = ctx.addMutableState("long[]", "hotsetArr",
      v => s"$v = (long[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SortedSearch.contains($arrTerm, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BroadcastSortedContains =
    copy(child = newChild)
}

/** Off-row broadcast (sorted keys, aligned values) lookup: value at the
  * probed key, or 0 when absent. The d19 order-key build probes each
  * token's corpus count from a budget-bounded broadcast (absent = below
  * the frequency floor = effectively rare = 0, exactly the ordering the
  * prefix filter wants). Same off-row discipline as
  * [[BroadcastSortedContains]]: the table never enters the row schema,
  * so no plan boundary can copy it per row. */
case class BroadcastSortedLookup(
    keysBc: org.apache.spark.broadcast.Broadcast[Array[Long]],
    valsBc: org.apache.spark.broadcast.Broadcast[Array[Long]],
    child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bc_sorted_lookup expects bigint, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bc_sorted_lookup"

  @transient private lazy val keys: Array[Long] = keysBc.value
  @transient private lazy val vals: Array[Long] = valsBc.value

  override def nullSafeEval(v: Any): Any =
    SortedSearch.lookup(keys, vals, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("lookupKeysBc", keysBc,
      "org.apache.spark.broadcast.Broadcast<long[]>")
    val vRef = ctx.addReferenceObj("lookupValsBc", valsBc,
      "org.apache.spark.broadcast.Broadcast<long[]>")
    val kTerm = ctx.addMutableState("long[]", "lookupKeys",
      v => s"$v = (long[]) $kRef.value();")
    val vTerm = ctx.addMutableState("long[]", "lookupVals",
      v => s"$v = (long[]) $vRef.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SortedSearch.lookup($kTerm, $vTerm, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BroadcastSortedLookup =
    copy(child = newChild)
}

/** Off-row broadcast equi-depth bucketing: rank of `child` in an
  * ascending-sorted broadcast double array (count of boundaries <= v,
  * O(log n) binary search). Replaces q101/q102's
  * `size(filter(boundaries, b => v >= b))` — a per-row O(|boundaries|)
  * interpreted HOF over a crossJoin-broadcast array column — with a
  * codegen'd expression whose array never enters the row schema. The
  * bucket id only steers work placement (the q102 invariant), never
  * the answer. */
case class BroadcastSortedRank(
    bc: org.apache.spark.broadcast.Broadcast[Array[Double]],
    child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bc_sorted_rank expects double, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bc_sorted_rank"

  @transient private lazy val bounds: Array[Double] = bc.value

  override def nullSafeEval(v: Any): Any =
    SortedSearch.rankLe(bounds, v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("rankBc", bc,
      "org.apache.spark.broadcast.Broadcast<double[]>")
    val bTerm = ctx.addMutableState("double[]", "rankBounds",
      v => s"$v = (double[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SortedSearch.rankLe($bTerm, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BroadcastSortedRank =
    copy(child = newChild)
}

/** Off-row broadcast Bloom-filter membership probe — the §3.2
  * "pre-filter the big side before its exchange" guide pattern as a
  * codegen'd expression. d08's scalar-UDF probe is fine at batch-row
  * volumes; this exists for streams where the probe sits on a
  * billions-of-rows hot path (p04's wedge stream) and a boxing closure
  * would become the stage's own term. False positives only cost their
  * share of the downstream exchange; there are NO false negatives, so a
  * confirming equi join downstream is unchanged — the filter routes,
  * the join answers. Same off-row discipline as
  * [[BroadcastSortedContains]]: the filter never enters the row schema. */
case class BroadcastBloomContains(
    bc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter],
    child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bc_bloom_contains expects bigint, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bc_bloom_contains"

  // The probe sits on p04's Θ(Σd²) wedge stream: TorrentBroadcast.value()
  // does assertValid + a lookup per call, so hoist the unwrapped filter
  // into per-instance state and probe that field (r15 ADVICE).
  @transient private lazy val filter = bc.value

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bc,
      "org.apache.spark.broadcast.Broadcast<org.apache.spark.util.sketch.BloomFilter>")
    val fTerm = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
      "bloomFilter",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $fTerm.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BroadcastBloomContains =
    copy(child = newChild)
}
