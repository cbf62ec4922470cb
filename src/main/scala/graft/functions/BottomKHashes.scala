package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native bottom-k (KMV) sketch aggregate: the k smallest DISTINCT int64
  * values per group, as a sorted array — a `TypedImperativeAggregate`,
  * the Catalyst extension point for aggregation state that doesn't fit a
  * fixed-width mutable row (SURVEY §2.2 names this for minhash-style
  * sketches).
  *
  * Why this sketch: over hashed keys, the k minima are a deterministic,
  * ORDER-INDEPENDENT uniform sample of the distinct keys (the classic
  * KMV/bottom-k distinct-count sketch: n-hat ~ (k-1)·M/h_k for hashes
  * uniform on [0, M)). Set-min semantics make it exactly reproducible
  * under any partitioning — unlike a reservoir sample, which depends on
  * encounter order — so the u05 catalog entry verifies bit-exact against
  * a DuckDB window-rank oracle.
  *
  * Scale: the buffer is a bounded size-k sorted set (bytes: 8k), partial
  * aggregation combines map-side, and the shuffle carries one small
  * buffer per (partition, group) — the same O(groups) shape as any
  * built-in agg. serialize/deserialize is exercised on every partial
  * exchange.
  */
case class BottomKHashes(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"graft_bottomk expects a bigint column, got ${child.dataType}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_bottomk expects a literal int k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottomk"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // Bounded insert: skip values already >= the current k-th minimum.
    if (buf.size < k || v < buf.last) {
      buf.add(v) // TreeSet dedups — DISTINCT semantics for free
      if (buf.size > k) buf.remove(buf.last)
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    other.forEach(v => add(buf, v))
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    buf.forEach { v => arr(i) = v; i += 1 } // TreeSet iterates ascending
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKHashes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKHashes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKHashes =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object BottomKHashes {
  val info = new ExpressionInfo(classOf[BottomKHashes].getName, "graft_bottomk")
  val builder: Seq[Expression] => Expression = exprs =>
    BottomKHashes(exprs.head, exprs(1)).toAggregateExpression()

  /** Session-scoped registration (mirrors [[CosineSim.register]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_bottomk", builder, "built-in")
}
