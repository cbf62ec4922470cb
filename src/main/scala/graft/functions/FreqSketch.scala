package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Misra-Gries frequent-items sketch: a `TypedImperativeAggregate`
  * whose buffer is a bounded map of at most k (item, counter) pairs, the
  * textbook streaming heavy-hitters summary.
  *
  * Update (classic MG): a tracked item increments its counter; an
  * untracked item takes a free slot if one exists, otherwise ALL counters
  * decrement by one (zeros evicted) and the item is dropped. Merge is the
  * mergeable-summaries form (Agarwal et al., PODS'12): sum counters
  * pairwise, then if more than k survive, subtract the (k+1)-th largest
  * counter from every entry and evict the non-positive — which preserves
  * the MG guarantee under ANY merge tree, exactly what partial
  * aggregation needs (map-side partials combine in whatever order the
  * shuffle delivers them).
  *
  * Guarantee: every item with true frequency > n/(k+1) is present in the
  * final summary, regardless of partitioning or merge order. The summary
  * alone is a SUPERSET of the heavy hitters whose exact membership can
  * vary with merge order — so the catalog entry (u06) never exposes raw
  * sketch contents: it certifies candidates with a second exact counting
  * pass and filters on the true threshold, making the end result
  * deterministic and oracle-exact while the scan over the token stream
  * stays one bounded-state pass + one candidates-only pass.
  *
  * Scale: buffer is O(k) strings; the shuffle carries one such buffer per
  * (partition, group) like any built-in agg. No token ever shuffles.
  */
case class FreqSketch(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]] {

  private type Buf = java.util.HashMap[String, java.lang.Long]

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"graft_topfreq expects a string column, got ${child.dataType}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_topfreq expects a literal int k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topfreq"

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      val cur = buf.get(s)
      if (cur != null) buf.put(s, cur + 1L)
      else if (buf.size < k) buf.put(s, 1L)
      else {
        // decrement-all: O(k) only when the buffer is full AND the item
        // is new; amortized O(1) per stream element
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove()
          else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.forEach { (s, c) =>
      val cur = buf.get(s)
      buf.put(s, if (cur == null) c else java.lang.Long.valueOf(cur + c))
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from all; ≤ k survive
      val vals = new Array[Long](buf.size)
      var i = 0
      buf.forEach((_, c) => { vals(i) = c; i += 1 })
      java.util.Arrays.sort(vals)
      val d = vals(vals.length - 1 - k)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= d) it.remove()
        else e.setValue(e.getValue - d)
      }
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val keys = new Array[AnyRef](buf.size)
    var i = 0
    buf.forEach((s, _) => { keys(i) = s; i += 1 })
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys.map(s => UTF8String.fromString(s.asInstanceOf[String])))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    var bytes = 4
    val enc = new java.util.ArrayList[(Array[Byte], Long)](buf.size)
    buf.forEach { (s, c) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      enc.add((b, c)); bytes += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(enc.size)
    enc.forEach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    var n = bb.getInt
    while (n > 0) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      n -= 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object FreqSketch {
  val info = new ExpressionInfo(classOf[FreqSketch].getName, "graft_topfreq")
  val builder: Seq[Expression] => Expression = exprs =>
    FreqSketch(exprs.head, exprs(1)).toAggregateExpression()

  /** Session-scoped registration (mirrors [[BottomKHashes.register]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_topfreq", builder, "built-in")
}
