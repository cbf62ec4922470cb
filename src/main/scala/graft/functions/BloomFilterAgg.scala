package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Distributed Bloom-filter build: aggregates int64 keys into a serialized
  * `org.apache.spark.util.sketch.BloomFilter` per group — the missing
  * half of the sharded-bloom incremental-dedup design (d09). d08 builds
  * ONE filter driver-side via `stat.bloomFilter` (a collect-shaped
  * bottleneck and a single broadcast blob); this aggregate builds ONE
  * FILTER PER GROUP map-side, merged like any partial agg, so a
  * trillion-key corpus can shard into per-key-range filters none of
  * which has to fit the broadcast budget.
  *
  * Scale: the buffer is a fixed-size bit array determined by (capacity,
  * fpp) — independent of input row count — and partial aggregation
  * merges bit-arrays with OR. The shuffle carries one buffer per
  * (partition, group), exactly the shape of any built-in sketch agg.
  * Capacity/fpp are literals: in production they come from persisted
  * corpus stats (key count per shard), not a pre-count of the input.
  */
case class BloomFilterAgg(
    child: Expression,
    capExpr: Expression,
    fppExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter] {

  private lazy val capacity: Long = capExpr.eval(InternalRow.empty) match {
    case i: Int => i.toLong
    case l: Long => l
  }
  private lazy val fpp: Double = fppExpr.eval(InternalRow.empty).asInstanceOf[Double]

  override def children: Seq[Expression] = Seq(child, capExpr, fppExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom expects a bigint column, got ${child.dataType}")
    else if (!capExpr.foldable || !(capExpr.dataType == LongType ||
        capExpr.dataType == org.apache.spark.sql.types.IntegerType))
      TypeCheckResult.TypeCheckFailure("graft_bloom expects a literal bigint capacity")
    else if (!fppExpr.foldable || fppExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure("graft_bloom expects a literal double fpp")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(capacity, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    // Same (capacity, fpp) literals on every partial => compatible bit
    // arrays; merge is bitwise OR.
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren(0), capExpr = newChildren(1), fppExpr = newChildren(2))
}

object BloomFilterAgg {
  val info = new ExpressionInfo(classOf[BloomFilterAgg].getName, "graft_bloom")
  val builder: Seq[Expression] => Expression = exprs =>
    BloomFilterAgg(exprs.head, exprs(1), exprs(2)).toAggregateExpression()

  /** Session-scoped registration (mirrors [[BottomKHashes.register]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_bloom", builder, "built-in")
}
