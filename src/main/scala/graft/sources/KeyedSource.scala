package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source that REPORTS ITS PARTITIONING — the connector
  * contract behind storage-partitioned joins (SPJ), the mechanism an
  * Iceberg/Hudi-class table format uses to join two co-bucketed 100 TB
  * tables with ZERO shuffle: the scan declares
  * `KeyGroupedPartitioning(identity(bucket), n)` via
  * [[SupportsReportPartitioning]], every input partition names its key
  * through [[HasPartitionKey]], and with
  * `spark.sql.sources.v2.bucketing.enabled` Catalyst's
  * EnsureRequirements recognizes the two sides as co-partitioned and
  * plans the join with no exchange on either side.
  *
  * Data layout: a directory of CSV chunk files (written by the entry
  * from test-table projections) with fixed schema (k BIGINT, num
  * DOUBLE, tag STRING); the source adds a materialized `bucket =
  * k % buckets` INT column — the partition key. Each of the `buckets`
  * input partitions scans the chunk files and keeps its own residue
  * class. A production connector maps pre-bucketed FILES to partitions
  * instead of re-filtering (this source demonstrates the PLANNING
  * contract; the read path is demo-grade at test scale, and the
  * filtering happens on executors, in parallel, either way).
  *
  * Usage: spark.read.format("graft.sources.KeyedSourceProvider")
  *          .option("path", dir).option("buckets", 8).load()
  */
class KeyedSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KeyedTable(properties.get("path"),
      Option(properties.get("buckets")).map(_.toInt).getOrElse(8),
      Option(properties.get("ordered")).exists(_.toBoolean))
}

object KeyedSource {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("num", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("bucket", IntegerType, nullable = false)))

  /** All CSV chunk files under the source path, name-ordered. */
  def csvFiles(path: String): Seq[String] = {
    val base = new java.io.File(path)
    Option(base.listFiles()).getOrElse(
      throw new IllegalArgumentException(
        s"keyed source path is not a readable directory: $path"))
      .toSeq.filter(f => f.isFile && f.getName.endsWith(".csv"))
      .sortBy(_.getName).map(_.getPath)
  }
}

class KeyedTable(path: String, buckets: Int, ordered: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"keyed($path, $buckets)"
  override def schema(): StructType = KeyedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new KeyedScan(path, buckets, ordered)
}

class KeyedScan(path: String, buckets: Int, ordered: Boolean = false)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsReportOrdering {
  override def readSchema(): StructType = KeyedSource.schema
  override def toBatch: Batch = this
  override def description(): String = s"KeyedScan(buckets=$buckets)"

  // the SPJ handshake: partitioning = identity over the bucket column
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("bucket")), buckets)

  /** The SORTED-layout handshake ([[SupportsReportOrdering]], the
    * planning contract a table format exposes when files are written
    * key-sorted): each partition holds one bucket (constant) and its
    * reader yields rows in ascending-k order provided the chunk-file
    * concatenation is globally k-sorted — which `ordered=true` ASSERTS,
    * exactly as Iceberg's sort-order metadata asserts it about its data
    * files; the writer, not the scan, is responsible for making it
    * true. With the ordering reported, EnsureRequirements drops the
    * SortExec under a sort-merge join of two such tables — combined
    * with the partitioning report above, a 100 TB fact⋈fact join runs
    * with ZERO exchange and ZERO sort. */
  override def outputOrdering(): Array[expressions.SortOrder] =
    if (ordered) Array(
      Expressions.sort(Expressions.column("bucket"),
        expressions.SortDirection.ASCENDING),
      Expressions.sort(Expressions.column("k"),
        expressions.SortDirection.ASCENDING))
    else Array.empty

  override def planInputPartitions(): Array[InputPartition] = {
    val files = KeyedSource.csvFiles(path)
    (0 until buckets).map(b => KeyedPartition(b, buckets, files): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new KeyedReaderFactory
}

case class KeyedPartition(bucket: Int, buckets: Int, files: Seq[String])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

class KeyedReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kp = p.asInstanceOf[KeyedPartition]
    new PartitionReader[InternalRow] {
      private val lines = kp.files.iterator.flatMap { f =>
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines().toVector finally src.close()
      }
      private var row: InternalRow = _
      override def next(): Boolean = {
        while (lines.hasNext) {
          val line = lines.next()
          if (line.nonEmpty) {
            // fixed 3-column layout, tag last (tags carry no commas)
            val c1 = line.indexOf(',')
            val c2 = line.indexOf(',', c1 + 1)
            val k = line.substring(0, c1).toLong
            // floorMod: negative keys still land in [0, buckets)
            if (java.lang.Math.floorMod(k, kp.buckets.toLong) == kp.bucket) {
              row = InternalRow(
                k,
                java.lang.Double.parseDouble(line.substring(c1 + 1, c2)),
                UTF8String.fromString(line.substring(c2 + 1)),
                kp.bucket)
              return true
            }
          }
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
