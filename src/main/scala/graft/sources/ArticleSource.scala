package graft.sources

import java.util
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the reference's paginated article
  * source (SURVEY §2.1 O1) with the sorted-scan early-stop pushdown (O8)
  * — the one reference behavior Spark's built-in readers cannot express:
  * the feed is newest-first, so once one row is at-or-below the watermark
  * the REST of that page and every later page can be skipped entirely
  * (/root/reference/fetch_articles.py:102-104 returns mid-page).
  *
  * Usage: spark.read.format("graft.sources.ArticleSourceProvider")
  *          .option("path", dir).load()
  *
  * Planning strategy mirrors the two reference modes:
  *  - no watermark filter pushed (backfill): one InputPartition PER PAGE —
  *    pages scan in parallel, like any file source;
  *  - watermark filter pushed (incremental): ONE partition walking pages
  *    in ascending page order, stopping the whole scan at the first stale
  *    parsed row. The feed order is the reference's contract; sequential
  *    consumption is inherent to early termination, and the row volume in
  *    this mode is the small "new since watermark" delta by construction.
  *
  * The pushed filter stays a residual (Spark re-applies it), so the stop
  * is purely an optimization — malformed rows pass through to the engine,
  * which drops them exactly like the PERMISSIVE path (O6).
  */
class ArticleSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArticleSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ArticleTable(properties.get("path"))
}

object ArticleSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("published_at", StringType),
    StructField("title", StringType),
    StructField("page", IntegerType)))

  /** Pages actually parsed — lets tests prove the early stop skipped
    * later pages rather than reading-then-filtering them. */
  val pagesParsed = new java.util.concurrent.atomic.AtomicLong(0)

  def parseIso(v: String): Option[java.time.Instant] =
    try Some(java.time.Instant.parse(v)) catch { case _: Exception => None }

  /** Sorted page dirs (page=N) under the source path, ascending N. */
  def pageFiles(path: String): Seq[(Int, java.io.File)] = {
    val base = new java.io.File(path)
    base.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("page="))
      .map(f => f.getName.stripPrefix("page=").toInt -> f.listFiles().head)
      .sortBy(_._1)
  }
}

class ArticleTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"articles($path)"
  override def schema(): StructType = ArticleSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArticleScanBuilder(path)
}

class ArticleScanBuilder(path: String) extends ScanBuilder with SupportsPushDownFilters {
  private var watermark: Option[String] = None
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Accept `published_at > <literal>` as the scan-stop watermark; every
    // filter (including the accepted one) remains residual — the source
    // may emit rows below the watermark (the stale row that triggered the
    // stop, malformed rows) and the engine finishes the job.
    pushed = filters.collect {
      case f @ GreaterThan("published_at", v: String) =>
        watermark = Some(v); f
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new ArticleScan(path, watermark)
}

class ArticleScan(path: String, watermark: Option[String]) extends Scan with Batch {
  override def readSchema(): StructType = ArticleSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"ArticleScan(watermarkStop=${watermark.getOrElse("none")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val pages = ArticleSource.pageFiles(path)
    watermark match {
      case Some(_) => Array(ArticlePartition(pages.map { case (p, f) => (p, f.getPath) }))
      case None => pages.map { case (p, f) => ArticlePartition(Seq((p, f.getPath))) }.toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ArticleReaderFactory(watermark)
}

case class ArticlePartition(pages: Seq[(Int, String)]) extends InputPartition

class ArticleReaderFactory(watermark: Option[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ArticleReader(partition.asInstanceOf[ArticlePartition], watermark)
}

class ArticleReader(partition: ArticlePartition, watermark: Option[String])
    extends PartitionReader[InternalRow] {

  private val wmInstant = watermark.flatMap(ArticleSource.parseIso)
  private val pageQueue = mutable.Queue(partition.pages: _*)
  private var rows: Iterator[InternalRow] = Iterator.empty
  private var stopped = false
  private var current: InternalRow = _

  private def loadNextPage(): Boolean = {
    if (stopped || pageQueue.isEmpty) return false
    val (page, file) = pageQueue.dequeue()
    ArticleSource.pagesParsed.incrementAndGet()
    val mapper = new ObjectMapper()
    val arr = mapper.readTree(new java.io.File(file))
    val buf = mutable.ArrayBuffer.empty[InternalRow]
    val it = arr.elements().asScala
    var pageStopped = false
    while (it.hasNext && !pageStopped) {
      val node = it.next()
      val ts = Option(node.get("published_at")).filter(!_.isNull).map(_.asText())
      // O8: first PARSED row at-or-below the watermark ends the entire
      // scan mid-page (strict >, so == stops too). Malformed rows are
      // emitted and left to the engine's residual filter — they must not
      // terminate the scan (O6 is log-and-continue).
      val stale = (for (w <- wmInstant; t <- ts.flatMap(ArticleSource.parseIso))
        yield !t.isAfter(w)).getOrElse(false)
      if (stale) {
        pageStopped = true
        stopped = true
      } else {
        buf += InternalRow(
          Option(node.get("id")).filter(!_.isNull).map(n => java.lang.Long.valueOf(n.asLong)).orNull,
          ts.map(UTF8String.fromString).orNull,
          Option(node.get("title")).filter(!_.isNull).map(n => UTF8String.fromString(n.asText)).orNull,
          page)
      }
    }
    // An empty page terminates the incremental scan too (fetch_articles.py:90-91)
    if (!arr.elements().hasNext && wmInstant.isDefined) stopped = true
    rows = buf.iterator
    true
  }

  override def next(): Boolean = {
    while (!rows.hasNext) if (!loadNextPage()) return false
    current = rows.next()
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
