package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path (the dual of [[ArticleSourceProvider]]'s read
  * path — with this, every DSv2 surface the engine uses is custom-
  * exercised): a manifest-committed atomic batch sink.
  *
  * The commit protocol is the one every exactly-once file sink uses
  * (FileOutputCommitter v1, Iceberg/Delta manifest commits):
  *  1. each TASK writes its rows to `_staging/<queryId>/part-p-t.jsonl`
  *     and returns the staged name in its WriterCommitMessage; a failed
  *     or speculated-away task ABORTS, deleting its own staged file;
  *  2. the DRIVER commit() — which Spark calls exactly once, only with
  *     messages from tasks that task-committed — renames the staged
  *     files into the target dir and writes a `_SUCCESS` manifest
  *     listing exactly the committed files with their row counts.
  * Readers that honor the manifest (the entry's read-back does) see the
  * write all-or-nothing: no torn output under task retry, speculation,
  * or job abort. Staged files never listed in any message are swept by
  * driver commit/abort. On a real object store the renames become
  * copy+delete or the manifest points at staged paths directly
  * (Iceberg's choice); the protocol — and this code — is unchanged.
  *
  * Types supported: long/int/double/string/boolean/timestamp (micros) —
  * JSON lines via Jackson, so the committed files read back with
  * `spark.read.schema(...).json`. `i18_v2_atomic_sink` writes events
  * through it and hash-matches the read-back aggregate; `AtomicSinkSpec`
  * drives the task-abort and straggler-sweep paths directly. */
class AtomicSinkProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  // write-only source: schema always arrives from the query
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil)
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AtomicSinkTable(schema, properties.get("path"))
}

final class AtomicSinkTable(schema: StructType, path: String)
    extends Table with SupportsWrite {
  require(path != null, "AtomicSinkProvider requires option(\"path\", ...)")
  override def name(): String = s"graft-atomic-sink($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new AtomicBatchWrite(path, info.schema(), info.queryId(), doTruncate)
      }
    }
}

final case class StagedFile(name: String, rows: Long) extends WriterCommitMessage

final class AtomicBatchWrite(
    path: String, schema: StructType, queryId: String, truncate: Boolean)
    extends BatchWrite {
  import java.nio.file.{Files, Paths, StandardCopyOption}

  private def staging = Paths.get(path, "_staging", queryId)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(staging)
    AtomicWriterFactory(path, schema.json, queryId)
  }

  /** Driver-side atomic publish: rename exactly the task-committed files
    * into place, manifest them, sweep everything else. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val committed = messages.collect { case s: StagedFile => s }
    if (truncate) {
      val st = Files.list(Paths.get(path))
      try st.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".jsonl"))
        .foreach(Files.delete(_))
      finally st.close()
      Files.deleteIfExists(Paths.get(path, "_SUCCESS"))
    }
    committed.foreach { s =>
      Files.move(staging.resolve(s.name), Paths.get(path, s.name),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val manifest = committed.sortBy(_.name)
      .map(s => s"""{"file":"${s.name}","rows":${s.rows}}""").mkString("\n")
    Files.write(Paths.get(path, "_SUCCESS"), manifest.getBytes("UTF-8"))
    sweepStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = sweepStaging()

  private def sweepStaging(): Unit = {
    if (Files.exists(staging)) {
      val st = Files.list(staging)
      try st.iterator().asScala.foreach(Files.deleteIfExists(_))
      finally st.close()
      Files.deleteIfExists(staging)
    }
  }
}

final case class AtomicWriterFactory(path: String, schemaJson: String, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AtomicDataWriter(path, schemaJson, queryId, partitionId, taskId)
}

final class AtomicDataWriter(
    path: String, schemaJson: String, queryId: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  import java.nio.file.{Files, Paths}

  private val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  private val name = f"part-$partitionId%05d-$taskId.jsonl"
  private val staged = Paths.get(path, "_staging", queryId, name)
  private val out = Files.newBufferedWriter(staged)
  private val mapper = new ObjectMapper()
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) node.putNull(f.name)
      else f.dataType match {
        case LongType => node.put(f.name, row.getLong(i))
        case IntegerType => node.put(f.name, row.getInt(i))
        case DoubleType => node.put(f.name, row.getDouble(i))
        case StringType => node.put(f.name, row.getUTF8String(i).toString)
        case BooleanType => node.put(f.name, row.getBoolean(i))
        case TimestampType => node.put(f.name, row.getLong(i)) // micros
        case other => throw new IllegalArgumentException(
          s"AtomicSink: unsupported type $other for field ${f.name}")
      }
    }
    out.write(mapper.writeValueAsString(node))
    out.newLine()
    rows += 1
  }

  override def commit(): WriterCommitMessage = { out.close(); StagedFile(name, rows) }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(staged); () }
  override def close(): Unit = ()
}
