package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The commit-protocol paths the i18 oracle can't see: task abort
  * removes the staged file; driver commit publishes ONLY task-committed
  * files (a straggler that never task-committed — speculation, lost
  * executor — is swept, not published); job abort leaves the target
  * dir untouched. */
class AtomicSinkSpec extends AnyFunSuite {
  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("tag", StringType)))

  private def row(id: Long, tag: String): InternalRow =
    InternalRow(id, UTF8String.fromString(tag))

  private def newWrite(dir: String, queryId: String): AtomicBatchWrite =
    new AtomicBatchWrite(dir, schema, queryId, truncate = false)

  test("task abort deletes its staged file; commit publishes the rest") {
    val dir = graft.TempDirs.newTempDir("graft_atomic_spec_")
    val bw = newWrite(dir, "q1")
    val factory = bw.createBatchWriterFactory(null)

    val ok = factory.createWriter(0, 0L)
    ok.write(row(1, "a")); ok.write(row(2, "b"))
    val msg = ok.commit()

    val bad = factory.createWriter(1, 1L)
    bad.write(row(99, "zzz"))
    bad.abort()

    // a straggler that wrote but never task-committed (speculated copy)
    val straggler = factory.createWriter(0, 7L)
    straggler.write(row(1, "a"))
    straggler.asInstanceOf[AtomicDataWriter].close()

    bw.commit(Array[WriterCommitMessage](msg))

    val published = Files.list(Paths.get(dir)).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (published.hasNext) names += published.next().getFileName.toString
    assert(names.count(_.endsWith(".jsonl")) == 1,
      s"exactly the committed file should publish, got $names")
    assert(names.contains("_SUCCESS"))
    assert(!Files.exists(Paths.get(dir, "_staging", "q1")), "staging not swept")
    val manifest = new String(Files.readAllBytes(Paths.get(dir, "_SUCCESS")), "UTF-8")
    assert(manifest.contains("\"rows\":2"))
    assert(!manifest.contains("part-00001"), "aborted task leaked into manifest")
  }

  test("job abort leaves the target dir unpublished") {
    val dir = graft.TempDirs.newTempDir("graft_atomic_spec2_")
    val bw = newWrite(dir, "q2")
    val factory = bw.createBatchWriterFactory(null)
    val w = factory.createWriter(0, 0L)
    w.write(row(1, "a"))
    w.commit() // task committed, but the JOB fails before driver commit
    bw.abort(Array.empty)
    val listing = Files.list(Paths.get(dir)).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (listing.hasNext) names += listing.next().getFileName.toString
    assert(!names.exists(_.endsWith(".jsonl")), s"job abort published data: $names")
    assert(!names.contains("_SUCCESS"))
  }

  test("end-to-end write through the Spark API reads back exactly") {
    val s = SparkTestBase.spark
    import s.implicits._
    val dir = graft.TempDirs.newTempDir("graft_atomic_spec3_")
    val df = (1L to 100L).map(i => (i, s"t${i % 3}")).toDF("id", "tag")
    df.repartition(4).write.format("graft.sources.AtomicSinkProvider")
      .option("path", dir).mode("append").save()
    val manifest = new String(Files.readAllBytes(Paths.get(dir, "_SUCCESS")), "UTF-8")
    val files = manifest.split("\n").filter(_.nonEmpty).map(l => s"$dir/${l.split("\"")(3)}")
    assert(files.length == 4)
    val back = s.read.schema(StructType(Seq(
        StructField("id", LongType), StructField("tag", StringType))))
      .json(files.toSeq: _*)
    assert(back.count() == 100)
    assert(back.agg(org.apache.spark.sql.functions.sum($"id")).collect()(0).getLong(0)
      == 5050L)
  }
}
