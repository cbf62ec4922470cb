package graft.ingest

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** i17's scale claim — the parts its oracle can't check: the rewrite
  * must actually collapse the file count (64 fragments → 4 compacted
  * files) and, because the compaction key is repartitionByRange(ts),
  * the compacted files must carry DISJOINT ts spans (so i16-style
  * min/max skipping works post-compaction). The entry's fn creates its
  * dirs internally; the spec locates them by their TempDirs prefix. */
class CompactionSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = "/root/testdata/sf0.001"

  private def dataFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val st = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    } finally st.close()
  }

  test("compaction collapses 64 fragments into 4 range-disjoint files") {
    val before = System.currentTimeMillis()
    val rows = IngestQueries.i17Compaction.fn(s, d).collect()
    assert(rows.nonEmpty)
    // locate the entry's own temp dir (newest graft_compact_* since start)
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val st = java.nio.file.Files.list(tmp)
    val root = try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala
        .filter(_.getFileName.toString.startsWith("graft_compact_"))
        .filter(p => java.nio.file.Files.getLastModifiedTime(p).toMillis >= before - 1000)
        .toSeq.sortBy(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .last
    } finally st.close()
    val frag = dataFiles(root.resolve("fragmented"))
    val comp = dataFiles(root.resolve("compacted"))
    assert(frag.size == 64, s"expected 64 fragments, got ${frag.size}")
    assert(comp.size == 4, s"expected 4 compacted files, got ${comp.size}")
    // per-file ts spans must not overlap (range layout)
    import org.apache.spark.sql.functions._
    val spans = comp.map { f =>
      val r = s.read.parquet(f.toString)
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping compacted ranges: $spans")
      case _ => ()
    }
    // lossless: row count preserved through both layouts
    val n0 = graft.Tables.t(s, d, "events").count()
    val n2 = s.read.parquet(root.resolve("compacted").toString).count()
    assert(n0 == n2, s"row count changed in compaction: $n0 -> $n2")
  }
}
