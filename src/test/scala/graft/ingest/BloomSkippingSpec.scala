package graft.ingest

import java.util.concurrent.atomic.LongAdder

import graft.SparkTestBase
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** i19's claim — bloom filters skip row groups for point lookups on a
  * layout where min/max stats are useless: both layouts below are
  * hash-scattered (every row group spans the whole doc_id range); only
  * one writes blooms. The bloomed scan must read strictly fewer rows
  * for the same IN probe. */
class BloomSkippingSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = "/root/testdata/sf0.01"

  private def readCounting(body: => Long): Long = {
    val read = new LongAdder
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) read.add(m.inputMetrics.recordsRead)
      }
    }
    s.sparkContext.addSparkListener(listener)
    try { body; SparkTestBase.drainListener(() => read.sum); read.sum }
    finally s.sparkContext.removeSparkListener(listener)
  }

  test("bloom filters skip row groups that min/max stats cannot") {
    val base = graft.Tables.t(s, d, "documents").repartition(4, col("source"))
    val dir = graft.TempDirs.newTempDir("graft_bloom_spec_")
    base.write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#doc_id", "true")
      .option("parquet.bloom.filter.expected.ndv#doc_id", "1000")
      .option("parquet.block.size", 32 * 1024)
      .parquet(s"$dir/with_bloom")
    base.write.mode("overwrite")
      .option("parquet.block.size", 32 * 1024)
      .parquet(s"$dir/no_bloom")

    def probe(path: String): Long =
      readCounting {
        s.read.parquet(path).filter(col("doc_id").isin(7, 211, 499)).count()
      }

    val withBloom = probe(s"$dir/with_bloom")
    val noBloom = probe(s"$dir/no_bloom")
    assert(noBloom > 0)
    assert(withBloom < noBloom,
      s"bloom read $withBloom rows vs $noBloom without — no row group skipped")
  }
}
