package graft.ingest

import java.util.concurrent.atomic.LongAdder

import graft.SparkTestBase
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.scalatest.funsuite.AnyFunSuite

/** i16's scale claim — the part its oracle can't check: the sorted
  * layout + pushed min/max predicate must let the parquet reader SKIP
  * row groups, so the scan reads strictly fewer rows than the table
  * holds (at row-group granularity, not exactly the match count). */
class SortedSkippingSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = "/root/testdata/sf0.01"

  test("sorted layout skips row groups outside the filter range") {
    val read = new LongAdder
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics // can be null for failed/skipped stages
        if (m != null) read.add(m.inputMetrics.recordsRead)
      }
    }
    s.sparkContext.addSparkListener(listener)
    val rows = try {
      val out = IngestQueries.i16SortedSkipping.fn(s, d).collect()
      SparkTestBase.drainListener(() => read.sum)
      out
    } finally s.sparkContext.removeSparkListener(listener)
    val total = graft.Tables.t(s, d, "documents").count()
    val matched = rows.map(_.getLong(1)).sum
    assert(matched == 100, s"expected the 100-doc slice, got $matched")
    // recordsRead includes the write-side scan of the full table (the
    // entry writes the sorted copy inside fn) plus the filtered read;
    // skipping is proven if the second scan read less than the table:
    // strictly under 2x total.
    assert(read.sum < 2 * total,
      s"no row-group skipping: read ${read.sum} rows for a table of $total")
    assert(read.sum >= total + matched, "sanity: both scans counted")
  }
}
