package graft.observability

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** O17: the one-row metrics record must reflect the real execution of
  * the instrumented query, and the listener must not leak. */
class ObservabilitySpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  test("o01 captures jobs/stages/tasks and the instrumented query's scan volume") {
    val row = ObservabilityQueries.o01QueryMetrics.fn(s, SparkTestBase.sfDir).collect().head
    assert(row.getString(0) == "q03_agg_pricing_summary")
    assert(row.getLong(1) >= 1, "at least one job")
    assert(row.getLong(2) >= 2, "an agg query has map + reduce stages")
    assert(row.getLong(3) >= row.getLong(2), "at least one task per stage")
    val lineitemRows = s.read.parquet(s"${SparkTestBase.sfDir}/lineitem.parquet").count()
    assert(row.getLong(4) >= lineitemRows,
      s"records_read ${row.getLong(4)} must cover the full lineitem scan ($lineitemRows)")
  }

  test("the per-query listener detaches afterwards (no accumulation across runs)") {
    val r1 = ObservabilityQueries.o01QueryMetrics.fn(s, SparkTestBase.sfDir).collect().head
    val r2 = ObservabilityQueries.o01QueryMetrics.fn(s, SparkTestBase.sfDir).collect().head
    // a leaked listener would double-count the second run's totals
    assert(r2.getLong(1) <= r1.getLong(1) * 2)
    assert(r2.getLong(4) <= r1.getLong(4) * 2)
  }
}
