package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Append-visibility and rollup-consistency checks for st17's chained
  * window aggregation: every emitted 4-hour window must be CLOSED by the
  * final watermark (max ts − 1 h), and each emitted rollup must equal
  * the batch recomputation from the raw events — i.e. the second-level
  * stateful operator neither drops nor double-counts any hourly cell. */
class ChainedWindowsSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("st17: emitted windows are watermark-closed and match batch rollup") {
    val rows = StreamingQueries.st17ChainedWindows.fn(s, d).collect()
    assert(rows.nonEmpty, "no 4-hour windows emitted — assertions vacuous")
    val maxTs = Tables.t(s, d, "events")
      .agg(max(col("ts"))).head().getTimestamp(0).getTime
    val wm = maxTs - 3600L * 1000
    rows.foreach { r =>
      val winEnd = r.getTimestamp(0).getTime + 4 * 3600L * 1000
      assert(winEnd <= wm,
        s"window ending $winEnd emitted past the final watermark $wm")
    }
    val batch = Tables.t(s, d, "events")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(col("h"), "4 hours").getField("start").as("win_start"),
        col("event_type"))
      .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_hours"),
        max(col("n")).as("max_hourly"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_hours"), r.getAs[Long]("max_hourly")))
      .toMap
    rows.foreach { r =>
      val k = (r.getTimestamp(0), r.getString(1))
      assert(batch.get(k).contains(
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_hours"), r.getAs[Long]("max_hourly"))),
        s"rollup mismatch vs batch for $k")
    }
  }
}
