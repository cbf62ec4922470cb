package graft.relational

import java.util.concurrent.atomic.LongAdder

import graft.SparkTestBase
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q65's scale claim — the part its oracle can't check: laying data out
  * in z-order makes parquet min/max stats selective on BOTH interleaved
  * dimensions at once, so a 2-d box predicate skips row groups. The
  * spec writes the (a, b, z) projection z-sorted with small row groups,
  * scans a tight box on (a, b) — z itself never appears in the filter —
  * and asserts recordsRead stays well under the table size. A plain
  * a-sorted layout gives b no locality at all; z-order is what makes
  * one physical order serve both. */
class ZorderSkippingSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = "/root/testdata/sf0.01"

  test("z-ordered layout skips row groups for a 2-d box predicate") {
    val full = RelationalQueries.q65Zorder.fn(s, d)
    // rebuild the unlimited projection (the entry LIMITs for the oracle)
    val a = col("user_id").bitwiseAND(lit(1023L))
    val b = expr("unix_micros(ts) div 86400000000").bitwiseAND(lit(1023L))
    assert(full.columns.toSeq == Seq("event_id", "a", "b", "z"))
    val zc = (0 until 10).map(i =>
      shiftleft(shiftright(col("a"), i).bitwiseAND(lit(1L)), 2 * i)
        + shiftleft(shiftright(col("b"), i).bitwiseAND(lit(1L)), 2 * i + 1))
      .reduce(_ + _)
    val t = graft.Tables.t(s, d, "events")
      .select(col("event_id"), a.as("a"), b.as("b"))
      .withColumn("z", zc)
    val dir = graft.TempDirs.newTempDir("graft_zorder_")
    t.repartitionByRange(1, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite")
      .option("parquet.block.size", 16 * 1024)
      .option("parquet.page.size", 4 * 1024)
      .parquet(s"$dir/events_z")

    val read = new LongAdder
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) read.add(m.inputMetrics.recordsRead)
      }
    }
    s.sparkContext.addSparkListener(listener)
    val (boxRows, total) = try {
      // at sf0.01: a spans [0,149] (150 users), b spans [267,296] (30
      // days masked to 10 bits) — the box is ~10% x ~25% of the live
      // key space, so a z-local layout must leave most groups untouched
      val out = s.read.parquet(s"$dir/events_z")
        .filter(col("a").between(0, 15) && col("b").between(267, 274))
        .count()
      SparkTestBase.drainListener(() => read.sum)
      (out, graft.Tables.t(s, d, "events").count())
    } finally s.sparkContext.removeSparkListener(listener)
    assert(boxRows > 0, "box is empty — assertion vacuous")
    // the count() scan reads only the z-table; skipping is proven if it
    // read strictly less than the table (row-group granularity). The
    // trailing total-count scan adds `total` more.
    assert(read.sum < total + total / 2,
      s"no 2-d skipping: read ${read.sum} of $total + $total")
  }
}
