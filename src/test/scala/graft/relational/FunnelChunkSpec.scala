package graft.relational

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The chunked two-phase funnel must equal the single-array fold on a
  * SKEWED synthetic event log (one power user with 100x the tail's
  * volume, adversarial same-timestamp ties, chunk-boundary chains),
  * while keeping every collected array bounded by events-per-user-per-
  * DAY rather than per-user volume — the property that stops a
  * pathological user from blowing a task at 100 TB (VERDICT r7 #6). */
class FunnelChunkSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  private val dayMs = 86400000L

  /** Deterministic skewed log: user 1 is the power user (3000 events
    * over 10 days); users 2–40 are the tail; 50/51/52 are edge cases
    * (all-same-instant, midnight-boundary chain, same-instant pair). */
  private def mkEvents(): DataFrame = {
    val rnd = new scala.util.Random(42)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = scala.collection.mutable.ArrayBuffer[(Long, java.sql.Timestamp, Int)]()
    def at(ms: Long) = new java.sql.Timestamp(ms)
    for (_ <- 1 to 3000)
      rows += ((1L, at(base + rnd.nextInt(10) * dayMs + rnd.nextInt(dayMs.toInt)),
        1 + rnd.nextInt(3)))
    for (u <- 2 to 40; _ <- 0 to rnd.nextInt(30))
      rows += ((u.toLong, at(base + rnd.nextInt(10) * dayMs + rnd.nextInt(dayMs.toInt)),
        1 + rnd.nextInt(3)))
    // all three stages at ONE instant: only view may count (strict >)
    rows ++= Seq(3, 2, 1).map(st => (50L, at(base + 1000), st))
    // chain straddling midnight exactly: view 1ms before, click AT the
    // boundary (lands in the next chunk), purchase later that day
    rows += ((51L, at(base + dayMs - 1), 1))
    rows += ((51L, at(base + dayMs), 2))
    rows += ((51L, at(base + dayMs + 5000), 3))
    // view+click at the same instant inside one chunk: click must not count
    rows += ((52L, at(base + 2 * dayMs), 1))
    rows += ((52L, at(base + 2 * dayMs), 2))
    import s.implicits._
    rows.toSeq.toDF("user_id", "ts", "stage")
  }

  /** The pre-r8 single-array formulation (whole user in one array). */
  private def naiveDepths(ev: DataFrame): DataFrame = {
    val depth = aggregate(
      col("es"),
      struct(lit(0).as("depth"), lit(null).cast("timestamp").as("last")),
      (acc, e) =>
        when(e("stage") === acc("depth") + 1
            && (acc("depth") === 0 || e("ts") > acc("last")),
          struct(e("stage").as("depth"), e("ts").as("last")))
        .otherwise(acc),
      acc => acc("depth"))
    ev.select(col("user_id"), struct(col("ts"), col("stage")).as("e"))
      .groupBy("user_id").agg(array_sort(collect_list(col("e"))).as("es"))
      .select(col("user_id"), depth.as("depth"))
  }

  test("chunked composition equals the single-array fold under power-user skew") {
    val ev = mkEvents().cache()
    try {
      val chunked = RelationalQueries.funnelDepths(ev)
        .orderBy("user_id").collect().map(r => (r.getLong(0), r.getInt(1)))
      val naive = naiveDepths(ev)
        .orderBy("user_id").collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(chunked.toSeq == naive.toSeq, "chunk composition diverged from the exact fold")
      // edge cases land where the semantics say they must
      val byUser = chunked.toMap
      assert(byUser(50L) == 1, "same-instant stages must not chain")
      assert(byUser(51L) == 3, "midnight-boundary chain must complete across chunks")
      assert(byUser(52L) == 1, "same-instant view+click must stop at view")
    } finally { ev.unpersist(); () }
  }

  test("collected arrays are bounded by per-day volume, not per-user volume") {
    val ev = mkEvents().cache()
    try {
      val widths = ev.groupBy(col("user_id"), date_trunc("day", col("ts")))
        .agg(count(lit(1)).as("w"))
      val maxChunk = widths.agg(max(col("w"))).collect()(0).getLong(0)
      val powerTotal = ev.filter(col("user_id") === 1).count()
      assert(maxChunk < powerTotal / 2,
        s"chunking did not split the power user: max chunk $maxChunk of $powerTotal")
      // phase-2 state per user is calendar-bounded: one 4-int vector per day
      val maxChunksPerUser = widths.groupBy("user_id").agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).collect()(0).getLong(0)
      assert(maxChunksPerUser <= 11, s"more chunk summaries than days: $maxChunksPerUser")
    } finally { ev.unpersist(); () }
  }
}
