package graft.relational

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** q29's union-window as-of join on constructed data where every edge is
  * present: equal-timestamp match (inclusive >=), purchase before any
  * click (null match), multiple clicks (latest wins), user with no
  * clicks at all. The fixture is written as an events.parquet in a temp
  * dir so the test drives the exact catalog fn. */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  test("as-of semantics: inclusive match, latest-prior click, null when none") {
    import s.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val events = Seq(
      // (event_id, ts, user_id, event_type, value, props)
      (100L, ts(10), 1L, "click", 0.0, "{}"),
      (101L, ts(10), 1L, "purchase", 5.0, "{}"),  // equal ts → matches click@10
      (102L, ts(5), 1L, "purchase", 1.0, "{}"),   // before any click → null
      (200L, ts(1), 2L, "click", 0.0, "{}"),
      (201L, ts(8), 2L, "click", 0.0, "{}"),
      (202L, ts(9), 2L, "purchase", 2.0, "{}"),   // latest prior click is @8
      (300L, ts(4), 3L, "purchase", 3.0, "{}"))   // user never clicked → null
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_spec_")
    events.coalesce(1).write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)

    val got = RelationalQueries.q29AsofJoin.fn(s, dir.toString).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getTimestamp(3))).toMap
    assert(got(101L) == ts(10), "a click at the exact purchase timestamp matches (>= is inclusive)")
    assert(got(102L) == null, "no click at or before t=5")
    assert(got(202L) == ts(8), "the LATEST prior click wins, not the first")
    assert(got(300L) == null, "user with no clicks")
    assert(got.size == 4)
  }
}
