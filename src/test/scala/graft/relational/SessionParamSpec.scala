package graft.relational

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q78's native session_window must compose the SAME sessions as q43's
  * manual two-window sessionization; q79's parameter markers must bind
  * to literals the optimizer can push down. */
class SessionParamSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("q78 native session_window groups identically to the manual gap logic") {
    // project q43's manual sessions onto q78's output shape
    val manual = RelationalQueries.q43Sessionize.fn(s, d)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val native = RelationalQueries.q78SessionWindow.fn(s, d)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(native.nonEmpty)
    assert(native == manual,
      s"diff: ${(native -- manual).take(3)} vs ${(manual -- native).take(3)}")
    // and session_end really is last-event + gap: end - start >= 8h only
    // when more than one event spread across the window
    val bad = RelationalQueries.q78SessionWindow.fn(s, d)
      .filter(col("session_end") < col("session_start")).count()
    assert(bad == 0L)
  }

  test("q79 parameters bind as literals: the status filter reaches the scan") {
    val df = RelationalQueries.q79ParameterizedSql.fn(s, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderstatus"),
      s"expected the bound parameter pushed to the parquet scan:\n$plan")
    val expected = Tables.t(s, d, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") >= 250000.0)
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
