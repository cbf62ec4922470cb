package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** u07's reason to exist: a SQL-defined function is INLINED by the
  * analyzer — the optimized plan must contain no UDF invocation node,
  * only the expanded decimal expression (so codegen/pushdown see through
  * it, unlike u02's JVM lambda). */
class SqlUdfInlineSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("SQL UDF body inlines: no UDF node in the optimized or executed plan") {
    val df = UdfQueries.u07SqlUdf.fn(s, d)
    val optimized = df.queryExecution.optimizedPlan.toString
    val executed = df.queryExecution.executedPlan.toString
    Seq(optimized, executed).foreach { p =>
      assert(!p.toLowerCase.contains("scalaudf"), p)
      assert(!p.contains("BatchEvalPython"), p)
    }
    // and the inlined arithmetic actually shows up as decimal math
    assert(optimized.contains("18,4") || optimized.contains("DecimalType(18,4)"),
      s"expected the function body's decimal cast inlined into the plan:\n$optimized")
    // exact result sanity: 3 return flags, deterministic revenue
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
  }
}
