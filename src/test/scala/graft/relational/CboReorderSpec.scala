package graft.relational

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.scalatest.funsuite.AnyFunSuite

/** q53's optimizer behavior — the part its oracle can't check: with
  * ANALYZE'd statistics and CBO on, CostBasedJoinReorder must override
  * the DECLARED fact-first join order and start from the selective
  * dim side instead; with CBO off, the declared order must survive. */
class CboReorderSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  /** Catalog-relation leaf names, left-to-right across the join tree. */
  private def joinLeaves(p: LogicalPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def walk(n: LogicalPlan): Unit = n match {
      case j: Join => walk(j.left); walk(j.right)
      case leaf if leaf.children.isEmpty =>
        "graft_q53_(\\w+)".r.findFirstMatchIn(leaf.toString)
          .foreach(m => out += m.group(1))
      case other => other.children.foreach(walk)
    }
    walk(p)
    out.toSeq
  }

  test("CBO reorders the declared fact-first join to start from the dims") {
    // The entry fn forces its optimizedPlan with CBO on (see its
    // scaladoc on the laziness trap) — the reordered tree is pinned in.
    val withCbo = joinLeaves(
      RelationalQueries.q53CboReorder.fn(s, d).queryExecution.optimizedPlan)
    // Same SQL, same analyzed tables (the fn just created them), CBO off.
    val declared = joinLeaves(s.sql(
      """SELECT n_name, COUNT(*) AS n_items
        |FROM graft_q53_lineitem
        | JOIN graft_q53_orders ON l_orderkey = o_orderkey
        | JOIN graft_q53_customer ON o_custkey = c_custkey
        | JOIN graft_q53_nation ON c_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_2', 'NATION_7')
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
      .queryExecution.optimizedPlan)
    assert(declared.size == 4 && withCbo.size == 4,
      s"expected 4 relations, got declared=$declared cbo=$withCbo")
    assert(declared.head == "lineitem",
      s"without CBO the declared fact-first order should survive: $declared")
    assert(withCbo != declared, "CBO did not reorder the join")
    assert(withCbo.head != "lineitem",
      s"CBO should not start from the fact table: $withCbo")
  }
}
