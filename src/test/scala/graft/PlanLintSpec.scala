package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide plan lint: every query's physical plan is walked for the
  * scale-killer shapes this project keeps designing away —
  *  - a window with an EMPTY partition spec funnels all rows through one
  *    task (the r1 q18 bug class);
  *  - a CartesianProduct (non-broadcast nested loop) is an N*M shuffle
  *    explosion (broadcast NLJ is fine and expected for q13/q14).
  * New catalog entries get linted automatically just by existing. */
class PlanLintSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children ++ p.subqueries).flatMap {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case c => flatten(c)
    }

  test("no catalog query plans a single-partition window or a cartesian product") {
    val violations = SparkEntry.catalog.flatMap { q =>
      val plan = q.fn(s, d).queryExecution.executedPlan
      flatten(plan).collect {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          s"${q.name}: WindowExec with empty partitionSpec (single-task window)"
        case _: CartesianProductExec =>
          s"${q.name}: CartesianProductExec (non-broadcast cross product)"
      }
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
