package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RewriteEagerAgg behavior:
  *  - the naive join-then-group shape gets its decomposable aggregates
  *    pushed below the join (pre-aggregate on the fact side);
  *  - rows are identical with the rule removed;
  *  - non-conforming shapes (outer join, DISTINCT agg, mixed-side
  *    group keys, decimal sum) are left untouched. */
class EagerAggSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  private def naive(): DataFrame =
    graft.relational.RelationalQueries.q66EagerAgg.fn(s, d)

  private def aggsAndJoins(p: LogicalPlan): (Int, Int) =
    (p.collect { case a: Aggregate => a }.size,
      p.collect { case j: Join => j }.size)

  private def hasPreAggBelowJoin(p: LogicalPlan): Boolean =
    p.collect { case j: Join => j }.exists(j =>
      (j.left.collectFirst { case a: Aggregate => a } orElse
        j.right.collectFirst { case a: Aggregate => a }).isDefined)

  test("naive join-then-group gets a pre-aggregate below the join") {
    val plan = naive().queryExecution.optimizedPlan
    val (na, _) = aggsAndJoins(plan)
    assert(na == 2, s"expected final + pre aggregate, got $na:\n$plan")
    assert(hasPreAggBelowJoin(plan), s"no aggregate under the join:\n$plan")
  }

  test("rule-off rows match rule-on rows") {
    val on = naive().collect().map(_.toSeq)
    val saved = s.experimental.extraOptimizations
    s.experimental.extraOptimizations = saved.filterNot(_ == RewriteEagerAgg)
    try {
      val offDf = naive()
      assert(!hasPreAggBelowJoin(offDf.queryExecution.optimizedPlan),
        "rule removed but plan still pre-aggregates")
      val off = offDf.collect().map(_.toSeq)
      assert(on.toSeq == off.toSeq, "eager aggregation changed the answer")
    } finally s.experimental.extraOptimizations = saved
  }

  test("non-conforming shapes are untouched") {
    val li = graft.Tables.t(s, d, "lineitem")
    val ord = graft.Tables.t(s, d, "orders")
    // outer join
    val outer = li.join(ord, col("l_orderkey") === col("o_orderkey"), "left")
      .groupBy("o_orderpriority").agg(sum(col("l_quantity")).as("q"))
    assert(!hasPreAggBelowJoin(outer.queryExecution.optimizedPlan), "outer join rewritten")
    // DISTINCT aggregate
    val dist = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(countDistinct(col("l_quantity")).as("q"))
    assert(!hasPreAggBelowJoin(dist.queryExecution.optimizedPlan), "distinct agg rewritten")
    // group keys from BOTH sides
    val mixed = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority", "l_linenumber").agg(sum(col("l_quantity")).as("q"))
    assert(!hasPreAggBelowJoin(mixed.queryExecution.optimizedPlan), "mixed groups rewritten")
    // decimal sum (Det kit) — precision would widen twice
    val dec = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(graft.Det.dsum(col("l_quantity")).as("q"))
    assert(!hasPreAggBelowJoin(dec.queryExecution.optimizedPlan), "decimal sum rewritten")
  }

}
