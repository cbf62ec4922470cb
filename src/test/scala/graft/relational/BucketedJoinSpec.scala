package graft.relational

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The point of q32 is the PLAN: bucketed+sorted tables must merge-join
  * with no exchange and no per-task sort. The spec builds the bare join
  * (no downstream agg/orderBy, which legitimately shuffle) so "zero
  * Exchange in the whole plan" is assertable. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  test("bucketed merge join plans without any exchange or extra sort") {
    val d = SparkTestBase.sfDir
    val tag = java.util.UUID.randomUUID.toString.replace("-", "")
    val dir = java.nio.file.Files.createTempDirectory(s"graft_bspec_$tag")
    Tables.t(s, d, "orders").write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", dir.resolve("o").toString).saveAsTable(s"bspec_o_$tag")
    Tables.t(s, d, "customer").write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", dir.resolve("c").toString).saveAsTable(s"bspec_c_$tag")
    val joined = s.table(s"bspec_o_$tag").hint("merge")
      .join(s.table(s"bspec_c_$tag").hint("merge"), col("o_custkey") === col("c_custkey"))
    val n = joined.count()
    assert(n == Tables.t(s, d, "orders")
      .join(Tables.t(s, d, "customer"), col("o_custkey") === col("c_custkey")).count())
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"merge hint must win:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed scans must satisfy the join distribution with no shuffle:\n$plan")
  }
}
