package graft.relational

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 relational additions: the blocked fuzzy join (q76) against a
  * driver-side Levenshtein recompute, and the LATERAL top-k (q77) against
  * its window-function equivalent + a decorrelation plan assert. */
class FuzzyLateralSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  private def lev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      System.arraycopy(cur, 0, prev, 0, prev.length)
    }
    prev(b.length)
  }

  test("q76 blocked fuzzy join equals driver-side blocking + edit distance") {
    val names = Tables.t(s, d, "part").groupBy("p_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- names.keys; b <- names.keys
      if a < b && a.split(" ")(0) == b.split(" ")(0) && lev(a, b) <= 3
    } yield (a, b, lev(a, b).toLong, names(a), names(b))).toSeq.sortBy(r => (r._1, r._2))
    val got = RelationalQueries.q76FuzzyJoin.fn(s, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.nonEmpty, "the name space always has within-block near-matches")
    assert(got == expected)
  }

  test("q77 lateral top-k equals the window spelling and plans decorrelated") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = Tables.t(s, d, "orders")
      .filter(col("o_totalprice") > 400000.0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("c_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val df = RelationalQueries.q77LateralTopk.fn(s, d)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty && got == expected)
    // Decorrelated execution: one plan, no per-outer-row re-execution —
    // the lateral should lower to a join/window shape, never a
    // CartesianProduct over the subquery.
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
