package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch's algebraic contract: bottom-k over a set must be
  * invariant to partitioning (the property that makes it exactly
  * verifiable), dedup duplicates, and truncate at k. Partitioned runs
  * exercise the partial-aggregate serialize/merge path for real. */
class BottomKHashesSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  private def sketch(parts: Int, vals: Seq[(String, Long)], k: Int): Map[String, Seq[Long]] = {
    BottomKHashes.register(s)
    import s.implicits._
    vals.toDF("g", "h").repartition(parts)
      .groupBy("g").agg(expr(s"graft_bottomk(h, $k)").as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
  }

  test("partition-count invariance (exercises serialize/merge)") {
    val vals = (1 to 500).map(i => (s"g${i % 3}", (i * 2654435761L) % 10007))
    val one = sketch(1, vals, 7)
    val many = sketch(13, vals, 7)
    assert(one == many)
  }

  test("matches brute-force distinct-sort-take and dedups") {
    val vals = Seq(("a", 5L), ("a", 5L), ("a", 1L), ("a", 9L), ("a", 1L),
      ("a", 3L), ("a", 7L), ("b", 2L))
    val got = sketch(4, vals, 3)
    assert(got("a") == Seq(1L, 3L, 5L))
    assert(got("b") == Seq(2L)) // fewer distinct values than k
  }

  test("negative hashes order below positive (signed long semantics)") {
    val got = sketch(2, Seq(("a", -4L), ("a", 3L), ("a", -9L), ("a", 8L)), 2)
    assert(got("a") == Seq(-9L, -4L))
  }
}
