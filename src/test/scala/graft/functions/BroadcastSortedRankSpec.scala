package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, GraftPlanShim}
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the two r12 off-row broadcast probes:
  *
  *  - [[BroadcastSortedRank]] (q101/q102's bucketing) must return
  *    exactly |{boundaries <= v}| — the same verdict as the
  *    size(filter(arr, b => v >= b)) HOF it replaced — across
  *    below-min / between / exact-tie / above-max probes and an empty
  *    boundary set.
  *  - [[BroadcastSortedLookup]] (the unigram order-key build) must
  *    return the aligned value on hits and 0 on misses.
  */
class BroadcastSortedRankSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  test("rankLe equals the HOF count on random probes, plus the edge probes") {
    import s.implicits._
    val bnd = Array(1.0, 3.0, 3.0, 7.5, 100.25)
    val bc = s.sparkContext.broadcast(bnd)
    def rank(v: Column): Column = GraftPlanShim.column(
      BroadcastSortedRank(bc, GraftPlanShim.expression(v)))
    val probes = Seq(-5.0, 0.99, 1.0, 2.0, 3.0, 3.01, 7.5, 99.0, 100.25,
      1e18) ++ (0 until 500).map(i => (i * 37 % 113) / 3.0)
    val arrLit = array(bnd.map(lit(_)): _*)
    val bad = probes.toDF("v")
      .select(rank(col("v")).as("fast"),
        size(filter(arrLit, b => col("v") >= b)).cast("long").as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad == 0L)
    // empty boundary set => rank 0 everywhere
    val bc0 = s.sparkContext.broadcast(Array.empty[Double])
    def rank0(v: Column): Column = GraftPlanShim.column(
      BroadcastSortedRank(bc0, GraftPlanShim.expression(v)))
    val nz = probes.toDF("v").select(rank0(col("v")).as("r"))
      .filter(col("r") =!= 0L).count()
    assert(nz == 0L)
  }

  test("lookup returns aligned values on hits and 0 on misses") {
    import s.implicits._
    val keys = Array(-9L, 2L, 5L, 1000L)
    val vals = Array(90L, 20L, 50L, 10000L)
    val kBc = s.sparkContext.broadcast(keys)
    val vBc = s.sparkContext.broadcast(vals)
    def look(v: Column): Column = GraftPlanShim.column(
      BroadcastSortedLookup(kBc, vBc, GraftPlanShim.expression(v)))
    val got = Seq(-10L, -9L, 0L, 2L, 5L, 6L, 1000L, 1001L).toDF("v")
      .select(look(col("v")).as("r")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 90L, 0L, 20L, 50L, 0L, 10000L, 0L))
  }
}
