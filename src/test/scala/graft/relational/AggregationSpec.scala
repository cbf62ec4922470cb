package graft.relational

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class AggregationSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("approx_count_distinct lands within 5% of exact per group") {
    import org.apache.spark.sql.functions._
    val approx = RelationalQueries.q28ApproxDistinct.fn(s, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = graft.Tables.t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("o"), countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, (aOrders, aParts)) <- approx) {
      val (eOrders, eParts) = exact(flag)
      assert(math.abs(aOrders - eOrders).toDouble / eOrders <= 0.05,
        s"$flag orders: approx $aOrders vs exact $eOrders")
      assert(math.abs(aParts - eParts).toDouble / eParts <= 0.05,
        s"$flag parts: approx $aParts vs exact $eParts")
    }
  }

  test("q49 KMV estimate lands within 20% of exact per group") {
    // k=256 => relative standard error ~1/sqrt(k-2) ~ 6.3%; 20% is >3
    // sigma. (The ESTIMATE's exact value is oracle-checked by the
    // catalog entry; this bounds its distance from ground truth.)
    val rows = RelationalQueries.q49KmvDistinct.fn(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - exact).toDouble / exact <= 0.20,
        s"${r.getString(0)}: KMV est $est vs exact $exact")
    }
  }
}
