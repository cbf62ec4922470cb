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
}
