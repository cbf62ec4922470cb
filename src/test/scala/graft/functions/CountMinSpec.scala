package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-law checks for u08's Count-Min: (a) the one-sided guarantee —
  * an estimate NEVER undercounts (min over depths of buckets that each
  * contain the key's full count); (b) mergeability — the sketch of the
  * whole equals the cellwise SUM of the sketches of disjoint halves,
  * the property that makes the 192-cell summary a distributed/streaming
  * aggregate rather than a single-pass trick. */
class CountMinSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("u08: estimates never undercount") {
    val rows = UdfQueries.u08CountMin.fn(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ex, est) = (r.getAs[Long]("exact_n"), r.getAs[Long]("cm_est"))
      assert(est >= ex, s"suppkey ${r.get(0)}: estimate $est < exact $ex")
    }
  }

  test("u08: sketches of disjoint halves merge cellwise to the whole") {
    def bucket(dep: Int) =
      conv(substring(md5(concat(lit(s"$dep:"), col("k").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 64
    def cells(pred: org.apache.spark.sql.Column) =
      graft.Tables.t(s, d, "lineitem").filter(pred)
        .select(col("l_suppkey").as("k"))
        .select(posexplode(array((0 until 3).map(bucket): _*)).as(Seq("dep", "bucket")))
        .groupBy("dep", "bucket").agg(count(lit(1)).as("c"))
    val whole = cells(lit(true)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val lo = cells(col("l_orderkey") % 2 === 0).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hi = cells(col("l_orderkey") % 2 =!= 0).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (lo.keySet ++ hi.keySet).map(k =>
      k -> (lo.getOrElse(k, 0L) + hi.getOrElse(k, 0L))).toMap
    assert(merged == whole, "cellwise merge of half-sketches != whole sketch")
  }
}
