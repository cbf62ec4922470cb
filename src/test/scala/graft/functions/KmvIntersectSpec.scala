package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-law checks for u09: θ and ρ must equal a driver-side replay
  * of the KMV combine from the raw key sets (64th-smallest union hash;
  * union-sketch members present in both input sketches), and the two
  * emitted estimates must be exactly the stated single-division
  * formulas — confirming the sketch algebra is the Beyer et al.
  * construction, not merely a plausible number. */
class KmvIntersectSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("u09: theta/rho match a driver replay and estimates match the formulas") {
    val row = UdfQueries.u09KmvIntersect.fn(s, d).head()
    val (rho, theta) = (row.getAs[Long]("rho"), row.getAs[Long]("theta"))

    def hashes(priority: String): Set[Long] =
      graft.Tables.t(s, d, "orders")
        .filter(col("o_orderpriority") === priority)
        .select(col("o_custkey")).distinct()
        .select(conv(substring(md5(col("o_custkey").cast("string")), 1, 8), 16, 10)
          .cast("long"))
        .collect().map(_.getLong(0)).toSet
    val (ha, hb) = (hashes("1-URGENT"), hashes("2-HIGH"))
    assert(ha.size >= 64 && hb.size >= 64, "segments too small for k=64 sketches")
    val sa = ha.toSeq.sorted.take(64).toSet
    val sb = hb.toSeq.sorted.take(64).toSet
    val u = (ha ++ hb).toSeq.sorted.take(64)
    assert(theta == u.last, s"theta $theta != 64th union hash ${u.last}")
    val expectedRho = u.count(h => sa(h) && sb(h)).toLong
    assert(rho == expectedRho, s"rho $rho != replayed $expectedRho")
    def bits(x: Double) = java.lang.Double.doubleToLongBits(x)
    assert(bits(row.getAs[Double]("est_union")) ==
      bits((63L * 4294967296L).toDouble / theta.toDouble))
    assert(bits(row.getAs[Double]("est_inter")) ==
      bits((rho * 63L * 4294967296L).toDouble / (64L * theta).toDouble))
    // sanity: the union estimate lands in the right ballpark (KMV with
    // k=64 has ~12% sd; 2.5x covers any fixed corpus this size)
    val exact = row.getAs[Long]("exact_union").toDouble
    assert(row.getAs[Double]("est_union") > exact / 2.5 &&
      row.getAs[Double]("est_union") < exact * 2.5)
  }
}
