package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The lossless-rollup law behind u10: merging per-month bottom-64
  * sketches must yield EXACTLY the bottom-64 sketch a full rescan of the
  * range would build (any of the 64 smallest hashes of a union is among
  * the 64 smallest of its own month) — so θ, and therefore the estimate,
  * is bit-identical to the no-pre-aggregation answer. Checked per range
  * against a driver-side replay from the raw key sets.
  */
class UdfRollupSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("u10: rolled-up theta equals direct bottom-64 theta for every range") {
    val rows = UdfQueries.u10SketchRollup.fn(s, d).collect()
    assert(rows.length == 4, s"expected 4 ranges, got ${rows.length}")

    val hk = graft.Tables.t(s, d, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
        conv(substring(md5(col("o_custkey").cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))

    val bounds = Map(
      "all" -> ("1995-01", "2001-12"),
      "y1995_96" -> ("1995-01", "1996-12"),
      "y1997_98" -> ("1997-01", "1998-12"),
      "y1999_01" -> ("1999-01", "2001-12"))

    rows.foreach { row =>
      val label = row.getAs[String]("label")
      val (lo, hi) = bounds(label)
      val direct = hk.collect { case (mon, h) if mon >= lo && mon <= hi => h }
        .toSet.toSeq.sorted.take(64)
      assert(row.getAs[Long]("sk_size") == direct.size.toLong, s"$label size")
      assert(row.getAs[Long]("theta") == direct.last,
        s"$label: rollup theta != direct-scan theta — rollup law violated")
      if (direct.size == 64) {
        val est = row.getAs[Double]("est_distinct")
        val expected = (63L * 4294967296L).toDouble / direct.last.toDouble
        assert(java.lang.Double.doubleToLongBits(est) ==
          java.lang.Double.doubleToLongBits(expected), s"$label estimate bits")
        val exact = row.getAs[Long]("exact_distinct").toDouble
        assert(est > exact / 2.5 && est < exact * 2.5,
          s"$label: estimate $est implausibly far from exact $exact")
      }
    }
  }
}
