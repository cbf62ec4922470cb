package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The int128 fixed-point sum and its double -> scaled-long front end.
  *
  * Two layers under test:
  *  - `Sum128.scaledLong` must equal round_half_up(exact_binary(v) *
  *    10^s) — checked against BigDecimal(v) (the EXACT constructor,
  *    not valueOf) over adversarial values and a broad random sweep;
  *  - the aggregate must equal Spark's own decimal Sum bit-for-bit on
  *    long-backed inputs (where Sum is exact), including null-skip and
  *    null-on-empty semantics, under any grouping/partitioning. */
class Sum128Spec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  private def oracleScaled(v: Double, scale: Int): Option[Long] = {
    // exact binary value of v, rounded HALF_UP at `scale`
    val exact = new java.math.BigDecimal(v)
    val r = exact.setScale(scale, java.math.RoundingMode.HALF_UP).unscaledValue()
    if (r.bitLength() > 62 || r.abs().compareTo(
        java.math.BigInteger.valueOf(999999999999999999L)) > 0) None
    else Some(r.longValueExact())
  }

  test("scaledLong matches exact-binary HALF_UP rounding (adversarial + random)") {
    val adversarial = Seq(
      0.0, -0.0, 1.0, -1.0, 0.07, -0.07, 0.1, 0.5e-8, 1.5e-8, 2.5e-8,
      4.999999999999999e-9, 5.000000000000001e-9,
      1.23456789e-9, -1.23456789e-9, // rounds to 0 / -0 territory
      java.lang.Double.MIN_VALUE, -java.lang.Double.MIN_VALUE, // subnormal
      2.2250738585072014e-308, // smallest normal
      9.99e9, -9.99e9, // near the scale-8 magnitude ceiling
      12345.678950001, 12345.678949999, // straddle the grid
      1e-300, 123.456, 1.0 / 3.0, math.Pi, math.E * 1e6)
    for (v <- adversarial; scale <- Seq(0, 2, 8)) {
      oracleScaled(v, scale) match {
        case Some(want) =>
          assert(Sum128.scaledLong(v, scale) == want,
            s"scaledLong($v, $scale): got ${Sum128.scaledLong(v, scale)}, want $want")
        case None =>
          intercept[ArithmeticException](Sum128.scaledLong(v, scale))
      }
    }
    // scale-0 left-shift path: large exact integers
    for (sh <- 40 to 59) {
      val v = math.pow(2, sh)
      assert(Sum128.scaledLong(v, 0) == (1L << sh), s"2^$sh at scale 0")
      assert(Sum128.scaledLong(-v, 0) == -(1L << sh), s"-2^$sh at scale 0")
    }
    val rnd = new scala.util.Random(42)
    var i = 0
    while (i < 200000) {
      // mix magnitudes across the full in-contract range
      val v = (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(21) - 10)
      val scale = Seq(0, 2, 8)(rnd.nextInt(3))
      oracleScaled(v, scale) match {
        case Some(want) => assert(Sum128.scaledLong(v, scale) == want,
          s"scaledLong($v, $scale)")
        case None =>
          intercept[ArithmeticException](Sum128.scaledLong(v, scale))
      }
      i += 1
    }
    // non-finite throws like an ANSI cast
    for (v <- Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity))
      intercept[ArithmeticException](Sum128.scaledLong(v, 8))
  }

  test("Sum128 aggregate == stock decimal Sum bit-for-bit, incl null semantics") {
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50000).map { i =>
      val v: java.lang.Double =
        if (i % 97 == 0) null
        else math.round((rnd.nextDouble() - 0.5) * 2e7) / 100.0 // 2-decimal, +-1e5
      (i % 37, v)
    } :+ ((99, null: java.lang.Double)) // group with only a null
    val df = rows.toDF("g", "v").repartition(13)
    val got = df.groupBy("g")
      .agg(Sum128.sumDoubleFixed(col("v"), 2).as("s128"),
        sum(col("v").cast("decimal(12,2)")).as("ssum"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val a = r.getDecimal(1); val b = r.getDecimal(2)
      if (b == null) assert(a == null, s"group ${r.get(0)}: Sum128 $a vs Sum null")
      else assert(a != null && a.compareTo(b) == 0,
        s"group ${r.get(0)}: Sum128 $a vs Sum $b")
    }
    // all-null group yields null (not 0)
    val g99 = got.find(_.getInt(0) == 99)
    assert(g99.isEmpty || g99.get.getDecimal(1) == null)
  }

  test("dsum128 == dsum bit-for-bit on fixed-point-derived corpus columns") {
    // the parity contract Det.dsum128's scaladoc cites: on
    // fixed-point-derived doubles (generator money/quantity columns and
    // their low-order products — dsum128's ONLY sanctioned input
    // class), the exact-binary rounding and the Cast's shortest-string
    // rounding agree on every row, so the two sums agree on every
    // group. Full-entropy doubles (e.g. iterated quotients) are out of
    // contract — see the scaladoc's p03 story.
    val li = graft.Tables.t(s, d, "lineitem")
    val cols = Seq(
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"), col("l_quantity") * col("l_quantity"),
      col("l_discount") * col("l_tax"),
      col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(graft.Det.dsum(c).as(s"a$i"), graft.Det.dsum128(c).as(s"b$i"))
    }
    val rows = li.groupBy("l_returnflag").agg(aggs.head, aggs.tail: _*).collect()
    assert(rows.nonEmpty)
    for (r <- rows; i <- cols.indices) {
      val a = r.getAs[Double](s"a$i")
      val b = r.getAs[Double](s"b$i")
      assert(java.lang.Double.doubleToRawLongBits(a) ==
        java.lang.Double.doubleToRawLongBits(b),
        s"col $i, group ${r.get(0)}: dsum $a != dsum128 $b")
    }
    val ord = graft.Tables.t(s, d, "orders")
    val or = ord.agg(graft.Det.dsum(col("o_totalprice")).as("a"),
      graft.Det.dsum128(col("o_totalprice")).as("b")).head()
    assert(or.getDouble(0) == or.getDouble(1))
    val ev = graft.Tables.t(s, d, "events")
    val er = ev.agg(graft.Det.dsum(col("value")).as("a"),
      graft.Det.dsum128(col("value")).as("b")).head()
    assert(er.getDouble(0) == er.getDouble(1))
  }
}
