package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Det's claim is ORDER-INDEPENDENCE: the same doubles summed under any
  * partitioning/ordering produce bit-identical results (plain double sum
  * does not — that's why it exists). */
class DetSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  test("dsum is bit-identical across partitionings and row orders") {
    import s.implicits._
    val xs = Seq.tabulate(10000)(i => 0.1 + i * 1e-7)
    val base = xs.toDF("x").repartition(1)
      .agg(Det.dsum(col("x"))).collect().head.getDouble(0)
    for (parts <- Seq(2, 7, 32)) {
      val v = scala.util.Random.shuffle(xs).toDF("x").repartition(parts)
        .agg(Det.dsum(col("x"))).collect().head.getDouble(0)
      assert(v == base, s"parts=$parts must match exactly (got $v vs $base)")
    }
  }

  test("davg divides the exact decimal sum by the count") {
    import s.implicits._
    val df = Seq(1.5, 2.5, 3.5, 4.0).toDF("x")
    val got = df.agg(Det.davg(col("x"))).collect().head.getDouble(0)
    assert(got == (BigDecimal("11.5") / 4).toDouble)
  }
}
