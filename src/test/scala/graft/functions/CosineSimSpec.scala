package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native expression must be BIT-identical to the interpreted
  * higher-order-function formulation on every row — same fold order, same
  * clamp — or the v05 oracle parity is luck. */
class CosineSimSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  test("codegen CosineSim == aggregate/zip_with formulation on all embeddings") {
    CosineSim.register(s)
    def dot(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)")
    val e = Tables.t(s, SparkTestBase.sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probe = e.filter(col("vec_id") === 0).select(col("v").as("pv"))
    val both = e.crossJoin(broadcast(probe))
      .select(col("vec_id"),
        expr("graft_cosine_sim(v, pv)").as("native"),
        least(greatest(
          dot("v", "pv") / (sqrt(dot("v", "v")) * sqrt(dot("pv", "pv"))),
          lit(-1.0)), lit(1.0)).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"vec ${r.getLong(0)}: native ${r.getDouble(1)} != hof ${r.getDouble(2)}")
    }
  }

  test("null and empty inputs behave like SQL (null-propagating, NaN on empty)") {
    CosineSim.register(s)
    import s.implicits._
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0))),
      (2L, None, Some(Seq(1.0, 2.0))),
      (3L, Some(Seq.empty[Double]), Some(Seq.empty[Double])))
      .toDF("id", "a", "b")
      .select(col("id"), expr("graft_cosine_sim(a, b)").as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    // (1*1 + 2*2) / (sqrt(5)*sqrt(5)) — sqrt(5)^2 lands one ulp above 5,
    // so the exact IEEE result is just below 1; the clamp bounds, it does
    // not round (identical to the SQL formulation's behavior)
    assert(df(1L) == 5.0 / (math.sqrt(5.0) * math.sqrt(5.0)))
    assert(df(2L) == null)
    assert(df(3L).asInstanceOf[Double].isNaN, "0/0 — same as the SQL formulation")
  }
}
