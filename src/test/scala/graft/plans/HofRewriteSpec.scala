package graft.plans

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule's contract: the HOF dot-product island rewrites to
  * the native expression, anything structurally different is left alone,
  * and values are bit-identical to the interpreted fold. Inputs come
  * from parquet — over a LocalRelation the optimizer constant-folds the
  * whole projection before any plan inspection can see it. */
class HofRewriteSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def emb = Tables.t(s, d, "embeddings")
    .filter(col("vec_id") < 50)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("HOF dot product rewrites to native DotProduct, bit-identically") {
    RewriteHofDotProduct.register(s)
    val df = emb.select(col("vec_id"), hofDot(col("v"), col("v")).as("d"))
    assert(df.queryExecution.optimizedPlan.expressions.exists(
      _.exists(_.isInstanceOf[graft.functions.DotProduct])),
      df.queryExecution.optimizedPlan.treeString)
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // Reference: an index-order Scala fold over the same doubles — the
    // exact accumulation order both the HOF and the native loop use.
    emb.collect().foreach { r =>
      val v = r.getSeq[Double](1)
      var acc = 0.0
      v.foreach(x => acc += x * x)
      assert(got(r.getLong(0)) == acc, s"vec ${r.getLong(0)}")
    }
  }

  test("structurally different aggregates are left alone") {
    RewriteHofDotProduct.register(s)
    // subtraction zip lambda — not a dot product; must keep ArrayAggregate
    val df = emb.select(
      aggregate(zip_with(col("v"), col("v"), (x, y) => x - y), lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!df.queryExecution.optimizedPlan.expressions.exists(
      _.exists(_.isInstanceOf[graft.functions.DotProduct])))
    assert(df.queryExecution.optimizedPlan.expressions.exists(
      _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ArrayAggregate])))
    df.collect() // and it still runs
  }
}
