package graft.relational

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-rewritten window queries must return exactly what the naive
  * single-window plans return — the rewrite buys parallelism, never a
  * different answer. */
class WindowScaleSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("two-phase q15 == naive low-cardinality window") {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val naive = Tables.t(s, d, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rnk") <= 5)
      .orderBy("c_mktsegment", "rnk", "c_custkey")
    val twoPhase = RelationalQueries.q15WindowRank.fn(s, d)
    assert(twoPhase.collect().toSeq == naive.collect().toSeq)
  }

  test("two-phase q20 == naive per-group top-k") {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val naive = Tables.t(s, d, "orders")
      .join(Tables.t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .drop("rn")
      .orderBy(col("c_mktsegment"), col("o_totalprice").desc, col("o_orderkey"))
    val twoPhase = RelationalQueries.q20TopKPerGroup.fn(s, d)
    assert(twoPhase.collect().toSeq == naive.collect().toSeq)
  }

  test("scale-safe global ntile == built-in single-partition NTILE") {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    val naive = Tables.t(s, d, "customer")
      .select(col("c_acctbal"), ntile(10).over(w).cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("c_acctbal")).cast("double").as("lo"),
        max(col("c_acctbal")).cast("double").as("hi"))
      .orderBy("bucket")
    val scaled = RelationalQueries.q18Ntile.fn(s, d)
    assert(scaled.collect().toSeq == naive.collect().toSeq)
  }
}
