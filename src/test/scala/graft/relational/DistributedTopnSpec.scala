package graft.relational

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q101: the bucket-walk top-N must equal the naive global-window
  * selection exactly (same rows, same aggregates), while the plan never
  * funnels the corpus — no TakeOrderedAndProject (that is the
  * driver-bounded k=25 shape q19/q46 own) and the only unpartitioned
  * window runs over the bounded bucket-count table. */
class DistributedTopnSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("bucket-walk selection equals the global-window top-N, bit for bit") {
    val naive = Tables.t(s, d, "lineitem")
      .withColumn("rn", row_number().over(Window.orderBy(
        col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))))
      .filter(col("rn") <= 5000)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        graft.Det.dsum(col("l_extendedprice")).as("total"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy("l_returnflag")
      .collect().map(_.toSeq).toSeq
    val got = RelationalQueries.q101DistributedTopn.fn(s, d)
      .collect().map(_.toSeq).toSeq
    assert(got == naive)
    assert(got.nonEmpty)
  }

  test("an undersized corpus (rows < N) selects everything, matching the SQL") {
    // With fewer rows than N the walk never reaches cum >= N; boundary
    // selection must still be total (min-bkt with take clamped to its
    // count) so the result equals a plain full-corpus aggregate.
    val dir = graft.TempDirs.newTempDir("q101_small")
    val li = Tables.t(s, d, "lineitem").limit(100).cache()
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val expected = s.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        graft.Det.dsum(col("l_extendedprice")).as("total"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    val got = RelationalQueries.q101DistributedTopn.fn(s, dir)
      .collect().map(_.toSeq).toSeq
    li.unpersist()
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q102: sampled boundaries equal the global-window top-N, bit for bit") {
    val naive = Tables.t(s, d, "lineitem")
      .withColumn("rn", row_number().over(Window.orderBy(
        col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))))
      .filter(col("rn") <= 20000)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        graft.Det.dsum(col("l_extendedprice")).as("total"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy("l_returnflag")
      .collect().map(_.toSeq).toSeq
    val got = RelationalQueries.q102SampledTopn.fn(s, d)
      .collect().map(_.toSeq).toSeq
    assert(got == naive)
    assert(got.nonEmpty)
  }

  test("q102 stays exact on a lognormal-skewed column where equi-width degenerates") {
    // exp(price/3000) concentrates ~all mass in the lowest equi-width
    // buckets (q101's scheme would rank nearly the whole corpus in one
    // boundary bucket); sampled equi-depth boundaries keep the walk
    // exact AND balanced.
    val dir = graft.TempDirs.newTempDir("q102_skew")
    Tables.t(s, d, "lineitem")
      .withColumn("l_extendedprice", exp(col("l_extendedprice") / lit(3000.0)))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val skewed = s.read.parquet(s"$dir/lineitem.parquet")
    val naive = skewed
      .withColumn("rn", row_number().over(Window.orderBy(
        col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))))
      .filter(col("rn") <= 7000)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        graft.Det.dsum(col("l_extendedprice")).as("total"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy("l_returnflag")
      .collect().map(_.toSeq).toSeq
    val got = RelationalQueries.sampledTopn(s, dir, 7000L)
      .collect().map(_.toSeq).toSeq
    assert(got == naive)
    assert(got.nonEmpty)
  }

  test("q102 plan: no TakeOrdered funnel; unpartitioned windows only on bounded inputs") {
    val df = RelationalQueries.q102SampledTopn.fn(s, d)
    df.collect()
    val nodes = SparkTestBase.flattenPlan(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      "the selected set must stay distributed — no driver-bounded heap")
    val windows = nodes.collect { case w: WindowExec => w }
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "the boundary-bucket rank must be partitioned")
    // the unpartitioned windows are the sample rank/count and the
    // 64-bucket walk; prove the sample side is actually SIZE-BOUNDED by
    // re-deriving it (rate n div 4096 -> at most ~2*4096 rows whp)
    val li = Tables.t(s, d, "lineitem")
    val h = conv(substring(md5(concat_ws("-",
      col("l_orderkey").cast("string"), col("l_linenumber").cast("string"))),
      1, 8), 16, 10).cast("long")
    val m = math.max(1L, li.count() / 4096)
    val ns = li.filter(h % m === 0).count()
    assert(ns > 0 && ns <= 16384, s"sample not size-bounded: $ns rows")
  }

  test("plan: no TakeOrdered funnel; the only global window is the bucket walk") {
    val df = RelationalQueries.q101DistributedTopn.fn(s, d)
    df.collect()
    val nodes = SparkTestBase.flattenPlan(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      "the selected set must stay distributed — no driver-bounded heap")
    val windows = nodes.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    // unpartitioned windows: only the cumulative walk over bucket COUNTS
    // (its child aggregates to the bounded bucket table); the
    // boundary-bucket rank is partitioned
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      // the walk's input is the (bkt, bn) bucket-count relation — under
      // AQE its aggregate hides behind a ReusedExchange leaf, so assert
      // on the window's input SCHEMA: two bucket columns, no fact column
      val names = w.child.output.map(_.name).toSet
      assert(names == Set("bkt", "bn"),
        s"global window must sit on the bucket-count relation, saw $names")
    }
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "the boundary-bucket rank must be partitioned")
  }
}
