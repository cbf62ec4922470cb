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

  /** The r12 invariant (verdict item 2): NO single-partition window
    * anywhere in the plan ever processes more than ~sample-size rows —
    * asserted from the executed plan's own runtime metrics, not a
    * schema heuristic. Covers the sample ranks, the 64-bucket walks,
    * and the recursion's threshold rank (driver-gated at <= 16384). */
  private def assertBoundedGlobalWindows(
      df: org.apache.spark.sql.DataFrame): Unit = {
    df.collect()
    val nodes = SparkTestBase.flattenPlan(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      "the selected set must stay distributed — no driver-bounded heap")
    // The sample rank / bucket walk windows run inside their own
    // MATERIALIZED jobs (trow/bnd are pinned then collected), so the
    // final plan may legitimately contain no window at all (take==bn
    // short-circuit) — what must hold is that any unpartitioned window
    // that IS here stayed sample-bounded.
    val windows = nodes.collect { case w: WindowExec => w }
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val out = w.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      assert(out <= 16384L,
        s"single-partition window processed $out rows — the recursion " +
          "was supposed to bound every global sort at ~sample size")
    }
  }

  test("q102 plan: no TakeOrdered funnel; every global window is sample-bounded") {
    assertBoundedGlobalWindows(RelationalQueries.q102SampledTopn.fn(s, d))
    // and the sample rate itself is size-bounded by construction
    val li = Tables.t(s, d, "lineitem")
    val h = conv(substring(md5(concat_ws("-",
      col("l_orderkey").cast("string"), col("l_linenumber").cast("string"))),
      1, 8), 16, 10).cast("long")
    val m = math.max(1L, li.count() / 4096)
    val ns = li.filter(h % m === 0).count()
    assert(ns > 0 && ns <= 16384, s"sample not size-bounded: $ns rows")
  }

  test("q101 plan: no TakeOrdered funnel; every global window is sample-bounded") {
    assertBoundedGlobalWindows(RelationalQueries.q101DistributedTopn.fn(s, d))
  }

  test("boundary recursion triggers above the rank threshold and stays exact") {
    // 40k rows with cnt > 16384 forces at least one recursive round
    // (boundary bucket ~cnt/64 ~ 625, then a direct bounded rank); the
    // selected multiset must equal the naive global-window top-n.
    import s.implicits._
    val rows = (1 to 40000).map { i =>
      val v = ((i * 2654435761L) % 100000L).toDouble / 100.0
      ("F", v, i.toLong, i)
    }.toDF("l_returnflag", "v", "l_orderkey", "l_linenumber")
      .repartition(4).cache()
    rows.count()
    val got = RelationalQueries
      .topRowsRecursive(s, rows, 5000L, 40000L, "v", depth = 1)
      .collect().map(r => (r.getDouble(1), r.getLong(2))).sorted.toSeq
    val naive = rows.withColumn("rn", row_number().over(Window.orderBy(
        col("v").desc, col("l_orderkey"), col("l_linenumber"))))
      .filter(col("rn") <= 5000)
      .collect().map(r => (r.getDouble(1), r.getLong(2))).sorted.toSeq
    rows.unpersist()
    assert(got.size == 5000)
    assert(got == naive)
  }
}
