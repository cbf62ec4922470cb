package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, GraftPlanShim}
import org.scalatest.funsuite.AnyFunSuite

/** Parity + contract for the O(log n) sorted-array membership probe:
  * bit-identical verdicts to array_contains on the same sorted input,
  * across empty / singleton / dense sets and hit/miss probes, in both
  * a flat projection (codegen path) and inside a higher-order filter
  * (eval path — how d16 uses it). */
class SortedLongContainsSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  private def probe(arr: Column, v: Column): Column =
    GraftPlanShim.column(SortedLongContains(
      GraftPlanShim.expression(arr), GraftPlanShim.expression(v)))

  test("matches array_contains verdicts over a pseudo-random corpus, both paths") {
    import s.implicits._
    // deterministic pseudo-random probes/sets from hashed sequences
    val rows = s.range(0, 2000)
      .select(col("id"),
        sort_array(array_distinct(transform(
          sequence(lit(0L), pmod(xxhash64(col("id")), lit(50L))),
          i => pmod(xxhash64(col("id") * 1000 + i), lit(97L))))).as("set"),
        pmod(xxhash64(col("id") + 7), lit(97L)).as("v"))
    val flat = rows.select(
      probe(col("set"), col("v")).as("fast"),
      array_contains(col("set"), col("v")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(flat == 0L, "flat-projection verdict diverged from array_contains")
    val hof = rows.select(
      // inside filter(): eval-mode, exactly d16's call shape
      size(filter(array(col("v")), x => probe(col("set"), x))).as("fast"),
      size(filter(array(col("v")), x => array_contains(col("set"), x))).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(hof == 0L, "HOF eval-mode verdict diverged from array_contains")
    // sanity: the corpus exercises both verdicts
    val hits = rows.select(array_contains(col("set"), col("v")).as("h"))
      .groupBy("h").count().collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(hits.getOrElse(true, 0L) > 0 && hits.getOrElse(false, 0L) > 0)
  }

  test("edge sets: empty, singleton hit/miss, extremes") {
    import s.implicits._
    val df = Seq(
      (Array.empty[Long], 5L, false),
      (Array(5L), 5L, true),
      (Array(5L), 6L, false),
      (Array(Long.MinValue, 0L, Long.MaxValue), Long.MinValue, true),
      (Array(Long.MinValue, 0L, Long.MaxValue), Long.MaxValue, true),
      (Array(Long.MinValue, 0L, Long.MaxValue), 1L, false)
    ).toDF("set", "v", "want")
    val bad = df.filter(probe(col("set"), col("v")) =!= col("want")).count()
    assert(bad == 0L)
  }
}
