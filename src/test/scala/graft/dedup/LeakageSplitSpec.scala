package graft.dedup

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d17: splitting by near-dup COMPONENT must put every cluster wholly in
  * one split, where q47's per-document hash demonstrably does not. */
class LeakageSplitSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  private def pctOf(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % 100
  private def splitOf(pct: org.apache.spark.sql.Column) =
    when(pct < 80, "train").when(pct < 90, "val").otherwise("test")

  test("d17: component-hash split never straddles a cluster; doc-hash split does") {
    val labels = DedupQueries.d07CcClusters.fn(s, d) // (doc_id, component)

    // the doc-hash baseline (q47's split key) LEAKS: some multi-doc
    // component has members in different splits
    val docLeaks = labels
      .select(col("component"), splitOf(pctOf(col("doc_id"))).as("split"))
      .groupBy("component")
      .agg(countDistinct(col("split")).as("n_splits"), count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("n_splits") > 1)
      .count()
    assert(docLeaks > 0,
      "expected the doc-hash baseline to straddle at least one cluster " +
        "(without a leak the contrast is vacuous)")

    // component-hash: zero straddling by construction — assert it anyway
    // on the materialized assignment, not the formula
    val compLeaks = labels
      .select(col("component"), splitOf(pctOf(col("component"))).as("split"))
      .groupBy("component")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
      .count()
    assert(compLeaks == 0, s"$compLeaks components straddle splits")
  }

  test("d17: rollup accounts for every document exactly once") {
    val res = DedupQueries.d17LeakageSplit.fn(s, d).collect()
    val totalDocs = res.map(_.getLong(1)).sum
    val totalChars = res.map(_.getLong(3)).sum
    val docs = Tables.t(s, d, "documents")
      .agg(count(lit(1)), sum("n_chars")).collect()(0)
    assert(totalDocs == docs.getLong(0), s"docs $totalDocs != ${docs.getLong(0)}")
    assert(totalChars == docs.getLong(1), s"chars $totalChars != ${docs.getLong(1)}")
    // components partition across splits: per-split distinct counts sum to
    // the global distinct count (no component counted in two splits)
    val nComponents = res.map(_.getLong(2)).sum
    val globalComponents = DedupQueries.d07CcClusters.fn(s, d)
      .select("component").distinct().count()
    assert(nComponents == globalComponents,
      s"per-split component counts $nComponents != global $globalComponents")
  }
}
