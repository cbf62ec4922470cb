package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The V2 source's contract: same rows as the built-in JSON path, parallel
  * per-page partitions in backfill mode, and a REAL early stop — stale
  * pages must never be parsed, not parsed-then-filtered. */
class ArticleSourceSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val path = "/root/repo/fixtures/articles"

  private def v2 = s.read.format("graft.sources.ArticleSourceProvider")
    .option("path", path).load()

  test("backfill mode (no watermark) reads every page, one partition each") {
    ArticleSource.pagesParsed.set(0)
    val rows = v2.collect()
    assert(rows.length == 28, "7+7+5+5+4+0 records across the six pages")
    assert(ArticleSource.pagesParsed.get == 6)
    assert(v2.rdd.getNumPartitions == 6, "page-parallel planning without a watermark")
  }

  test("watermark pushdown stops the scan mid-page; later pages never parsed") {
    ArticleSource.pagesParsed.set(0)
    val filtered = v2.filter(col("published_at") > lit("2025-06-01T12:00:00Z"))
    val ids = filtered.select("id").collect().map(_.getLong(0)).toSet
    assert(ArticleSource.pagesParsed.get == 4,
      "pages 1-4 parsed (stop lands on page 4's stale row); 5 and 6 skipped")
    assert(!ids.contains(403L), "the at-watermark row triggered the stop and is excluded")
    assert(!ids.contains(404L) && !ids.contains(501L))
    assert(ids.contains(401L) && ids.contains(402L), "pre-stop rows of the stop page survive")
    // malformed rows pass through the source; the engine's residual filter
    // decides — lexicographically 'not-a-timestamp' > the watermark string,
    // so it survives THIS filter (i10 adds the parse-null guard)
    assert(ids.contains(107L))
  }

  test("scan description advertises the pushed watermark") {
    val filtered = v2.filter(col("published_at") > lit("2025-06-01T12:00:00Z"))
    assert(filtered.queryExecution.executedPlan.toString.contains(
      "watermarkStop=2025-06-01T12:00:00Z"))
  }

  test("V2 rows match the built-in multiLine JSON reader") {
    val builtin = s.read
      .schema(graft.ingest.ArticlePipeline.articleSchema)
      .option("multiLine", "true").json(path)
      .select(col("id"), col("published_at"), col("title"), col("page").cast("int"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    val custom = v2.select("id", "published_at", "title", "page")
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    assert(custom == builtin)
  }
}
