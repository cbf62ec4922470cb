package graft.ingest

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SURVEY §2.1 fine print, asserted one clause at a time against the
  * committed fixtures (tools/gen_fixtures.py plants each case). */
class IngestPipelineSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  private def kept = ArticlePipeline.newSince(
    ArticlePipeline.keepParsed(ArticlePipeline.readPages(s)),
    ArticlePipeline.loadWatermark(s))

  test("watermark filter is strictly > : the record AT the watermark is dropped") {
    val ids = kept.select("id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(403L), "id 403 is published exactly at the watermark")
    assert(ids.contains(402L), "id 402 (just above the watermark) must survive")
    assert(!ids.contains(404L) && !ids.contains(501L), "pre-watermark rows must be dropped")
  }

  test("malformed records are skipped row-wise, never failing the batch") {
    val parsed = ArticlePipeline.keepParsed(ArticlePipeline.readPages(s))
    val ids = parsed.select("id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(106L), "missing published_at")
    assert(!ids.contains(107L), "unparsable published_at")
    assert(!ids.contains(207L), "null published_at")
    // the rest of each affected page is intact (log-and-continue semantics)
    assert(ids.contains(101L) && ids.contains(201L))
  }

  test("Z-suffixed ISO timestamps parse to the UTC instant") {
    val ts = ArticlePipeline.keepParsed(ArticlePipeline.readPages(s))
      .filter(col("id") === 101).select("ts").collect().head.getTimestamp(0)
    assert(ts.toInstant == java.time.Instant.parse("2025-06-10T09:30:00Z"))
  }

  test("running-max watermark advances to the max kept timestamp") {
    val row = ArticlePipeline.nextWatermark(kept).collect().head
    assert(row.getTimestamp(0).toInstant == java.time.Instant.parse("2025-06-10T09:30:00Z"))
    assert(row.getLong(1) == 18L)
  }

  test("empty run short-circuits: no rows past a max-advanced watermark, watermark untouched") {
    val atMax = ArticlePipeline.nextWatermark(kept).select(col("new_watermark").as("wm"))
    val rerun = ArticlePipeline.newSince(
      ArticlePipeline.keepParsed(ArticlePipeline.readPages(s)), atMax)
    assert(rerun.count() == 0, "nothing is strictly newer than the advanced watermark")
    val next = ArticlePipeline.nextWatermark(rerun).collect().head
    assert(next.isNullAt(0) && next.getLong(1) == 0L,
      "an empty batch must not manufacture a watermark (caller keeps the old one)")
  }

  test("backfill cursor floors to 1 (committed checkpoint says page 0)") {
    val cursor = ArticlePipeline.loadBackfillCursor(s).collect().head.getLong(0)
    assert(cursor == 1L)
  }

  test("missing cursor checkpoint defaults to page 1 (first-ever run)") {
    val cursor = ArticlePipeline
      .loadBackfillCursorFrom(s, "/tmp/graft_no_such_checkpoint.json")
      .collect().head.getLong(0)
    assert(cursor == 1L)
  }

  test("null page in the checkpoint blob also floors to 1") {
    val p = java.nio.file.Files.createTempFile("graft_cursor_", ".json")
    java.nio.file.Files.writeString(p, """{"page": null}""")
    val cursor = ArticlePipeline.loadBackfillCursorFrom(s, p.toString)
      .collect().head.getLong(0)
    assert(cursor == 1L)
  }

  test("bounded micro-batch admits exactly maxPages pages from the cursor") {
    val pages = ArticlePipeline.boundedPages(
      ArticlePipeline.readPages(s), ArticlePipeline.loadBackfillCursor(s), 3)
      .select("page").distinct().collect().map(_.getInt(0)).sorted
    assert(pages.toSeq == Seq(1, 2, 3))
  }

  test("date-partitioned sink writes hive dirs and round-trips") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink_spec_").toString
    ArticlePipeline.writeDatePartitioned(kept.drop("wm"), out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.forall(_.startsWith("ingest_date=")), s"hive layout expected, got ${dirs.toSeq}")
    assert(dirs.length == 9, "one partition per distinct event date (9 days survive the watermark)")
    val back = s.read
      .schema(ArticlePipeline.articleSchema.add("ts", org.apache.spark.sql.types.TimestampType))
      .json(out)
    assert(back.count() == 18)
  }
}
