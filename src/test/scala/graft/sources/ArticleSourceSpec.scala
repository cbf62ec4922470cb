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

  // ---- O2/O3: retry, backoff, exhaustion, throttle, multi-chunk pages ----

  private def withFault[A](fault: (String, Int) => Unit)(body: => A): A =
    try { ArticleSource.readFault = fault; body }
    finally ArticleSource.readFault = (_, _) => ()

  private def fastRead = s.read.format("graft.sources.ArticleSourceProvider")
    .option("path", path).option("retryBaseMs", "1")

  test("O2: transient read failures retry with backoff and then succeed") {
    val attempts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val n = withFault { (file, attempt) =>
      attempts.merge(file, 1, (a, b) => a + b)
      // every file fails twice, succeeds on the 3rd (== default maxRetries) attempt
      if (attempt < 3) throw new java.io.IOException(s"transient fault $attempt")
    } { fastRead.load().count() }
    assert(n == 28, "all rows arrive despite two transient failures per page")
    assert(attempts.values().toArray.forall(_ == Integer.valueOf(3)),
      "each page file took exactly 3 attempts")
  }

  test("O2: retry exhaustion degrades a backfill chunk to an empty page") {
    val rows = withFault { (file, _) =>
      if (file.contains("page=2")) throw new java.io.IOException("hard down")
    } { fastRead.load().select("page").collect().map(_.getInt(0)) }
    assert(!rows.contains(2), "the permanently-failing page yields no rows")
    assert(rows.length == 21, "the other pages' 28-7 rows still commit (partial progress)")
  }

  test("O2: retry exhaustion in incremental mode stops the scan like an empty page") {
    ArticleSource.pagesParsed.set(0)
    val pages = withFault { (file, _) =>
      if (file.contains("page=3")) throw new java.io.IOException("hard down")
    } {
      fastRead.load()
        .filter(col("published_at") > lit("2020-01-01T00:00:00Z"))
        .select("page").collect().map(_.getInt(0)).toSet
    }
    assert(pages == Set(1, 2), "rows before the dead page commit; nothing after it")
    assert(ArticleSource.pagesParsed.get == 3, "pages 4-6 never attempted after the abort")
  }

  test("O2: a JSON parse error aborts the page immediately without retry") {
    val dir = java.nio.file.Files.createTempDirectory("articles_bad").toFile
    val p1 = new java.io.File(dir, "page=1"); p1.mkdirs()
    java.nio.file.Files.writeString(p1.toPath.resolve("articles.json"), "{not json[")
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val n = withFault { (_, _) => attempts.incrementAndGet(); () } {
      s.read.format("graft.sources.ArticleSourceProvider")
        .option("path", dir.getPath).option("retryBaseMs", "1").load().count()
    }
    assert(n == 0)
    assert(attempts.get == 1, "parse errors are not retried (reference breaks immediately)")
  }

  test("O3: throttleMs paces successive page reads in the incremental walk") {
    val t0 = System.nanoTime()
    fastRead.option("throttleMs", "40").load()
      .filter(col("published_at") > lit("2025-06-01T12:00:00Z")).count()
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    // incremental walk parses pages 1-4 → 3 inter-page sleeps of 40 ms
    assert(elapsedMs >= 120, s"expected >=3 throttle sleeps, elapsed ${elapsedMs}ms")
  }

  test("multi-chunk page dirs: every appended blob is read, in name order") {
    val dir = java.nio.file.Files.createTempDirectory("articles_multi").toFile
    val p1 = new java.io.File(dir, "page=1"); p1.mkdirs()
    java.nio.file.Files.writeString(p1.toPath.resolve("page=1_20250601T000000Z.json"),
      """[{"id": 1, "published_at": "2025-06-01T00:00:00Z", "title": "a"}]""")
    java.nio.file.Files.writeString(p1.toPath.resolve("page=1_20250602T000000Z.json"),
      """[{"id": 2, "published_at": "2025-06-02T00:00:00Z", "title": "b"}]""")
    val df = s.read.format("graft.sources.ArticleSourceProvider")
      .option("path", dir.getPath).load()
    assert(df.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(df.rdd.getNumPartitions == 2, "backfill plans one partition per chunk file")
  }

  test("pageFiles fails loudly on a missing source path") {
    intercept[IllegalArgumentException] {
      ArticleSource.pageFiles("/root/repo/fixtures/does_not_exist")
    }
  }

  test("O13/O14 streaming: page-cursor offset commits atomically; restart reads nothing new") {
    val base = java.nio.file.Files.createTempDirectory("articles_ckpt")
    val (out, ckpt) = (base.resolve("out").toString, base.resolve("ckpt").toString)
    def runOnce(): Long = {
      val q = s.readStream.format("graft.sources.ArticleSourceProvider")
        .option("path", path).load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out).count()
    }
    assert(runOnce() == 28, "first run drains every page into the sink")
    assert(runOnce() == 28,
      "second run with the same checkpoint resumes past the committed cursor: zero new rows")
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
