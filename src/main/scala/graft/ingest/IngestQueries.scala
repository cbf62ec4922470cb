package graft.ingest

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-checked catalog entries for the reference's ingestion pipeline
  * (SURVEY.md §2.1 O4–O14) over the committed fixtures — plus the JSON/CSV
  * scan coverage of §2.2. The DuckDB oracle reads the very same fixture
  * files (read_json/read_csv), so both engines see identical input bytes.
  */
object IngestQueries {

  private val F = ArticlePipeline.fixturesDir

  /** Shared oracle fragments. */
  private val pagesSql =
    s"""read_json('$F/articles/*/*.json',
       |  columns={'id':'BIGINT','published_at':'VARCHAR','title':'VARCHAR'},
       |  hive_partitioning=true)""".stripMargin
  private val wmSql =
    s"""(SELECT try_cast(latest_timestamp AS TIMESTAMP) AS wm
       |  FROM read_json('$F/checkpoints/latest_timestamp.json',
       |    columns={'latest_timestamp':'VARCHAR'}))""".stripMargin

  /** O1/O4/O10: one multi-file scan unions every page blob; per-page raw
    * row counts (page 6 is an empty array on both engines → absent). */
  val i01PageScan: Q = Q(
    "i01_page_scan",
    s"""SELECT CAST(page AS INT) AS page, COUNT(*) AS n_raw,
       |  COUNT(published_at) AS n_with_ts
       |FROM $pagesSql
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, _) =>
    ArticlePipeline.readPages(s)
      .groupBy("page")
      .agg(count(lit(1)).as("n_raw"), count(col("published_at")).as("n_with_ts"))
      .orderBy("page")
  }

  /** O5/O6: ISO-8601 parse with malformed-skip accounting — id 106
    * (missing), 107 (garbage), 207 (null) surface as n_malformed, never as
    * batch failures. */
  val i02TimestampParse: Q = Q(
    "i02_timestamp_parse",
    s"""SELECT CAST(page AS INT) AS page, COUNT(*) AS n_raw,
       |  COUNT(try_cast(published_at AS TIMESTAMP)) AS n_parsed,
       |  COUNT(*) - COUNT(try_cast(published_at AS TIMESTAMP)) AS n_malformed,
       |  MIN(try_cast(published_at AS TIMESTAMP)) AS min_ts,
       |  MAX(try_cast(published_at AS TIMESTAMP)) AS max_ts
       |FROM $pagesSql
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, _) =>
    ArticlePipeline.withTs(ArticlePipeline.readPages(s))
      .groupBy("page")
      .agg(
        count(lit(1)).as("n_raw"),
        count(col("ts")).as("n_parsed"),
        (count(lit(1)) - count(col("ts"))).as("n_malformed"),
        min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts"))
      .orderBy("page")
  }

  /** O7 (+O13 read): strictly-newer-than-watermark filter. Id 403 sits
    * exactly AT the watermark and must be absent (strict `>`,
    * fetch_articles.py:102). */
  val i03WatermarkFilter: Q = Q(
    "i03_watermark_filter",
    s"""SELECT id, try_cast(published_at AS TIMESTAMP) AS ts, CAST(page AS INT) AS page
       |FROM $pagesSql, $wmSql
       |WHERE try_cast(published_at AS TIMESTAMP) > wm
       |ORDER BY id""".stripMargin) { (s, _) =>
    ArticlePipeline.newSince(
      ArticlePipeline.keepParsed(ArticlePipeline.readPages(s)),
      ArticlePipeline.loadWatermark(s))
      .select("id", "ts", "page")
      .orderBy("id")
  }

  /** O9: the running-max watermark advance over the kept batch. */
  val i04RunningMax: Q = Q(
    "i04_running_max",
    s"""SELECT MAX(ts) AS new_watermark, COUNT(*) AS n_new FROM (
       |  SELECT try_cast(published_at AS TIMESTAMP) AS ts FROM $pagesSql, $wmSql
       |  WHERE try_cast(published_at AS TIMESTAMP) > wm)""".stripMargin) { (s, _) =>
    ArticlePipeline.nextWatermark(
      ArticlePipeline.newSince(
        ArticlePipeline.keepParsed(ArticlePipeline.readPages(s)),
        ArticlePipeline.loadWatermark(s)))
  }

  /** O12/O13: the full incremental run — parse, skip, watermark-filter,
    * hive date-partitioned JSON sink — then a read-back of the committed
    * files proves the partition layout (counts per ingest_date come from
    * the sink's own directories, not the in-memory batch). */
  val i05PartitionedSink: Q = Q(
    "i05_partitioned_sink",
    s"""SELECT CAST(try_cast(published_at AS TIMESTAMP) AS DATE) AS ingest_date,
       |  COUNT(*) AS n
       |FROM $pagesSql, $wmSql
       |WHERE try_cast(published_at AS TIMESTAMP) > wm
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, _) =>
    val kept = ArticlePipeline.newSince(
      ArticlePipeline.keepParsed(ArticlePipeline.readPages(s)),
      ArticlePipeline.loadWatermark(s))
      .drop("wm")
    val out = graft.TempDirs.newTempDir("graft_i05_sink_")
    ArticlePipeline.writeDatePartitioned(kept, out)
    s.read
      .schema(ArticlePipeline.articleSchema.add("ts", org.apache.spark.sql.types.TimestampType))
      .json(out)
      .groupBy("ingest_date")
      .agg(count(lit(1)).as("n"))
      .orderBy("ingest_date")
  }

  /** O11/O14: bounded backfill micro-batch from the page-cursor
    * checkpoint. The committed cursor is 0 — the max(1, page) floor
    * (fetch_articles_backfill.py:42) must land the window on pages 1–3. */
  val i06BackfillCursor: Q = Q(
    "i06_backfill_cursor",
    s"""SELECT MIN(page) AS first_page, MAX(page) AS last_page,
       |  COUNT(DISTINCT page) AS n_pages, COUNT(*) AS n_rows,
       |  MAX(page) + 1 AS next_cursor
       |FROM (SELECT CAST(page AS INT) AS page FROM $pagesSql,
       |  (SELECT greatest(page, 1) AS cursor
       |   FROM read_json('$F/checkpoints/backfill_page.json', columns={'page':'BIGINT'}))
       |  WHERE page >= cursor AND page < cursor + 3)""".stripMargin) { (s, _) =>
    ArticlePipeline.boundedPages(
      ArticlePipeline.readPages(s), ArticlePipeline.loadBackfillCursor(s), 3)
      .agg(
        min(col("page")).as("first_page"),
        max(col("page")).as("last_page"),
        countDistinct(col("page")).as("n_pages"),
        count(lit(1)).as("n_rows"),
        (max(col("page")) + 1).as("next_cursor"))
  }

  /** End-to-end incremental summary: per-day new-article counts — the
    * query a consumer of the reference's blob layout would run. */
  val i07DailyCounts: Q = Q(
    "i07_ingest_daily_counts",
    s"""SELECT CAST(try_cast(published_at AS TIMESTAMP) AS DATE) AS day,
       |  COUNT(*) AS n, COUNT(DISTINCT id) AS n_ids
       |FROM $pagesSql, $wmSql
       |WHERE try_cast(published_at AS TIMESTAMP) > wm
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, _) =>
    ArticlePipeline.newSince(
      ArticlePipeline.keepParsed(ArticlePipeline.readPages(s)),
      ArticlePipeline.loadWatermark(s))
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"), countDistinct(col("id")).as("n_ids"))
      .orderBy("day")
  }

  /** O4/O6 line-level: PERMISSIVE newline-delimited read — the two corrupt
    * lines become all-null rows on both engines (Spark PERMISSIVE null-fill
    * == DuckDB ignore_errors), counted but never fatal. */
  val i08JsonlPermissive: Q = Q(
    "i08_jsonl_permissive",
    s"""SELECT COUNT(*) AS n_total, COUNT(id) AS n_valid,
       |  COUNT(*) - COUNT(id) AS n_corrupt
       |FROM read_json('$F/articles_jsonl/articles.jsonl',
       |  columns={'id':'BIGINT','published_at':'VARCHAR'},
       |  format='newline_delimited', ignore_errors=true)""".stripMargin) { (s, _) =>
    ArticlePipeline.readJsonl(s)
      .agg(
        count(lit(1)).as("n_total"),
        count(col("id")).as("n_valid"),
        (count(lit(1)) - count(col("id"))).as("n_corrupt"))
  }

  /** CSV scan (SURVEY §2.2 scans row) with explicit schema + header. */
  val i09CsvScan: Q = Q(
    "i09_csv_scan",
    s"""SELECT category, COUNT(*) AS n,
       |  ${Det.sqlSum("price")} AS total_price,
       |  CAST(SUM(CAST(in_stock AS INT)) AS BIGINT) AS n_in_stock
       |FROM read_csv('$F/prices.csv', header=true,
       |  columns={'sku':'VARCHAR','category':'VARCHAR','price':'DOUBLE','in_stock':'BOOLEAN'})
       |GROUP BY category ORDER BY category""".stripMargin) { (s, _) =>
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sku", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("category", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("price", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("in_stock", org.apache.spark.sql.types.BooleanType)))
    s.read.schema(schema).option("header", "true").csv(s"$F/prices.csv")
      .groupBy("category")
      .agg(
        count(lit(1)).as("n"),
        Det.dsum(col("price")).as("total_price"),
        sum(col("in_stock").cast("int")).as("n_in_stock"))
      .orderBy("category")
  }

  /** O1/O8 via the custom DataSource V2 article source: the watermark
    * predicate pushes into the scan, which walks pages newest-first and
    * terminates the whole read at the first stale row — later pages are
    * never parsed (asserted in ArticleSourceSpec). The residual filter
    * uses the raw ISO string comparison (lexicographic == chronological
    * for this fixed format) plus a parse-null guard, both stated
    * identically in the oracle. */
  val i10V2SourceScan: Q = Q(
    "i10_v2_source_scan",
    s"""SELECT id, CAST(page AS INT) AS page FROM $pagesSql
       |WHERE published_at > '2025-06-01T12:00:00Z'
       |  AND try_cast(published_at AS TIMESTAMP) IS NOT NULL
       |ORDER BY id""".stripMargin) { (s, _) =>
    s.read.format("graft.sources.ArticleSourceProvider")
      .option("path", s"$F/articles").load()
      .filter(col("published_at") > lit("2025-06-01T12:00:00Z")
        && try_to_timestamp(col("published_at")).isNotNull)
      .select("id", "page")
      .orderBy("id")
  }

  /** Corrupt-record RETENTION (VERDICT r3 missing #5): the production
    * half of PERMISSIVE that i08 leaves out — quarantine the raw bad
    * line via columnNameOfCorruptRecord instead of just null-filling,
    * the columnar analog of the reference logging the offending payload
    * before skipping it (fetch_articles.py:98-100). The oracle reads the
    * same file as raw lines (delim='' = whole-line CSV) and quarantines
    * exactly the lines that fail json_valid. */
  val i11CorruptRetention: Q = Q(
    "i11_corrupt_retention",
    s"""SELECT COUNT(*) AS n_total,
       |  COUNT(CASE WHEN json_valid(line)
       |        AND json_extract(line, '$$.id') IS NOT NULL THEN 1 END) AS n_valid,
       |  COUNT(CASE WHEN NOT json_valid(line) THEN 1 END) AS n_quarantined,
       |  MIN(CASE WHEN NOT json_valid(line) THEN line END) AS sample_raw
       |FROM read_csv('$F/articles_jsonl/articles.jsonl', delim='', header=false,
       |  quote='', columns={'line':'VARCHAR'})""".stripMargin) { (s, _) =>
    val schema = org.apache.spark.sql.types.StructType(
      ArticlePipeline.articleSchema.fields :+
        org.apache.spark.sql.types.StructField("_corrupt_record",
          org.apache.spark.sql.types.StringType))
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$F/articles_jsonl/articles.jsonl")
      // n_valid also keeps a data column referenced — Spark (correctly)
      // refuses a scan whose only projected column is the corrupt record
      .agg(
        count(lit(1)).as("n_total"),
        count(col("id")).as("n_valid"),
        count(col("_corrupt_record")).as("n_quarantined"),
        min(col("_corrupt_record")).as("sample_raw"))
  }

  /** Schema evolution on read: batch 1 lands without o_orderpriority,
    * batch 2 (a later producer version) adds it; mergeSchema unions the
    * file schemas and null-fills the old batch — the standard long-lived-
    * table upgrade path (at scale: explicit schema + mergeSchema only on
    * the migration read, since footer-merging every file is a cost). The
    * oracle reconstructs the same union from the source table. */
  val i12SchemaEvolution: Q = Q(
    "i12_schema_evolution",
    """SELECT o_orderkey, o_totalprice,
      |  CASE WHEN o_orderkey > 100 THEN o_orderpriority END AS o_orderpriority
      |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val dir = graft.TempDirs.newTempDir("graft_i12_evo_")
    val o = graft.Tables.t(s, d, "orders")
    o.filter(col("o_orderkey") <= 100)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$dir/b1")
    o.filter(col("o_orderkey") > 100 && col("o_orderkey") <= 200)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/b2")
    s.read.option("mergeSchema", "true").parquet(s"$dir/*")
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  /** The article source as a STREAMING V2 source (O1 long-term + O13/O14):
    * page cursor = streaming Offset, committed atomically by the
    * checkpoint log; Trigger.AvailableNow drains all pages as
    * micro-batches of per-page partitions. The oracle is the full batch
    * page scan folded to per-page stats — streaming and batch reads of
    * the same feed must agree exactly. Checkpoint-restart semantics
    * (second run reads zero new rows) are proven in ArticleSourceSpec. */
  val i13StreamingSource: Q = Q(
    "i13_streaming_source",
    s"""SELECT CAST(page AS INT) AS page, COUNT(*) AS n,
       |  MIN(id) AS min_id, MAX(id) AS max_id
       |FROM $pagesSql
       |GROUP BY page ORDER BY page""".stripMargin) { (s, _) =>
    val qn = s"graft_i13_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = s.readStream.format("graft.sources.ArticleSourceProvider")
      .option("path", s"$F/articles").load()
      .writeStream.format("memory").queryName(qn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(qn)
      .groupBy("page")
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"), max(col("id")).as("max_id"))
      .orderBy("page")
  }

  /** Dynamic partition overwrite — the TRUE Spark analog of the
    * reference's per-date blob overwrite (O12, fetch_articles.py:128
    * `overwrite=True`): re-running one day's ingest replaces ONLY that
    * day's partition, leaving every other date untouched. The entry
    * writes the full date-partitioned table, then re-ingests the max
    * date with corrected values under
    * partitionOverwriteMode=dynamic. The oracle states the expected
    * FINAL table — if the overwrite had static semantics (the default:
    * whole-table truncate), every other date would vanish and the count
    * rows would disappear, so the green hash IS the proof of the
    * partition-scoped semantics. Writes cluster on the partition column
    * first (v07's small-file lesson). */
  val i14DynamicOverwrite: Q = Q(
    "i14_dynamic_partition_overwrite",
    s"""SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n,
       |  ${Det.sqlSum("CASE WHEN CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM events) THEN value * 2 ELSE value END")} AS sum_value
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val ev = graft.Tables.t(s, d, "events")
      .select(col("event_id"), to_date(col("ts")).as("event_date"), col("value"))
    val out = graft.TempDirs.newTempDir("graft_i14_")
    ev.repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)
    val maxDate = ev.agg(max(col("event_date"))).head.getDate(0)
    val delta = ev.filter(col("event_date") === lit(maxDate))
      .select(col("event_id"), col("event_date"), (col("value") * 2).as("value"))
    val key = "spark.sql.sources.partitionOverwriteMode"
    val old = s.conf.get(key, "STATIC")
    s.conf.set(key, "dynamic")
    try delta.repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)
    finally s.conf.set(key, old)
    s.read.parquet(out)
      .groupBy("event_date")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .orderBy("event_date")
  }

  /** ORC round-trip — the other columnar format Spark bundles (the
    * common lakehouse migration case: Hive-era ORC tables feeding a
    * parquet-era pipeline). The entry writes the documents table as ORC
    * (snappy, same as the parquet fixtures), scans it back with an
    * aggregation whose plan must push the column pruning into the ORC
    * reader (only source/n_chars read, verified the same way the
    * parquet scans are), and hash-matches the oracle computed from the
    * original parquet — proving the format conversion is lossless. Temp
    * dir registered for shutdown cleanup (TempDirs). */
  val i15OrcRoundtrip: Q = Q(
    "i15_orc_roundtrip",
    """SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val dir = graft.TempDirs.newTempDir("graft_orc_")
    graft.Tables.t(s, d, "documents")
      .write.mode("overwrite").orc(s"$dir/documents.orc")
    s.read.orc(s"$dir/documents.orc")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("source")
  }

  /** Sort-key layout → parquet row-group skipping: the data-skipping
    * technique (Z-order-lite) that makes selective scans cheap at
    * 100 TB without an index. The entry writes documents SORTED by
    * doc_id (small row groups so the test file has several), then scans
    * a tight doc_id range: the pushed min/max predicate lets the reader
    * skip whole row groups whose footer stats can't match. Correctness
    * is the oracle's (same answer as scanning the unsorted original);
    * the skipping itself is asserted by SortedSkippingSpec via task
    * inputMetrics (recordsRead strictly below the table row count —
    * 333/500 at sf0.01 for a 100-row slice, row-group granularity).
    * The same layout choice at cluster scale is writer-side sort/
    * cluster-by, and the skip ratio scales with file count x groups. */
  val i16SortedSkipping: Q = Q(
    "i16_sorted_skipping",
    """SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents WHERE doc_id BETWEEN 100 AND 199
      |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val dir = graft.TempDirs.newTempDir("graft_sorted_")
    graft.Tables.t(s, d, "documents").coalesce(1).sortWithinPartitions("doc_id")
      .write.mode("overwrite")
      .option("parquet.block.size", 32 * 1024)
      .option("parquet.page.size", 8 * 1024)
      .parquet(s"$dir/documents_sorted")
    s.read.parquet(s"$dir/documents_sorted")
      .filter(col("doc_id").between(100, 199))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("source")
  }

  /** Small-file compaction — the table-maintenance op every streaming
    * ingest (st06's sink, a Kafka lander, i05's daily partitions) needs
    * on a schedule: thousands of KB-sized files per partition destroy
    * scan throughput (one task + one footer + one seek per file) and
    * overwhelm the driver's file index at 100 TB. The entry simulates
    * the degenerate layout (events written 64-way fragmented), then
    * compacts by REWRITING with repartitionByRange on the query-
    * predicate column — range layout, so the compacted files also carry
    * disjoint min/max spans (i16's skipping applies post-compaction;
    * `CompactionSpec` asserts the file count collapses 64 → 4 and that
    * ranges don't overlap). The oracle reads the original table: the
    * rewrite must be bit-lossless through both layouts. */
  val i17Compaction: Q = Q(
    "i17_compaction",
    """SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val dir = graft.TempDirs.newTempDir("graft_compact_")
    val ev = graft.Tables.t(s, d, "events")
    ev.repartition(64).write.mode("overwrite").parquet(s"$dir/fragmented")
    s.read.parquet(s"$dir/fragmented")
      .repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(s"$dir/compacted")
    s.read.parquet(s"$dir/compacted")
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_date")
  }

  /** The custom DataSource V2 WRITE path ([[graft.sources.AtomicSinkProvider]])
    * end-to-end: a third of events written through the manifest-committed
    * atomic sink (task-commit → driver-commit, the FileOutputCommitter-v1/
    * Iceberg protocol), read back honoring the `_SUCCESS` manifest, and
    * aggregated against the direct-source oracle — proving the custom
    * commit protocol is lossless and exactly-once-visible. The abort and
    * straggler-sweep paths the oracle can't see are driven directly in
    * `AtomicSinkSpec`. */
  val i18V2AtomicSink: Q = Q(
    "i18_v2_atomic_sink",
    s"""SELECT event_type, COUNT(*) AS n, ${Det.sqlSum("value")} AS sum_value
       |FROM events WHERE event_id % 3 = 0
       |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val dir = graft.TempDirs.newTempDir("graft_atomic_sink_")
    graft.Tables.t(s, d, "events")
      .filter(col("event_id") % 3 === 0)
      .select("event_id", "event_type", "value")
      .write.format("graft.sources.AtomicSinkProvider")
      .option("path", dir).mode("append").save()
    val manifest = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, "_SUCCESS")), "UTF-8")
    val files = manifest.split("\n").filter(_.nonEmpty)
      .map(l => s"$dir/${l.split("\"")(3)}")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    s.read.schema(schema).json(files.toSeq: _*)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  /** Parquet BLOOM-FILTER point lookups — the data-skipping channel for
    * UNSORTED data, complementing i16's sorted min/max skipping: write
    * documents hash-scattered (every row group spans the full doc_id
    * range, so min/max stats prune NOTHING), but with a bloom filter on
    * doc_id in each row-group footer; a point-IN probe then skips every
    * row group whose bloom proves absence. This is the technique for
    * selective lookups on high-cardinality keys where maintaining sort
    * order is too expensive (the id-lookup side of a 100 TB corpus).
    * Correctness is the oracle's; the skip itself is metric-asserted in
    * `BloomSkippingSpec` (recordsRead strictly under a no-bloom
    * rewrite of the same layout). */
  val i19ParquetBloom: Q = Q(
    "i19_parquet_bloom",
    """SELECT doc_id, source, n_chars FROM documents
      |WHERE doc_id IN (7, 211, 499)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val dir = graft.TempDirs.newTempDir("graft_bloom_")
    graft.Tables.t(s, d, "documents")
      .repartition(4, col("source")) // hash layout: no min/max locality
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#doc_id", "true")
      .option("parquet.bloom.filter.expected.ndv#doc_id", "1000")
      .option("parquet.block.size", 32 * 1024)
      .parquet(s"$dir/documents_bloom")
    s.read.parquet(s"$dir/documents_bloom")
      .filter(col("doc_id").isin(7, 211, 499))
      .select("doc_id", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** MERGE-ON-READ — the lakehouse table layout (Hudi MOR / Iceberg
    * v2 deletes) that makes upserts cheap at 100 TB: writers append
    * small SEQUENCED delta files (full-row updates + tombstones)
    * instead of rewriting the base, and readers reconstruct current
    * state as base ∪ deltas → latest sequence per key wins → drop
    * tombstones. Complements the WRITE-side upsert family (q45
    * write-time merge, q56 SCD2, i14 partition overwrite) with the
    * READ side, and pairs with i17: compaction is exactly what folds
    * these deltas back into a new base when the per-read window cost
    * grows. Real files: base snapshot + two delta generations land in
    * a temp dir as parquet (derived deterministically from orders, so
    * the oracle reconstructs the identical final state from the source
    * table), then ONE read-side plan does the merge. The per-key
    * latest-wins window shuffles only (key, seq) + carried columns of
    * base∪delta — deltas are small, and at scale the window prunes to
    * updated keys' groups via the same two-phase top-k machinery
    * (AutoLocalTopK fires on the row_number()=1 idiom). */
  val i20MergeOnRead: Q = Q(
    "i20_merge_on_read",
    """WITH live AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey BETWEEN 500 AND 799 THEN 'X-URGENT'
      |         ELSE o_orderpriority END AS o_orderpriority,
      |    CASE WHEN o_orderkey BETWEEN 600 AND 699 THEN o_totalprice * 1.1 * 0.5
      |         WHEN o_orderkey BETWEEN 500 AND 799 THEN o_totalprice * 1.1
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders
      |  WHERE o_orderkey < 2000 AND o_orderkey NOT BETWEEN 800 AND 899)
      |SELECT o_orderpriority, COUNT(*) AS n_live,
      |""".stripMargin + s"  ${Det.sqlSum("o_totalprice")} AS total\n" +
      """FROM live GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val dir = graft.TempDirs.newTempDir("graft_mor_")
    val ord = graft.Tables.t(s, d, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    // base snapshot: seq 0, no tombstones
    ord.filter(col("o_orderkey") < 2000)
      .withColumn("_seq", lit(0L)).withColumn("_deleted", lit(false))
      .write.mode("overwrite").parquet(s"$dir/base")
    // delta 1: full-row updates for keys 500-799 (priority + 10% price),
    // tombstones for keys 800-899
    ord.filter(col("o_orderkey").between(500, 899))
      .withColumn("o_orderpriority",
        when(col("o_orderkey") <= 799, lit("X-URGENT")).otherwise(col("o_orderpriority")))
      .withColumn("o_totalprice",
        when(col("o_orderkey") <= 799, col("o_totalprice") * 1.1).otherwise(col("o_totalprice")))
      .withColumn("_seq", lit(1L))
      .withColumn("_deleted", col("o_orderkey").between(800, 899))
      .write.mode("overwrite").parquet(s"$dir/delta1")
    // delta 2: read-modify-write on top of delta 1 for keys 600-699
    // (half the already-bumped price; carries delta 1's priority)
    ord.filter(col("o_orderkey").between(600, 699))
      .withColumn("o_orderpriority", lit("X-URGENT"))
      .withColumn("o_totalprice", col("o_totalprice") * 1.1 * 0.5)
      .withColumn("_seq", lit(2L)).withColumn("_deleted", lit(false))
      .write.mode("overwrite").parquet(s"$dir/delta2")
    // READ SIDE: one plan — union, latest seq per key, drop tombstones
    val merged = s.read.parquet(s"$dir/base", s"$dir/delta1", s"$dir/delta2")
    val w = Window.partitionBy("o_orderkey").orderBy(col("_seq").desc)
    merged.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1)
      .filter(!col("_deleted"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_live"), Det.dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderpriority")
  }

  /** STORAGE-PARTITIONED JOIN — the final DSv2 surface next to the O1
    * read source and the i18 atomic sink: a scan that REPORTS its
    * partitioning (see [[graft.sources.KeyedSourceProvider]]) lets two
    * co-bucketed tables join with ZERO shuffle on either side, the
    * Iceberg/Hudi mechanism that makes a daily 100 TB fact⋈fact join
    * affordable. Orders and customer project into the keyed-CSV layout
    * bucketed by custkey; both scans declare
    * KeyGroupedPartitioning(identity(bucket), 8); under
    * spark.sql.sources.v2.bucketing.enabled (+ broadcast off, else the
    * small side would broadcast and the question is moot)
    * EnsureRequirements plans the equi join exchange-free —
    * `SpjSpec` asserts zero shuffles below the join and that switching
    * the conf off brings the exchanges back. The oracle joins the same
    * projections on the source tables. */
  val i21SpjJoin: Q = Q(
    "i21_spj_join",
    s"""WITH o AS (SELECT o_custkey AS k, o_totalprice AS num FROM orders),
       |c AS (SELECT c_custkey AS k, c_mktsegment AS tag FROM customer)
       |SELECT tag, COUNT(*) AS n, ${Det.sqlSum("num")} AS total
       |FROM o JOIN c USING (k)
       |GROUP BY tag ORDER BY tag""".stripMargin) { (s, d) =>
    val dir = graft.TempDirs.newTempDir("graft_spj_")
    graft.Tables.t(s, d, "orders")
      .select(col("o_custkey"), col("o_totalprice"), lit("-"))
      .write.option("header", "false").csv(s"$dir/orders")
    graft.Tables.t(s, d, "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      .write.option("header", "false").csv(s"$dir/customer")
    def keyed(sub: String) = s.read
      .format("graft.sources.KeyedSourceProvider")
      .option("path", s"$dir/$sub").option("buckets", "8").load()
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      // the join clusters on (bucket, k); the reported partition key is
      // only (bucket) — allow co-partitioning on the subset
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> s.conf.get(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val o = keyed("orders").select(
        col("k"), col("num").as("o_num"), col("bucket"))
      val c = keyed("customer").select(
        col("k"), col("tag"), col("bucket"))
      val df = o.join(c, Seq("bucket", "k"))
        .groupBy("tag")
        .agg(count(lit(1)).as("n"), Det.dsum(col("o_num")).as("total"))
        .orderBy("tag")
      df.queryExecution.executedPlan // pin the exchange-free plan in-scope
      df
    } finally saved.foreach { case (k, v) => s.conf.set(k, v) }
  }

  /** SNAPSHOT DIFF (CDC derivation) — given two table snapshots, emit
    * the change set (inserts/deletes/updates) without ever comparing
    * full rows: each side is projected to (key, fingerprint) where the
    * fingerprint is an md5 over the significant columns (priced in
    * exact integer cents so the hash input is bit-identical across
    * engines), so the only thing that ever shuffles is 8+32 bytes per
    * row — at 100 TB the diff costs one fingerprint scan per snapshot
    * plus a key-width shuffle, not a row-width one. The plan is
    * union-then-groupBy rather than full outer join: both shapes
    * shuffle each side once, but the single aggregate needs no join
    * build side and degrades gracefully under AQE when one snapshot is
    * far smaller (the usual incremental case). Snapshots are derived
    * deterministically from orders (v0 drops keys ≡0 mod 101, v1 drops
    * keys ≡0 mod 97 and bumps price by $1 for keys ≡0 mod 13), so the
    * oracle reconstructs both sides exactly. Output is the per-class
    * count plus a key checksum — the downstream contract a CDC consumer
    * (i20's merge-on-read deltas, q56's SCD2) would ingest. */
  val i22SnapshotDiff: Q = Q(
    "i22_snapshot_diff",
    """WITH v0 AS (
      |  SELECT o_orderkey AS k,
      |    md5(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
      |        || '|' || o_orderstatus) AS fp
      |  FROM orders WHERE o_orderkey % 101 != 0),
      |v1 AS (
      |  SELECT o_orderkey AS k,
      |    md5(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
      |          + CASE WHEN o_orderkey % 13 = 0 THEN 100 ELSE 0 END AS VARCHAR)
      |        || '|' || o_orderstatus) AS fp
      |  FROM orders WHERE o_orderkey % 97 != 0),
      |paired AS (
      |  SELECT k, max(CASE WHEN side = 0 THEN fp END) AS fp0,
      |         max(CASE WHEN side = 1 THEN fp END) AS fp1
      |  FROM (SELECT 0 AS side, * FROM v0 UNION ALL SELECT 1 AS side, * FROM v1)
      |  GROUP BY k),
      |cls AS (
      |  SELECT k, CASE WHEN fp0 IS NULL THEN 'insert'
      |                 WHEN fp1 IS NULL THEN 'delete'
      |                 WHEN fp0 <> fp1 THEN 'update'
      |                 ELSE 'unchanged' END AS change_type
      |  FROM paired)
      |SELECT change_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_checksum
      |FROM cls GROUP BY change_type ORDER BY change_type""".stripMargin) { (s, d) =>
    val ord = graft.Tables.t(s, d, "orders")
    def cents(bump: Column): Column =
      (round(col("o_totalprice") * 100).cast("long") + bump).cast("string")
    val v0 = ord.filter(col("o_orderkey") % 101 =!= 0)
      .select(col("o_orderkey").as("k"),
        md5(concat(cents(lit(0L)), lit("|"), col("o_orderstatus"))).as("fp"))
    val v1 = ord.filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey").as("k"),
        md5(concat(
          cents(when(col("o_orderkey") % 13 === 0, 100L).otherwise(0L)),
          lit("|"), col("o_orderstatus"))).as("fp"))
    // One shuffle: key + two 32-char fingerprints; rows never move.
    val paired = v0.withColumn("side", lit(0))
      .unionByName(v1.withColumn("side", lit(1)))
      .groupBy("k")
      .agg(max(when(col("side") === 0, col("fp"))).as("fp0"),
        max(when(col("side") === 1, col("fp"))).as("fp1"))
    paired.select(col("k"),
        when(col("fp0").isNull, "insert")
          .when(col("fp1").isNull, "delete")
          .when(col("fp0") =!= col("fp1"), "update")
          .otherwise("unchanged").as("change_type"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("key_checksum"))
      .orderBy("change_type")
  }

  /** SNAPSHOT DRIFT DETECTION — the monitoring counterpart of i22's
    * change feed: given two dataset snapshots (here the time-split
    * halves of `events` — the before/after of a pipeline rerun),
    * compare their FEATURE DISTRIBUTIONS and flag shifted cells. Drift
    * checks gate every production training-data refresh (is today's
    * crawl distributed like yesterday's?); the statistic here is the
    * per-cell total-variation numerator |n_a·T_b − n_b·T_a| — the
    * cross-multiplied form of |n_a/T_a − n_b/T_b| that stays in EXACT
    * integer arithmetic (n ≤ 1e8 and T ≤ 1e8 at the 1000× step keeps
    * the product < 2^63; PSI/KL need ln, which cross-engine differs in
    * the last ulp — the t15 lesson — and divides information the
    * consumer can derive). Two features per event (the categorical
    * event_type and a width-25 bucketing of value) melt into (feature,
    * bucket) rows via a 2-ary explode, so BOTH histograms build in ONE
    * scan and one partial-aggregated shuffle whose key space is the
    * bounded cell set, not the row count; per-feature totals are a
    * window over the ~15-row histogram. At 100 TB: the events table
    * streams through once, 16 bytes per row enter the agg, and the
    * drift math runs on a table that fits in a cache line. */
  val i23SnapshotDrift: Q = Q(
    "i23_snapshot_drift",
    """WITH e AS (
      |  SELECT CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS snap,
      |    event_type,
      |    CAST(CAST(floor(value / 25) AS BIGINT) AS VARCHAR) AS vb
      |  FROM events),
      |m AS (
      |  SELECT snap, 'event_type' AS feature, event_type AS bucket FROM e
      |  UNION ALL
      |  SELECT snap, 'value_bucket', vb FROM e),
      |h AS (
      |  SELECT feature, bucket,
      |    CAST(SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM m GROUP BY feature, bucket)
      |SELECT feature, bucket, n_a, n_b,
      |  CAST(SUM(n_a) OVER (PARTITION BY feature) AS BIGINT) AS total_a,
      |  CAST(SUM(n_b) OVER (PARTITION BY feature) AS BIGINT) AS total_b,
      |  CAST(abs(n_a * (SUM(n_b) OVER (PARTITION BY feature))
      |         - n_b * (SUM(n_a) OVER (PARTITION BY feature))) AS BIGINT) AS drift_num
      |FROM h ORDER BY feature, bucket""".stripMargin) { (s, d) =>
    val wF = Window.partitionBy("feature")
    Tables.t(s, d, "events")
      .select(
        when(col("ts") < lit("2024-01-16").cast("timestamp"), 0).otherwise(1).as("snap"),
        explode(array(
          struct(lit("event_type").as("feature"), col("event_type").as("bucket")),
          struct(lit("value_bucket").as("feature"),
            floor(col("value") / 25).cast("long").cast("string").as("bucket")))).as("fb"))
      .select(col("snap"), col("fb.feature"), col("fb.bucket"))
      .groupBy("feature", "bucket")
      .agg(sum(when(col("snap") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("snap") === 1, 1L).otherwise(0L)).as("n_b"))
      .withColumn("total_a", sum(col("n_a")).over(wF))
      .withColumn("total_b", sum(col("n_b")).over(wF))
      .withColumn("drift_num",
        abs(col("n_a") * col("total_b") - col("n_b") * col("total_a")))
      .orderBy("feature", "bucket")
  }

  /** CONSTRAINT AUDIT — the "trust but verify" companion of the RELY
    * declarations that license [[graft.plans.RewriteJoinElimination]]:
    * RELY constraints are unenforced by design (enforcement at write
    * time is what a 100 TB pipeline cannot afford per-row), so
    * production schedules an audit query instead and revokes the
    * declaration if it ever reports violations. One row per declared
    * constraint: PK audits count duplicate keys (COUNT − COUNT
    * DISTINCT, a map-side-combined scan each); FK audits count orphans
    * (NULL or unmatched child keys). The three lineitem FKs audit in
    * ONE scan — the child table is by far the biggest, so the plan
    * left-joins its key triple against the three parent key sets
    * (each a unique build side) and conditionally counts the misses,
    * rather than re-scanning the fact table per constraint. Parent key
    * sets are PK-unique so the joins cannot duplicate; NULL child keys
    * never match and count as orphans, matching the SQL NOT IN + IS
    * NULL form. All counts land in exact longs; the expected output on
    * FK-consistent data (which ScaleUp preserves at every factor) is
    * all-zeros — the audit's green certificate. */
  val i24ConstraintAudit: Q = Q(
    "i24_constraint_audit",
    """SELECT rule_name, violations FROM (
      |  SELECT 'pk_orders' AS rule_name,
      |    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS violations FROM orders
      |  UNION ALL SELECT 'pk_customer',
      |    CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) FROM customer
      |  UNION ALL SELECT 'pk_part',
      |    CAST(COUNT(*) - COUNT(DISTINCT p_partkey) AS BIGINT) FROM part
      |  UNION ALL SELECT 'pk_supplier',
      |    CAST(COUNT(*) - COUNT(DISTINCT s_suppkey) AS BIGINT) FROM supplier
      |  UNION ALL SELECT 'fk_lineitem_orders',
      |    CAST(COUNT(*) FILTER (WHERE l_orderkey IS NULL
      |      OR l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'fk_lineitem_part',
      |    CAST(COUNT(*) FILTER (WHERE l_partkey IS NULL
      |      OR l_partkey NOT IN (SELECT p_partkey FROM part)) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'fk_lineitem_supplier',
      |    CAST(COUNT(*) FILTER (WHERE l_suppkey IS NULL
      |      OR l_suppkey NOT IN (SELECT s_suppkey FROM supplier)) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'fk_orders_customer',
      |    CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL
      |      OR o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT) FROM orders)
      |ORDER BY rule_name""".stripMargin) { (s, d) =>
    def pkAudit(table: String, key: String): DataFrame =
      Tables.t(s, d, table).agg(
        (count(lit(1)) - count_distinct(col(key))).cast("long").as("violations"))
        .select(lit(s"pk_$table").as("rule_name"), col("violations"))
    val li = Tables.t(s, d, "lineitem")
    def parentKeys(table: String, key: String, marker: String): DataFrame =
      Tables.t(s, d, table).select(col(key), lit(1).as(marker))
    // one fact scan, three unique-build left joins, conditional counts
    val liAudit = li.select("l_orderkey", "l_partkey", "l_suppkey")
      .join(parentKeys("orders", "o_orderkey", "hit_o"),
        col("l_orderkey") === col("o_orderkey"), "left")
      .join(parentKeys("part", "p_partkey", "hit_p"),
        col("l_partkey") === col("p_partkey"), "left")
      .join(parentKeys("supplier", "s_suppkey", "hit_s"),
        col("l_suppkey") === col("s_suppkey"), "left")
      .agg(
        sum(when(col("hit_o").isNull, 1L).otherwise(0L)).as("fk_lineitem_orders"),
        sum(when(col("hit_p").isNull, 1L).otherwise(0L)).as("fk_lineitem_part"),
        sum(when(col("hit_s").isNull, 1L).otherwise(0L)).as("fk_lineitem_supplier"))
    val liRows = liAudit.select(explode(array(
      struct(lit("fk_lineitem_orders").as("rule_name"),
        col("fk_lineitem_orders").as("violations")),
      struct(lit("fk_lineitem_part").as("rule_name"),
        col("fk_lineitem_part").as("violations")),
      struct(lit("fk_lineitem_supplier").as("rule_name"),
        col("fk_lineitem_supplier").as("violations")))).as("r"))
      .select(col("r.rule_name"), col("r.violations"))
    val ordAudit = Tables.t(s, d, "orders")
      .join(parentKeys("customer", "c_custkey", "hit_c"),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(sum(when(col("hit_c").isNull, 1L).otherwise(0L)).as("violations"))
      .select(lit("fk_orders_customer").as("rule_name"), col("violations"))
    pkAudit("orders", "o_orderkey")
      .unionByName(pkAudit("customer", "c_custkey"))
      .unionByName(pkAudit("part", "p_partkey"))
      .unionByName(pkAudit("supplier", "s_suppkey"))
      .unionByName(liRows)
      .unionByName(ordAudit)
      .orderBy("rule_name")
  }

  /** Parquet FOOTER aggregate pushdown — the third data-skipping channel
    * after i16 (sorted min/max) and i19 (bloom): an unfiltered global
    * COUNT/MIN/MAX never needs to decode a single data page, because the
    * parquet footer already carries row counts and per-column min/max
    * stats. Spark's DSv2 parquet scan ships exactly this rewrite
    * (`ParquetScanBuilder.pushAggregation`, gated on
    * `spark.sql.parquet.aggregatePushdown` + the V2 read path), turning a
    * full-table aggregate into #row-groups footer reads — at 100 TB the
    * difference between touching every byte of the corpus and touching
    * kilobytes of metadata per file. The V1 path Spark defaults to has no
    * such channel, so the entry scopes `useV1SourceList` off for parquet.
    *
    * The footer-only scan must EXECUTE while those confs hold (the
    * pushdown is re-decided at each optimization, so a lazily-returned
    * plan would re-plan after the finally restores them); the result is
    * ONE row — the bounded-scalar idiom — materialized here and returned
    * as a local relation. `AggPushdownSpec` asserts the plan carries
    * `PushedAggregation` and that the scan reads one record per row
    * group, not per row. */
  val i25AggPushdown: Q = Q(
    "i25_agg_pushdown",
    """SELECT COUNT(*) AS n_rows,
      |  MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key,
      |  MIN(l_linenumber) AS min_line, MAX(l_linenumber) AS max_line
      |FROM lineitem""".stripMargin) { (s, d) =>
    val (df, rows) = pushedFooterAggPlan(s, d)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Builds the pushed-aggregate query, executes it under the scoped
    * confs, and returns (the executed Dataset, its one result row).
    * Exposed to `AggPushdownSpec` so the assertion sees the SAME
    * QueryExecution that produced the answer. */
  private[ingest] def pushedFooterAggPlan(
      s: org.apache.spark.sql.SparkSession, d: String)
      : (DataFrame, Array[org.apache.spark.sql.Row]) = {
    val confs = Seq(
      // route parquet through DSv2 — aggregate pushdown lives in
      // ParquetScanBuilder, which the default V1 FileSourceScan bypasses
      "spark.sql.sources.useV1SourceList" -> "",
      "spark.sql.parquet.aggregatePushdown" -> "true")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val df = s.read.parquet(s"$d/lineitem.parquet")
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("min_key"),
          max(col("l_orderkey")).as("max_key"),
          min(col("l_linenumber")).as("min_line"),
          max(col("l_linenumber")).as("max_line"))
      (df, df.collect())
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  /** SORTED STORAGE-PARTITIONED JOIN — i21's exchange-free join with the
    * OTHER half of the table-format metadata: the scan also reports its
    * per-partition SORT ORDER ([[graft.sources.KeyedScan]] under
    * `ordered=true`, Spark's `SupportsReportOrdering` — what Iceberg's
    * sort-order spec records about key-sorted data files). A sort-merge
    * join requires children ordered by the join keys; without the report
    * EnsureRequirements plants a SortExec per side — at 100 TB that is
    * two full spill-backed sorts of data that was ALREADY sorted on
    * disk. With partitioning + ordering both reported, the fact⋈fact
    * join runs with zero exchange AND zero sort (`SortedScanSpec`
    * asserts both, and that dropping the report brings the sorts back).
    *
    * The writer side holds up the contract with the BUCKET-PLACED layout
    * (`partitionBy("bucket")` + `sortWithinPartitions(bucket, k)`): one
    * k-sorted file per bucket directory, and each scan partition reads
    * ONLY its directory — 1× read amplification, where the unbucketed
    * residue-filter layout parses the whole corpus per bucket
    * (PROBE_I26 at sf10: 20.1 s vs 1.1 s for the same orders scan).
    * This is the write path a real bucketed-sorted table format runs
    * on ingest. Measurement note: the staging writes make this entry
    * writeback-sensitive — single w1 passes swing 13–66 s at sf10 as
    * the kernel flushes prior passes' CSVs; SCALE.md records sync'd
    * min-of-3. */
  val i26SortedScanJoin: Q = Q(
    "i26_sorted_scan_join",
    s"""WITH o AS (SELECT o_custkey AS k, o_totalprice AS num FROM orders),
       |c AS (SELECT c_custkey AS k, c_acctbal AS num, c_mktsegment AS tag
       |      FROM customer)
       |SELECT tag, COUNT(*) AS n, ${Det.sqlSum("o.num")} AS total_price,
       |  ${Det.sqlSum("c.num")} AS total_bal
       |FROM o JOIN c USING (k)
       |GROUP BY tag ORDER BY tag""".stripMargin) { (s, d) =>
    val dir = graft.TempDirs.newTempDir("graft_sorted_spj_")
    // Range-repartition on (bucket, k), NOT hash on bucket: a hash write
    // caps parallelism at 8 tasks (measured: the write dominated the
    // entry at sf10), while ranges keep every core sorting a contiguous
    // (bucket, k) slice. partitionBy files each task's slice under its
    // bucket dir with the task id in the name, so name order within a
    // directory = k order — the invariant the ordering report needs.
    def writeBucketed(df: org.apache.spark.sql.DataFrame, sub: String): Unit =
      df.withColumn("bucket", pmod(col("k"), lit(8)).cast("int"))
        .repartitionByRange(s.sparkContext.defaultParallelism,
          col("bucket"), col("k"))
        .sortWithinPartitions("bucket", "k")
        .write.partitionBy("bucket").option("header", "false")
        .csv(s"$dir/$sub")
    writeBucketed(graft.Tables.t(s, d, "orders")
      .select(col("o_custkey").as("k"), col("o_totalprice").as("num"),
        lit("-").as("tag")), "orders")
    writeBucketed(graft.Tables.t(s, d, "customer")
      .select(col("c_custkey").as("k"), col("c_acctbal").as("num"),
        col("c_mktsegment").as("tag")), "customer")
    def keyed(sub: String) = s.read
      .format("graft.sources.KeyedSourceProvider")
      .option("path", s"$dir/$sub").option("buckets", "8")
      .option("ordered", "true").load()
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // force the sort-merge path: the point is the elided SortExec
      "spark.sql.join.preferSortMergeJoin" -> "true")
    val saved = confs.map { case (k, _) => k -> s.conf.get(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val o = keyed("orders").select(
        col("k"), col("num").as("o_num"), col("bucket"))
      val c = keyed("customer").select(
        col("k"), col("num").as("c_num"), col("tag"), col("bucket"))
      val df = o.join(c, Seq("bucket", "k"))
        .groupBy("tag")
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("o_num")).as("total_price"),
          Det.dsum(col("c_num")).as("total_bal"))
        .orderBy("tag")
      df.queryExecution.executedPlan // pin the sort- and exchange-free plan
      df
    } finally saved.foreach { case (k, v) => s.conf.set(k, v) }
  }

  val all: Seq[Q] = Seq(
    i01PageScan, i02TimestampParse, i03WatermarkFilter, i04RunningMax,
    i05PartitionedSink, i06BackfillCursor, i07DailyCounts,
    i08JsonlPermissive, i09CsvScan, i10V2SourceScan, i11CorruptRetention,
    i12SchemaEvolution, i13StreamingSource, i14DynamicOverwrite,
    i15OrcRoundtrip, i16SortedSkipping, i17Compaction, i18V2AtomicSink,
    i19ParquetBloom, i20MergeOnRead, i21SpjJoin, i22SnapshotDiff,
    i23SnapshotDrift, i24ConstraintAudit, i25AggPushdown, i26SortedScanJoin)
}
