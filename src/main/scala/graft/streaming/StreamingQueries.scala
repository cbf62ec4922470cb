package graft.streaming

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface (SURVEY.md §2.2 streaming row; §7 P3):
  * the `events` table replayed through a file stream with
  * Trigger.AvailableNow, exercising watermarks, tumbling/sliding windows,
  * session windows, and dropDuplicatesWithinWatermark — each checked
  * against its batch-equivalent DuckDB SQL (stream-batch equivalence is
  * exactly what Structured Streaming's incremental model guarantees, so
  * the oracle is legitimate, not a weaker proxy).
  *
  * Every query runs the real streaming engine (offsets, state store,
  * micro-batches) to completion inside the catalog fn, lands in a memory
  * sink, and returns the sink table ordered. The replay dir is a temp
  * copy of events.parquet so the file-stream source sees exactly one
  * table. At production scale the same plans run unchanged against a
  * directory that keeps growing — AvailableNow becomes a real trigger and
  * the memory sink becomes a partitioned parquet/Kafka sink (st06 shows
  * that shape with a checkpointLocation).
  *
  * Mode note: the windowed aggregations run in COMPLETE mode here so a
  * bounded replay emits every window — correct for verification, but
  * complete mode retains all window state forever. A production deploy of
  * these exact plans switches to append/update, where the declared
  * watermark bounds state by evicting windows older than max(event time)
  * - delay; nothing else in the plan changes.
  */
object StreamingQueries {

  /** Stage one table's parquet into a fresh replay dir. The table is a
    * single file at driver SFs but a Spark-written DIRECTORY of part
    * files for ScaleUp output — Files.copy on a directory copies only
    * the (empty) dir entry, silently starving the stream, so stage each
    * data file explicitly. */
  private def stageForReplay(d: String, name: String, prefix: String): String = {
    val dir = java.nio.file.Paths.get(graft.TempDirs.newTempDir(prefix))
    val src = java.nio.file.Paths.get(s"$d/$name.parquet")
    if (java.nio.file.Files.isDirectory(src)) {
      val listing = java.nio.file.Files.list(src)
      try listing.filter(_.getFileName.toString.endsWith(".parquet"))
        .forEach(p => { java.nio.file.Files.copy(p, dir.resolve(p.getFileName)); () })
      finally listing.close()
    } else java.nio.file.Files.copy(src, dir.resolve(s"$name.parquet"))
    // Record the staged volume so withCappedStateWidth can size state
    // partitions from DATA, not a constant (production picks the state
    // width for peak volume up front; the bench must do the same or the
    // 1000x step funnels 100 M replayed rows through 8 state tasks).
    // Overwritten per staging call — entries stage before they run, so
    // the hint always describes the entry's own replay.
    val bytes = {
      val listing = java.nio.file.Files.list(dir)
      try listing.mapToLong(p => java.nio.file.Files.size(p)).sum()
      finally listing.close()
    }
    stagedReplayBytes.set(bytes)
    dir.toString
  }

  /** Staged-replay volume of the CURRENT entry (thread-local: Verify and
    * Bench run entries single-threaded per session, but suites share a
    * session across threads). */
  private val stagedReplayBytes = new ThreadLocal[java.lang.Long] {
    override def initialValue(): java.lang.Long = 0L
  }

  private[graft] def replayedEvents(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Paths.get(
      stageForReplay(d, "events", "graft_stream_events_"))
    val raw = s.read.parquet(s"$d/events.parquet").schema
    val df = s.readStream.schema(raw).parquet(dir.toString)
    raw("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Stateful ops write one state-store delta file per partition per
    * micro-batch, so on a bounded few-MB replay the per-file fixed cost
    * dominates: 32 state partitions do 4x the IO of 8 for the same few
    * thousand rows (~0.3-1 s per query at local[32]). Cap the stream's
    * shuffle width while it runs and restore after. This is the
    * test-scale analog of PRODUCTION state sizing — partition count is
    * frozen into the checkpoint at first run, so real deployments pick
    * it for peak state volume up front (and would size UP, not down). */
  private def withCappedStateWidth[T](s: SparkSession)(body: => T): T = {
    val old = s.conf.get("spark.sql.shuffle.partitions").toInt
    // Width scales with the staged replay volume (~16 MB of input per
    // state partition), floored at 8 — the measured-best narrow width
    // for few-MB replays, where per-partition delta-file fixed cost
    // dominates — and capped at the session width (local cores).
    val scaled = math.max(8L, stagedReplayBytes.get() / (16L << 20))
    graft.Widths.withWidth(s, math.min(old.toLong, scaled).toInt)(body)
  }

  /** Stage a (doc_id, ...) frame into per-batch single-file parquet with
    * pinned, increasing mtimes (the file source's batch order), batch =
    * doc_id mod nBatches — shared by st21/st23. ONE write job with a
    * hash repartition on the batch residue replaces nBatches separate
    * filter+coalesce(1) jobs (each of which re-scanned the source): all
    * rows of one residue land in exactly one task, and the partitioned
    * writer opens one file per partition value per task, so each
    * `__b=k/` dir holds exactly one data file — same per-batch content
    * as the old per-residue filters (row order within a file differs;
    * the entries' verdicts are arrival-order-independent within a batch
    * by design, see st21's determinism note). Residue classes empty at
    * tiny fixture SFs fall back to staging an empty file so batch
    * numbering stays dense. */
  private def stageModBatches(s: SparkSession, src: DataFrame, nBatches: Int,
      base: java.nio.file.Path, streamDir: java.nio.file.Path,
      t0Ms: Long, stepMs: Long): Unit = {
    import java.nio.file.Files
    val tmp = base.resolve("w")
    src.withColumn("__b", pmod(col("doc_id"), lit(nBatches)).cast("int"))
      .repartition(nBatches, col("__b"))
      .write.partitionBy("__b").parquet(tmp.toString)
    (0 until nBatches).foreach { b =>
      val dir = tmp.resolve(s"__b=$b")
      val dst = streamDir.resolve(s"b$b.parquet")
      val part = if (Files.isDirectory(dir)) {
        val listing = Files.list(dir)
        val files = try {
          import scala.jdk.CollectionConverters._
          listing.filter(_.getFileName.toString.endsWith(".parquet"))
            .iterator().asScala.toList
        } finally listing.close()
        // One task per residue ⇒ exactly one data file; a second file
        // (e.g. maxRecordsPerFile / maxConcurrentOutputFileWriters set)
        // would silently drop rows from the staged batch — fail loud.
        require(files.size == 1,
          s"staged batch dir $dir holds ${files.size} data files, expected 1")
        files.head
      } else {
        val empty = base.resolve(s"we$b")
        src.filter(lit(false)).coalesce(1).write.parquet(empty.toString)
        val listing = Files.list(empty)
        try listing.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        finally listing.close()
      }
      Files.copy(part, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(t0Ms + b * stepMs))
    }
  }

  /** Run a streaming DataFrame to completion into a memory sink, return
    * the sink table. Query names are uniqued per invocation (bench runs
    * each fn twice in one session). */
  private def runToTable(s: SparkSession, df: DataFrame, mode: String): DataFrame = {
    val qn = s"graft_sink_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    withCappedStateWidth(s) {
      val q = df.writeStream
        .format("memory").queryName(qn)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(qn)
  }

  /** Tumbling 1-hour windows per event_type with a watermark; complete
    * mode so the bounded replay emits every window (append would hold
    * back windows past the final watermark — a replay artifact, not a
    * semantic difference). */
  val st01Tumbling: Q = Q(
    "st01_stream_tumbling",
    s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
       |  COUNT(*) AS n, ${Det.sqlSum("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val agg = replayedEvents(s, d)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
    runToTable(s, agg, "complete")
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")
  }

  /** Sliding 2-hour windows advancing hourly — each event lands in two
    * windows; the oracle unnests the two window starts per row. */
  val st02Sliding: Q = Q(
    "st02_stream_sliding",
    s"""SELECT win_start, COUNT(*) AS n, ${Det.sqlSum("value")} AS sum_value
       |FROM (SELECT unnest([time_bucket(INTERVAL '1 hour', ts),
       |                     time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour']) AS win_start,
       |             value
       |      FROM events)
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val agg = replayedEvents(s, d)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
    runToTable(s, agg, "complete")
      .select(col("window.start").as("win_start"), col("n"), col("sum_value"))
      .orderBy("win_start")
  }

  /** Gap-based session windows (5-minute inactivity) per user: the
    * streaming session_window state machine vs the classic batch
    * lag/cumsum sessionization — same strict-gap semantics (a gap of
    * exactly 5 minutes starts a new session on both paths). */
  val st03Session: Q = Q(
    "st03_stream_session",
    """WITH flags AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |          OR ts - lag(ts) OVER w >= INTERVAL '5 minutes' THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (
      |  SELECT user_id, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flags)
      |SELECT user_id, MIN(ts) AS session_start,
      |  MAX(ts) + INTERVAL '5 minutes' AS session_end, COUNT(*) AS n
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    val agg = replayedEvents(s, d)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    runToTable(s, agg, "complete")
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n"))
      .orderBy("user_id", "session_start")
  }

  /** Streaming dedup: dropDuplicatesWithinWatermark on (user_id,
    * event_type) — first occurrence flows through, later ones are
    * suppressed by the state store. The watermark (40 days) exceeds the
    * replay's span, so no state eviction: emitted rows == distinct pairs,
    * which is the batch COUNT(DISTINCT) oracle. */
  val st04Dedup: Q = Q(
    "st04_stream_dedup",
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_unique
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val deduped = replayedEvents(s, d)
      .withWatermark("ts", "40 days")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
    runToTable(s, deduped, "append")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_unique"))
      .orderBy("event_type")
  }

  /** Arbitrary stateful processing: flatMapGroupsWithState maintaining a
    * per-user (count, max-event-time) state machine — the generalized
    * form of the reference's watermark-cursor state (O9/O13/O14). Each
    * micro-batch emits the updated state; the sink is folded to the final
    * value per user, which the batch oracle reproduces as COUNT/MAX. */
  val st05Stateful: Q = Q(
    "st05_stream_stateful",
    """SELECT user_id, COUNT(*) AS n_events, MAX(ts) AS last_ts
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = replayedEvents(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long)]
    val updated = typed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
          val batch = evs.toSeq
          val (n0, m0) = state.getOption.getOrElse((0L, Long.MinValue))
          val next = (n0 + batch.size, math.max(m0, batch.map(_._2).max))
          state.update(next)
          Iterator.single((uid, next._1, next._2))
      }
    runToTable(s, updated.toDF("user_id", "n_events", "ts_us"), "append")
      .groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"),
        timestamp_micros(max(col("ts_us"))).as("last_ts"))
      .orderBy("user_id")
  }

  /** Checkpointed streaming file sink (SURVEY §2.2 sinks row; the
    * streaming upgrade of O12+O13): the stream lands as parquet files
    * under a sink dir with a checkpointLocation recording offsets/commits
    * atomically — the effectively-once replacement for the reference's
    * non-atomic blob-then-watermark pair. The query then reads the sink
    * FILES back (not the in-memory batch), like i05 does for batch. */
  val st06FileSink: Q = Q(
    "st06_stream_file_sink",
    s"""SELECT event_type, COUNT(*) AS n, ${Det.sqlSum("value")} AS sum_value
       |FROM events WHERE value >= 100
       |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val base = java.nio.file.Paths.get(graft.TempDirs.newTempDir("graft_st06_"))
    val (out, ckpt) = (base.resolve("out").toString, base.resolve("ckpt").toString)
    // staged OUTSIDE the width scope: the scope sizes itself from the
    // staged volume, so staging must have happened when it opens
    val src = replayedEvents(s, d)
      .filter(col("value") >= 100)
      .select("event_id", "ts", "event_type", "value")
    withCappedStateWidth(s) {
      val q = src
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  /** Stream-stream interval join (the last big Structured Streaming
    * operator class): views joined to same-user purchases landing within
    * the following hour — the classic streaming attribution shape. Both
    * sides carry watermarks and the join condition carries the time
    * range, so the state store can evict rows once the other side's
    * watermark passes (at 100 TB/day the state held is one hour of one
    * side, not the stream). Inner join emits matches as they occur;
    * the bounded replay therefore yields exactly the batch join, which
    * is the oracle. */
  val st07StreamJoin: Q = Q(
    "st07_stream_stream_join",
    """SELECT v.user_id, COUNT(*) AS n_pairs
      |FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      |  ON v.user_id = p.user_id
      | AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR
      |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin) { (s, d) =>
    // one replayed source, filtered into both sides (stream SELF-join):
    // halves the source scans/fixture copies vs two independent replays
    // (measured ~1 s at sf0.1) — the state-store machinery is the
    // irreducible cost, not the scans
    val src = replayedEvents(s, d)
    val views = src
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val purchases = src
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = views.join(purchases,
      expr("v_user = p_user AND p_ts >= v_ts AND p_ts < v_ts + INTERVAL 1 HOUR"))
    runToTable(s, joined, "append")
      .groupBy(col("v_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  /** foreachBatch — the arbitrary-sink extension point (the seam where
    * production pipelines do upserts/merges into external stores): each
    * micro-batch arrives as a plain DataFrame with its batch id and is
    * written with ordinary batch APIs, here parquet tagged by batch_id.
    * Exactly-once comes from the (batchId, checkpoint) contract: a
    * replayed batch overwrites deterministically rather than double-
    * applying. The read-back agg must equal the plain batch oracle. */
  val st08ForeachBatch: Q = Q(
    "st08_stream_foreach_batch",
    s"""SELECT event_type, COUNT(*) AS n, ${Det.sqlSum("value")} AS sum_value
       |FROM events WHERE user_id % 2 = 0
       |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val out = graft.TempDirs.newTempDir("graft_st08_")
    val src = replayedEvents(s, d)
      .filter(col("user_id") % 2 === 0)
      .select("event_id", "event_type", "value")
    withCappedStateWidth(s) {
      val q = src
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(out)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  /** Stream-static enrichment join — the canonical "enrich events with a
    * dimension" deployment shape: the static side is read once per
    * micro-batch and BROADCAST, so the stream side never shuffles for
    * the join (state-free, unlike st07's stream-stream join). The dim
    * here derives deterministically from event_type; in production it is
    * any slowly-changing table, re-resolved every batch for free. */
  val st09StreamStaticJoin: Q = Q(
    "st09_stream_static_join",
    s"""SELECT CASE WHEN event_type IN ('click', 'view') THEN 'browse'
       |            ELSE 'action' END AS tier,
       |  COUNT(*) AS n, ${Det.sqlSum("value")} AS sum_value
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    val types = Tables.t(s, d, "events")
      .select("event_type").distinct().as[String].collect().sorted
    val dim = s.createDataFrame(types.map(t =>
      (t, if (t == "click" || t == "view") "browse" else "action")).toSeq)
      .toDF("event_type", "tier")
    val agg = replayedEvents(s, d)
      .join(broadcast(dim), "event_type")
      .withWatermark("ts", "1 hour")
      .groupBy("tier")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
    runToTable(s, agg, "complete")
      .orderBy("tier")
  }

  /** UPDATE output mode — the third (and production-default) streaming
    * output semantics after complete (st01-st03) and append (st04-st07):
    * each micro-batch emits only the keys whose state CHANGED, and the
    * sink upserts. On this bounded single-batch replay every key changes
    * exactly once, so the update stream equals the batch aggregate —
    * the same stream-batch equivalence argument as the other entries,
    * now for the mode a live dashboard actually runs. */
  val st10UpdateMode: Q = Q(
    "st10_stream_update_mode",
    s"""SELECT user_id, COUNT(*) AS n, ${Det.sqlSum("value")} AS sum_value
       |FROM events WHERE user_id < 50
       |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    val agg = replayedEvents(s, d)
      .filter(col("user_id") < 50)
      .withWatermark("ts", "1 hour")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
    runToTable(s, agg, "update")
      .orderBy("user_id")
  }

  /** In-flight dedup against a historical corpus — the STREAMING half of
    * d08's incremental-ingest shape: documents arrive as a stream, and
    * anything whose fingerprint already exists in the (static, batch)
    * historical half is dropped by a stream-static LEFT ANTI join before
    * it ever reaches the sink. st04 dedups the stream against ITSELF
    * (within-watermark state); this entry dedups it against persisted
    * history with ZERO streaming state — the static side is just a
    * (broadcastable) key table, re-resolvable per micro-batch, which is
    * why this is the shape a 100 TB ingest actually runs (state stores
    * don't hold a trillion-key corpus; a bloom/key table does).
    * Fingerprint = d08's first-3-token xxhash64; same even/odd split,
    * same NOT-IN oracle semantics, aggregated per source. */
  val st11StreamDedup: Q = Q(
    "st11_stream_dedup_vs_history",
    """WITH t AS (
      |  SELECT doc_id, source,
      |         array_to_string(string_split(text, ' ')[1:3], ' ') AS fp
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_new FROM t
      |WHERE doc_id % 2 = 1
      |  AND fp NOT IN (SELECT fp FROM t WHERE doc_id % 2 = 0)
      |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val toks = split(col("text"), " ")
    val h = xxhash64(concat_ws(" ", slice(toks, 1, 3)))
    val hist = Tables.t(s, d, "documents")
      .filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(h.as("h"))
    val streamed = replayedDocuments(s, d)
      .filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("source"), h.as("h"))
      .join(broadcast(hist), Seq("h"), "left_anti")
      .groupBy("source")
      .agg(count(lit(1)).as("n_new"))
    runToTable(s, streamed, "complete")
      .orderBy("source")
  }

  /** Streaming quantized-ANN routing — the INGEST half of a vector store
    * at 100 TB: embeddings arrive on the stream, are int8-quantized
    * (v10's recipe: per-vector scale = max|x|/127, round, dequantize),
    * and routed to their nearest IVF cell, the step that precedes v07's
    * cell-partitioned write. Centroids (the 8 seed vectors, read once
    * from the batch table) are INLINED as literal arrays — the st09
    * broadcast-dim pattern taken one step further, since k·dim doubles
    * fit in the plan itself — so routing is pure per-row math: no join,
    * no window (streams forbid them), no shuffle except the final
    * k-row aggregate. The argmin is array_min over (dist, cell) structs
    * — lexicographic struct comparison gives the same
    * total-order tie-break row_number provides in the batch oracle.
    * Every arithmetic step is the proven cross-engine kit (float→double
    * exact, half-away-from-zero round, fixed-parenthesization distance,
    * sequential-fold dots), so per-cell counts + id-checksum are
    * hash-green: any single mis-routed vector anywhere breaks the match. */
  val st12StreamAnnRoute: Q = Q(
    "st12_stream_ann_route",
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (
      |  SELECT vec_id, list_transform(v, x -> round(x / scale) * scale) AS qv
      |  FROM (SELECT vec_id, v,
      |          list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      |        FROM e)),
      |c0 AS (SELECT vec_id AS cell, v AS c FROM e WHERE vec_id < 8),
      |a AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT q.vec_id, c0.cell,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        ((list_dot_product(q.qv, q.qv) - 2 * list_dot_product(q.qv, c0.c))
      |          + list_dot_product(c0.c, c0.c)), c0.cell) AS rn
      |    FROM q, c0)
      |  WHERE rn = 1)
      |SELECT cell, COUNT(*) AS n_vecs, CAST(SUM(vec_id) AS BIGINT) AS id_sum
      |FROM a GROUP BY cell ORDER BY cell""".stripMargin) { (s, d) =>
    def dotL(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val cents = Tables.t(s, d, "embeddings")
      .filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"),
        col("embedding").cast("array<double>").as("c"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    val options = cents.map { case (cell, c) =>
      val cc = array(c.map(lit): _*)
      struct(
        ((dotL(col("qv"), col("qv")) - lit(2) * dotL(col("qv"), cc)) + dotL(cc, cc))
          .as("dist"),
        lit(cell.toLong).as("cell"))
    }
    val routed = replayedEmbeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))) / 127.0)
      .withColumn("qv", transform(col("v"), x => round(x / col("scale"), 0) * col("scale")))
      .withColumn("cell", array_min(array(options.toSeq: _*)).getField("cell"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"), sum(col("vec_id")).as("id_sum"))
    runToTable(s, routed, "complete")
      .orderBy("cell")
  }

  /** The SAME stateful machinery under the RocksDB state store — the
    * provider a production 100 TB stream actually runs, because HDFS-
    * backed state lives on the executor HEAP (every distinct key in
    * memory, forever for complete-mode windows) while RocksDB spills
    * state to local SSD with a bounded block cache: state size stops
    * being a heap-pressure question. The provider is a session conf
    * read at stream START, so the swap is config-only — the PLAN and
    * therefore the answer are identical, which is exactly what the
    * shared-oracle hash proves. `RocksdbStateSpec` asserts the query's
    * state operator actually reported rocksdb custom metrics (the part
    * the oracle can't see). Daily windows per event type keep the
    * result disjoint from st01's hourly totals. */
  val st13RocksdbState: Q = Q(
    "st13_rocksdb_state",
    s"""SELECT time_bucket(INTERVAL '1 day', ts) AS win_start, event_type,
       |  COUNT(*) AS n, ${Det.sqlSum("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = s.conf.get(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val agg = replayedEvents(s, d)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      runToTable(s, agg, "complete")
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("win_start", "event_type")
    } finally s.conf.set(key, saved)
  }

  private def replayedEmbeddings(s: SparkSession, d: String): DataFrame = {
    val dir = stageForReplay(d, "embeddings", "graft_stream_emb_")
    val schema = s.read.parquet(s"$d/embeddings.parquet").schema
    s.readStream.schema(schema).parquet(dir)
  }

  private def replayedDocuments(s: SparkSession, d: String): DataFrame = {
    val dir = stageForReplay(d, "documents", "graft_stream_docs_")
    val schema = s.read.parquet(s"$d/documents.parquet").schema
    s.readStream.schema(schema).parquet(dir)
  }

  /** Stream-stream LEFT OUTER interval join — st07's attribution shape
    * plus the half production actually cares about: views with NO
    * purchase in the following hour (the unconverted impressions). The
    * engine can only emit a null-padded row once the purchase-side
    * watermark proves no match can still arrive, i.e. after
    * v_ts + 1h < watermark, where the final watermark is
    * min(max view ts, max purchase ts) - 1h (the engine takes the MIN
    * across watermark nodes); rows younger than that are stuck in state
    * when a bounded replay ends — not wrong, just undecided. The
    * comparison therefore restricts BOTH sides to the decided region
    * (v_ts strictly below that min minus 2h, a one-row batch lookup),
    * applied to the SINK output — filtering the view stream itself
    * would starve the view-side watermark node and recursively shrink
    * the decided region (measured: exactly the boundary row). This
    * makes the streamed outer join equal the batch left join the
    * oracle runs — stream-batch equivalence extended to outer results.
    * State story unchanged from st07: each side holds one watermark-
    * bounded hour, evicted as the other side's watermark passes. */
  val st14StreamLeftOuter: Q = Q(
    "st14_stream_left_outer_join",
    """WITH m AS (SELECT LEAST(
      |    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'view'),
      |    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'purchase')) AS mx),
      |v AS (SELECT user_id, ts FROM events, m
      |      WHERE event_type = 'view' AND epoch_us(ts) < mx - 7200000000),
      |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT v.user_id,
      |  COUNT(p.ts) AS n_converted,
      |  COUNT(*) - COUNT(p.ts) AS n_unconverted
      |FROM v LEFT JOIN p
      |  ON v.user_id = p.user_id AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR
      |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin) { (s, d) =>
    val maxSide = Tables.t(s, d, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy("event_type").agg(max(unix_micros(col("ts"))).as("mx"))
      .agg(min(col("mx"))).collect()(0).getLong(0)
    val src = replayedEvents(s, d)
    val views = src
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val purchases = src
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = views.join(purchases,
      expr("v_user = p_user AND p_ts >= v_ts AND p_ts < v_ts + INTERVAL 1 HOUR"),
      "left_outer")
    // The raw join emission is row-per-(view[, purchase]) — corpus-sized,
    // unlike the small aggregate tables the memory sink holds elsewhere
    // in this module. A memory sink COLLECTS the sink table to the
    // driver, which capped this entry at spark.driver.maxResultSize on
    // the 1000x corpus (1.05 GB of task results, found by the sf100
    // campaign); the parquet sink is the production shape for raw
    // emissions (st06) and keeps the output distributed.
    val base = java.nio.file.Paths.get(graft.TempDirs.newTempDir("graft_st14_"))
    val (out, ckpt) = (base.resolve("out").toString, base.resolve("ckpt").toString)
    withCappedStateWidth(s) {
      val q = joined.writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(out)
      .filter(unix_micros(col("v_ts")) < maxSide - 7200000000L)
      .groupBy(col("v_user").as("user_id"))
      .agg(count(col("p_ts")).as("n_converted"),
        (count(lit(1)) - count(col("p_ts"))).as("n_unconverted"))
      .orderBy("user_id")
  }

  /** The transformWithState ARBITRARY-STATE API (Spark 4's state
    * processor — the successor to st05's flatMapGroupsWithState): a
    * StatefulProcessor with an explicit named ValueState per key,
    * init/handleInputRows lifecycle, and timer support, running under
    * the RocksDB provider the API requires. State is (count, cents) in
    * exact integers — value rounds to cents once per row (the same
    * double on both engines rounds the same way), so the fold is
    * commutative and the oracle hash-exact regardless of per-key
    * iterator order. Bounded one-batch replay in update mode emits each
    * key exactly once = the batch aggregate. At scale this is the API
    * for per-entity running state (billions of keys on SSD-backed
    * RocksDB, TTL'd); the plan shuffles once on the key like any
    * stateful op. */
  val st15TransformWithState: Q = Q(
    "st15_transform_with_state",
    """SELECT user_id, COUNT(*) AS n,
      |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM events WHERE user_id < 40
      |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = s.conf.get(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = replayedEvents(s, d)
        .filter(col("user_id") < 40)
        .select(col("user_id"),
          expr("cast(round(value * 100) as long)").as("cents"))
        .as[(Long, Long)]
      val out = input
        .groupByKey(_._1)
        .transformWithState(
          new RunningCentsProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update(),
          implicitly[org.apache.spark.sql.Encoder[(Long, Long, Long)]])
        .toDF("user_id", "n", "cents")
      runToTable(s, out, "update")
        .orderBy("user_id")
    } finally s.conf.set(key, saved)
  }

  /** Event-time TIMERS under transformWithState (see
    * [[SessionExpiryProcessor]]): emit each user's session summary only
    * when the watermark proves their silence exceeded the 2 h gap —
    * output is produced exclusively by handleExpiredTimer, never by
    * input processing, which is the capability (emit-on-absence) no
    * join/window/agg shape can express. Users active within the last
    * (gap + watermark delay) of the stream never expire and must NOT
    * appear — the oracle states exactly that cutoff in batch SQL. */
  val st16TimerExpiry: Q = Q(
    "st16_timer_session_expiry",
    """WITH m AS (SELECT epoch_ms(MAX(ts)) AS mx FROM events),
      |u AS (SELECT user_id, COUNT(*) AS n, epoch_ms(MAX(ts)) AS last_ms
      |      FROM events GROUP BY user_id)
      |SELECT user_id, n, last_ms FROM u, m
      |WHERE last_ms + 7200000 < mx - 3600000
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = s.conf.get(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try withCappedStateWidth(s) {
      val input = replayedEvents(s, d)
        .withWatermark("ts", "1 hour")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"))
        .as[(Long, Long)]
      val out = input
        .groupByKey(_._1)
        .transformWithState(
          new SessionExpiryProcessor(7200000L),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append(),
          implicitly[org.apache.spark.sql.Encoder[(Long, Long, Long)]])
        .toDF("user_id", "n", "last_ms")
      runToTable(s, out, "append")
        .orderBy("user_id")
    } finally s.conf.set(key, saved)
  }

  /** CHAINED stateful window aggregations (Spark 4 multiple-stateful-
    * operator support): hourly counts per event_type, re-aggregated into
    * 4-hour rollups IN THE SAME STREAM — `window(window_time(window),
    * "4 hours")` re-windows the first aggregate's output on its
    * event-time column, the pre-aggregation pattern that makes
    * dashboard rollup cascades one pipeline instead of two jobs with an
    * intermediate sink. Chained stateful ops require append mode, so
    * only windows the final watermark (max ts − 1 h) closes are
    * emitted; the oracle states that visibility rule explicitly
    * (win_end ≤ wm), making the append semantics — not just the sums —
    * part of what's verified. Each hourly window lands in exactly one
    * 4-hour bucket (1 h divides 4 h; both engines' buckets are
    * epoch-aligned), so the rollup keys agree engine-for-engine. State
    * at scale: level 1 holds one hour per type, level 2 four PRE-REDUCED
    * rows per window — the cascade shrinks state, never grows it. */
  val st17ChainedWindows: Q = Q(
    "st17_chained_windows",
    """WITH hourly AS (
      |  SELECT time_bucket(INTERVAL '1 hour', ts) AS h, event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |wm AS (SELECT MAX(ts) - INTERVAL '1 hour' AS w FROM events)
      |SELECT time_bucket(INTERVAL '4 hours', h) AS win_start, event_type,
      |  CAST(SUM(n) AS BIGINT) AS n_events, COUNT(*) AS n_hours, MAX(n) AS max_hourly
      |FROM hourly, wm
      |WHERE time_bucket(INTERVAL '4 hours', h) + INTERVAL '4 hours' <= w
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val hourly = replayedEvents(s, d)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val rolled = hourly
      .groupBy(window(window_time(col("window")), "4 hours"), col("event_type"))
      .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_hours"),
        max(col("n")).as("max_hourly"))
    runToTable(s, rolled, "append")
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("n_hours"), col("max_hourly"))
      .orderBy("win_start", "event_type")
  }

  /** STATE STORE AS A TABLE (Spark 4 state data source): run a
    * checkpointed streaming aggregation, then read its state store
    * BACK as a DataFrame — `spark.read.format("statestore")` over the
    * checkpoint — and verify the recovered state against the batch
    * truth. This is the ops/debugging surface production streaming
    * needs (inspect hot keys, audit state growth, bootstrap a new job
    * from an old job's state) and it closes the loop on the engine's
    * checkpoint claims: st06 proved offsets/commits are atomic; this
    * entry proves the STATE ROWS themselves are a queryable, correct
    * artifact. The aggregates kept are count and max — merge-order-
    * independent, so the state equals the batch aggregation exactly
    * and the entry stays hash-checkable. At scale the state source
    * reads one store per shuffle partition in parallel — a partitioned
    * scan like any other, no replay of the stream. */
  val st18StateReader: Q = Q(
    "st18_state_reader",
    """SELECT event_type, COUNT(*) AS n, MAX(value) AS max_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val ckpt = graft.TempDirs.newTempDir("graft_st18_ckpt_")
    val src = replayedEvents(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max(col("value")).as("max_value"))
    withCappedStateWidth(s) {
      val q = src
        .writeStream.format("memory")
        .queryName(s"graft_st18_${java.util.UUID.randomUUID.toString.replace("-", "")}")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.format("statestore").load(ckpt)
      .select(col("key.event_type").as("event_type"),
        col("value.count").as("n"), col("value.max").as("max_value"))
      .orderBy("event_type")
  }

  /** Stream-stream JOIN chained into a windowed aggregation — the
    * other half of the multiple-stateful-operator matrix (st17 chains
    * agg→agg; this chains join→agg): view→purchase attribution pairs
    * (st07's time-interval join) rolled into hourly conversion counts
    * INSIDE the same stream, no intermediate sink. Watermark
    * propagation does the load-bearing work: the join's output
    * watermark for p_ts is min(wm_view, wm_purchase) — the interval
    * condition p_ts ∈ [v_ts, v_ts+1h) never emits a p_ts older than
    * the v-side watermark, so no extra holdback — and the downstream
    * window emits once that propagated watermark passes its end. The
    * oracle states the rule (win_end ≤ max ts − 1 h) rather than
    * relying on the fixture's pairs happening to close. State at
    * scale: the join holds one hour per side, the agg one hour of
    * PAIRS (already user-matched, tiny) — chaining avoids
    * re-shuffling the raw streams into a second job. */
  val st19JoinThenWindow: Q = Q(
    "st19_join_then_window",
    """WITH pairs AS (
      |  SELECT p.ts AS p_ts
      |  FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      |  JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      |    ON v.user_id = p.user_id
      |   AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR),
      |wm AS (SELECT MAX(ts) - INTERVAL '1 hour' AS w FROM events)
      |SELECT time_bucket(INTERVAL '1 hour', p_ts) AS win_start,
      |  COUNT(*) AS n_pairs
      |FROM pairs, wm
      |WHERE time_bucket(INTERVAL '1 hour', p_ts) + INTERVAL '1 hour' <= w
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val src = replayedEvents(s, d)
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val rolled = views.join(purchases,
      expr("v_user = p_user AND p_ts >= v_ts AND p_ts < v_ts + INTERVAL 1 HOUR"))
      .groupBy(window(col("p_ts"), "1 hour"))
      .agg(count(lit(1)).as("n_pairs"))
    runToTable(s, rolled, "append")
      .select(col("window.start").as("win_start"), col("n_pairs"))
      .orderBy("win_start")
  }

  /** Stream-stream FULL OUTER interval join — completing the streaming
    * join matrix (inner st07, left st14): both the unconverted views AND
    * the organic purchases (no preceding view) in one stream. Emission
    * rules per side mirror st14's analysis: an unmatched view needs the
    * purchase watermark past v_ts + 1h; an unmatched purchase needs the
    * view watermark past p_ts (its match window is v_ts ∈ (p_ts − 1h,
    * p_ts]); matches emit immediately. With the final watermark
    * min(mx_v, mx_p) − 1h, every row whose driving timestamp (v_ts when
    * the view side is present, else p_ts) is below mx − 2h is provably
    * decided when the bounded replay ends, so the comparison restricts
    * both engines' JOIN RESULTS to that region — the same sink-side
    * filter discipline as st14 (filtering a source would starve its
    * watermark node). State held is still one watermark-bounded hour
    * per side at any scale. */
  val st20StreamFullOuter: Q = Q(
    "st20_full_outer_join",
    """WITH m AS (SELECT LEAST(
      |    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'view'),
      |    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'purchase')) AS mx),
      |v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
      |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
      |j AS (SELECT v.user_id AS vu, v.ts AS vts, p.user_id AS pu, p.ts AS pts
      |      FROM v FULL JOIN p
      |        ON v.user_id = p.user_id AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR)
      |SELECT COALESCE(vu, pu) AS user_id,
      |  COUNT(CASE WHEN vts IS NOT NULL AND pts IS NOT NULL THEN 1 END) AS n_pairs,
      |  COUNT(CASE WHEN vts IS NOT NULL AND pts IS NULL THEN 1 END) AS n_view_only,
      |  COUNT(CASE WHEN vts IS NULL THEN 1 END) AS n_purchase_only
      |FROM j, m
      |WHERE (vts IS NOT NULL AND epoch_us(vts) < mx - 7200000000)
      |   OR (vts IS NULL AND epoch_us(pts) < mx - 7200000000)
      |GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, d) =>
    val bound = Tables.t(s, d, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy("event_type").agg(max(unix_micros(col("ts"))).as("mx"))
      .agg(min(col("mx"))).collect()(0).getLong(0) - 7200000000L
    val src = replayedEvents(s, d)
    val views = src
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val purchases = src
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = views.join(purchases,
      expr("v_user = p_user AND p_ts >= v_ts AND p_ts < v_ts + INTERVAL 1 HOUR"),
      "full_outer")
    runToTable(s, joined, "append")
      .filter(
        (col("v_ts").isNotNull && unix_micros(col("v_ts")) < bound) ||
        (col("v_ts").isNull && unix_micros(col("p_ts")) < bound))
      .groupBy(coalesce(col("v_user"), col("p_user")).as("user_id"))
      .agg(
        count(when(col("v_ts").isNotNull && col("p_ts").isNotNull, 1)).as("n_pairs"),
        count(when(col("v_ts").isNotNull && col("p_ts").isNull, 1)).as("n_view_only"),
        count(when(col("v_ts").isNull, 1)).as("n_purchase_only"))
      .orderBy("user_id")
  }

  /** Streaming NEAR-dup detection — st11 (exact-fingerprint novelty vs a
    * static history) upgraded to d03's MinHash-LSH semantics with LIVE
    * state: documents arrive in micro-batches, each carries 2 banded
    * MinHash keys over its word-3-gram shingles (d06's md5-portable hash
    * recipe; 8 perms × 4-row bands, so a band collision needs all four
    * minima equal — P ≈ J⁴ per band, selective even on a
    * high-baseline-similarity corpus), and
    * a `flatMapGroupsWithState` keyed on the band string holds one
    * boolean per band ever seen — a doc is a near-dup candidate iff ANY
    * of its bands was seen in a STRICTLY EARLIER batch. That per-band
    * bit is the whole state: O(distinct bands), never O(docs), and
    * merge-free (set-once), which is what lets a 100 TB/day ingest keep
    * dedup state in RocksDB instead of re-joining history per batch
    * (d08's bloom is the batch analog; this is the always-on form).
    * Determinism is by construction, not luck: batches are three staged
    * files split by doc_id mod 3 with pinned mtimes (the file source
    * orders by modification time), "seen earlier" is batch-level (ties
    * within a batch are NOT dups on either engine), and the verdict is
    * arrival-order-independent within a batch — so the DuckDB oracle
    * reproduces the stream's exact answer from the static table by
    * recomputing each band's first batch. */
  val st21StreamNearDup: Q = Q(
    "st21_stream_neardup",
    {
      val mins = (0 until 8).map(i =>
        s"list_min(list_transform(toks, t -> ('0x' || substr(md5('$i:' || t), 1, 8))::BIGINT))")
        .mkString("[", ",\n      ", "]")
      s"""WITH tk AS (SELECT doc_id, doc_id % 3 AS batch,
         |    string_split(text, ' ') AS tk FROM documents),
         |t AS (SELECT doc_id, batch,
         |    list_distinct(list_transform(range(1, len(tk) - 1),
         |      i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS toks FROM tk),
         |m AS (SELECT doc_id, batch,
         |    $mins AS ms FROM t),
         |bands AS (
         |  SELECT doc_id, batch,
         |    CAST(j AS VARCHAR) || ':' || CAST(ms[4 * j + 1] AS VARCHAR)
         |      || ':' || CAST(ms[4 * j + 2] AS VARCHAR)
         |      || ':' || CAST(ms[4 * j + 3] AS VARCHAR)
         |      || ':' || CAST(ms[4 * j + 4] AS VARCHAR) AS band
         |  FROM m, LATERAL unnest([0, 1]) AS u(j)),
         |fb AS (SELECT band, MIN(batch) AS fb FROM bands GROUP BY band),
         |v AS (SELECT doc_id, batch,
         |    MAX(CASE WHEN fb.fb < bands.batch THEN 1 ELSE 0 END) AS dup
         |  FROM bands JOIN fb USING (band) GROUP BY doc_id, batch)
         |SELECT batch, COUNT(*) AS n_docs, CAST(SUM(dup) AS BIGINT) AS n_neardup,
         |  CAST(SUM(CASE WHEN dup = 1 THEN doc_id ELSE 0 END) AS BIGINT) AS dup_checksum
         |FROM v GROUP BY batch ORDER BY batch""".stripMargin
    }) { (s, d) =>
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import s.implicits._
    val base = Paths.get(graft.TempDirs.newTempDir("graft_st21_"))
    val streamDir = base.resolve("stream")
    Files.createDirectories(streamDir)
    val src = Tables.t(s, d, "documents").select("doc_id", "text")
    // Pinned, increasing mtimes — the file source's batch order.
    stageModBatches(s, src, 3, base, streamDir, 1700000000000L, 60000L)
    // Band derivation rides the shared SaltedMinHash kernel (r16): the
    // r15 staged-HOF spelling (trigram transform + array_distinct +
    // aggregate/zip_with over 8 salted md5s, every lambda interpreted)
    // is one eval call per doc — same minima bit-for-bit
    // (SaltedMinHashSpec pins it against the HOF form on the fixture
    // corpus), ~2.5x less band-derivation wall (A/B in
    // OPTIMIZATION_r16.md).
    val schema = s.read.parquet(streamDir.resolve("b0.parquet").toString).schema
    val bands = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
      .select(col("doc_id"), minhash8(col("text")).as("ms"))
      .select(col("doc_id"), explode(array((0 until 2).map(j =>
        concat_ws(":", lit(j.toString),
          element_at(col("ms"), 4 * j + 1).cast("string"),
          element_at(col("ms"), 4 * j + 2).cast("string"),
          element_at(col("ms"), 4 * j + 3).cast("string"),
          element_at(col("ms"), 4 * j + 4).cast("string"))): _*)).as("band"))
      .as[(Long, String)]
    val verdicts = bands.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(Long, String)], state: GroupState[Boolean]) =>
          val prior = state.getOption.getOrElse(false)
          state.update(true)
          rows.map { case (docId, _) => (docId, prior) }
      }
    runToTable(s, verdicts.toDF("doc_id", "prior_seen"), "append")
      .groupBy("doc_id")
      .agg(max(when(col("prior_seen"), 1).otherwise(0)).as("dup"))
      .withColumn("batch", pmod(col("doc_id"), lit(3)))
      .groupBy("batch")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("dup")).cast("long").as("n_neardup"),
        sum(when(col("dup") === 1, col("doc_id")).otherwise(0L))
          .cast("long").as("dup_checksum"))
      .orderBy("batch")
  }

  /** BOUNDED-STATE streaming near-dup — st21's retention/compaction story
    * (VERDICT r12 item 7). st21's per-band set-once state grows ~2
    * rows/doc FOREVER: fine at any bench SF, an unbounded RocksDB at
    * 100 TB/day. This entry is the production answer, implemented and
    * oracle-checked: a TWO-TIER design where live state holds only bands
    * seen within a retention window and everything older lives in an
    * append-only compacted HISTORY table.
    *
    *  - Live tier: `flatMapGroupsWithState` keyed on band with an
    *    EVENT-TIME TIMEOUT at last-arrival + retention. A band idle past
    *    retention times out, emits one eviction record, and removes its
    *    state row — so state size tracks the retention window's WORKING
    *    SET (bands active in the last R), not bands ever seen.
    *  - History tier: each micro-batch's foreachBatch appends that
    *    trigger's evictions to a parquet history table and finalizes the
    *    trigger's verdicts as (prior arrival in live state) OR (band in
    *    history) — the history lookup is st11's dedup-vs-history join,
    *    batch-side, against a table a nightly compactor can dedup and
    *    date-partition at scale.
    *
    * The verdict is EXACTLY st21's for ANY retention value: eviction
    * moves a band between tiers but never forgets it, and a band evicted
    * in a trigger had no arrivals in that trigger (that is what "timed
    * out" means), so checking history as of the PREVIOUS batch is
    * sufficient — the oracle below recomputes first-seen-batch with no
    * mirror of the tiering at all, and retention only bounds STATE.
    * Self-checks make the bound load-bearing: the run must actually
    * evict (history non-empty) and must end with fewer live state rows
    * than distinct bands ever seen; BoundedStateSpec additionally plants
    * a band that is evicted and then re-arrives, proving the history
    * join (not leftover state) produces the dup verdict.
    *
    * At 100 TB/day: state rows ≈ bands in the last R (a day's working
    * set), history is a date-partitioned table whose per-batch lookup is
    * a broadcast/bloom + anti-join (d08's routing argument), and the
    * eviction stream IS the compaction input — no stop-the-world state
    * rewrite anywhere. */
  val st23BoundedStateNearDup: Q = Q(
    "st23_bounded_state_neardup",
    {
      val mins = (0 until 8).map(i =>
        s"list_min(list_transform(toks, t -> ('0x' || substr(md5('$i:' || t), 1, 8))::BIGINT))")
        .mkString("[", ",\n      ", "]")
      s"""WITH tk AS (SELECT doc_id, doc_id % 4 AS batch,
         |    string_split(text, ' ') AS tk FROM documents),
         |t AS (SELECT doc_id, batch,
         |    list_distinct(list_transform(range(1, len(tk) - 1),
         |      i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS toks FROM tk),
         |m AS (SELECT doc_id, batch,
         |    $mins AS ms FROM t),
         |bands AS (
         |  SELECT doc_id, batch,
         |    CAST(j AS VARCHAR) || ':' || CAST(ms[4 * j + 1] AS VARCHAR)
         |      || ':' || CAST(ms[4 * j + 2] AS VARCHAR)
         |      || ':' || CAST(ms[4 * j + 3] AS VARCHAR)
         |      || ':' || CAST(ms[4 * j + 4] AS VARCHAR) AS band
         |  FROM m, LATERAL unnest([0, 1]) AS u(j)),
         |fb AS (SELECT band, MIN(batch) AS fb FROM bands GROUP BY band),
         |v AS (SELECT doc_id, batch,
         |    MAX(CASE WHEN fb.fb < bands.batch THEN 1 ELSE 0 END) AS dup
         |  FROM bands JOIN fb USING (band) GROUP BY doc_id, batch)
         |SELECT batch, COUNT(*) AS n_docs, CAST(SUM(dup) AS BIGINT) AS n_neardup,
         |  CAST(SUM(CASE WHEN dup = 1 THEN doc_id ELSE 0 END) AS BIGINT) AS dup_checksum
         |FROM v GROUP BY batch ORDER BY batch""".stripMargin
    }) { (s, d) => boundedStateNearDup(s, d) }

  /** st23's implementation, callable on any documents dir (the spec runs
    * it on a planted fixture to force the evict-then-rehydrate path).
    *
    * Probe knobs (PROBE_ST23SPLIT, r15 — the entry is the board's
    * slowest bench row and had never had a cost-split; production
    * answers are never read from probe modes):
    *  - `probeMode`: "full" (the entry), "nohist" (verdicts from live
    *    state only — no per-batch history read/join, evictions still
    *    append), "bands" (band derivation + streaming machinery, no
    *    stateful op, noop sink), "passthrough" (raw file stream + noop
    *    sink — the fixed micro-batch overhead floor). The ladder
    *    passthrough < bands < nohist < full splits the wall into fixed
    *    overhead / band derivation / state ops / history join.
    *  - `histSeed`: pre-seed the history tier with N synthetic bands —
    *    the knob that measures the per-batch history-join cost as
    *    history grows 10x (the d08 bloom-routing argument, measured). */
  /** st23's band derivation over a batch (doc_id, text) frame — shared
    * by the stream, the static distinct-band self-check, and
    * PROBE_STREAMSTATE's static ever-seen counterpoint (the number
    * st21's state converges to, computable without a 40-minute
    * streaming replay at the big rungs). st21's staged-projection
    * discipline; see its comments. */
  /** text → array<long>(8) of salted-md5 trigram-shingle minima: the
    * one-eval-per-doc [[graft.functions.SaltedMinHash]] kernel (r16),
    * bit-identical to the r15 staged-HOF spelling it replaced
    * (SaltedMinHashSpec pins the identity; A/B in OPTIMIZATION_r16.md). */
  private def minhash8(text: Column): Column =
    org.apache.spark.sql.GraftPlanShim.column(
      graft.functions.SaltedMinHash(
        org.apache.spark.sql.GraftPlanShim.expression(split(text, " "))))

  private[graft] def bandize(df: DataFrame): DataFrame = {
    df
      .select(col("doc_id"), minhash8(col("text")).as("ms"))
      .select(col("doc_id"), explode(array((0 until 2).map(j =>
        concat_ws(":", lit(j.toString),
          element_at(col("ms"), 4 * j + 1).cast("string"),
          element_at(col("ms"), 4 * j + 2).cast("string"),
          element_at(col("ms"), 4 * j + 3).cast("string"),
          element_at(col("ms"), 4 * j + 4).cast("string"))): _*)).as("band"))
  }

  private[graft] def boundedStateNearDup(s: SparkSession, d: String,
      probeMode: String = "full",
      histSeed: Option[DataFrame] = None): DataFrame = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import s.implicits._
    val base = Paths.get(graft.TempDirs.newTempDir("graft_st23_"))
    val streamDir = base.resolve("stream")
    Files.createDirectories(streamDir)
    val histDir = base.resolve("history").toString
    val outDir = base.resolve("verdicts").toString
    val nBatches = 4
    val t0Ms = 1700000000000L
    val batchMs = 60000L
    val retentionMs = 30000L // < one batch gap, so single-batch bands evict
    val src = Tables.t(s, d, "documents").select("doc_id", "text")
    stageModBatches(s, src, nBatches, base, streamDir, t0Ms, batchMs)
    // empty seed so the per-batch history read never races its own first
    // append (schema pinned; the dir always exists and parses)
    histSeed.getOrElse(s.emptyDataset[String].toDF("band"))
      .write.mode("overwrite").parquet(histDir)
    val schema = s.read.parquet(streamDir.resolve("b0.parquet").toString).schema
    val rawStream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
    if (probeMode == "passthrough" || probeMode == "bands") {
      // probe floors: same files, same trigger cadence, same checkpoint
      // machinery — minus the stateful op (+ minus band derivation for
      // passthrough) and with a noop sink
      val floor = if (probeMode == "passthrough") rawStream.select("doc_id")
        else bandize(rawStream)
      val q = floor.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.format("noop").mode("overwrite").save()
        }
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      return s.emptyDataFrame
    }
    val bands = bandize(rawStream)
      // event time derives from the doc's batch — stable under replay,
      // so the watermark walk (and therefore eviction timing) is
      // deterministic for a given corpus
      .withColumn("ts", timestamp_millis(
        lit(t0Ms) + pmod(col("doc_id"), lit(nBatches)) * batchMs))
      .withWatermark("ts", "0 seconds")
      .as[(Long, String, java.sql.Timestamp)]
    val tagged = bands.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (band: String, rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // idle past retention: hand the band to the history tier
            state.remove()
            Iterator((-1L, band, false, true))
          } else {
            val rs = rows.toSeq
            val prior = state.exists
            val maxTs = rs.iterator.map(_._3.getTime).max
            state.update(maxTs)
            state.setTimeoutTimestamp(maxTs + retentionMs)
            rs.iterator.map { case (docId, b, _) => (docId, b, prior, false) }
          }
      }.toDF("doc_id", "band", "prior_live", "evict")
    val query = withCappedStateWidth(s) {
      val q = tagged.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val b = batch.persist()
          try {
            val ss = b.sparkSession
            // verdicts against history AS OF THE PREVIOUS batch — a band
            // evicted in this trigger had no arrivals in it, so no
            // verdict in this batch can need this batch's evictions
            // (probe nohist: live-state verdict only — isolates the
            // per-batch history read+join term)
            val verdict =
              if (probeMode == "nohist") b.filter(!col("evict"))
                .select(col("doc_id"), col("prior_live").as("dup"))
              else {
                // History probe shape (r15, measured by PROBE_ST23SPLIT's
                // seeded-history growth rows): the old form
                // `hist.distinct()` SHUFFLED the full history table every
                // micro-batch — the one per-batch term that grows with
                // history, i.e. the entry's 100 TB killer. The batch's
                // own bands are O(batch), so instead BROADCAST them into
                // a semi-join that streams history past the build map
                // with no exchange and no history-wide distinct; only
                // the (tiny) intersection is then broadcast back into
                // the verdict join. At scale the same probe composes
                // with date-partitioned history + per-partition
                // band-hash bucketing/bloom (d08's routing) to skip
                // whole files; the semi-join shape is what makes that
                // pushdown reachable — a history-wide distinct never
                // prunes anything.
                val live = b.filter(!col("evict"))
                // r15 opt pass: only rows NOT already dup via live state
                // need the history answer (dup = prior_live OR in_hist,
                // and prior_live short-circuits), and neither side of
                // the probe needs a `.distinct()` — a hash build over
                // duplicate keys answers a semi join identically, and
                // replacing the left join + in_hist flag with a
                // semi/anti split means no row is ever duplicated, so
                // the two per-batch distinct EXCHANGES the r15
                // restructure added are gone while its scale property
                // (history streams past a broadcast build, no history-
                // wide shuffle) is untouched. The two broadcasts of
                // `touched` are one exchange at runtime (ReuseExchange:
                // identical subtree). Verdict multiset is unchanged:
                // each live row lands in exactly one branch with the
                // same dup bit as before.
                val unknown = live.filter(!col("prior_live"))
                val touched = ss.read.parquet(histDir)
                  .join(broadcast(unknown.select("band")), Seq("band"), "left_semi")
                live.filter(col("prior_live"))
                  .select(col("doc_id"), lit(true).as("dup"))
                  .unionByName(unknown
                    .join(broadcast(touched), Seq("band"), "left_semi")
                    .select(col("doc_id"), lit(true).as("dup")))
                  .unionByName(unknown
                    .join(broadcast(touched), Seq("band"), "left_anti")
                    .select(col("doc_id"), lit(false).as("dup")))
              }
            verdict.write.mode("append").parquet(outDir)
            b.filter(col("evict")).select("band")
              .write.mode("append").parquet(histDir)
          } finally { b.unpersist(); () }
        }
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
    // The bound is the point — make it load-bearing, st22-style: the run
    // must actually have evicted (else this degrades to st21 with extra
    // steps), and live state must end strictly below bands-ever-seen.
    // (Probe modes skip the checks: a histSeed inflates the eviction
    // count and nohist's verdicts are deliberately partial.)
    if (probeMode != "full" || histSeed.nonEmpty)
      return s.read.parquet(outDir)
        .groupBy("doc_id")
        .agg(max(when(col("dup"), 1).otherwise(0)).as("dup"))
        .groupBy().count().toDF("n")
    val evicted = s.read.parquet(histDir).count()
    require(evicted > 0,
      "retention never fired — no band was idle past the window; " +
        "the bounded-state path went unexercised")
    // Ever-seen bands = live tier ∪ history tier, read from the two
    // tiers' ACTUAL contents (state reader over the checkpoint + the
    // history parquet). r15 opt pass: the old form re-derived every
    // band from raw text (a second full bandize pass over the corpus —
    // ~2 s of the entry's wall at sf0.1 and a second corpus scan at any
    // scale, which no deployment would run per window); every band that
    // ever arrived created state (set-once per first arrival) and
    // eviction moves it to history, so live ∪ history IS ever-seen.
    // BoundedStateSpec's planted evict-then-rehydrate fixture pins the
    // tier bookkeeping this relies on, and PROBE_STREAMSTATE keeps the
    // independent static-bandize counterpoint for the scale ladders.
    val liveBands = s.read.format("statestore")
      .load(base.resolve("ckpt").toString)
      .select(col("key.value").as("band"))
    val distinctBands = liveBands
      .unionByName(s.read.parquet(histDir))
      .agg(count_distinct(col("band"))).collect()(0).getLong(0)
    val finalStateRows = query.recentProgress.toSeq
      .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
      .lastOption.map(_.numRowsTotal).getOrElse(-1L)
    require(finalStateRows >= 0 && finalStateRows < distinctBands,
      s"state not bounded: $finalStateRows live rows vs $distinctBands " +
        "distinct bands — eviction should keep live state below ever-seen")
    s.read.parquet(outDir)
      .groupBy("doc_id")
      .agg(max(when(col("dup"), 1).otherwise(0)).as("dup"))
      .withColumn("batch", pmod(col("doc_id"), lit(nBatches)))
      .groupBy("batch")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("dup")).cast("long").as("n_neardup"),
        sum(when(col("dup") === 1, col("doc_id")).otherwise(0L))
          .cast("long").as("dup_checksum"))
      .orderBy("batch")
  }

  /** END-TO-END EXACTLY-ONCE under crash-replay — the failure window
    * every production streaming sink must survive: the engine writes a
    * batch's output, crashes BEFORE recording the batch's commit marker,
    * and on restart re-executes that batch into the sink. A sink that
    * appends double-counts the replayed batch; the idempotent pattern —
    * each batch overwrites its OWN batch-id-keyed output directory —
    * converges to exactly-once no matter how many times a batch replays.
    *
    * The entry runs the real sequence, deterministically:
    *  1. stage events into 4 parquet files; stream them with
    *     maxFilesPerTrigger=1 (4 micro-batches) through a foreachBatch
    *     sink writing `out/batch_id=<id>/` with per-batch overwrite;
    *  2. CRASH SIMULATION: delete the newest checkpoint commit marker —
    *     the batch's offsets are recorded (so its input set is pinned)
    *     but its commit is not, which is precisely the state a real
    *     crash between sink-write and commit leaves behind;
    *  3. restart from the same checkpoint with AvailableNow: the engine
    *     replays exactly that batch into the sink, then finishes.
    * The oracle is the plain batch aggregate — any double-count from the
    * replay hash-mismatches. (File-to-batch assignment order is
    * irrelevant to the result: every event lands in exactly one batch.)
    *
    * At 100 TB the same pattern is MERGE-by-batch-id into a transactional
    * table, or dynamic partition overwrite keyed on (date, batch) — the
    * idempotence argument is identical. */
  val st22RestartExactlyOnce: Q = Q(
    "st22_restart_exactly_once",
    s"""SELECT event_type, COUNT(*) AS n, ${Det.sqlSum("value")} AS sum_value
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val base = java.nio.file.Paths.get(graft.TempDirs.newTempDir("graft_st22_"))
    val (stage, out, ckpt) = (base.resolve("stage").toString,
      base.resolve("out").toString, base.resolve("ckpt").toString)
    Tables.t(s, d, "events").repartition(4)
      .write.mode("overwrite").parquet(stage)
    val schema = s.read.parquet(stage).schema
    def runOnce(): Unit = {
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
      val q = src.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.write.mode("overwrite").parquet(s"$out/batch_id=$batchId")
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    withCappedStateWidth(s) {
      runOnce()
      // crash between sink-write and commit: offsets/<last> exists,
      // commits/<last> does not
      val commits = java.nio.file.Paths.get(ckpt, "commits")
      val listing = java.nio.file.Files.list(commits)
      val latest =
        try listing.filter(p => p.getFileName.toString.forall(_.isDigit))
          .max(java.util.Comparator.comparingLong(p => p.getFileName.toString.toLong))
        finally listing.close()
      java.nio.file.Files.delete(latest.get())
      // the local ChecksumFs keeps a `.N.crc` sidecar per log file; a
      // stale sidecar without its file is a state no real crash leaves
      // behind (and fails the replayed commit's rename), so the
      // simulation removes both
      java.nio.file.Files.deleteIfExists(
        latest.get().resolveSibling("." + latest.get().getFileName + ".crc"))
      runOnce()
      // self-check: the restart must actually have replayed the
      // uncommitted batch (recreating its commit marker) — otherwise
      // this entry would degrade to a plain two-run no-op and stop
      // exercising the exactly-once path it exists to prove
      require(java.nio.file.Files.exists(latest.get()),
        "restart did not replay the uncommitted batch")
    }
    s.read.parquet(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(st01Tumbling, st02Sliding, st03Session, st04Dedup,
    st05Stateful, st06FileSink, st07StreamJoin, st08ForeachBatch,
    st09StreamStaticJoin, st10UpdateMode, st11StreamDedup, st12StreamAnnRoute,
    st13RocksdbState, st14StreamLeftOuter, st15TransformWithState, st16TimerExpiry,
    st17ChainedWindows, st18StateReader, st19JoinThenWindow, st20StreamFullOuter,
    st21StreamNearDup, st22RestartExactlyOnce, st23BoundedStateNearDup)
}

/** st15's processor: named per-key ValueState holding (count, cents),
  * folded per input batch, current total emitted per update. Top-level
  * class (not an entry-local anonymous one) because the processor is
  * serialized into the streaming query. */
/** st16's processor: per-user session finalization via EVENT-TIME TIMERS
  * — the half of the transformWithState API st15's ValueState entry
  * doesn't touch. Each input batch advances the user's (count, last-ts)
  * state and re-arms a timer at last-ts + gap (the previous timer is
  * deleted — exactly one armed timer per key); when the WATERMARK passes
  * a timer, handleExpiredTimer emits the final session summary and
  * clears state — the emit-on-silence pattern (cart abandonment,
  * session end, SLA breach) that polling can't express. Nothing is
  * emitted from handleInputRows; output exists ONLY via timers. */
class SessionExpiryProcessor(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), (Long, Long, Long)] {
  @transient private var state: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

  override def init(
      outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long)](
      "sess",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timers: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, Long)] = {
    var (n, last) = Option(state.get()).getOrElse((0L, Long.MinValue))
    rows.foreach { case (_, ms) => n += 1; if (ms > last) last = ms }
    // re-arm: exactly one live timer per key
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
    getHandle.registerTimer(last + gapMs)
    state.update((n, last))
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: Long,
      timers: org.apache.spark.sql.streaming.TimerValues,
      expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[(Long, Long, Long)] = {
    val out = Option(state.get()).map { case (n, last) => (key, n, last) }
    state.clear()
    out.iterator
  }
}

class RunningCentsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), (Long, Long, Long)] {
  @transient private var state: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

  override def init(
      outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long)](
      "agg",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timers: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, Long)] = {
    var (n, cents) = Option(state.get()).getOrElse((0L, 0L))
    rows.foreach { case (_, c) => n += 1; cents += c }
    state.update((n, cents))
    Iterator.single((key, n, cents))
  }
}
