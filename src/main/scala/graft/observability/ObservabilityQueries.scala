package graft.observability

import java.util.concurrent.atomic.LongAdder

import graft.Q
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Observability (SURVEY §2.1 O17): the engine-side analog of the
  * reference's logging/App-Insights telemetry (fetch_articles.py's
  * logging calls) — a SparkListener attached for the duration of one
  * catalog query, aggregating scheduler + task metrics into a one-row
  * record a metrics pipeline would ship.
  *
  * No oracle: job/stage/task topology is engine-internal (AQE may
  * re-plan stage counts run to run); ObservabilitySpec asserts the
  * invariants (counts positive, records_read covers the scanned table,
  * listener detached afterwards).
  */
object ObservabilityQueries {

  val o01QueryMetrics: Q = Q.noOracle("o01_query_metrics") { (s, d) =>
    val jobs, stages, tasks, recordsRead, shuffleWrite = new LongAdder
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.increment()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.increment()
        recordsRead.add(e.stageInfo.taskMetrics.inputMetrics.recordsRead)
        shuffleWrite.add(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = tasks.increment()
    }
    s.sparkContext.addSparkListener(listener)
    val metrics = try {
      graft.relational.RelationalQueries.q03AggBasic.fn(s, d)
        .write.format("noop").mode("overwrite").save()
      // the listener bus delivers asynchronously — poll until the
      // counters go quiet (bounded, ~2 s worst case)
      var prev = -1L
      var cur = jobs.sum + stages.sum + tasks.sum
      var spins = 0
      while (prev != cur && spins < 40) {
        Thread.sleep(50); prev = cur
        cur = jobs.sum + stages.sum + tasks.sum; spins += 1
      }
      (jobs.sum, stages.sum, tasks.sum, recordsRead.sum, shuffleWrite.sum)
    } finally s.sparkContext.removeSparkListener(listener)
    import s.implicits._
    Seq(("q03_agg_pricing_summary", metrics._1, metrics._2, metrics._3,
      metrics._4, metrics._5))
      .toDF("query", "n_jobs", "n_stages", "n_tasks", "records_read",
        "shuffle_bytes_written")
      .orderBy("query")
  }

  /** Pipeline-embedded metrics via Dataset.observe — the production
    * monitoring surface o01's listener approximates from outside:
    * named aggregates ride INSIDE the query plan (CollectMetrics →
    * AggregatingAccumulator), so row counts / checksums / data-quality
    * tallies cost zero extra passes — at 100 TB the write and its
    * audit metrics are one scan, not two. Unlike o01, the metrics here
    * are pure data aggregates (count + Det-decimal sum + a predicate
    * tally), deterministic regardless of scheduling — so this entry is
    * fully ORACLE-CHECKED: the observed values themselves hash-match
    * DuckDB computing the same aggregates. The action is a noop-sink
    * write (the realistic shape: observe decorates a write, not a
    * collect); Observation blocks until the query-end listener
    * delivers the metrics row. */
  val o02Observe: Q = Q(
    "o02_observe",
    s"""SELECT COUNT(*) AS n_rows,
       |  ${graft.Det.sqlSum("l_extendedprice")} AS total_price,
       |  CAST(COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT) AS n_discounted
       |FROM lineitem""".stripMargin) { (s, d) =>
    // one-shot per invocation: Observation instances are single-use and
    // Bench runs each fn multiple times in one session
    val obs = org.apache.spark.sql.Observation(
      s"graft_o02_${java.util.UUID.randomUUID.toString.replace("-", "")}")
    graft.Tables.t(s, d, "lineitem")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        graft.Det.dsum(col("l_extendedprice")).as("total_price"),
        count(when(col("l_discount") > 0.05, 1)).as("n_discounted"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    import s.implicits._
    Seq((m("n_rows").asInstanceOf[Long], m("total_price").asInstanceOf[Double],
      m("n_discounted").asInstanceOf[Long]))
      .toDF("n_rows", "total_price", "n_discounted")
  }

  /** observe() on a STREAMING query — o02's in-plan audit channel in
    * the deployment where it matters most: a long-running stream whose
    * per-batch data-quality metrics land in every
    * StreamingQueryProgress (the feed a monitoring pipeline tails).
    * The metrics are pure data aggregates in exact integer arithmetic
    * (count, cents sum, threshold tally), summed across batches on the
    * driver — batch boundaries can't change a sum of longs — so the
    * entry is fully ORACLE-CHECKED against DuckDB computing the same
    * aggregates over the same events. The stream runs to a noop sink:
    * the metrics ride the real streaming engine (offsets, progress
    * reporting), not a batch shortcut. */
  val o03StreamObserve: Q = Q(
    "o03_stream_observe",
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
      |  CAST(COUNT(CASE WHEN CAST(round(value * 100) AS BIGINT) > 5000
      |             THEN 1 END) AS BIGINT) AS n_big
      |FROM events WHERE event_type = 'purchase'""".stripMargin) { (s, d) =>
    val obsName = s"graft_o03_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val stream = graft.streaming.StreamingQueries.replayedEvents(s, d)
      .filter(col("event_type") === "purchase")
      .select(expr("cast(round(value * 100) as long)").as("c"))
      .observe(obsName,
        count(lit(1)).as("n_rows"),
        sum(col("c")).as("cents"),
        count(when(col("c") > 5000, 1)).as("n_big"))
    // Collect per-batch metrics through a StreamingQueryListener, NOT
    // q.recentProgress: the progress buffer is capped at
    // spark.sql.streaming.numRecentProgressUpdates (default 100), so a
    // replay splitting into >100 batches would silently drop the
    // earliest batches from the sum. The listener sees every progress
    // event; batchId keying dedups any redelivery. obsName is
    // UUID-unique, so filtering on its presence needs no query-id
    // handshake with the (async) listener bus.
    val perBatch = new java.util.concurrent.ConcurrentHashMap[
      java.lang.Long, org.apache.spark.sql.Row]()
    val terminated = new java.util.concurrent.CountDownLatch(1)
    val ourId = new java.util.concurrent.atomic.AtomicReference[java.util.UUID]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        Option(e.progress.observedMetrics.get(obsName))
          .foreach(r => perBatch.put(e.progress.batchId, r))
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        if (e.id == ourId.get) terminated.countDown()
    }
    s.streams.addListener(listener)
    try {
      val q = stream.writeStream.format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      ourId.set(q.id)
      q.awaitTermination()
      // the listener bus is async; the terminated event is delivered
      // after every progress event for this query, so waiting for it
      // guarantees perBatch is complete.
      terminated.await(60, java.util.concurrent.TimeUnit.SECONDS)
    } finally s.streams.removeListener(listener)
    import scala.jdk.CollectionConverters._
    val batches = perBatch.values.asScala.toSeq
    val n = batches.map(_.getAs[Long]("n_rows")).sum
    val cents = batches.flatMap(r => Option(r.getAs[Any]("cents")))
      .map(_.asInstanceOf[Long]).sum
    val big = batches.map(_.getAs[Long]("n_big")).sum
    import s.implicits._
    Seq((n, cents, big)).toDF("n_rows", "cents", "n_big")
  }

  val all: Seq[Q] = Seq(o01QueryMetrics, o02Observe, o03StreamObserve)
}
