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

  val all: Seq[Q] = Seq(o01QueryMetrics)
}
