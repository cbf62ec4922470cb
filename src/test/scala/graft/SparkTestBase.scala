package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM (a per-suite
  * session would pay ~5 s of context startup each). Config mirrors the
  * Verify/Bench harness: UTC, small shuffle width, nanos-as-long for the
  * events table. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // The generated-class cache defaults to 100 entries; a 137-query
      // catalog compiles far more distinct codegen classes than that, so
      // the cache thrashes and queries pay Janino recompilation on every
      // pass (measured on the dedup subset: d05 3.5 -> 2.1 s, d04/d07
      // -25% with the cache sized to hold the whole catalog).
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // keep ContextCleaner ahead of multi-suite shuffle/broadcast
      // garbage (see Bench.scala for the sf10 measurement)
      .config("spark.cleaner.periodicGC.interval", "45s")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftEngine.install(s)
    s
  }

  /** Smoke-tier data — correctness semantics don't need volume. */
  val sfDir = "/root/testdata/sf0.001"

  /** AQE wrappers (AdaptiveSparkPlanExec / QueryStageExec) are LEAF
    * nodes hiding the real tree — unwrap them wherever they appear,
    * including the root. Includes subqueries. One copy here; specs had
    * grown four diverging clones of this. */
  def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      flattenPlan(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      flattenPlan(q.plan)
    case other => other +: (other.children ++ other.subqueries).flatMap(flattenPlan)
  }

  /** The listener bus delivers asynchronously; poll a counter until it
    * goes quiet (bounded, ~2 s worst case). */
  def drainListener(current: () => Long): Unit = {
    var prev = -1L; var cur = current(); var spins = 0
    while (prev != cur && spins < 40) {
      Thread.sleep(50); prev = cur; cur = current(); spins += 1
    }
  }
}
