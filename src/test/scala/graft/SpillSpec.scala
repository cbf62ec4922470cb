package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.scalatest.funsuite.AnyFunSuite

/** Regression tripwire for the scale story's quietest assumption
  * (VERDICT r5 #7): the hot queries' shuffle partitions FIT IN MEMORY —
  * no sort/aggregation/join spill at the verify SF. A refactor that
  * silently fattens a shuffle (a dropped projection, a pre-shuffle
  * explode, an unpruned text column riding a join) shows up here as
  * nonzero spill long before it becomes an sf0.1 bench regression or a
  * 100 TB OOM. (Executor memory here is the test JVM's; at cluster
  * scale the same zero-spill property is what
  * spark.sql.shuffle.partitions sizing maintains.) */
class SpillSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = "/root/testdata/sf0.01"

  // Entries whose plans this repo tunes hardest: scans/aggs/joins,
  // window top-k, the stats sweep, the 6-table composite, the dedup and
  // similarity heavies.
  private val hot = Seq(
    "q01_scan_project", "q03_agg_pricing_summary", "q07_join_broadcast",
    "q08_join_multiway", "q19_topk_global", "q20_topk_per_group",
    "q37_stats_exact", "q48_topk_auto", "q51_tpch_composite",
    "d05_ngram_jaccard", "v04_embedding_neardup", "t09_decontamination",
    // round-7 heavies: the iterative graph pair, the trigram LM sweep,
    // the rewritten join-agg shapes, and the within-cell pairwise dedup
    "p03_pagerank", "p04_triangles", "t14_lm_score", "q66_eager_agg",
    "q67_delta_join_view", "d10_semantic_dedup", "v12_certified_rerank",
    // round-8 heavies: frontier BFS, batched ANN serving, chunk-hash
    // binary dedup, the MOR read, and the clustering+representative
    // composition
    "p05_bfs_hops", "v14_batched_ann", "m07_binary_neardup",
    "i20_merge_on_read", "d12_canonical_select")

  test("hot queries run spill-free at the verify SF") {
    val spilled = new LongAdder
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) spilled.add(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    s.sparkContext.addSparkListener(listener)
    val perQuery = try {
      hot.map { name =>
        spilled.reset()
        SparkEntry.queries(name)(s, d).write.format("noop").mode("overwrite").save()
        SparkTestBase.drainListener(() => spilled.sum)
        name -> spilled.sum
      }
    } finally s.sparkContext.removeSparkListener(listener)
    val offenders = perQuery.filter(_._2 > 0)
    assert(offenders.isEmpty,
      offenders.map { case (n, b) => s"$n spilled $b bytes" }.mkString("; "))
  }
}
