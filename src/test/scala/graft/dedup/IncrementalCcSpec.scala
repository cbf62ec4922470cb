package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d18: merging the doc_id%10=0 batch into yesterday's clustering must
  * reproduce the full recompute exactly, while the delta CC loop runs on
  * a graph sized by the batch, not the corpus. */
class IncrementalCcSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("d18 equals the full d07 recompute, label for label") {
    val full = DedupQueries.d07CcClusters.fn(s, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inc = DedupQueries.d18IncrementalCc.fn(s, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc.size == full.size, s"row counts differ: ${inc.size} vs ${full.size}")
    val diffs = full.collect {
      case (id, c) if inc(id) != c => (id, c, inc(id))
    }
    assert(diffs.isEmpty, s"labels diverge (doc, full, incremental): ${diffs.take(5)}")
  }

  test("d18's delta graph is batch-sized, not corpus-sized") {
    val (oldLabels, deltaNodes, _) = DedupQueries.incrementalCcParts(s, d)
    val corpus = oldLabels.count() // old docs alone already ~90% of corpus
    val delta = deltaNodes.count()
    // nodes = new docs + touched old components; the batch is 10% of the
    // corpus, so anything near corpus size means contraction failed
    assert(delta < corpus / 2,
      s"delta graph has $delta nodes against a $corpus-doc history — " +
        "the incremental loop is not contracting")
  }

  test("a merged component relabels its OLD members too") {
    // find a component whose final label differs from some member's
    // yesterday label — i.e. today's batch actually merged old clusters
    // (if the fixture never exercises the remap path, the test is vacuous
    // and must say so rather than silently pass)
    val (oldLabels, _, result) = DedupQueries.incrementalCcParts(s, d)
    val remapped = oldLabels
      .join(result, oldLabels("id") === result("doc_id"))
      .filter(col("comp") =!= col("component"))
      .count()
    assert(remapped > 0,
      "no old document changed label — the fixture exercises only the " +
        "trivial append path; pick a different batch predicate")
  }
}
