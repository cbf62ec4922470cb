package graft.similarity

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("brute-force cosine top-k leads with the probe itself at exactly 1.0") {
    val top = SimilarityQueries.v01CosineTopK.fn(s, d).collect()
    assert(top.head.getLong(0) == 0L, "vec_id 0 is the probe")
    assert(top.head.getDouble(2) == 1.0, "self-similarity must clamp to exactly 1.0")
    val sims = top.map(_.getDouble(2)).toSeq
    assert(sims == sims.sorted.reverse, "descending by similarity")
    assert(sims.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("LSH bucket lookup returns a subset of brute force, probe first") {
    val bucket = SimilarityQueries.v03AnnLshBucket.fn(s, d).collect()
    assert(bucket.nonEmpty && bucket.head.getLong(0) == 0L,
      "the probe's own bucket always contains the probe")
    assert(bucket.head.getDouble(2) == 1.0)
  }

  test("partitioned ANN lookup plans a partition-PRUNED scan") {
    val df = SimilarityQueries.v07AnnPartitionPruned.fn(s, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected a bucket partition filter on the scan:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.head.getLong(0) == 0L && rows.head.getDouble(2) == 1.0)
    assert(rows.map(r => r.get(1).toString).distinct.length == 1,
      "only the probe's cell is read")
  }

  test("near-dup pair mining reports only pairs above threshold, i < j") {
    val pairs = SimilarityQueries.v04EmbeddingNearDup.fn(s, d).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4 && r.getDouble(2) <= 1.0)
    }
  }
}
