package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Shard-manifest laws for p13:
  *  (a) round-robin over a total order makes shard sizes PROVABLY
  *      balanced: max − min ≤ 1 document (hash-mod sharding is only
  *      balanced in expectation);
  *  (b) the shards partition the corpus exactly: doc counts and id
  *      checksums sum to the whole table's;
  *  (c) the shuffle is deterministic: a second run is bit-identical
  *      (reproducible data order is the point of seeding the shuffle). */
class ShardShuffleSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("shards are balanced, exhaustive, and deterministic") {
    val rows = PipelineQueries.p13ShardShuffle.fn(s, d).collect()
    assert(rows.length == 16, s"expected 16 shards, got ${rows.length}")
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.max - counts.min <= 1,
      s"round-robin shards unbalanced: min ${counts.min}, max ${counts.max}")
    val docs = graft.Tables.t(s, d, "documents")
    val total = docs.count()
    val idSum = docs.agg(org.apache.spark.sql.functions.sum("doc_id"))
      .head().getLong(0)
    assert(counts.sum == total, s"shards cover ${counts.sum} of $total docs")
    assert(rows.map(_.getAs[Long]("id_checksum")).sum == idSum,
      "id checksums do not partition the corpus")
    val again = PipelineQueries.p13ShardShuffle.fn(s, d).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "shard assignment not deterministic across runs")
  }
}
