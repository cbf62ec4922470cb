package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** p08's packing invariants — the guarantees a data loader relies on,
  * checked over the real fixture rather than against the oracle:
  *  1. every doc appears exactly once (packing is a permutation);
  *  2. no sequence exceeds capacity unless it holds a single oversized
  *     doc (greedy never splits and never overfills);
  *  3. greedy tightness: the first doc of sequence k+1 did NOT fit in
  *     sequence k (otherwise the fold rolled over too early);
  *  4. within a bucket, sequence ids follow doc_id order (deterministic
  *     shard-order packing).
  */
class SequencePackSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir
  private val cap = 256L

  test("greedy first-fit invariants hold over the whole fixture") {
    val rows = PipelineQueries.p08SequencePack.fn(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = graft.Tables.t(s, d, "documents").count()
    assert(rows.length.toLong == nDocs)
    assert(rows.map(_._1).distinct.length == rows.length)

    rows.groupBy(r => (r._2, r._3)).foreach { case ((b, seq), ds) =>
      val fill = ds.map(_._4).sum
      assert(fill <= cap || ds.length == 1,
        s"bucket $b seq $seq overfilled: $fill with ${ds.length} docs")
    }

    rows.groupBy(_._2).foreach { case (b, ds) =>
      val inOrder = ds.sortBy(_._1)
      // seq ids are non-decreasing in doc_id order and start at 0
      assert(inOrder.head._3 == 0L)
      inOrder.sliding(2).foreach {
        case Array((_, _, s1, _), (_, _, s2, _)) =>
          assert(s2 == s1 || s2 == s1 + 1, s"bucket $b skips seq: $s1 -> $s2")
        case _ => ()
      }
      // tightness: the doc that OPENS seq k+1 would have overflowed seq k
      val bySeq = inOrder.groupBy(_._3)
      bySeq.keys.filter(_ > 0).foreach { k =>
        val prevFill = bySeq(k - 1).map(_._4).sum
        val opener = bySeq(k).minBy(_._1)._4
        assert(prevFill + opener > cap,
          s"bucket $b seq $k opened although ${prevFill} + ${opener} <= $cap")
      }
    }
  }
}
