package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Apportionment-law checks for p07: largest-remainder allocation must
  * (a) spend EXACTLY the budget, (b) stay within one token of every
  * bucket's exact proportional quota (the within-quota property that
  * makes largest-remainder the standard method), and (c) allocate zero
  * only to zero-token buckets. */
class MixAllocationSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir
  private val budget = 100000L

  test("mix allocation sums to the budget and stays within quota +-1") {
    val rows = PipelineQueries.p07MixAllocation.fn(s, d).collect()
    assert(rows.nonEmpty, "no buckets survived curation — assertions vacuous")
    val tokens = rows.map(_.getAs[Long]("n_tokens"))
    val alloc = rows.map(_.getAs[Long]("alloc"))
    val total = tokens.sum
    assert(alloc.sum == budget,
      s"allocation spent ${alloc.sum}, budget is $budget")
    tokens.zip(alloc).foreach { case (t, a) =>
      // exact quota = budget * t / total; largest-remainder gives
      // floor(q) or floor(q)+1, i.e. a - q in (-1, 1)
      val qFloor = budget * t / total
      assert(a == qFloor || a == qFloor + 1,
        s"bucket with $t tokens got $a, quota floor $qFloor")
    }
    // determinism: a second run is bit-identical (window tie-break total)
    val again = PipelineQueries.p07MixAllocation.fn(s, d).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "allocation not deterministic across runs")
  }
}
