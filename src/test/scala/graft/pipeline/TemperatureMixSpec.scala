package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Temperature-sampling laws for p12 (α = 1/2 mixture):
  *  (a) the apportionment spends EXACTLY the budget and stays within one
  *      token of each language's √-weighted quota;
  *  (b) the TEMPERATURE property itself: p^α preserves the ordering and
  *      provably compresses the EXTREMES for α < 1 — q_max ≤ p_max and
  *      q_min ≥ p_min (since Σ√p_j = Σ p_j/√p_j is bracketed by
  *      1/√p_max and 1/√p_min); the biggest language is damped, the
  *      smallest boosted. Middle languages can legitimately land
  *      outside [p, 1/k] under skew, so only the sound extremes are
  *      asserted;
  *  (c) weights are the exactly-computable integer form
  *      floor(2^20·√n_tokens). */
class TemperatureMixSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir
  private val budget = 1000000L

  test("temperature mix: budget exact, quota ±1, shares compressed toward uniform") {
    val rows = PipelineQueries.p12TemperatureMix.fn(s, d).collect()
    assert(rows.length >= 2, "need at least two languages for mixture checks")
    val tokens = rows.map(_.getAs[Long]("n_tokens"))
    val weights = rows.map(_.getAs[Long]("weight"))
    val alloc = rows.map(_.getAs[Long]("alloc"))
    // (c) the integer weight law
    tokens.zip(weights).foreach { case (t, w) =>
      assert(w == math.floor(math.sqrt(t.toDouble) * 1048576).toLong,
        s"weight $w is not floor(2^20*sqrt($t))")
    }
    // (a) exact spend + within-quota
    assert(alloc.sum == budget, s"spent ${alloc.sum}, budget $budget")
    val wTotal = weights.sum
    weights.zip(alloc).foreach { case (w, a) =>
      val qFloor = budget * w / wTotal
      assert(a == qFloor || a == qFloor + 1,
        s"weight $w got $a, quota floor $qFloor")
    }
    // (b) ordering preserved + extremes compressed (±1-token wobble)
    val tTotal = tokens.sum.toDouble
    val byTokens = tokens.zip(alloc).sortBy(_._1)
    byTokens.sliding(2).foreach {
      case Array((t1, a1), (t2, a2)) =>
        assert(a1 <= a2 + 1, s"ordering broken: $t1 tokens -> $a1 vs $t2 -> $a2")
      case _ =>
    }
    val (tMax, aMax) = byTokens.last
    val (tMin, aMin) = byTokens.head
    assert(aMax / budget.toDouble <= tMax / tTotal + 2e-5,
      s"max language not damped: share ${aMax / budget.toDouble} vs raw ${tMax / tTotal}")
    assert(aMin / budget.toDouble >= tMin / tTotal - 2e-5,
      s"min language not boosted: share ${aMin / budget.toDouble} vs raw ${tMin / tTotal}")
  }
}
