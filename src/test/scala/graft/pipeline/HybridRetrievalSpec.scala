package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Fusion-law checks for p09's reciprocal-rank fusion: each source's
  * ranks are a permutation prefix (1..k, no repeats), the fused score is
  * exactly 1/(60+r_lex) + 1/(60+r_dense) with absent ranks contributing
  * zero, and the output is totally ordered by (rrf DESC, doc_id). */
class HybridRetrievalSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("p09: ranks are 1..k without repeats and rrf matches the formula") {
    val rows = PipelineQueries.p09HybridRetrieval.fn(s, d).collect()
    assert(rows.nonEmpty)
    def ranks(c: String) = rows.flatMap(r => Option(r.getAs[java.lang.Long](c)).map(_.toLong))
    for (c <- Seq("r_lex", "r_dense")) {
      val rs = ranks(c).sorted.toSeq
      assert(rs == (1L to rs.length.toLong).toSeq,
        s"$c is not a dense 1..k prefix: ${rs.take(5)}")
    }
    // union of two ≤50-lists: between max(|lex|,|den|) and their sum
    assert(rows.length >= ranks("r_lex").length.max(ranks("r_dense").length))
    assert(rows.length <= ranks("r_lex").length + ranks("r_dense").length)
    rows.foreach { r =>
      def term(c: String) = Option(r.getAs[java.lang.Long](c))
        .map(v => 1.0 / (60.0 + v.toDouble)).getOrElse(0.0)
      val expected = term("r_lex") + term("r_dense")
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("rrf")) ==
        java.lang.Double.doubleToLongBits(expected),
        s"doc ${r.get(0)}: rrf ${r.getAs[Double]("rrf")} != $expected")
    }
    val fused = rows.map(r => (r.getAs[Double]("rrf"), r.getAs[Long]("doc_id")))
    assert(fused.sortBy { case (sc, id) => (-sc, id) }.toSeq == fused.toSeq,
      "output not ordered by (rrf DESC, doc_id)")
  }
}
