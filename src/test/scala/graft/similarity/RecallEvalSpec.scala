package graft.similarity

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The v17/v18 evaluation pair's documented claim, pinned: on this
  * corpus the geometry-directed IVF probe must beat the fixed-plane
  * sign-LSH bucket on recall@20, both recalls must equal hits/k
  * exactly, and both evaluations must agree on k. */
class RecallEvalSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("v17/v18: recall = hits/k, same k, and IVF beats sign-LSH here") {
    val lsh = SimilarityQueries.v17AnnRecall.fn(s, d).head()
    val ivf = SimilarityQueries.v18IvfRecall.fn(s, d).head()
    for (r <- Seq(lsh, ivf)) {
      val (k, hits) = (r.getAs[Long]("k"), r.getAs[Long]("hits"))
      assert(k == 20 && hits >= 0 && hits <= k)
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("recall")) ==
        java.lang.Double.doubleToLongBits(hits.toDouble / k.toDouble))
    }
    assert(ivf.getAs[Double]("recall") > lsh.getAs[Double]("recall"),
      s"IVF recall ${ivf.getAs[Double]("recall")} did not beat " +
        s"LSH recall ${lsh.getAs[Double]("recall")} on this corpus")
  }
}
