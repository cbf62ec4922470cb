package graft.similarity

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** v15's statistical properties — the ones the end-to-end hash cannot
  * pin (the hash proves both engines run the SAME approximate pipeline;
  * this spec proves the approximation is a sane one):
  *  - the Cauchy-Schwarz certificate holds row-by-row:
  *    |dot(v,p) − adc| <= ||residual|| · ||p|| (inflated 1e-6 relative
  *    + 1e-9 absolute for the bound arithmetic's own rounding) — adc
  *    scores are never silently wrong by more than the quantization
  *    theory allows;
  *  - the ADC shortlist PRUNES (100 rows out of a larger table);
  *  - recall@100 of the exact top-20 clears a floor (PQ on this
  *    quasi-random corpus is a weak quantizer — sub-vectors carry no
  *    cluster structure — so the floor is deliberately modest; the
  *    rerank output is exact for whatever the shortlist contains, and
  *    the entry's hash-greenness never depends on recall). */
class PqAnnSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("ADC bound holds per row; shortlist prunes; recall clears floor") {
    val (scored, short, _) = SimilarityQueries.pqParts(s, d)
    val dotExpr = aggregate(zip_with(col("v"), col("pv"), (x, y) => x * y),
      lit(0.0), (a, x) => a + x)
    val pNorm = sqrt(aggregate(transform(col("pv"), x => x * x),
      lit(0.0), (a, x) => a + x))
    val cached = scored
      .select(col("vec_id"), col("qdot"), col("err2"),
        dotExpr.as("dot"), pNorm.as("pn"))
      .cache()
    try {
      val n = cached.count()
      val nViolations = cached
        .filter(abs(col("dot") - col("qdot")) >
          sqrt(col("err2")) * col("pn") * 1.000001 + 1e-9)
        .count()
      assert(nViolations == 0, s"$nViolations rows violate the ADC bound")

      assert(n > 100, s"table too small for the shortlist to prune: $n rows")
      assert(short.count() == 100)

      val top20 = cached.orderBy(col("dot").desc, col("vec_id")).limit(20)
        .collect().map(_.getLong(0)).toSet
      val inShort = short.select("vec_id").collect().map(_.getLong(0)).toSet
      val recall = (top20 & inShort).size / 20.0
      info(s"recall@100 of exact top-20: $recall")
      assert(recall >= 0.5, s"recall@100 collapsed: $recall")
    } finally cached.unpersist()
  }
}
