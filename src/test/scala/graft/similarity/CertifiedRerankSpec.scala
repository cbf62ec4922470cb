package graft.similarity

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** v12's certificate, checked directly: the quantized-bound shortlist
  * must (a) actually prune — strictly fewer candidates than rows — and
  * (b) contain every member of the true top-k, which is the property
  * that makes the two-phase plan EXACT rather than approximate. The
  * oracle already proves the final output; this spec proves the
  * pruning was legal rather than lucky. */
class CertifiedRerankSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = "/root/testdata/sf0.01"

  test("certified shortlist prunes and still contains the true top-k") {
    val k = 20
    val (scored, shortlist) = SimilarityQueries.certifiedParts(s, d, k)
    val total = scored.count()
    val kept = shortlist.count()
    assert(kept < total, s"no pruning: $kept of $total")
    assert(kept >= k, s"shortlist smaller than k: $kept")

    val short = shortlist.select("vec_id").collect().map(_.getLong(0)).toSet
    val e = graft.Tables.t(s, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probe = e.filter(col("vec_id") === 3).select(col("v").as("pv"))
    val exact = e.crossJoin(broadcast(probe))
      .select(col("vec_id"),
        aggregate(zip_with(col("v"), col("pv"), (x, y) => x * y),
          lit(0.0), (a, x) => a + x).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k).collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(short),
      s"certificate violated: missing ${exact diff short}")
  }
}
