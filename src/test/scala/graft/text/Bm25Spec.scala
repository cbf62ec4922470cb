package graft.text

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** t15's arithmetic contract, checked independently of the oracle: the
  * engine's rational BM25 must equal the formula computed directly from
  * per-doc token counts on the driver (same integer/double steps, so
  * equality is exact, not approximate). */
class Bm25Spec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir
  private val terms = Seq("spark", "vector", "merge")

  test("engine scores equal the driver-side rational BM25, bit for bit") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val n = docs.length.toLong
    val t = docs.map(_._2.length.toLong).sum
    val tfs: Map[(Long, String), Long] = docs.flatMap { case (id, toks) =>
      terms.flatMap { w =>
        val tf = toks.count(_ == w).toLong
        if (tf > 0) Some((id, w) -> tf) else None
      }
    }.toMap
    val dfs: Map[String, Long] =
      terms.map(w => w -> tfs.keys.count(_._2 == w).toLong).toMap

    def score(id: Long, dl: Long, w: String): Double = tfs.get((id, w)) match {
      case None => 0.0
      case Some(tf) =>
        val idf = (2 * n - 2 * dfs(w) + 1).toDouble / (2 * dfs(w) + 1).toDouble
        val tfn = (44 * tf * t).toDouble /
          (20 * tf * t + 6 * t + 18 * dl * n).toDouble
        idf * tfn
    }
    val expected = docs
      .map { case (id, toks) =>
        val ss = terms.map(w => score(id, toks.length.toLong, w))
        (id, ss(0), ss(1), ss(2), ss(0) + ss(1) + ss(2))
      }
      .filter(r => r._5 > 0.0)
      .sortBy(r => (-r._5, r._1))
      .take(20)

    val got = TextQueries.t15Bm25.fn(s, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1, s"doc order: $g vs $e")
      // exact equality — every step is either integer-exact or one
      // correctly-rounded IEEE op in the same order on both sides
      assert(java.lang.Double.doubleToLongBits(g._5) ==
        java.lang.Double.doubleToLongBits(e._5), s"score bits: $g vs $e")
    }
  }
}
