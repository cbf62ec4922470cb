package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.GraftPlanShim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CountTokens must agree with size(split(text, " ")) EVERYWHERE —
  * that identity is what lets t06 swap it in under an unchanged
  * string_split oracle. Checked on the edge strings split semantics
  * makes tricky (empty string → 1, consecutive/leading/trailing
  * spaces keep empties, multi-byte unicode around the ASCII delimiter)
  * and corpus-wide on the verify SF. */
class CountTokensSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  private def native = GraftPlanShim.column(
    CountTokens(GraftPlanShim.expression(col("text"))))

  test("edge strings: empties, runs of spaces, unicode") {
    import s.implicits._
    val edge = Seq("", " ", "  ", "a", "a b", "a  b", " a b ",
      "héllo wörld", "日本 語 テスト", "a\tb", "ü  ", "  ü").toDF("text")
    val rows = edge.select(native.as("n_native"),
      size(split(col("text"), " ")).cast("long").as("n_split")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native ${r.getLong(0)} != split ${r.getLong(1)}"))
  }

  test("corpus-wide parity at the verify SF") {
    val mismatches = graft.Tables.t(s, d, "documents")
      .select(native.as("n_native"),
        size(split(col("text"), " ")).cast("long").as("n_split"))
      .filter(col("n_native") =!= col("n_split"))
      .count()
    assert(mismatches == 0, s"$mismatches documents disagree")
  }
}
