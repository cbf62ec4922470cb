package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.GraftPlanShim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[SaltedMinHash]] bit-identical to the r15 staged-HOF spelling
  * it replaced in st21/st23's band derivation (OPTIMIZATION_r16.md):
  * same 8 salted-md5 trigram-shingle minima on the real fixture corpus
  * and on adversarial synthetic docs. The HOF reference is rebuilt here
  * verbatim so the identity stays checkable after the production code
  * moved on. */
class SaltedMinHashSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  private def msNew(text: org.apache.spark.sql.Column) =
    GraftPlanShim.column(SaltedMinHash(
      GraftPlanShim.expression(split(text, " "))))

  /** The r15 staged-HOF band-derivation spelling, verbatim. */
  private def msOld(text: org.apache.spark.sql.Column) = {
    val hash8: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => array((0 until 8).map(i =>
        conv(substring(md5(concat(lit(s"$i:"), t)), 1, 8), 16, 10).cast("long")): _*)
    val tk = split(text, " ")
    val sh = array_distinct(transform(
      sequence(lit(1), size(tk) - 2),
      i => concat_ws(" ", element_at(tk, i),
        element_at(tk, i + 1), element_at(tk, i + 2))))
    aggregate(sh,
      array((0 until 8).map(_ => lit(Long.MaxValue)): _*),
      (acc, t) => zip_with(acc, hash8(t), (a, b) => least(a, b)))
  }

  test("minima match the HOF spelling on the fixture corpus") {
    val docs = s.read.parquet(s"${SparkTestBase.sfDir}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val diff = docs
      .select(col("doc_id"), msNew(col("text")).as("a"), msOld(col("text")).as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(diff == 0L)
  }

  test("minima match on adversarial synthetic docs") {
    import s.implicits._
    val docs = Seq(
      // repeated shingles (array_distinct's dedup must not change minima)
      "a b c a b c a b c",
      // exactly three tokens (single shingle)
      "x y z",
      // multi-byte UTF-8 tokens
      "héllo wörld ünïcode ťest ελληνικά 中文 字",
      // empty tokens from double spaces survive split(" ")
      "a  b   c d",
      // long doc with a hot token
      (1 to 200).map(i => if (i % 3 == 0) "hot" else s"w$i").mkString(" ")
    ).toDF("text")
    val diff = docs
      .select(msNew(col("text")).as("a"), msOld(col("text")).as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(diff == 0L)
  }

  test("null text yields null; short docs yield the empty-fold accumulator") {
    import s.implicits._
    val rows = Seq[Option[String]](None, Some("one two"), Some(""), Some("solo"))
      .toDF("text")
      .select(msNew(col("text")).as("ms"))
      .collect()
    assert(rows(0).isNullAt(0))
    // < 3 tokens: defined as the empty-fold accumulator (all maxLong) —
    // the old spelling THREW here (descending sequence + element_at(0)),
    // so no fixture doc exercises it; this pins the chosen total behavior.
    (1 to 3).foreach { i =>
      assert(rows(i).getSeq[Long](0) == Seq.fill(8)(Long.MaxValue))
    }
  }
}
