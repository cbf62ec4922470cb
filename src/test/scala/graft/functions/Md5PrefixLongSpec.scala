package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Md5PrefixLong]] bit-identical to the
  * `conv(substring(md5(x), s, n), 16, 10)::long` chain it replaced on
  * the sketch/fingerprint paths (u05/u08/u09/u10, t08, t22/t26),
  * including every (start, n) shape the catalog uses and the
  * inside-HOF-lambda placement. */
class Md5PrefixLongSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  private def chain(c: org.apache.spark.sql.Column, st: Int, n: Int) =
    conv(substring(md5(c), st, n), 16, 10).cast("long")

  test("matches the conv/substring chain for every catalog (start, n) shape") {
    val docs = s.read.parquet(s"${SparkTestBase.sfDir}/documents.parquet")
      .select(col("text"))
    val shapes = Seq((1, 4), (1, 8), (1, 13), (1, 15), (5, 4), (9, 8), (17, 8), (25, 8))
    val diff = docs.select(shapes.map { case (st, n) =>
      (Md5PrefixLong(col("text"), st, n) === chain(col("text"), st, n)).as(s"ok_${st}_$n")
    }: _*).filter(not(shapes.map { case (st, n) => col(s"ok_${st}_$n") }.reduce(_ && _)))
      .count()
    assert(diff == 0L)
  }

  test("matches inside a higher-order-function lambda (t08's placement)") {
    val docs = s.read.parquet(s"${SparkTestBase.sfDir}/documents.parquet")
      .select(split(col("text"), " ").as("toks"))
    val newFp = aggregate(transform(col("toks"),
      (t, i) => (i + 1).cast("long") * Md5PrefixLong(t, 1, 8)),
      lit(0L), (acc, x) => acc + x)
    val oldFp = aggregate(transform(col("toks"),
      (t, i) => (i + 1).cast("long") * chain(t, 1, 8)),
      lit(0L), (acc, x) => acc + x)
    val diff = docs.select(newFp.as("a"), oldFp.as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff == 0L)
  }

  test("null input yields null; binary input matches md5 of the same bytes") {
    import s.implicits._
    val rows = Seq(Option("abc"), None).toDF("t")
      .select(Md5PrefixLong(col("t"), 1, 8).as("h"),
        chain(col("t"), 1, 8).as("c"))
      .collect()
    assert(rows(0).getLong(0) == rows(0).getLong(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    val bin = Seq(Array[Byte](0, 1, 2, -1)).toDF("b")
      .select(Md5PrefixLong(col("b"), 1, 8).as("h"), chain(col("b"), 1, 8).as("c"))
      .collect()(0)
    assert(bin.getLong(0) == bin.getLong(1))
  }
}
