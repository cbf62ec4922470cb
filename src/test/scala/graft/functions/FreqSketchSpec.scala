package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Algorithm-level checks for the Misra-Gries aggregate behind u06:
  * the guarantee the certify pass relies on is that the sketch output is
  * a SUPERSET of every true heavy hitter under any partitioning (merge
  * tree), even though the raw candidate set itself may vary. */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("MG candidates contain every item with freq > n/(k+1), under any partitioning") {
    FreqSketch.register(s)
    val words = graft.Tables.t(s, d, "documents")
      .select(explode(split(col("text"), " ", -1)).as("w")).cache()
    try {
      val n = words.count()
      val k = 32
      val exactHH = words.groupBy("w").count()
        .filter(col("count") * (k + 1) > n)
        .collect().map(_.getString(0)).toSet
      assert(exactHH.nonEmpty, "no heavy hitters at this k — test vacuous")
      for (parts <- Seq(1, 7, 32)) {
        val cands = words.repartition(parts)
          .agg(expr(s"graft_topfreq(w, $k)")).collect()(0)
          .getSeq[String](0).toSet
        assert(cands.size <= k, s"sketch returned ${cands.size} > k=$k items")
        val missed = exactHH -- cands
        assert(missed.isEmpty,
          s"partitioning=$parts dropped true heavy hitters: $missed")
      }
    } finally { words.unpersist(); () }
  }

  import org.apache.spark.sql.catalyst.expressions.Literal

  test("serialize/deserialize roundtrips the counter map") {
    val agg = FreqSketch(Literal("x"), Literal(4))
    val buf = agg.createAggregationBuffer()
    buf.put("alpha", 5L)
    buf.put("beta", 2L)
    buf.put("", 1L) // empty-string token (split keeps them)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }

  test("merge evicts down to k entries and preserves counter differences") {
    val agg = FreqSketch(Literal("x"), Literal(2))
    val a = agg.createAggregationBuffer()
    a.put("x", 10L); a.put("y", 6L)
    val b = agg.createAggregationBuffer()
    b.put("z", 3L); b.put("y", 1L)
    val m = agg.merge(a, b)
    // counts: x=10 y=7 z=3; (k+1)-th largest = 3 → x=7, y=4, z evicted
    assert(m.size == 2)
    assert(m.get("x") == 7L && m.get("y") == 4L && !m.containsKey("z"))
  }

  test("u06 certified output equals the exact heavy hitters") {
    val got = UdfQueries.u06HeavyHitters.fn(s, d).collect().map(_.toSeq).toSeq
    val words = graft.Tables.t(s, d, "documents")
      .select(explode(split(col("text"), " ", -1)).as("w"))
    val n = words.count()
    val expected = words.groupBy("w").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 65 > n)
      .orderBy(col("cnt").desc, col("w"))
      .collect().map(_.toSeq).toSeq
    assert(expected.nonEmpty, "no heavy hitters — comparison vacuous")
    assert(got == expected)
  }
}
