package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side ground truth for the round-11 text operators: lexical
  * diversity (t16), PMI-lift collocations (t17), and duplicated-chunk
  * boilerplate suppression (t18). Every comparison is exact — the
  * entries' arithmetic is integer-or-one-division by design. */
class TextOpsSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  private lazy val corpus: Array[(Long, Array[String])] =
    graft.Tables.t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toArray)

  test("t16 diversity: flags exactly the rational-threshold docs, exact metrics") {
    val expected = corpus.flatMap { case (id, toks) =>
      val l = toks.length.toLong
      val counts = toks.groupBy(identity).map(_._2.length.toLong)
      val types = counts.size.toLong
      val topc = counts.max
      if (3 * types < l || 8 * topc > l)
        Some((id, l, types, topc, types.toDouble / l.toDouble))
      else None
    }.sortBy(_._1).toSeq
    val got = TextQueries.t16Diversity.fn(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got.nonEmpty, "the corpus always has low-diversity docs")
    assert(got == expected)
  }

  test("t17 collocations: engine lift equals driver-side rational PMI lift") {
    val bigrams = corpus.flatMap { case (_, toks) => toks.iterator.sliding(2)
      .withPartial(false).map(p => (p.head, p(1))).toSeq }
    val nxy = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nx = nxy.groupBy(_._1._1).map { case (x, m) => x -> m.values.sum }
    val ny = nxy.groupBy(_._1._2).map { case (y, m) => y -> m.values.sum }
    val n = nxy.values.sum
    val expected = nxy.toSeq.filter(_._2 >= 5)
      .map { case ((x, y), c) =>
        (x, y, c, (c * n).toDouble / (nx(x) * ny(y)).toDouble) }
      .sortBy(r => (-r._4, r._1, r._2))
      .take(30)
    val got = TextQueries.t17Collocations.fn(s, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got.size == expected.size)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"$g vs $e")
      assert(java.lang.Double.doubleToLongBits(g._4) ==
        java.lang.Double.doubleToLongBits(e._4), s"lift bits: $g vs $e")
    }
  }

  test("t18 boilerplate: drops exactly the cross-doc repeated chunks, md5-exact rebuild") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val chunked = corpus.filter(_._2.length >= 8).map { case (id, toks) =>
      id -> toks.grouped(8).filter(_.length == 8).map(_.mkString(" ")).toArray
    }
    val df = chunked.flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (c, v) => c -> v.length }
    val bp = df.filter(_._2 >= 2).keySet
    val expected = chunked.flatMap { case (id, cs) =>
      val kept = cs.filterNot(bp)
      val dropped = cs.length - kept.length
      if (dropped > 0)
        Some((id, cs.length.toLong, dropped.toLong, md5hex(kept.mkString(" "))))
      else None
    }.sortBy(_._1).toSeq
    val got = TextQueries.t18Boilerplate.fn(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got.nonEmpty, "the corpus plants cross-doc repeated segments")
    assert(got == expected)
  }
}
