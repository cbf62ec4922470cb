package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Generator contract edge cases: fan-out counts, positions, and the
  * degenerate inputs a Generate node must absorb without failing. */
class PosExplodeNgramsSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  private def gen(rows: Seq[(Option[String], Int)]): Seq[(Int, String)] = {
    import s.implicits._
    PosExplodeNgrams.register(s)
    rows.toDF("text", "n")
      .selectExpr("graft_posexplode_ngrams(text, n)")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
  }

  test("bigrams fan out with 0-based positions in order") {
    assert(gen(Seq((Some("a b c d"), 2))) ==
      Seq((0, "a b"), (1, "b c"), (2, "c d")))
  }

  test("n = 1 yields each token at its position") {
    assert(gen(Seq((Some("x y"), 1))) == Seq((0, "x"), (1, "y")))
  }

  test("degenerate inputs produce zero rows, not errors") {
    assert(gen(Seq((None, 2))).isEmpty, "null text")
    assert(gen(Seq((Some("one two"), 3))).isEmpty, "n longer than the token list")
    assert(gen(Seq((Some("one two"), 0))).isEmpty, "non-positive n")
  }

  test("rows flow through Generate per input row (two docs stay separate)") {
    val out = gen(Seq((Some("a b c"), 2), (Some("d e"), 2)))
    assert(out == Seq((0, "a b"), (1, "b c"), (0, "d e")))
  }

  test("property: agrees with the split-and-slide reference on random inputs") {
    val rnd = new scala.util.Random(7)
    val words = Seq("a", "bb", "ccc", "", "dd")
    for (_ <- 1 to 25) {
      val text = Seq.fill(rnd.nextInt(8))(words(rnd.nextInt(words.length))).mkString(" ")
      val n = 1 + rnd.nextInt(4)
      val expected = {
        val toks = text.split(' ')  // same tokenizer the Generator uses
        if (toks.length < n) Seq.empty
        else (0 to toks.length - n).map(i => (i, toks.slice(i, i + n).mkString(" ")))
      }
      assert(gen(Seq((Some(text), n))) == expected, s"text='$text' n=$n")
    }
  }
}
