package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the algebra the pipeline relies on (SURVEY §5.2 #3).
  * These exercise the same formulas the Spark plans compute, in-process,
  * across thousands of generated cases — shapes no fixture file covers.
  * (ScalaCheck is driven directly — the scalatestplus bridge isn't among
  * the offline-resolvable deps.) */
class PipelinePropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  private val tokenGen = Gen.oneOf("the", "fast", "key", "order", "sort", "scan",
    "merge", "spark", "data", "row", "batch", "join", "agg", "window")
  private val docGen: Gen[List[String]] = Gen.nonEmptyListOf(tokenGen)

  private def shingles(toks: List[String]): Set[String] =
    if (toks.length < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size

  /** The d05 prune invariant: at threshold θ, any pair with jaccard >= θ
    * shares at least one token of each other's sorted prefix of length
    * |s| - ceil(θ|s|) + 1 — the join can prune everything else and still
    * be exact. */
  test("prefix filtering is lossless for the Jaccard threshold join") {
    val theta = 0.6
    def prefix(s: Set[String]): Set[String] = {
      val sorted = s.toList.sorted
      sorted.take(sorted.size - math.ceil(theta * sorted.size).toInt + 1).toSet
    }
    check(Prop.forAll(docGen, docGen) { (d1, d2) =>
      val (s1, s2) = (shingles(d1), shingles(d2))
      val j = jaccard(s1, s2)
      j < theta || s1.isEmpty || s2.isEmpty ||
        prefix(s1).intersect(prefix(s2)).nonEmpty
    })
  }

  /** O7/O10 commute: filtering each page then unioning equals unioning
    * then filtering — the reason the Spark plan can read all page files
    * in one scan where the reference loops page-by-page. */
  test("watermark filter commutes with page union") {
    val tsGen = Gen.chooseNum(0L, 1000L)
    val pageGen = Gen.listOf(tsGen)
    check(Prop.forAll(pageGen, pageGen, tsGen) { (p1, p2, wm) =>
      (p1.filter(_ > wm) ++ p2.filter(_ > wm)).sorted == (p1 ++ p2).filter(_ > wm).sorted
    })
  }

  /** O9 monotonicity: a watermark advanced over more data never regresses. */
  test("running-max watermark is monotone under batch growth") {
    val tsGen = Gen.chooseNum(0L, 1000L)
    check(Prop.forAll(Gen.nonEmptyListOf(tsGen), Gen.listOf(tsGen)) { (b1, b2) =>
      (b1 ++ b2).max >= b1.max
    })
  }

  /** The q18 NTILE size formula: buckets differ by at most one row and
    * partition the input exactly. */
  test("ntile bucket assignment partitions n rows into k near-equal buckets") {
    check(Prop.forAll(Gen.chooseNum(1L, 5000L), Gen.chooseNum(1L, 64L)) { (n, k) =>
      val q = n / k
      val r = n % k
      val bigSpan = (q + 1) * r
      def bucket(rn: Long): Long =
        if (rn <= bigSpan) (rn - 1) / (q + 1) + 1
        else r + (rn - 1 - bigSpan) / math.max(q, 1L) + 1
      val counts = (1L to n).groupBy(bucket).values.map(_.size.toLong)
      counts.sum == n &&
        (counts.max - counts.min) <= 1 &&
        (1L to n).forall(rn => bucket(rn) >= 1 && bucket(rn) <= k)
    })
  }

  /** MinHash per-permutation estimator bound used by d03: agreement of
    * independent min-hashes is an unbiased Jaccard estimator; here we pin
    * the deterministic part — identical sets agree on every permutation. */
  test("identical shingle sets produce identical minhash signatures") {
    check(Prop.forAll(docGen) { d =>
      val sh = shingles(d)
      sh.isEmpty || {
        val sig1 = (0 until 32).map(p => sh.map(x => (x, p).hashCode).min)
        val sig2 = (0 until 32).map(p => sh.map(x => (x, p).hashCode).min)
        sig1 == sig2
      }
    })
  }
}
