package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-10 curation additions: the soft-dedup
  * weighting (d15), the Gopher-style quality gate (t21), and the
  * tolerance-bounded as-of join (q92). Hash-correctness is the oracle's
  * job; these pin the properties a consumer relies on beyond
  * cell-equality. */
class CurationGateSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("d15 soft-dedup weights: per-group mass is 1, total mass = #components") {
    val w = dedup.DedupQueries.d15SoftDedupWeights.fn(s, d)
    val byGroup = w.groupBy("component")
      .agg(sum(col("weight")).as("mass"), count(lit(1)).as("n"),
        first(col("group_size")).as("sz"))
      .collect()
    assert(byGroup.nonEmpty)
    byGroup.foreach { r =>
      assert(math.abs(r.getAs[Double]("mass") - 1.0) < 1e-9,
        s"group ${r.get(0)} mass ${r.getAs[Double]("mass")}")
      assert(r.getAs[Long]("n") == r.getAs[Long]("sz"))
    }
    // weights must cover every document exactly once
    val nDocs = Tables.t(s, d, "documents").count()
    assert(w.count() == nDocs)
  }

  test("t21 quality gate agrees with its own signals and is non-degenerate") {
    val rows = text.TextQueries.t21QualityRules.fn(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val keep = r.getAs[Int]("keep")
      val expect = n >= 10 && n <= 5000 &&
        r.getAs[Double]("digit_ratio") < 0.3 &&
        r.getAs[Double]("alpha_ratio") > 0.5 &&
        r.getAs[Double]("max_tok_frac") < 0.2 &&
        n > 1 && r.getAs[Double]("simpson_repeat") < 0.05
      assert((keep == 1) == expect, s"doc ${r.get(0)} keep=$keep signals disagree")
      // ratios are fractions of token occurrences
      Seq("digit_ratio", "alpha_ratio", "max_tok_frac", "simpson_repeat").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v out of range")
      }
    }
  }

  test("q92 as-of tolerance: matches equal q29 where fresh, null where stale") {
    val tol = 48L * 3600 * 1000 * 1000
    val base = relational.RelationalQueries.q29AsofJoin.fn(s, d)
      .select("event_id", "click_ts", "gap_us").collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    val bounded = relational.RelationalQueries.q92AsofTolerance.fn(s, d)
      .select("event_id", "click_ts", "gap_us").collect()
    assert(bounded.nonEmpty)
    var kept = 0
    var nulled = 0
    bounded.foreach { r =>
      val id = r.getLong(0)
      val gap = base(id)
      if (gap.exists(_ <= tol)) {
        kept += 1
        assert(!r.isNullAt(1) && r.getLong(2) == gap.get, s"event $id should keep its match")
      } else {
        nulled += 1
        assert(r.isNullAt(1) && r.isNullAt(2), s"event $id should be nulled (stale or no match)")
      }
    }
    assert(kept > 0 && nulled > 0, s"degenerate fixture: kept=$kept nulled=$nulled")
  }
}
