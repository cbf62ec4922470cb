package graft.streaming

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** st23's bounded-state claim, made load-bearing on a PLANTED corpus:
  * the retention window must actually evict an idle band to the history
  * tier, and a later re-arrival of that band must be flagged dup BY THE
  * HISTORY JOIN (its live state is gone by construction) — the one path
  * a fixture-of-convenience corpus is not guaranteed to exercise.
  *
  * Timeline (batch = doc_id % 4, event time t0 + 60 s per batch,
  * retention 30 s, watermark delay 0):
  *  - docs 4, 8 arrive in batch 0; docs 5, 9 in batch 1; 6 in batch 2;
  *    7 in batch 3.
  *  - doc 7 repeats doc 4's text: its bands are idle through batches
  *    1-2, time out during trigger 2 (watermark t0+60 s passes their
  *    t0+30 s deadline), and move to history — so doc 7's dup verdict
  *    can ONLY come from the history join.
  *  - doc 9 repeats doc 8's text one batch later: its bands are still
  *    live (deadline t0+90 s > watermark t0+0 at trigger 1), so its dup
  *    verdict comes from live state — both tiers proven in one run.
  * Expected (identical to st21 first-seen-batch semantics, which is the
  * design's exactness invariant): dups are exactly docs 9 and 7. */
class BoundedStateSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  test("st23 evicts idle bands to history and rehydrates dup verdicts from it") {
    import s.implicits._
    val dir = graft.TempDirs.newTempDir("graft_st23spec_")
    val x = "alpha beta gamma delta epsilon"
    val w = "one two three four five"
    Seq(
      (4L, x), (8L, w),                                  // batch 0
      (5L, "solo first text here now"), (9L, w),         // batch 1
      (6L, "another unique document text body"),         // batch 2
      (7L, x)                                            // batch 3
    ).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = StreamingQueries.boundedStateNearDup(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 2L, 0L, 0L),
      (1L, 2L, 1L, 9L),  // doc 9: dup via LIVE state (band still resident)
      (2L, 1L, 0L, 0L),
      (3L, 1L, 1L, 7L))) // doc 7: dup via HISTORY (band evicted at trigger 2)
  }
}
