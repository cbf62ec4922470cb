package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d10 SemDeDup's log-depth quantizer invariants, pinned on fixtures the
  * sf oracle cannot distinguish:
  *
  *  1. DESCENT COMPLETENESS under exact fp ties. The level-j→j+1 edge
  *     argmin prefers SELF on ties (bit-identical / parallel duplicate
  *     centroid vectors give bit-equal scores); were a both-levels cell
  *     to tie away from itself, a parent could end with zero children
  *     and its vectors would vanish through the inner-join descent —
  *     identically on both engines, so the DuckDB oracle alone cannot
  *     catch it. The fixture plants 8 bit-identical vector values
  *     across 8448 rows (k = 33 > 32 forces lmax = 1, so the recursive
  *     level machinery actually runs), making EVERY centroid a
  *     duplicate of one of 8 values — the maximal-tie regime — and
  *     asserts no vector is dropped.
  *
  *  2. The tie fixture's final cells are exactly the 8 per-direction
  *     min-id winners: parallel duplicate centroids must collapse
  *     consistently (descent and edges resolve ties with the same
  *     (score, cell-id) order), never fragment or cross directions.
  */
class QuantizerSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  private lazy val tieDir: String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("d10tie").toString
    // 8448 rows => k = max(8, 8448/256) = 33 > 32 => lmax = 1. Eight
    // bit-identical orthogonal direction values, one per vec_id % 8.
    val n = 8448
    val rows = (0 until n).map { i =>
      val g = i % 8
      (i.toLong, Array.tabulate(8)(j => if (j == g) 1.0f else 0.0f).toSeq)
    }
    rows.toDF("vec_id", "embedding")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("d10 descent drops no vectors under maximal centroid ties") {
    val out = DedupQueries.d10SemanticDedup.fn(s, tieDir).collect()
    val members = out.map(_.getLong(1)).sum
    assert(members === 8448L,
      s"descent lost ${8448L - members} vectors — a both-levels cell " +
        "failed to self-parent (edge-argmin tie-break regression)")
  }

  test("d10 tie fixture collapses each direction to one cell, min-id consistent") {
    val out = DedupQueries.d10SemanticDedup.fn(s, tieDir).collect()
    // 8 orthogonal directions, 1056 vectors each: ties inside a
    // direction must all resolve to the SAME cell (the id-min of the
    // parallel centroid class), so exactly 8 cells, 1056 members each,
    // and everything but the per-cell survivor deduped (cos = 1).
    assert(out.length === 8, s"expected 8 cells, got ${out.length}")
    assert(out.forall(_.getLong(1) === 1056L))
    assert(out.forall(_.getLong(2) === 1L),
      "bit-identical members must dedup to 1 survivor per cell")
  }

  test("d10 on the smoke corpus preserves the vector count") {
    val d = SparkTestBase.sfDir
    val n = graft.Tables.t(s, d, "embeddings").count()
    val members = DedupQueries.d10SemanticDedup.fn(s, d)
      .agg(sum(col("n_members"))).collect()(0).getLong(0)
    assert(members === n)
  }
}
