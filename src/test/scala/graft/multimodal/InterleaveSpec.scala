package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed-rank law for m08: the bucketed rank + broadcast offset
  * plan must equal the naive per-kind global window EXACTLY, and each
  * kind's cycle sequence must be dense 1..n — i.e. the prefix-sum
  * offsets neither skip nor collide across bucket boundaries. */
class InterleaveSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("m08: bucketed rank equals the naive per-kind window") {
    val out = MultimodalQueries.m08Interleave.fn(s, d).collect()
      .map(r => (r.getAs[Long]("cycle"), r.getAs[String]("kind"), r.getAs[Long]("asset_id")))
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (kind, rows) =>
      val cycles = rows.map(_._1).sorted.toSeq
      assert(cycles == (1L to cycles.length.toLong).toSeq,
        s"$kind cycles not dense: ${cycles.take(5)}")
    }
    import org.apache.spark.sql.expressions.Window
    val naive = graft.Tables.t(s, d, "documents")
      .select(col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"))
      .select(row_number().over(Window.partitionBy("kind").orderBy("asset_id"))
        .cast("long").as("cycle"), col("kind"), col("asset_id"))
      .collect()
      .map(r => (r.getAs[Long]("cycle"), r.getAs[String]("kind"), r.getAs[Long]("asset_id")))
    assert(out.sorted.toSeq == naive.sorted.toSeq,
      "bucketed distributed rank diverges from the naive global window")
  }
}
