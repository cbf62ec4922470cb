package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing's two independent decode paths must agree,
  * and the frame fan-out must match its arithmetic. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("m03's mapPartitions decoder derives the same dims as m02's columnar stub") {
    // m02 serializes {"width":w,"height":h,...} from SQL md5; m03 computes
    // (w, h) in JVM code via MessageDigest — same payload, same answer.
    val m02 = MultimodalQueries.m02DecodeMeta.fn(s, d)
      .select(col("asset_id"),
        get_json_object(col("meta"), "$.width").cast("long").as("w"),
        get_json_object(col("meta"), "$.height").cast("long").as("h"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val m03 = MultimodalQueries.m03ResizeBatch.fn(s, d)
      .select("asset_id", "w", "h")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m03.keySet == m02.keySet)
    assert(m03.forall { case (id, wh) => m02(id) == wh },
      "JVM MessageDigest path and SQL md5 path disagree on some asset")
  }

  test("m04 emits exactly the arithmetic frame count per video asset") {
    val expected = graft.Tables.t(s, d, "documents")
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), (floor((lit(29) + col("n_chars") % 300) / 30) + 1).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val actual = MultimodalQueries.m04FrameSample.fn(s, d)
      .groupBy("asset_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(actual == expected)
  }
}
