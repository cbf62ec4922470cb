package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** st18's state-as-a-table contract: the recovered state rows equal the
  * batch aggregation, checked per key — every key present, none extra,
  * counts and maxima exact. */
class StateReaderSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("st18: recovered state rows equal the batch aggregation per key") {
    val out = StreamingQueries.st18StateReader.fn(s, d).collect()
    assert(out.nonEmpty)
    val batch = graft.Tables.t(s, d, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max(col("value")).as("max_value"))
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Double]("max_value")))
      .toMap
    assert(out.length == batch.size)
    out.foreach { r =>
      val k = r.getString(0)
      assert(batch.get(k).contains((r.getAs[Long]("n"), r.getAs[Double]("max_value"))),
        s"state row for $k diverges from batch aggregation")
    }
  }
}
