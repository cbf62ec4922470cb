package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** The reference's checkpoint state machine (running-max watermark per
  * key, SURVEY §2.1 O9/O13) as Structured Streaming custom state:
  * mapGroupsWithState must carry the max across micro-batches and never
  * regress it when late/old events arrive in a later batch. */
class StreamingStateSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  test("mapGroupsWithState keeps a per-key running-max watermark across batches") {
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, Long)] // (user_id, event epoch-seconds)
    val watermarks = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val incoming = evs.map(_._2).max
          val next = math.max(incoming, state.getOption.getOrElse(Long.MinValue))
          state.update(next)
          (uid, next)
      }

    val qn = s"graft_state_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val query = watermarks.writeStream
      .format("memory").queryName(qn).outputMode(OutputMode.Update())
      .start()

    def snapshot(): Map[Long, Long] =
      s.table(qn).collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }

    // batch 1: establish watermarks
    input.addData((1L, 100L), (1L, 250L), (2L, 50L))
    query.processAllAvailable()
    assert(snapshot() == Map(1L -> 250L, 2L -> 50L))

    // batch 2: user 1 sends only OLD events (must not regress), user 2 advances
    input.addData((1L, 120L), (2L, 300L))
    query.processAllAvailable()
    assert(snapshot() == Map(1L -> 250L, 2L -> 300L),
      "a late/old event must never move a watermark backwards")

    query.stop()
  }
}
