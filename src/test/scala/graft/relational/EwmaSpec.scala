package graft.relational

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** q75's distributed ordered fold must equal the literal driver-side
  * recurrence y_t = (y_{t-1} + x_t)/2 applied to each user's events in
  * (ts, event_id) order — bit-for-bit, since every multiply is a
  * power-of-two scale and the additions fold in the same order. */
class EwmaSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("engine EWMA fold is bit-identical to the driver-side recurrence") {
    val got = RelationalQueries.q75Ewma.fn(s, d).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("ewma"))).toMap
    assert(got.nonEmpty)

    val events = graft.Tables.t(s, d, "events")
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[Double]("value")))
    val expected = events.groupBy(_._1).map { case (u, es) =>
      val xs = es.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).map(_._4)
      u -> (xs.length.toLong, xs.foldLeft(0.0)((acc, x) => (acc + x) * 0.5))
    }
    assert(got.keySet == expected.keySet, "user sets differ")
    expected.foreach { case (u, (n, y)) =>
      assert(got(u)._1 == n, s"user $u event count")
      assert(java.lang.Double.doubleToLongBits(got(u)._2) ==
        java.lang.Double.doubleToLongBits(y),
        s"user $u: engine ${got(u)._2} vs recurrence $y — fold order differs")
    }
  }
}
