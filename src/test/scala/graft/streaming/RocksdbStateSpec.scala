package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** st13's physical contract — the part the shared oracle can't see: the
  * providerClass conf actually swapped the state backend, proven by the
  * state operator reporting rocksdb custom metrics in the query
  * progress (an HDFS-backed run reports none). */
class RocksdbStateSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  test("stateful agg under RocksDBStateStoreProvider reports rocksdb metrics") {
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = s.conf.get(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, Long)]
      val agg = input.toDF().toDF("k", "v").groupBy("k").count()
      val qn = s"graft_rocksdb_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      val query = agg.writeStream
        .format("memory").queryName(qn).outputMode(OutputMode.Complete())
        .start()
      input.addData(("a", 1L), ("a", 2L), ("b", 3L))
      query.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val metrics = query.lastProgress.stateOperators.toSeq
        .flatMap(_.customMetrics.keySet.asScala)
      query.stop()
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb custom metrics in state operator progress: $metrics")
      assert(s.table(qn).collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
        Set(("a", 2L), ("b", 1L)))
    } finally s.conf.set(key, saved)
  }
}
