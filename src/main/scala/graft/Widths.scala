package graft

import org.apache.spark.sql.SparkSession

/** Scoped shuffle-width pin that wins under AQE too.
  *
  * The session builders set a high
  * `spark.sql.adaptive.coalescePartitions.initialPartitionNum` so that
  * un-scoped wide shuffles start wide and AQE coalesces DOWN from
  * runtime sizes — the scale-correct default (a fixed
  * `spark.sql.shuffle.partitions = cores` capped every reduce side at
  * 32 partitions regardless of data volume; at the 1000× step that put
  * ~19 M fact rows in each sort-merge task and the spill took
  * q51_tpch_composite from an expected ~50 s to 279 s). But once
  * initialPartitionNum is set, AQE takes the INITIAL reduce width from
  * it, not from shuffle.partitions — so a deliberately-sized loop or
  * kernel width (d07's label rounds, p04's wedge joins, d05's
  * candidate-pair stages, capped streaming state) must pin BOTH keys
  * for its scope or the global default silently overrides it.
  */
object Widths {
  private val ShufKey = "spark.sql.shuffle.partitions"
  private val InitKey =
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

  def withWidth[T](s: SparkSession, width: Int)(body: => T): T = {
    val savedShuf = s.conf.get(ShufKey)
    val savedInit = s.conf.getOption(InitKey)
    s.conf.set(ShufKey, width.toString)
    s.conf.set(InitKey, width.toString)
    try body
    finally {
      s.conf.set(ShufKey, savedShuf)
      savedInit match {
        case Some(v) => s.conf.set(InitKey, v)
        case None    => s.conf.unset(InitKey)
      }
    }
  }
}
