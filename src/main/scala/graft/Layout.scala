package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scan-layout robustness guard for MAP-ONLY pipelines.
  *
  * A stage with no shuffle inherits its parallelism from the SCAN — one
  * task per file split, and a parquet file is only splittable at row-group
  * boundaries. A table written as one file with one row group (small
  * fixtures; any badly-compacted production partition) therefore runs an
  * entire map-side pipeline on ONE core no matter how many the cluster
  * has. Entries that shuffle early self-heal (the reduce side re-widens);
  * pipelines whose POINT is zero data shuffles — d16's rewrite pass,
  * per-row scoring scans — do not, and their wall grows with corpus size
  * while 31 of 32 cores idle (measured: d16's rewrite at sf10 on the
  * single-row-group fixture, 21 minutes of one busy core; 26× growth on a
  * 10× step that is ~linear once parallel).
  *
  * `widen` pays ONE row-preserving repartition only when the scan's
  * split count can't feed the cores (< half of defaultParallelism) —
  * the cost-based call a planner can't make for you because it doesn't
  * know the pipeline downstream is shuffle-free. On a well-laid-out
  * corpus (files ≈ multiples of cores) it is a no-op. */
object Layout {
  def widen(s: SparkSession, df: DataFrame): DataFrame = {
    val cores = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= cores) df.repartition(cores) else df
  }
}
