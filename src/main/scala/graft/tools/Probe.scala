package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiling main (not part of the catalog): decompose an
  * entry's wall time into scan / arithmetic / accumulation components. */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(tag: String)(f: => DataFrame): Unit = {
      f.queryExecution // warm plan
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val li = graft.Tables.t(spark, d, "lineitem")
    val q = col("l_quantity"); val x = col("l_discount"); val y = col("l_tax")
    for (_ <- 1 to 2) {
      time("count_only") {
        li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      }
      time("double_sums_7") {
        li.groupBy("l_returnflag").agg(count(lit(1)).as("n"),
          sum(q).as("a"), sum(q * q).as("b"), sum(x).as("c"), sum(y).as("dd"),
          sum(x * x).as("e"), sum(y * y).as("f"), sum(x * y).as("g"))
      }
      time("dsum_decimal28_7") {
        li.groupBy("l_returnflag").agg(count(lit(1)).as("n"),
          graft.Det.dsum(q).as("a"), graft.Det.dsum(q * q).as("b"),
          graft.Det.dsum(x).as("c"), graft.Det.dsum(y).as("dd"),
          graft.Det.dsum(x * x).as("e"), graft.Det.dsum(y * y).as("f"),
          graft.Det.dsum(x * y).as("g"))
      }
      time("dsum128_7") {
        li.groupBy("l_returnflag").agg(count(lit(1)).as("n"),
          graft.Det.dsum128(q).as("a"), graft.Det.dsum128(q * q).as("b"),
          graft.Det.dsum128(x).as("c"), graft.Det.dsum128(y).as("dd"),
          graft.Det.dsum128(x * x).as("e"), graft.Det.dsum128(y * y).as("f"),
          graft.Det.dsum128(x * y).as("g"))
      }
    }
    spark.stop()
  }
}
