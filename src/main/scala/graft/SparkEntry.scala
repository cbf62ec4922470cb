package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog is assembled from per-domain modules; every entry is a
  * [[Q]] with a DuckDB oracle unless the op is genuinely non-SQL-expressible.
  */
object SparkEntry {

  /** All catalog modules, in SURVEY.md §2 inventory order. */
  def catalog: Seq[Q] = {
    val all =
      relational.RelationalQueries.all ++
        functions.UdfQueries.all ++
        scalar.ScalarFunctionQueries.all ++
        ingest.IngestQueries.all ++
        dedup.DedupQueries.all ++
        similarity.SimilarityQueries.all ++
        text.TextQueries.all ++
        multimodal.MultimodalQueries.all ++
        streaming.StreamingQueries.all ++
        pipeline.PipelineQueries.all ++
        observability.ObservabilityQueries.all
    // A duplicate name would silently drop a Map entry (and its oracle),
    // shrinking coverage unnoticed — fail fast instead.
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue-per-day rollup over orders joined to broadcast customer dims. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.t(spark, d, "orders")
      .join(broadcast(Tables.t(spark, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(date_trunc("day", col("o_orderdate")).as("order_day"))
      .agg(
        count(lit(1)).as("n_orders"),
        Det.dsum(col("o_totalprice")).as("revenue"))
      .orderBy("order_day")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
