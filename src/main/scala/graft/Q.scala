package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named Spark query over an sf directory plus an
  * optional DuckDB oracle SQL (same tables, bare names). `oracle = None`
  * downgrades the driver's check to rows-only (reserved for genuinely
  * non-SQL-expressible ops).
  *
  * Determinism contract for every entry (SURVEY.md section 5.2):
  *  - total ORDER BY on both sides (no nullable sort keys, or NULLS FIRST);
  *  - double aggregates go through [[Det]] (exact decimal accumulate);
  *  - column names identical between Spark result and oracle SQL.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
