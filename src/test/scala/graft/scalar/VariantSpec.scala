package graft.scalar

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** s16 must actually exercise the VARIANT path (parse_json +
  * variant_get), not fall back to string JSON walking, and its typed
  * extraction must agree with get_json_object on every row. */
class VariantSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("s16 plans variant_get over a parsed variant and matches the string path") {
    val df = ScalarFunctionQueries.s16Variant.fn(s, d)
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("variant_get") || analyzed.contains("VariantGet"),
      s"expected the variant extraction in the plan:\n$analyzed")
    val viaVariant = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaString = graft.Tables.t(s, d, "events")
      .filter(col("props").isNotNull)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("k").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaVariant == viaString)
    // absent paths are NULL, so n_missing is zero everywhere
    val missing = ScalarFunctionQueries.s16Variant.fn(s, d)
      .agg(sum(col("n_missing"))).collect()(0).getLong(0)
    assert(missing == 0L)
  }
}
