package graft.multimodal

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The property CDC exists for: boundaries depend only on local content,
  * so an insertion near the front re-chunks ONLY up to the first
  * boundary after the edit — every later chunk hash survives. Fixed-size
  * chunking (m06) shifts every chunk after the edit point, invalidating
  * the whole tail. The spec runs m09's exact chunker (via a temp view
  * standing in for `documents`) over a corpus and a +1-byte-prefix copy
  * of it and checks tail-chunk-hash survival and the dedup consequence. */
class CdcChunkingSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("an inserted prefix invalidates only the head chunks") {
    import s.implicits._
    // the real corpus text for doc 0..19, plus a shifted copy
    val base = graft.Tables.t(s, d, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 20)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // shifted copies keep ids under m09's doc_id < 100 scope
    val shifted = base.map { case (id, t) => (id + 20L, "X" + t) }
    val both = (base ++ shifted).toSeq.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("spec"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("cdcspec").toString
    both.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val chunks = MultimodalQueries.m09CdcChunking.fn(s, dir)
      .collect()
      .map(r => (r.getAs[Long]("asset_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[String]("chunk_md5")))
    val byDoc = chunks.groupBy(_._1)
    var checked = 0
    base.keys.filter(byDoc.contains).foreach { id =>
      val orig = byDoc(id).sortBy(_._2).map(_._3)
      val shift = byDoc.getOrElse(id + 20L, Array.empty).sortBy(_._2).map(_._3)
      if (orig.length >= 3 && shift.nonEmpty) {
        // all chunks after the first boundary must survive the prefix edit:
        // the shifted doc's tail chunks equal the original's tail chunks
        val survived = orig.toSet.intersect(shift.toSet).size
        assert(survived >= orig.length - 2,
          s"doc $id: only $survived of ${orig.length} chunks survived a 1-byte prefix")
        checked += 1
      }
    }
    assert(checked >= 5, s"only $checked docs had enough chunks to exercise the property")
  }
}
