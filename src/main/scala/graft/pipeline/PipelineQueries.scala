package graft.pipeline

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Capstone: the LLM training-data pipeline composed end-to-end from the
  * catalog's building blocks — quality filtering (TextQueries' t04
  * criteria), exact dedup with deterministic representative (DedupQueries'
  * d01), and an embedding-coverage join — in ONE declarative plan that
  * Catalyst optimizes as a whole (filters push to the scans, the dedup
  * agg and the join pipeline into each other; no materialization
  * boundaries needed because nothing here is self-joined).
  */
object PipelineQueries {

  val p01TrainingPipeline: Q = Q(
    "p01_training_pipeline",
    """WITH scored AS (
      |  SELECT doc_id, lang, text,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')) AS ttr
      |  FROM documents),
      |kept AS (
      |  SELECT * FROM scored
      |  WHERE n_tokens BETWEEN 10 AND 1000 AND ttr > 0.2),
      |deduped AS (
      |  SELECT MIN(doc_id) AS doc_id, MIN(lang) AS lang FROM kept GROUP BY text)
      |SELECT d.lang, COUNT(*) AS n_docs,
      |  COUNT(e.vec_id) AS n_with_embedding
      |FROM deduped d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin) { (s, d) =>
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("long")
    val ttr = size(array_distinct(toks)).cast("long") / nTok
    val kept = Tables.t(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("text"), nTok.as("n_tokens"), ttr.as("ttr"))
      .filter(col("n_tokens").between(10, 1000) && col("ttr") > 0.2)
    val deduped = kept
      .groupBy("text")
      .agg(min(col("doc_id")).as("doc_id"), min(col("lang")).as("lang"))
    deduped
      .join(Tables.t(s, d, "embeddings").select(col("vec_id")),
        col("doc_id") === col("vec_id"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), count(col("vec_id")).as("n_with_embedding"))
      .orderBy("lang")
  }

  /** Round-5 capstone: the CURATION pipeline — near-dup fingerprint
    * dedup (d08's canonicalization key), per-source quality ranking
    * keeping only the top 5 (q20/q46's top-k shape), and a final
    * per-lang yield report — again ONE declarative plan. The
    * fingerprint dedup groups on a short prefix key (not full text) and
    * the per-source rank shuffles only survivors: at 100 TB the plan is
    * two key-shuffles over ids+keys, with the heavy text column pruned
    * away right after scoring (ReadSchema keeps it out of every
    * shuffle). */
  val p02CurationPipeline: Q = Q(
    "p02_curation_pipeline",
    """WITH scored AS (
      |  SELECT doc_id, lang, source,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    array_to_string(string_split(text, ' ')[1:3], ' ') AS fp
      |  FROM documents),
      |kept AS (SELECT * FROM scored WHERE n_tokens >= 10),
      |canon AS (
      |  SELECT fp, MIN(doc_id) AS doc_id FROM kept GROUP BY fp),
      |survivors AS (
      |  SELECT k.* FROM kept k JOIN canon c ON k.doc_id = c.doc_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY source
      |                               ORDER BY n_tokens DESC, doc_id) AS rn
      |  FROM survivors)
      |SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      |FROM ranked WHERE rn <= 5
      |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val toks = split(col("text"), " ")
    val scored = Tables.t(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        size(toks).cast("long").as("n_tokens"),
        concat_ws(" ", slice(toks, 1, 3)).as("fp"))
    val kept = scored.filter(col("n_tokens") >= 10)
    val canon = kept.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val survivors = kept.join(canon, "doc_id")
    val w = Window.partitionBy("source").orderBy(col("n_tokens").desc, col("doc_id"))
    survivors
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("total_tokens"))
      .orderBy("lang")
  }

  val all: Seq[Q] = Seq(p01TrainingPipeline, p02CurationPipeline)
}
