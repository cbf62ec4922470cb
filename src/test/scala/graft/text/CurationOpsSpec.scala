package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side ground truth for the round-10 curation operators: C4-style
  * line-level corpus dedup (d16), GPT-style concat-and-chunk sequence
  * packing (t23), and token-budget subset selection (t24). All integer
  * arithmetic — every comparison is exact. Plan-shape assertions pin the
  * scale contracts the entries' scaladocs claim (fact side never
  * shuffles for d16; t24 has no corpus-wide global window).
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  private lazy val corpus: Array[(Long, Array[String])] =
    graft.Tables.t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toArray)

  private def spans(toks: Array[String]): Array[String] =
    toks.grouped(3).map(_.mkString(" ")).toArray

  test("d16 line dedup: drops exactly the corpus-wide hot spans, order kept") {
    val counts = corpus.iterator.flatMap(c => spans(c._2))
      .toSeq.groupBy(identity).map { case (k, v) => k -> v.length }
    val expected = corpus.flatMap { case (id, toks) =>
      val (kept, dropped) = spans(toks).partition(counts(_) < 3)
      if (kept.nonEmpty) Some((id, kept.mkString(" "), kept.length.toLong,
        dropped.length.toLong))
      else None
    }.sortBy(_._1).toSeq
    val got = graft.dedup.DedupQueries.d16LineDedup.fn(s, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    assert(got.exists(_._4 > 0), "the corpus always has hot spans to drop")
  }

  test("d16 plan: count pass shuffles hashes only; the fact side never shuffles") {
    val df = graft.dedup.DedupQueries.d16LineDedup.fn(s, d)
    df.collect()
    val nodes = SparkTestBase.flattenPlan(df.queryExecution.executedPlan)
    val exchanges = nodes.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
    // The ALGORITHM's exchanges are hot-span count agg + single-row
    // collect_set + final ORDER BY — none carrying text. Layout.widen's
    // guarded scan repair (which FIRES here: the fixture is a
    // single-row-group file) is the only exchange allowed to carry the
    // chunk arrays, and must be a row-preserving REPARTITION_BY_NUM.
    val (widen, algo) = exchanges.partition {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.shuffleOrigin == org.apache.spark.sql.execution.exchange.REPARTITION_BY_NUM
      case _ => false
    }
    assert(widen.nonEmpty, "the widen guard must fire on the one-file fixture")
    assert(algo.size == 3, s"extra algorithm shuffle:\n${df.queryExecution}")
    // the algorithm's exchanges move span HASHES and finished result rows,
    // never the chunk arrays
    assert(algo.forall(!_.child.output.exists(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])),
      s"a chunk array crossed an algorithm shuffle:\n${df.queryExecution}")
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      "hot set must reach the corpus as a broadcast, not a join shuffle")
  }

  test("t23 sequence pack: per-shard prefix placement, budget-256 chunks") {
    val expected = corpus.map { case (id, toks) => (id, id % 8, toks.length.toLong) }
      .groupBy(_._2).toSeq.flatMap { case (_, docs) =>
        docs.sortBy(_._1).foldLeft((0L, List.empty[(Long, Long, Long, Long, Long)])) {
          case ((cum, acc), (id, sh, n)) =>
            (cum + n, (id, sh, n, cum / 256, cum % 256) :: acc)
        }._2
      }.sortBy(_._1)
    val got = TextQueries.t23SequencePack.fn(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.map(_._4).max > 10, "packing must span many sequences per shard")
  }

  test("t24 budget select: equals the global-window prefix, boundary tight") {
    val ranked = corpus.map { case (id, toks) =>
      val n = toks.length.toLong
      (id, 1000L * toks.distinct.length / n, n)
    }.sortBy { case (id, score, _) => (-score, id) }
    val expected = ranked.scanLeft((0L, 0L, 0L, 0L)) {
      case ((_, _, _, cum), (id, sc, n)) => (id, sc, n, cum + n)
    }.drop(1).takeWhile(_._4 <= 10000L).sortBy(_._1).toSeq
    val got = TextQueries.t24TokenBudgetSelect.fn(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    val total = got.map(_._3).sum
    val next = ranked.drop(got.size).headOption
    assert(total <= 10000L)
    assert(next.forall(total + _._3 > 10000L), "prefix must stop exactly at the budget")
  }

  test("t24 plan: two bucket-scoped windows, no corpus-wide global window") {
    val df = TextQueries.t24TokenBudgetSelect.fn(s, d)
    df.collect()
    val nodes = SparkTestBase.flattenPlan(df.queryExecution.executedPlan)
    val windows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.size == 2)
    // the single-partition window runs over the <=1001-row bucket agg;
    // the corpus-side window is partitioned by score
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "corpus window must be bucket-partitioned")
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "bucket priors must broadcast back to the corpus")
  }
}
