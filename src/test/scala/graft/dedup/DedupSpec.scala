package graft.dedup

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The near-dup machinery against ground truth: the prefix-filtered exact
  * join must equal brute force, and MinHash must both find the planted
  * high-similarity pairs and estimate their similarity sanely. */
class DedupSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  /** Brute-force all-pairs exact Jaccard >= theta over 3-gram shingles. */
  private def bruteForce(theta: Double) = {
    val toks = split(col("text"), " ")
    val sh = Tables.t(s, d, "documents")
      .select(col("doc_id"), sort_array(array_distinct(transform(
        sequence(lit(1), greatest(size(toks) - 2, lit(0))),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))
        .as("sh"))
      .filter(size(col("sh")) > 0)
    val inter = size(array_intersect(col("a.sh"), col("b.sh"))).cast("long")
    val jac = inter / (size(col("a.sh")).cast("long") + size(col("b.sh")).cast("long") - inter)
    sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"), jac.as("jac"))
      .filter(col("jac") >= theta)
  }

  test("prefix-filtered Jaccard join is lossless: equals brute-force all-pairs") {
    val pruned = DedupQueries.d05NgramJaccard.fn(s, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = bruteForce(0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned == brute)
    assert(brute.nonEmpty, "the corpus plants near-dup pairs; an empty set means the shingling broke")
  }

  test("d05's scale path (bare-id candidates + join-back verify) equals the inline path") {
    // Above ~500k docs the entry switches from array-riding inline
    // verification to bare-id candidates + co-partitioned join-backs
    // (the sf100 campaign measured the inline shuffle exhausting the
    // box's scratch disk). Both strategies must produce identical pairs.
    val inline = DedupQueries.d05NgramJaccard.fn(s, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    System.setProperty("graft.d05.forceJoinBack", "1")
    try {
      val joinBack = DedupQueries.d05NgramJaccard.fn(s, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(joinBack == inline)
      assert(inline.nonEmpty)
    } finally System.clearProperty("graft.d05.forceJoinBack")
  }

  test("d05's scale path plans no posting-stream sort-merge join; sig lookups broadcast") {
    // d05's verify stage runs behind a Stage.materialize checkpoint, so
    // its joins are invisible on the returned DataFrame's plan (only
    // the LogicalRDD scan shows). SparkTestBase.executedPlans captures
    // the QueryExecution of EVERY action in the run — including the
    // eager localCheckpoint — so the join inventory is assertable after
    // all (VERDICT r12 margin item 4: a config drift could silently
    // revert d05's SHJ hint with no named failure; now it has one).
    // Both broadcast thresholds are disabled in scope so the hint and
    // the explicit sig-lookup broadcast() are load-bearing, exactly as
    // in ContainmentSpec's d19 pin: candidate join must be
    // shuffled-hash, sig lookups must broadcast, and any SMJ must be
    // confined to the survivor-bound (i, j) join-backs that AQE
    // broadcast-converts in production.
    System.setProperty("graft.d05.forceJoinBack", "1")
    try SparkTestBase.withSQLConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val nodes = SparkTestBase.executedPlans(expectMin = 2) {
        DedupQueries.d05NgramJaccard.fn(s, d).collect()
      }
      val smj = nodes.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
      val badSmj = smj.filterNot(j =>
        (j.leftKeys ++ j.rightKeys).flatMap(_.references).map(_.name)
          .toSet.subsetOf(Set("i", "j")))
      assert(badSmj.isEmpty,
        s"sort-merge join leaked onto a posting/candidate stream: " +
          badSmj.map(_.verboseString(1)))
      val shj = nodes.collect {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j }
      assert(shj.nonEmpty,
        "candidate join is not shuffled-hash — the shuffle_hash hint drifted")
      val bhj = nodes.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
      assert(bhj.size >= 2,
        s"sig lookups did not broadcast under the gate (got ${bhj.size} BHJ)")
    } finally System.clearProperty("graft.d05.forceJoinBack")
  }

  test("MinHash LSH finds every planted pair with true Jaccard >= 0.9") {
    val truth = bruteForce(0.9).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = DedupQueries.d03MinHashLsh.fn(s, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    assert(truth.subsetOf(found),
      s"missed planted pairs: ${truth -- found} (32-perm signatures collide on >=0.9 with overwhelming probability)")
  }

  test("MinHash similarity estimate tracks exact Jaccard on reported pairs") {
    val exact = bruteForce(0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val est = DedupQueries.d03MinHashLsh.fn(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(est.nonEmpty)
    est.foreach { case (pair, e) =>
      val j = exact.getOrElse(pair, 0.0)
      assert(math.abs(e - j) <= 0.3,
        s"pair $pair: estimate $e vs exact $j — 32 permutations bound the error well under 0.3")
    }
  }

  test("SimHash 16-bit blocking recovers >=90% of planted near-dup pairs") {
    val truth = bruteForce(0.9).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = DedupQueries.d04SimHash.fn(s, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    val recall = (truth & found).size.toDouble / truth.size
    // Deterministic given fixed data+hashes. Pigeonhole only guarantees a
    // shared block at hamming <= 3; higher distances are probabilistic, so
    // recall is high but not 1.0 — that bound is the documented tradeoff.
    assert(recall >= 0.9, s"recall $recall: missed ${truth -- found}")
  }

  test("exact dedup keeps one representative per text group") {
    val out = DedupQueries.d01ExactDedup.fn(s, d)
    val total = Tables.t(s, d, "documents").count()
    assert(out.agg(sum(col("group_size"))).collect().head.getLong(0) == total)
    assert(out.select("keep_id").distinct().count() == out.count())
  }

  test("d07 label propagation equals driver-side union-find on the same edges") {
    // Independent algorithm, same edge definition: brute-force union-find
    // over collected edges vs the distributed pointer-jumping loop.
    val toksC = split(col("text"), " ")
    val keyed = Tables.t(s, d, "documents").select(col("doc_id"),
      concat_ws(" ", slice(toksC, 1, 3)).as("pre"),
      concat_ws(" ", slice(toksC, -3, 3)).as("suf"))
    def edges(k: String) = keyed.as("a")
      .join(keyed.as("b"), col(s"a.$k") === col(s"b.$k") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val es = edges("pre") ++ edges("suf")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    val expected = Tables.t(s, d, "documents").select("doc_id").collect()
      .map(_.getLong(0)).map(id => id -> find(id)).toMap
    val got = DedupQueries.d07CcClusters.fn(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(expected.values.toSet.size < expected.size,
      "corpus yields no non-trivial components — edge definition broke")
  }

  test("d08 bloom routing is exact and actually prunes the anti-join side") {
    val toksC = split(col("text"), " ")
    val keyed = Tables.t(s, d, "documents").select(col("doc_id"), col("source"),
      xxhash64(concat_ws(" ", slice(toksC, 1, 3))).as("h"))
    val hist = keyed.filter(pmod(col("doc_id"), lit(2)) === 0).select("h")
    val batch = keyed.filter(pmod(col("doc_id"), lit(2)) === 1)
    // Exactness: bloom-routed output == plain anti-join.
    val plain = batch.join(hist, Seq("h"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val routed = DedupQueries.d08BloomIncremental.fn(s, d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(routed == plain)
    // Pruning: most batch rows must bypass the join entirely (the bloom
    // negative path) — otherwise the entry's scale story is vacuous.
    val bf = hist.stat.bloomFilter("h", math.max(hist.count(), 1L), 0.01)
    val hits = batch.collect().count(r => bf.mightContain(r.getLong(2)))
    assert(hits < batch.count() / 2,
      s"bloom passed $hits of ${batch.count()} batch rows to the anti-join")
  }

  test("d09 sharded blooms: exact, sharded, and each filter fits a broadcast budget") {
    // Same split and key as d08 => identical exact answer.
    val viaSingle = DedupQueries.d08BloomIncremental.fn(s, d)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val viaSharded = DedupQueries.d09ShardedBloom.fn(s, d)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaSharded == viaSingle)
    // The per-shard filters the entry builds: several shards, none past
    // the (deliberately small here) per-filter budget — the property that
    // makes the design hold when ONE filter can't broadcast.
    graft.functions.BloomFilterAgg.register(s)
    val toksC = split(col("text"), " ")
    val keyed = Tables.t(s, d, "documents").select(col("doc_id"),
      xxhash64(concat_ws(" ", slice(toksC, 1, 3))).as("h"))
      .filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("h"), pmod(col("h"), lit(8)).cast("int").as("shard"))
    val blooms = keyed.repartition(5) // force multi-partition partial merges
      .groupBy("shard")
      .agg(expr("graft_bloom(h, CAST(65536 AS BIGINT), CAST(0.01 AS DOUBLE))").as("bf"))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]]("bf")).toMap
    assert(blooms.size > 1, "corpus hashed into a single shard — sharding vacuous")
    val budget = 256 * 1024 // bytes; stands in for the broadcast ceiling
    blooms.foreach { case (sh, bytes) =>
      assert(bytes.length < budget, s"shard $sh bloom is ${bytes.length} B")
    }
    // No false negatives after distributed build + OR-merge: every
    // historical key must hit its own shard's filter.
    val filters = blooms.map { case (sh, bytes) =>
      sh -> org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(bytes))
    }
    keyed.collect().foreach { r =>
      val (h, sh) = (r.getLong(0), r.getInt(1))
      assert(filters(sh).mightContain(h), s"false negative: key $h shard $sh")
    }
  }

  /** Longest common token substring by direct dynamic programming —
    * independent ground truth for the seed-and-chain entry. */
  private def tokenLcs(a: Array[String], b: Array[String]): Int = {
    var best = 0
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      var j = 1
      while (j <= b.length) {
        cur(j) = if (a(i - 1) == b(j - 1)) prev(j - 1) + 1 else 0
        if (cur(j) > best) best = cur(j)
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, prev.length)
      i += 1
    }
    best
  }

  test("d13 substring spans: reported max_span equals token-LCS; subset-complete") {
    val reported = DedupQueries.d13SubstringSpan.fn(s, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(reported.nonEmpty, "the corpus plants long verbatim spans")
    val texts = Tables.t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    // Soundness + exactness: every reported span IS the pair's LCS.
    reported.foreach { case ((i, j), span) =>
      val lcs = tokenLcs(texts(i), texts(j))
      assert(lcs == span, s"pair ($i,$j): reported $span, true LCS $lcs")
    }
    // Completeness on a bounded subset (no seed hits the df stop-cap at
    // this SF, so chain semantics = plain LCS >= 20): every qualifying
    // pair among the first 120 docs must be reported.
    val ids = texts.keys.filter(_ < 120).toSeq.sorted
    for (i <- ids; j <- ids if i < j) {
      val lcs = tokenLcs(texts(i), texts(j))
      if (lcs >= 20)
        assert(reported.contains((i, j)), s"missed pair ($i,$j) with LCS $lcs")
    }
  }
}
