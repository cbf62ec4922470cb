package graft.dedup

import graft.{Q, Stage, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication surface (LLM-pipeline north star): exact, hash-key,
  * MinHash+LSH, SimHash, and an exact n-gram-Jaccard similarity join with
  * lossless prefix filtering.
  *
  * Scale design — the whole point of this module is that NOTHING here is
  * all-pairs:
  *  - exact/hash dedup shuffle once on the dedup key (an 8-byte xxhash64,
  *    not the document text — at 100 TB the shuffle moves keys, not docs);
  *  - MinHash near-dup joins only within (band, band-signature) buckets —
  *    the standard LSH guarantee that candidate count tracks true-pair
  *    count, not N²;
  *  - SimHash blocks on 16-bit signature chunks (pigeonhole: hamming <= 3
  *    is guaranteed to share a block; higher distances probabilistically);
  *  - the Jaccard join prunes with prefix filtering (PPJoin-style): a pair
  *    can only match at threshold θ if their lexicographic shingle
  *    prefixes of length |s|-⌈θ|s|⌉+1 intersect — provably lossless, so
  *    the pruned Spark plan still hash-matches DuckDB's all-pairs oracle.
  */
object DedupQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.t(s, d, "documents")
  private def toks = split(col("text"), " ")

  /** Distinct word-3-gram shingles, lexicographically sorted (canonical
    * order shared by the prefix filter and the signature computations). */
  private def shingles: Column = sort_array(array_distinct(transform(
    sequence(lit(1), greatest(size(toks) - 2, lit(0))),
    i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))

  /** Materialized (doc_id, sh) shingle table, built in two pinned stages:
    * tokens first, then shingles from the STORED token array. Without the
    * intermediate stage, projection collapse inlines split(text) into each
    * of the three element_at references — re-tokenizing every doc ~3x per
    * shingle (graft.Stage scaladoc). */
  private def shingledDocs(s: SparkSession, d: String, tag: String): DataFrame = {
    val toksDf = Stage.materialize(s,
      docs(s, d).select(col("doc_id"), toks.as("toks")), s"${tag}toks")
    val t = col("toks")
    val sh = sort_array(array_distinct(transform(
      sequence(lit(1), greatest(size(t) - 2, lit(0))),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))))
    Stage.materialize(s,
      toksDf.select(col("doc_id"), sh.as("sh")).filter(size(col("sh")) > 0),
      s"${tag}sh")
  }

  /** Exact dedup with deterministic representative: min doc_id per text
    * group. (dropDuplicates keeps an arbitrary row — fine in production,
    * not hash-comparable; min-id is the reproducible equivalent.) */
  val d01ExactDedup: Q = Q(
    "d01_exact_dedup",
    """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS group_size
      |FROM documents GROUP BY text
      |ORDER BY keep_id""".stripMargin) { (s, d) =>
    docs(s, d)
      .groupBy("text")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("group_size"))
      .select("keep_id", "group_size")
      .orderBy("keep_id")
  }

  /** Hash-key dedup: the 100 TB pattern — shuffle the 8-byte xxhash64 of
    * the text, never the text itself. The oracle checks the distinct-hash
    * count against the distinct-text count per source (identical barring a
    * 64-bit collision, p < 1e-13 at this scale). */
  val d02HashDedup: Q = Q(
    "d02_hash_dedup",
    """SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_distinct
      |FROM documents GROUP BY source
      |ORDER BY source""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(col("source"), xxhash64(col("text")).as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("h")).as("n_distinct"))
      .orderBy("source")
  }

  /** MinHash + banded LSH near-dup pairs. 32 permutations (xxhash64 with a
    * per-permutation salt), 8 bands x 4 rows; candidates only within
    * (band, band-key) buckets; estimated Jaccard = signature agreement,
    * kept at >= 0.5. No SQL oracle (minhash is engine-specific); the
    * driver's rows>0 smoke applies and MinHashSpec asserts the estimate
    * brackets the exact Jaccard on the planted near-dup pairs. */
  val d03MinHashLsh: Q = Q.noOracle("d03_minhash_lsh") { (s, d) =>
    val P = 32 // permutations
    val B = 8  // bands
    val R = 4  // rows per band
    // Shingles materialize first (see shingledDocs): the 32 per-permutation
    // array_min transforms each reference the shingle column, and projection
    // collapse would inline the shingling 32x per doc. The signature
    // stage materializes too so the band self-join computes it once.
    val shingled = shingledDocs(s, d, "d03")
    val withSig = Stage.materialize(s,
      shingled.withColumn("sig", array((0 until P).map(p =>
        array_min(transform(col("sh"), x => xxhash64(lit(p), x)))): _*))
        .select("doc_id", "sig"),
      "d03sig")
    val bandKeys = array((0 until B).map(b =>
      xxhash64((0 until R).map(r => element_at(col("sig"), b * R + r + 1)): _*)): _*)
    // The signature rides along through the band explode so candidate
    // verification needs no join back to the docs (8x sig duplication in
    // the shuffle, bounded at 32*8 bytes per row — cheap at any scale).
    val bands = withSig
      .select(col("doc_id"), col("sig"), posexplode(bandKeys).as(Seq("band", "bkey")))
    val est = size(filter(
      zip_with(col("sig_i"), col("sig_j"), (x, y) => x === y), v => v))
      .cast("double") / P
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.sig").as("sig_i"), col("b.sig").as("sig_j"))
      .dropDuplicates("i", "j")
      .select(col("i"), col("j"), est.as("est_sim"))
      .filter(col("est_sim") >= 0.5)
      .orderBy("i", "j")
  }

  /** SimHash near-dup pairs: 64-bit signature from per-token bit votes,
    * blocked on 4x16-bit chunks, verified at hamming <= 8. Signature and
    * bit-count are per-row SQL higher-order functions (no UDF, no
    * shuffle); the only shuffle is the (block, value) bucket join. */
  val d04SimHash: Q = Q.noOracle("d04_simhash") { (s, d) =>
    val votes = expr(
      """aggregate(
        |  transform(split(text, ' '), t -> xxhash64(t)),
        |  array_repeat(0L, 64),
        |  (acc, h) -> zip_with(acc,
        |    transform(sequence(0, 63), j -> IF(((h >> j) & 1) = 1, 1L, -1L)),
        |    (a, b) -> a + b))""".stripMargin)
    val simhash = expr(
      """aggregate(
        |  transform(sequence(0, 63), j -> IF(element_at(votes, j + 1) > 0, shiftleft(1L, j), 0L)),
        |  0L, (acc, x) -> acc | x)""".stripMargin)
    // The vote aggregate MUST materialize before the per-bit packing:
    // projection collapse would otherwise inline the whole O(tokens*64)
    // aggregate into each of the 64 bit lambdas (O(tokens*64^2) per doc —
    // observed 250+ s at sf0.1, ~2 s materialized).
    // (repartition first: the raw docs scan is a single few-MB partition,
    // and the vote aggregate is compute-bound — Stage scaladoc)
    val votesDf = Stage.materialize(s,
      docs(s, d).repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), votes.as("votes")), "d04votes")
    val withSim = Stage.materialize(s,
      votesDf.select(col("doc_id"), simhash.as("sim")), "d04sim")
    val blocks = withSim.select(col("doc_id"), col("sim"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("blk", "blkval")))
    blocks.as("a")
      .join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.blkval") === col("b.blkval")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        expr("bit_count(a.sim ^ b.sim)").cast("long").as("hamming"))
      .dropDuplicates("i", "j")
      .filter(col("hamming") <= 8)
      .orderBy("i", "j")
  }

  /** Exact n-gram-Jaccard similarity join at θ=0.6 with lossless prefix
    * filtering: only pairs sharing a token in their length
    * |s|-⌈θ|s|⌉+1 sorted-shingle prefix can reach θ, so the bucket join
    * explores a tiny candidate set yet returns EXACTLY the all-pairs
    * answer — which is what the DuckDB oracle computes. Jaccard is an
    * exact int/int division (bit-identical across engines). */
  val d05NgramJaccard: Q = Q(
    "d05_ngram_jaccard",
    """WITH sh AS (
      |  SELECT doc_id, list_sort(list_distinct(
      |           [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |            for i in range(1, len(toks) - 1)])) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 3)
      |SELECT a.doc_id AS i, b.doc_id AS j,
      |  len(list_intersect(a.s, b.s)) /
      |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE len(list_intersect(a.s, b.s)) /
      |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.6
      |ORDER BY i, j""".stripMargin) { (s, d) =>
    val theta = 0.6
    val sh = shingledDocs(s, d, "d05").withColumnRenamed("sh", "s")
    // PPJoin proper: the prefix order must be a corpus-wide total order,
    // and the right one is ASCENDING DOCUMENT FREQUENCY — prefixes then
    // hold each doc's rarest shingles, so the candidate join's buckets
    // stay tiny. (Lexicographic order is equally lossless but pathological
    // on a shared-vocabulary corpus: every prefix holds the same
    // alphabetically-small shingles and the join degenerates toward
    // all-pairs — observed 31 s vs 4 s at sf0.1.) Ties break on the
    // shingle string, so the order is total and shared by both join sides.
    // Residual cost note: this corpus draws from ~30 words, so even the
    // rarest shingles repeat and ~193k of 12.5M possible pairs survive the
    // prefix+length prune at sf0.1 (65x) — real corpora have heavy-tailed
    // vocabularies and prune orders of magnitude harder.
    val dfCounts = sh.select(explode(col("s")).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df"))
    val ranked = sh.select(col("doc_id"), explode(col("s")).as("shingle"))
      .join(dfCounts, "shingle")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("shingle")))).as("ordered"))
    val prefix = ranked.select(col("doc_id"),
      size(col("ordered")).as("sz"),
      posexplode(slice(transform(col("ordered"), o => o.getField("shingle")), lit(1),
        (size(col("ordered")) - ceil(size(col("ordered")) * theta) + 1).cast("int"))))
      .select(col("doc_id"), col("sz"), col("pos"), col("col").as("ptok"))
    // Candidates travel as bare id pairs; the shingle arrays join back in
    // only for the surviving pairs' exact verification. Two more lossless
    // bounds ride in the join condition:
    //  - length filter: jaccard >= θ forces θ|a| <= |b| <= |a|/θ, so
    //    mismatched sizes never leave the bucket;
    //  - PPJoin+ positional filter: a shared token at (0-based) prefix
    //    positions (p_a, p_b) caps the overlap at
    //      min(p_a, p_b) + 1 + min(|a|-p_a-1, |b|-p_b-1)
    //    (shared tokens strictly before it + itself + shared after it,
    //    all in the one corpus-wide order), while jaccard >= θ needs
    //    overlap >= ⌈θ/(1+θ)·(|a|+|b|)⌉. Every shared prefix token of a
    //    TRUE result pair satisfies the cap (it bounds the same overlap),
    //    so pruning matches that fail it loses nothing — pairs survive
    //    via any passing match and dedup after.
    //    Measured on this corpus it prunes only ~1.5% (193k→190k at
    //    sf0.1): docs are near-uniform length, so positions hardly
    //    discriminate — same data-pathology note as the prefix filter
    //    above. On heavy-tailed real corpora the positional bound is the
    //    classic second-biggest pruner after the prefix itself, and it
    //    rides in the join condition at zero measured cost.
    val alpha = ceil((col("a.sz") + col("b.sz")) * lit(theta / (1 + theta)))
    val posBound = least(col("a.pos"), col("b.pos")) + lit(1) +
      least(col("a.sz") - col("a.pos") - 1, col("b.sz") - col("b.pos") - 1)
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.ptok") === col("b.ptok") && col("a.doc_id") < col("b.doc_id")
          && col("b.sz") >= ceil(col("a.sz") * theta)
          && col("b.sz") <= floor(col("a.sz") / theta)
          && posBound >= alpha)
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .dropDuplicates("i", "j")
    val inter = size(array_intersect(col("s_i"), col("s_j"))).cast("long")
    val jac = inter / (size(col("s_i")).cast("long") + size(col("s_j")).cast("long") - inter)
    cand
      .join(sh.select(col("doc_id").as("i"), col("s").as("s_i")), Seq("i"))
      .join(sh.select(col("doc_id").as("j"), col("s").as("s_j")), Seq("j"))
      .select(col("i"), col("j"), jac.as("jac"))
      .filter(col("jac") >= theta)
      .orderBy("i", "j")
  }

  /** Engine-portable MinHash (the oracle-checked complement to d03):
    * permutation hashes derive from md5 — shared bit-for-bit by both
    * engines — so the full signature computation (min over per-seed
    * hashes of the distinct token set) verifies EXACTLY against DuckDB,
    * not just statistically. d03 keeps xxhash64 for the production path
    * (one 64-bit mix vs a full md5 per token·perm); this entry pins the
    * minhash MATH itself cross-engine. 8 perms over distinct word
    * tokens; per-token cost is a scan-local map, no shuffle. */
  val d06MinHashPortable: Q = Q(
    "d06_minhash_portable",
    {
      val mins = (0 until 8).map(i =>
        s"  list_min(list_transform(toks, t -> ('0x' || substr(md5('$i:' || t), 1, 8))::BIGINT)) AS m$i")
        .mkString(",\n")
      s"""SELECT doc_id,
         |$mins
         |FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
         |      FROM documents WHERE doc_id < 100)
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    val toksDistinct = array_distinct(toks)
    val minCols = (0 until 8).map(i =>
      array_min(transform(toksDistinct, t =>
        conv(substring(md5(concat(lit(s"$i:"), t)), 1, 8), 16, 10).cast("long"))).as(s"m$i"))
    docs(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id") +: minCols: _*)
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(d01ExactDedup, d02HashDedup, d03MinHashLsh, d04SimHash,
    d05NgramJaccard, d06MinHashPortable)
}
