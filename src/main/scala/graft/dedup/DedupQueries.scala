package graft.dedup

import graft.{Q, Stage, Tables, Widths}
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

  /** Corpus-size budget for broadcasting the signature-screen lookup sides
    * (shared by d05 and d19 — ADVICE r12: the constant was duplicated
    * verbatim in both entries). Raw payload is ~88 B/doc (8 B doc_id +
    * 8x8 B sig + size), so 6M docs is ~530 MB of rows — but Spark's
    * in-memory HashedRelation typically inflates raw bytes 2-4x (UnsafeRow
    * headers + the hash map's key/offset arrays), so the resident build
    * side is ~1-2 GB: routine for a cluster-sized executor, and measured
    * safe at the largest live point (5M docs, sf100). The default keeps a
    * margin below the previously-hardcoded 8M; deployments with bigger
    * executors can raise it per-run via -Dgraft.dedup.sigBroadcastMaxDocs.
    * Above the budget the lookups fall back to shuffled-hash — sort-free
    * at any scale, just not exchange-free. */
  private[graft] def sigBroadcastMaxDocs: Long =
    sys.props.get("graft.dedup.sigBroadcastMaxDocs").map(_.toLong)
      .getOrElse(6000000L)

  /** Budget-gated signature lookup: map-side (broadcast) under the budget
    * so the candidate pair stream crosses NO exchange until the post-screen
    * dedup; shuffled-hash (never sort-merge) above it. */
  private def sigLookup(nDocs: Long)(df: DataFrame): DataFrame =
    if (nDocs <= sigBroadcastMaxDocs) broadcast(df) else df.hint("shuffle_hash")

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
    // SORT-MERGE retained after a measured A/B (r13 SMJ sweep): the
    // audit flagged this join's shape (4M-row banded posting stream
    // sorted to emit 183k candidates at sf10), but hinting it
    // shuffled-hash measured SLOWER — 13.2 -> 15.2 s w1/isolated —
    // because both sides carry the 32-perm signature payload
    // (~300 B/row, deliberately riding along so verification needs no
    // join-back; see above), and a 4M-row hash build over fat rows
    // costs more than the sort saves at this width. The probe-only
    // graft.d03.shj toggle re-runs the A/B at any scale without a
    // recompile; flip the default only with a measurement.
    (if (sys.props.contains("graft.d03.shj")) bands.hint("shuffle_hash")
     else bands).as("a")
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
    // SORT-MERGE retained after a measured A/B (r13 SMJ sweep): hinting
    // this self-join shuffled-hash measured 17.7 -> 19.3 s at sf10
    // (w3 min-of-3) even though the block rows are 28 B lean — the
    // self-join's heavily duplicated (blk, blkval) keys make the hash
    // build's per-key chains pay more than the sort's run-length merge
    // saves. Like d03: the audit's flag is a hypothesis, the A/B is the
    // verdict.
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

  /** Portable SimHash — d04's algorithm re-grounded on md5 so the whole
    * computation is engine-checkable, mirroring the d03→d06 graduation:
    * d04 stays the fast engine-native xxhash64 variant; THIS entry
    * derives every per-token hash from the first 8 md5 hex digits
    * (d06/q47's portable-hash idiom), votes each of 16 signature bits
    * by sign (+1 if the token hash has the bit set, −1 otherwise, over
    * DISTINCT tokens — exact integer arithmetic, so the vote sum and
    * its sign are bit-identical in any engine), and emits near-dup
    * pairs at hamming ≤ 3. The Spark side blocks on 4×4-bit signature
    * chunks — pigeonhole-LOSSLESS at this threshold (3 differing bits
    * leave ≥1 of 4 chunks equal), so the blocked plan returns EXACTLY
    * the all-pairs answer the DuckDB oracle computes; the doc_id scope
    * bounds the oracle's quadratic side the way d06's does. At corpus
    * scale the same plan widens the signature and the chunks (64-bit,
    * 4×16) — the shape (per-row signature, chunk bucket join, no
    * all-pairs) is d04's proven one. */
  val d11SimHashPortable: Q = Q(
    "d11_simhash_portable",
    {
      val bitVal = (j: Int) =>
        s"""(CASE WHEN list_sum(list_transform(hs,
           |    x -> CASE WHEN ((x >> $j) & 1) = 1 THEN 1 ELSE -1 END)) > 0
           |  THEN ${1 << j} ELSE 0 END)""".stripMargin
      s"""WITH t AS (
         |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
         |  FROM documents WHERE doc_id < 200),
         |h AS (
         |  SELECT doc_id, list_transform(toks,
         |    t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS hs FROM t),
         |sig AS (
         |  SELECT doc_id,
         |${(0 until 16).map(bitVal).mkString("  ", "\n  + ", "")} AS sig
         |  FROM h)
         |SELECT a.doc_id AS i, b.doc_id AS j,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3
         |ORDER BY i, j""".stripMargin
    }) { (s, d) =>
    val votes = expr(
      """aggregate(
        |  transform(array_distinct(split(text, ' ')),
        |    t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)),
        |  array_repeat(0L, 16),
        |  (acc, h) -> zip_with(acc,
        |    transform(sequence(0, 15), j -> IF(((h >> j) & 1) = 1, 1L, -1L)),
        |    (a, b) -> a + b))""".stripMargin)
    val sig = expr(
      """aggregate(
        |  transform(sequence(0, 15), j -> IF(element_at(votes, j + 1) > 0, shiftleft(1L, j), 0L)),
        |  0L, (acc, x) -> acc | x)""".stripMargin)
    // votes materialize before bit packing — same projection-collapse
    // trap as d04 (the O(tokens*16) aggregate would inline into each of
    // the 16 bit lambdas)
    val votesDf = Stage.materialize(s,
      docs(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"), votes.as("votes")), "d11votes")
    val withSig = Stage.materialize(s,
      votesDf.select(col("doc_id"), sig.as("sig")), "d11sig")
    val blocks = withSig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sig"), b * 4).bitwiseAND(lit(0xFL))): _*))
        .as(Seq("blk", "blkval")))
    blocks.as("a")
      .join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.blkval") === col("b.blkval")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        expr("bit_count(a.sig ^ b.sig)").cast("long").as("hamming"))
      .dropDuplicates("i", "j")
      .filter(col("hamming") <= 3)
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
    // Width scales with the CORPUS (candidate volume is linear in docs
    // under the prefix prune): ~6k docs per partition, floored at 8 —
    // at the verify/bench SFs that is the measured-best narrow width
    // (4.1 s @32 -> 2.3 s @8 at sf0.1: task overhead dominates small
    // stages), while at 100x the old fixed cap of 8 put 2.4M candidate
    // pairs in each of 8 tasks on a 32-core box (measured 210 -> 71 s
    // cold at sf10 with the scaled width, sf1 unchanged).
    val nDocs = Tables.t(s, d, "documents").count()
    val d05Width = math.min(512L, math.max(8L, nDocs / 6000L)).toInt
    Widths.withWidth(s, d05Width) {
      // Shingles reduce to 64-bit xxhash64 ids at the scan and STRINGS
      // NEVER TRAVEL: every downstream shuffle moves 8-byte longs
      // instead of ~20-byte trigram strings — the only way to fly at
      // 100 TB. Distinct shingles map to distinct ids with
      // p(collision) < 1e-11 at this cardinality (d02's accepted
      // hash-key regime), so set sizes and intersections — and therefore
      // every Jaccard value — are unchanged and still hash-match the
      // all-pairs string oracle.
      //
      // PPJoin proper: the prefix order must be a corpus-wide total
      // order; prefixes should hold each doc's RAREST shingles so the
      // candidate buckets stay tiny. (Lexicographic order is equally
      // lossless but pathological on a shared-vocabulary corpus:
      // every prefix holds the same alphabetically-small shingles and
      // the join degenerates toward all-pairs — observed 31 s vs 4 s at
      // sf0.1.) r12 replaced the TRUE-df order with [[unigramRanked]]'s
      // map-only unigram-estimate order: the df join-back build was two
      // corpus-postings-scale shuffles (925 s of d19's sf100 wall on
      // the shared build) for a candidate-volume heuristic the estimate
      // recovers to within ~2x — absorbed by the signature screen below.
      // Residual cost note: this corpus draws from ~30 words, so even
      // the rarest shingles repeat — real corpora have heavy-tailed
      // vocabularies and prune orders of magnitude harder.
      //
      // Verification happens INLINE in the candidate join's projection
      // on small corpora — the ordered FULL id array rides along with
      // each prefix row (~40 longs/doc); no arrays-join-back, no
      // 190k-pair dropDuplicates shuffle (measured 4.1 -> 2.3 s at
      // sf0.1; the dup-match double-verify costs ~1.5%). Survivors
      // dedup AFTER the θ filter, when ~hundreds of rows remain.
      // Inline mini-sig (d19's r14 pre-screen, in two-sided Jaccard
      // form): W x 64-bit per-doc OR-masks ride the prefix rows and
      // prune candidate matches INSIDE the join condition. Lossless:
      // popcount(mA & ~mB) lower-bounds |A \ B| (d19's witness
      // argument), so overlap <= min(|a| - missA, |b| - missB), and
      // matches with that bound < alpha can never verify. DEFAULT OFF,
      // d19's verdict (see its scaladoc + SCALE.md r14): the words
      // widen every exploded prefix row, and the candidate exchange's
      // bytes — not the screen probes they save — are the measured
      // sf100 wall. -Dgraft.d05.msigWords=W enables for probe-bound
      // corpora; the words are materialized per doc in unigramRanked
      // (deriving them here would re-evaluate per posting row).
      val msigWords = sys.props.get("graft.d05.msigWords").map(_.toInt).getOrElse(0)
      val msel = (0 until msigWords).map(n => col(s"msig$n"))
      val ranked = unigramRanked(s, d, "d05", msigWords)
      val prefix = ranked.select(
        Seq(col("doc_id"), col("sz"), col("ord")) ++ msel ++
          Seq(posexplode(slice(col("ord"), lit(1),
            (col("sz") - ceil(col("sz") * theta) + 1).cast("int")))): _*)
        .select(Seq(col("doc_id"), col("sz"), col("ord"), col("pos"),
          col("col").as("ptok")) ++ msel: _*)
      // Two more lossless bounds ride in the join condition:
      //  - length filter: jaccard >= θ forces θ|a| <= |b| <= |a|/θ, so
      //    mismatched sizes never leave the bucket;
      //  - PPJoin+ positional filter: a shared token at (0-based) prefix
      //    positions (p_a, p_b) caps the overlap at
      //      min(p_a, p_b) + 1 + min(|a|-p_a-1, |b|-p_b-1)
      //    (shared tokens strictly before it + itself + shared after it,
      //    all in the one corpus-wide order), while jaccard >= θ needs
      //    overlap >= ⌈θ/(1+θ)·(|a|+|b|)⌉. Every shared prefix token of a
      //    TRUE result pair satisfies the cap (it bounds the same
      //    overlap), so pruning matches that fail it loses nothing —
      //    pairs survive via any passing match and dedup after.
      //    Measured on this corpus it prunes only ~1.5%: docs are
      //    near-uniform length, so positions hardly discriminate. On
      //    heavy-tailed real corpora the positional bound is the classic
      //    second-biggest pruner after the prefix itself, and it rides
      //    in the join condition at zero measured cost.
      val alpha = ceil((col("a.sz") + col("b.sz")) * lit(theta / (1 + theta)))
      val posBound = least(col("a.pos"), col("b.pos")) + lit(1) +
        least(col("a.sz") - col("a.pos") - 1, col("b.sz") - col("b.pos") - 1)
      def jacOf(aOrd: Column, bOrd: Column, aSz: Column, bSz: Column) = {
        val inter = size(array_intersect(aOrd, bOrd)).cast("long")
        inter / (aSz.cast("long") + bSz.cast("long") - inter)
      }
      val missOf = (x: String, y: String) => (0 until msigWords).map(n =>
        bit_count(col(s"$x.msig$n").bitwiseAND(
          col(s"$y.msig$n").bitwiseXOR(lit(-1L))))).reduce(_ + _)
      val miniBound =
        if (msigWords == 0) lit(true)
        else least(col("a.sz") - missOf("a", "b"),
          col("b.sz") - missOf("b", "a")) >= alpha
      val bucketCond =
        col("a.ptok") === col("b.ptok") && col("a.doc_id") < col("b.doc_id") &&
          col("b.sz") >= ceil(col("a.sz") * theta) &&
          col("b.sz") <= floor(col("a.sz") / theta) &&
          posBound >= alpha && miniBound
      // VERIFICATION STRATEGY is corpus-size-adaptive — the same
      // cost-based call a planner makes, decided from the row count
      // already fetched for the width:
      //  - small corpora (<= ~sf10): the df-ordered full id
      //    array rides with each prefix row and verification happens
      //    INLINE in the candidate join's projection. Fewer shuffles
      //    wins when bytes are cheap (measured 4.1 -> 2.3 s at sf0.1 vs
      //    the join-back shape; the dup-match double-verify costs ~1.5%).
      //  - at scale the array-bearing prefix shuffle is the bend: rows
      //    carry ~40 exploded prefix copies x the full ~40-400-long id
      //    array EACH, and the sf100 campaign measured it exhausting the
      //    box's 65 GB of shuffle disk (>100 GB planned spill, entry
      //    DEAD, not slow). The scale path ships BARE 16-byte id rows
      //    through the bucket join, dedups candidate pairs while they
      //    are still ids, and fetches each distinct pair's two arrays
      //    ONCE via co-partitioned join-backs: bytes drop from
      //    O(prefix-rows x doclen) to O(docs x doclen + candidates).
      //    Same bounds, same survivors, same hash — verified at sf1.
      // Materialized INSIDE the conf scope so the join/filter stages
      // actually execute at the capped width (the entry's DataFrame is
      // lazy; without this pin they would plan at the restored session
      // width after fn returns).
      // Crossover measured, not guessed: at sf10 (500k docs) inline wins
      // 65.5 s vs the join-back's 115 s (the two extra co-partitioned
      // shuffles cost more than the fatter prefix rows at this size);
      // at sf100 (5M docs) inline PLANS ~terabytes of prefix-array
      // shuffle (dead on any box tier) while the join-back's
      // O(docs × doclen + candidates) bytes are ~30x leaner. The switch
      // sits at 2M between the measured sizes. (Session 9 correction:
      // the first version of this note labeled the SFs with 10x-inflated
      // doc counts — 5M/50M — and set the switch at 20M, which at sf100's
      // ACTUAL 5M docs would have picked the dead inline path on any
      // cluster sized like this box-per-node.)
      val pairs = if (nDocs <= 2000000L && !sys.props.contains("graft.d05.forceJoinBack")) {
        Stage.materialize(s,
          prefix.as("a")
            .join(prefix.as("b"), bucketCond)
            .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
              jacOf(col("a.ord"), col("b.ord"), col("a.sz"), col("b.sz")).as("jac"))
            .filter(col("jac") >= theta),
          "d05pairs").dropDuplicates("i", "j")
      } else {
        val lite = prefix.select(
          Seq(col("doc_id"), col("sz"), col("pos"), col("ptok")) ++ msel: _*)
        // d19's r12b join discipline, in self-join form: shuffled HASH
        // join (skips sorting both exploded prefix streams — the sort
        // was measured as d19's sf100 wall, 434 vs 94 s) and candidate
        // dedup AFTER the signature screen (duplication measures 1.03x,
        // so the pre-screen dropDuplicates was a full-stream shuffle to
        // remove 3%; post-screen it dedups ~survivor volume).
        val cand = lite.hint("shuffle_hash").as("a")
          .join(lite.as("b"), bucketCond)
          .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
        // SIGNATURE SCREEN before the array join-backs (d19's r12
        // machinery, in Jaccard form): jac >= θ needs overlap α =
        // ceil(θ/(1+θ)·(|a|+|b|)), and popcount(sigX & ~sigY) lower-
        // bounds |X∖Y|, so overlap <= min(|a| − missA, |b| − missB) —
        // pruning pairs whose bound is < α is lossless in both
        // directions at once. Candidates shrink to ~survivors before
        // any ~1.6 KB ord array ships.
        val sigSide = shingleSigs(s, ranked, "d05")
        val missA = aggregate(zip_with(col("asig"), col("bsig"),
          (x, y) => bit_count(x.bitwiseAND(y.bitwiseXOR(lit(-1L))))),
          lit(0), (acc, x) => acc + x)
        val missB = aggregate(zip_with(col("bsig"), col("asig"),
          (x, y) => bit_count(x.bitwiseAND(y.bitwiseXOR(lit(-1L))))),
          lit(0), (acc, x) => acc + x)
        val alphaS = ceil((col("assz") + col("bssz")) * lit(theta / (1 + theta)))
        // Broadcast-gated sig lookups, d19's screen discipline (see its
        // scaladoc: two shuffle-join lookups reship the pair stream
        // with sig payloads; map-side lookups keep it exchange-free
        // until the post-screen dedup). Budget + fallback are the
        // shared sigBroadcastMaxDocs/sigLookup at the top of this file.
        val screened = cand
          .join(sigLookup(nDocs)(sigSide.select(col("doc_id").as("i"),
            col("sig").as("asig"), col("ssz").as("assz"))), "i")
          .join(sigLookup(nDocs)(sigSide.select(col("doc_id").as("j"),
            col("sig").as("bsig"), col("ssz").as("bssz"))), "j")
          .filter(least(col("assz") - missA, col("bssz") - missB) >= alphaS)
          .select(col("i"), col("j"))
          .dropDuplicates("i", "j")
        val docsSide = ranked.select(col("doc_id"), col("ord"), col("sz"))
        Stage.materialize(s,
          screened
            .join(docsSide.select(col("doc_id").as("i"),
              col("ord").as("aord"), col("sz").as("asz")), "i")
            .join(docsSide.select(col("doc_id").as("j"),
              col("ord").as("bord"), col("sz").as("bsz")), "j")
            .select(col("i"), col("j"),
              jacOf(col("aord"), col("bord"), col("asz"), col("bsz")).as("jac"))
            .filter(col("jac") >= theta),
          "d05pairs")
      }
      pairs.orderBy("i", "j")
    }
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

  /** Connected components over near-dup edges — the step every LSH/
    * blocking dedup needs AFTER pair generation: candidate pairs are not
    * transitive, so picking canonical documents requires the component
    * (cluster) each doc belongs to, A~B and B~C pulling A,B,C together
    * even when A~C was never emitted. Edges here come from fuzzy
    * blocking (equal first-3-token prefix OR equal last-3-token suffix —
    * two cheap hash-groupable keys that chain, producing genuinely
    * non-transitive components).
    *
    * Spark side is iterative min-label propagation with pointer
    * jumping: per round, every node takes the min label in its
    * neighborhood, then labels compress one level (l(v) <- l(l(v))), so
    * convergence is O(log diameter) rounds, not O(diameter) — the
    * scale-critical distinction (a 100 TB web-dup graph has long
    * chains). Each round is two shuffles on bare (id, label) longs; the
    * documents themselves never travel. Labels materialize per round
    * (iterative DataFrame lineage otherwise grows unboundedly — the
    * checkpoint-per-iteration pattern). Convergence detection is exact,
    * not heuristic: labels only ever decrease, so sum(label) is
    * stationary iff the labeling is a fixpoint.
    *
    * Oracle: DuckDB recursive CTE computing min reachable id per node —
    * feasible at verify scale (500 docs), which is exactly why the
    * Spark side must NOT use that transitive-closure shape (its
    * intermediate `reach` set is O(n·component) rows). */
  /** The d07 near-dup graph's connected-component labels (doc_id → min
    * reachable doc_id), shared by d07 (the cluster report) and d15 (the
    * soft-dedup weighting). See d07's scaladoc for the star-expansion +
    * pointer-jumping scale story. */
  private def ccLabels(s: SparkSession, d: String): DataFrame =
    ccFromKeyed(s, keyedOf(s, d))

  /** (doc_id, pre, suf) blocking keys — the d07 near-dup graph's edge
    * generator, shared with the incremental path (d18). */
  private def keyedOf(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("toks"), 1, 3)).as("pre"),
        concat_ws(" ", slice(col("toks"), -3, 3)).as("suf"))

  /** Budget-gated lookup for the CC kernels (r13 SMJ sweep): the lookup
    * sides here are |V|-row bare-long tables (labels, nbrMin, parents,
    * block hubs), so under ~2M nodes (≈32 MB of rows) an explicit
    * broadcast makes every loop join map-side; above it, shuffled-hash
    * keeps the corpus/edge stream sort-free at any scale. The gate
    * matters in BOTH directions — the first sweep pass hinted
    * shuffle_hash unconditionally and d18 regressed 13.3 → 16.0 s at
    * sf10 because its contracted-delta loop (66k nodes) lost the
    * broadcast AQE had been picking; gated, the small regime keeps
    * broadcast and the large regime never sorts. */
  private def ccLookup(nV: Long)(df: DataFrame): DataFrame =
    if (nV <= sys.props.get("graft.cc.broadcastMaxNodes").map(_.toLong)
        .getOrElse(2000000L)) broadcast(df)
    else df.hint("shuffle_hash")

  private def ccFromKeyed(s: SparkSession, keyed: DataFrame): DataFrame = {
    val nDocs = keyed.count()
    def blockEdges(k: String) = {
      val hub = keyed.groupBy(col(k).as("key"))
        .agg(min(col("doc_id")).as("u"), count(lit(1)).as("n"))
        .filter(col("n") > 1)
      // gated hash/broadcast, never sort-merge: the corpus-side stream
      // (all docs) dwarfs the hub table (blocks with >1 member) AND the
      // output — sorting it buys nothing (r13 SMJ sweep)
      keyed.join(ccLookup(nDocs)(hub), col(k) === col("key"))
        .filter(col("doc_id") =!= col("u"))
        .select(col("u"), col("doc_id").as("v"))
    }
    val e0 = blockEdges("pre").union(blockEdges("suf")).distinct()
    ccLoop(s, e0, keyed.select(col("doc_id").as("id")))
  }

  /** Min-label pointer-jumping CC over (u, v) edges (given one
    * direction; symmetrized here) and an `id` node list — d07's loop,
    * extracted so d18 can run it on the contracted DELTA graph. */
  private def ccLoop(s: SparkSession, e0: DataFrame, nodes: DataFrame): DataFrame = {
    val loopWidth = math.min(s.sparkContext.defaultParallelism, 8)
    val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .repartition(loopWidth).localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("comp"))
      .repartition(loopWidth).localCheckpoint()
    val nV = labels.count()
    var prevSum = -1L
    var curSum = 0L
    var round = 0
    Widths.withWidth(s, loopWidth) {
      while (curSum != prevSum && round < 25) {
        // Loop lookups ride ccLookup (r13 SMJ sweep): every lookup side
        // is a |V|-row bare-long table (labels, the per-round nbrMin,
        // parents) — broadcast under the 2M-node budget, shuffled-hash
        // above it, NEVER sort-merge: the audit caught the pointer jump
        // sorting both 500k-row sides every round x5 rounds at sf10,
        // and at sf100 the nbrMin/stepped lookups stop auto-broadcasting
        // and would degrade to per-round edge-stream sorts.
        val nbrMin = edges.join(ccLookup(nV)(labels),
            edges("v") === labels("id"))
          .groupBy(col("u").as("nid")).agg(min(col("comp")).as("ncomp"))
        val stepped = labels.join(ccLookup(nV)(nbrMin),
            labels("id") === nbrMin("nid"), "left")
          .select(col("id"), least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        val pinned = stepped.localCheckpoint()
        val parents = pinned.select(col("id").as("pid"), col("comp").as("pcomp"))
        labels = pinned.join(ccLookup(nV)(parents), pinned("comp") === parents("pid"))
          .select(col("id"), col("pcomp").as("comp"))
          .localCheckpoint()
        prevSum = curSum
        curSum = labels.agg(sum(col("comp"))).head.getLong(0)
        round += 1
      }
    }
    labels
  }

  val d07CcClusters: Q = Q(
    "d07_cc_clusters",
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |p AS (
      |  SELECT doc_id, array_to_string(toks[1:3], ' ') AS pre,
      |         array_to_string(toks[-3:], ' ') AS suf FROM t),
      |e0 AS (
      |  SELECT a.doc_id AS u, b.doc_id AS v FROM p a
      |    JOIN p b ON a.pre = b.pre AND a.doc_id < b.doc_id
      |  UNION
      |  SELECT a.doc_id, b.doc_id FROM p a
      |    JOIN p b ON a.suf = b.suf AND a.doc_id < b.doc_id),
      |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.id)
      |SELECT id AS doc_id, MIN(r) AS component
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin) { (s, d) =>
    // Implementation lives in ccLabels (shared with d15). Key structural
    // notes preserved here:
    //  - STAR expansion per block, not all-pairs: a blocking key's edges
    //    only exist to merge its members into one component, and
    //    connecting every member to the block MINIMUM yields the same
    //    components with n-1 edges per block instead of n(n-1)/2. The
    //    1000x campaign forced this: the generator's 8 global tokens form
    //    ~512 all-global 3-gram prefixes whose blocks grow WITH the
    //    factor (the boilerplate-prefix shape of a real crawl), so
    //    all-pairs enumeration planned ~1e9 edges at factor 1000 (551 s)
    //    where the star keeps the edge relation linear (33 s, identical
    //    components, same all-pairs oracle).
    //  - localCheckpoint per round (not a parquet stage): cuts lineage
    //    and caches executor-local blocks at a fraction of a filesystem
    //    round-trip. Tradeoff is fault-tolerance — a long-lived cluster
    //    job checkpoints to reliable storage every k rounds instead.
    //  - Loop width caps at 8 (labels/edges are bare-id tables tiny at
    //    test SF; at cluster scale width follows edge count — the
    //    shuffles are 16-byte rows). Widths.withWidth pins the loop's
    //    join width for the same reason.
    ccLabels(s, d)
      .select(col("id").as("doc_id"), col("comp").as("component"))
      .orderBy("doc_id")
  }

  /** Incremental dedup of a new batch against a historical corpus — the
    * every-day shape of a 100 TB training pipeline (yesterday's corpus
    * is deduped; only today's delta needs checking). The historical
    * side compresses to a broadcast Bloom filter over the 8-byte
    * fingerprint hash (~1.2 MB per 1M keys at 1% FPP — at trillion-key
    * corpus scale a single filter no longer broadcasts, and the same
    * pattern shards into per-key-range blooms co-partitioned with the
    * batch, or accepts a higher FPP since the anti-join confirms
    * exactly anyway), so:
    *  - batch rows the filter rejects are DEFINITELY new — kept with no
    *    join and no shuffle at all (the common case);
    *  - only the filter's positives (true dups + ~1% FP) reach the
    *    exact anti-join, shrinking its left side from |batch| to
    *    |hits|.
    * The output is exact — the Bloom filter only routes; the anti-join
    * confirms — and hash-matches the plain NOT IN oracle. (Spark's AQE
    * InjectRuntimeFilter does this same trick inside joins; here it is
    * explicit because the filter is worth persisting across daily runs.)
    * Fingerprint = first-3-token prefix (canonicalization stand-in);
    * dedup key travels as xxhash64 like d02 (collision p < 1e-13).
    * Split is doc_id parity so it holds at every SF. */
  val d08BloomIncremental: Q = Q(
    "d08_bloom_incremental",
    """WITH t AS (
      |  SELECT doc_id, source,
      |         array_to_string(string_split(text, ' ')[1:3], ' ') AS fp
      |  FROM documents)
      |SELECT doc_id, source FROM t
      |WHERE doc_id % 2 = 1
      |  AND fp NOT IN (SELECT fp FROM t WHERE doc_id % 2 = 0)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val keyed = docs(s, d).select(col("doc_id"), col("source"),
      xxhash64(concat_ws(" ", slice(toks, 1, 3))).as("h"))
    val hist = keyed.filter(pmod(col("doc_id"), lit(2)) === 0).select("h")
    val batch = keyed.filter(pmod(col("doc_id"), lit(2)) === 1)
    val bf = hist.stat.bloomFilter("h", math.max(hist.count(), 1L), 0.01)
    // Scalar closure UDF over one long — the documented seam for a
    // driver-built sketch (same status as u01-u03); everything heavy
    // stays in codegen'd exprs around it.
    val mightContain = udf((x: Long) => bf.mightContain(x))
    val definitelyNew = batch.filter(!mightContain(col("h")))
    val confirmed = batch.filter(mightContain(col("h")))
      .join(hist, Seq("h"), "left_anti")
    definitelyNew.select("doc_id", "source")
      .unionByName(confirmed.select("doc_id", "source"))
      .orderBy("doc_id")
  }

  /** Typed rows for the d09 cogroup (object-level so Encoders derive). */
  case class BatchDoc(doc_id: Long, source: String, h: Long, shard: Int)
  case class ShardBloom(shard: Int, bf: Array[Byte])

  /** Beyond-broadcast incremental dedup — the design d08's scaladoc only
    * documents, demonstrated (VERDICT r5 #2): when the historical corpus
    * is too big for ONE bloom filter to broadcast (trillion-key scale),
    * shard it by key range and co-partition the filters WITH the batch:
    *
    *  1. per-shard blooms are built DISTRIBUTIVELY by the graft_bloom
    *     TypedImperativeAggregate (no driver-side stat.bloomFilter
    *     collect, unlike d08) — one fixed-size bit-array buffer per
    *     shard, OR-merged map-side like any partial agg;
    *  2. batch and filters cogroup on shard = pmod(h, S): each task gets
    *     ONE shard's filter plus exactly the batch rows that filter can
    *     answer for, deserializes it ONCE, and routes its rows — no
    *     filter ever crosses the broadcast budget, no row meets a
    *     foreign shard's filter;
    *  3. bloom hits (true dups + ~fpp FPs) go to the exact per-key
    *     anti-join confirm; misses are definitely new. Output exact,
    *     same NOT-IN oracle as d08.
    *
    * The price vs d08 is one shuffle of the batch by shard — the honest
    * cost of beyond-broadcast scale (d08 stays the right plan while one
    * filter fits). Filter capacity is a LITERAL (a persisted corpus stat
    * in production): oversizing wastes bits, undersizing raises FPP, and
    * neither affects correctness because the anti-join confirms exactly. */
  val d09ShardedBloom: Q = Q(
    "d09_sharded_bloom",
    """WITH t AS (
      |  SELECT doc_id, source,
      |         array_to_string(string_split(text, ' ')[1:3], ' ') AS fp
      |  FROM documents)
      |SELECT doc_id, source FROM t
      |WHERE doc_id % 2 = 1
      |  AND fp NOT IN (SELECT fp FROM t WHERE doc_id % 2 = 0)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.functions.BloomFilterAgg.register(s)
    import s.implicits._
    val S = 8
    val keyed = docs(s, d).select(col("doc_id"), col("source"),
      xxhash64(concat_ws(" ", slice(toks, 1, 3))).as("h"))
    val shard = pmod(col("h"), lit(S)).cast("int").as("shard")
    // Pinned: hist feeds BOTH the bloom build and the exact-confirm
    // anti-join — without the pin each consumer re-runs the full
    // documents scan + tokenize + hash.
    val hist = Stage.materialize(s,
      keyed.filter(pmod(col("doc_id"), lit(2)) === 0).select(col("h"), shard), "d09hist")
    val batch = keyed.filter(pmod(col("doc_id"), lit(2)) === 1).withColumn("shard", shard)
    val blooms = hist.groupBy("shard")
      .agg(expr("graft_bloom(h, CAST(65536 AS BIGINT), CAST(0.01 AS DOUBLE))").as("bf"))
    val routed = batch.select("doc_id", "source", "h", "shard").as[BatchDoc]
      .groupByKey(_.shard)
      .cogroup(blooms.as[ShardBloom].groupByKey(_.shard)) { (_, rows, bfs) =>
        val bf = bfs.nextOption().map(b => org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(b.bf)))
        rows.map(r => (r.doc_id, r.source, r.h, bf.exists(_.mightContain(r.h))))
      }.toDF("doc_id", "source", "h", "hit")
    // Pinned so the hit/miss split scans the cogroup once, not per branch.
    val pinned = Stage.materialize(s, routed, "d09routed")
    val definitelyNew = pinned.filter(!col("hit"))
    val confirmed = pinned.filter(col("hit"))
      .join(hist.select("h"), Seq("h"), "left_anti")
    definitelyNew.select("doc_id", "source")
      .unionByName(confirmed.select("doc_id", "source"))
      .orderBy("doc_id")
  }

  /** SEMANTIC dedup (SemDeDup, Abbas et al. 2023 — the embedding-space
    * dedup every modern pre-training corpus runs after the lexical
    * passes d01-d09): cluster embeddings, then drop any item whose
    * cosine to an EARLIER item in the same cluster exceeds τ — catching
    * paraphrases and re-encodings that share no n-grams at all. The
    * cluster step makes it scale: pairwise comparison happens only
    * WITHIN a cell, and k grows with the corpus so cells stay
    * bounded — pair volume is Σ|cell|², not N² (the same
    * never-all-pairs contract as the rest of this module).
    * k = greatest(8, N div 256) keeps the EXPECTED cell at ~256
    * members at every scale — the round-10 sf10 run caught the
    * original fixed k=8 turning this entry quadratic (92× wall on
    * 10× data at the 100× step), the exact failure mode SemDeDup's
    * own k ∝ N prescription exists to prevent. With k ∝ N a FLAT
    * assignment scan is itself O(N·k) = O(N²/256), and ANY fixed-depth
    * quantizer tree keeps a polynomial residue (depth D costs
    * N·D·k^(1/D): the round-10 three-level rung measured 11.2× per
    * decade at sf100 from its k^(1/3) term). Assignment now descends a
    * LOG-DEPTH stride tree with branching factor b=32: live fine
    * cells are ranked (row_number by cell id, a k-row window) and
    * level j keeps the cells whose rank is divisible by 32^j — NESTED
    * level sets (⌈k/32^j⌉ members each) up to the first level with
    * ≤32 members, depth L = ⌈log₃₂k⌉−1 (3 levels at sf100, 4 at
    * sf1000; 32^j = 2^{5j} is exact in a double, so the oracle's
    * power-cast carries no cross-engine ulp hazard). Each level-j cell
    * takes one parent edge: the argmin level-(j+1) member by negative
    * cosine −c·p/|p| (a member of both levels is always its own
    * parent — cos>1 is impossible — so descent paths are consistent).
    * A vector probes the ≤32 top cells, then at each level only its
    * parent's children: b·(L+1) ≈ 32·log₃₂k distances instead of
    * 3∛k — the assignment term drops from Θ(N^{4/3}) to Θ(N·log N),
    * +32 dots per decade instead of ×2.15, putting the entry on the
    * linear tier's ladder (the Σ|cell|² pair stage, ~128 dots/vector,
    * dominates at every scale). b = 32 is a MEASURED choice, not a
    * free parameter: per-level fanout is what discriminates CORRELATED
    * mass (ScaleUp replicas share geometry, so same-replica vectors
    * make the same choice wherever their own centroids are absent —
    * and upper levels hold fewer centroids than the corpus holds
    * replicas). At sf100, b=8 funneled whole replicas down shared
    * paths (max cell 33,381, Σ|cell|² = 7.6 B — 3.8× the three-level's
    * 2.0 B; identical under squared-distance and cosine keys, so the
    * tree SHAPE, not the metric, was the bend), and replacing argmin
    * edges with structurally-balanced rank blocks made it WORSE
    * (29.5 B): blocks pin every fanout at exactly b but destroy
    * parent-child geometric coherence, and a leaf's mass is set by
    * where correlated groups split, not by fanout arithmetic. b=32
    * restores the ~20-way-per-level discrimination the three-level
    * tree measured 2.0 B with, while keeping the depth logarithmic.
    * The level count is data-dependent,
    * so the oracle's fixed text expresses the descent as a RECURSIVE
    * CTE (the d07/p06 discipline) — one UNION ALL step per level,
    * terminating at j=0 — while the engine runs a driver loop with one
    * [[graft.Stage.materialize]] pin per level (the p05 iterative
    * discipline: state is (vec_id, cell) longs, the vector table is
    * re-joined co-partitioned on vec_id each step, never carried
    * through the pin). Parent edges are flat argmins over the next
    * level (Σ_j ⌈k/32^j⌉·⌈k/32^{j+1}⌉ ≈ k²/32 centroid-pair dots —
    * subdominant to the N·256 pair stage until k ≈ N/256 crosses
    * ~10^5, i.e. corpus ≈ 10 TB; past that the edge step itself
    * descends the already-built upper tree, the documented refinement).
    * Every argmin is the native [[graft.functions.ArgMinLong]] hash
    * aggregate on the exploded stream — flat codegen'd buffer,
    * map-side partial aggregation, so no expansion ever crosses the
    * wire — ranking by negative cosine −v·c/|c| (|v| is constant per
    * group so it divides out; both engines rank by the same reduced
    * expression, so fp ties agree), lexicographic (key, cell)
    * tie-break.
    * CENTROID SELECTION must be a hash-uniform sample, not an id
    * prefix or stride: ids are replica-sparse, so a prefix lands
    * entirely in replica 0 and every other replica funnels into a
    * handful of cells (measured at sf100 before the fix: 2,000 live
    * cells, max 34,073, Σ|cell|² = 15.2 B). bucket = md5₃₂(id) % k,
    * centroid = the bucket's (h, id)-min member — one
    * map-side-combining min per bucket, the d06/d11 portable-hash
    * discipline, so DuckDB picks the identical set.
    * At extreme scale the broadcast centroid set itself outgrows the
    * driver — that regime shards the centroid table and the coarse
    * probe becomes v07's partition-pruned join. Keep-lowest-id is the
    * deterministic survivor policy (SemDeDup keeps a centroid-nearest
    * representative; id order is the reproducible analog). Every
    * distance is the proven cross-engine fold, so cells, duplicate
    * pairs, and survivor counts all hash-match the
    * all-pairs-within-cell oracle. */
  val d10SemanticDedup: Q = Q(
    "d10_semantic_dedup",
    """WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |nn AS (SELECT COUNT(*) AS n FROM e),
      |kk AS (SELECT GREATEST(8, n // 256) AS k FROM nn),
      |ll AS (SELECT MIN(j) AS lmax FROM range(0, 12) r(j), kk
      |       WHERE kk.k <= CAST(power(32, j + 1) AS BIGINT)),
      |bb AS (SELECT vec_id,
      |         ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS h
      |       FROM e),
      |bc AS (SELECT vec_id, h, h % kk.k AS cell FROM bb, kk),
      |mh AS (SELECT cell, MIN(h) AS mh FROM bc GROUP BY cell),
      |win AS (SELECT bc.cell, MIN(bc.vec_id) AS cvid FROM bc
      |        JOIN mh ON bc.cell = mh.cell AND bc.h = mh.mh GROUP BY bc.cell),
      |c0 AS (SELECT win.cell, e.v AS c, list_dot_product(e.v, e.v) AS cn
      |       FROM win JOIN e ON e.vec_id = win.cvid),
      |rk AS (SELECT cell, c, cn, row_number() OVER (ORDER BY cell) - 1 AS r FROM c0),
      |lv AS (SELECT j, cell, c, cn FROM rk, ll, range(0, 12) q(j)
      |       WHERE j <= ll.lmax AND r % CAST(power(32, j) AS BIGINT) = 0),
      |ed AS (SELECT j, cell, parent FROM (
      |   SELECT ch.j, ch.cell, pa.cell AS parent,
      |     row_number() OVER (PARTITION BY ch.j, ch.cell ORDER BY
      |       (pa.cell <> ch.cell),
      |       (-list_dot_product(ch.c, pa.c) / sqrt(pa.cn)), pa.cell) AS rn
      |   FROM lv ch JOIN lv pa ON pa.j = ch.j + 1) WHERE rn = 1),
      |dsc AS (
      |  SELECT vec_id, v, j, cell FROM (
      |    SELECT e.vec_id, e.v, lv.j, lv.cell,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        (-list_dot_product(e.v, lv.c) / sqrt(lv.cn)), lv.cell) AS rn
      |    FROM e, lv, ll WHERE lv.j = ll.lmax) WHERE rn = 1
      |  UNION ALL
      |  SELECT vec_id, v, j, cell FROM (
      |    SELECT d.vec_id, d.v, ch.j, ch.cell,
      |      row_number() OVER (PARTITION BY d.vec_id ORDER BY
      |        (-list_dot_product(d.v, ch.c) / sqrt(ch.cn)), ch.cell) AS rn
      |    FROM dsc d
      |    JOIN ed ON ed.j = d.j - 1 AND ed.parent = d.cell
      |    JOIN lv ch ON ch.j = ed.j AND ch.cell = ed.cell
      |    WHERE d.j > 0) WHERE rn = 1),
      |a1 AS (SELECT vec_id, v, cell FROM dsc WHERE j = 0),
      |dups AS (SELECT DISTINCT a.vec_id AS i FROM a1 a JOIN a1 b
      |   ON a.cell = b.cell AND b.vec_id < a.vec_id
      |   WHERE list_cosine_similarity(a.v, b.v) > 0.35)
      |SELECT cell, COUNT(*) AS n_members,
      |  COUNT(*) FILTER (WHERE vec_id NOT IN (SELECT i FROM dups)) AS n_kept
      |FROM a1 GROUP BY cell ORDER BY cell""".stripMargin) { (s, d) =>
    import graft.functions.ArgMinLong.argmin
    import org.apache.spark.sql.expressions.Window
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    graft.plans.RewriteHofDotProduct.register(s)
    val e = Tables.t(s, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // dimension scalars, all integer-derived so both engines branch
    // identically: k fine cells, depth lmax = smallest j with
    // k ≤ 32^(j+1) (32^j = 2^(5j) is EXACT in a double, so the
    // power-cast carries no cross-engine ulp hazard). One count job;
    // the scalars drive the level loop below.
    val n = e.count()
    val k = math.max(8L, n / 256)
    def pow32(j: Int): Long = 1L << (5 * j)
    val lmax = (0 to 12).find(j => k <= pow32(j + 1)).get
    val hb = e.select(col("vec_id"),
        conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .select(col("vec_id"), col("h"), (col("h") % k).as("cell"))
    val win = hb.groupBy("cell")
      .agg(min(struct(col("h"), col("vec_id"))).as("w"))
      .select(col("cell"), col("w").getField("vec_id").as("cvid"))
    // fine centroid table, with |c|^2 precomputed once and the level
    // rank r: a k-row single-partition window — centroid-sized, never
    // N-scaled. Pinned: every level filter and edge build below reads
    // it, and without the pin each reader re-runs the corpus scan +
    // hash-min (the d09 lesson).
    val c0 = Stage.materialize(s,
      e.join(broadcast(win), col("vec_id") === col("cvid"))
        .select(col("cell"), col("v").as("c"), dot(col("v"), col("v")).as("cn"))
        .withColumn("r", row_number().over(Window.orderBy("cell")).cast("long") - 1),
      "d10c0")
    def level(j: Int) = c0.filter(col("r") % pow32(j) === 0)
    // parent edges, level j -> j+1: flat argmin over the next level's
    // centroids (both sides centroid-sized; see scaladoc for the k²/b
    // accounting). A cell present at both levels self-parents — its
    // self-score -|c| is the strict minimum whenever every other parent
    // has cos < 1, and for EXACT ties (bit-identical duplicate centroid
    // vectors, plausible in a dedup fixture) self is preferred
    // explicitly (-Inf ord; oracle mirrors with a `pa.cell <> ch.cell`
    // primary rank key). Without that, a tie could parent a cell away
    // from itself, leaving a parent with zero children and silently
    // dropping its vectors through the inner-join descent — identically
    // on both engines, so the oracle alone could not catch it
    // (QuantizerSpec pins the no-drop invariant on a tie fixture).
    def edges(j: Int) = level(j)
      .crossJoin(broadcast(level(j + 1)
        .select(col("cell").as("pcell"), col("c").as("pc"), col("cn").as("pcn"))))
      .groupBy("cell")
      .agg(argmin(when(col("pcell") === col("cell"),
          lit(Double.NegativeInfinity))
          .otherwise(-dot(col("c"), col("pc")) / sqrt(col("pcn"))),
        col("pcell")).as("parent"))
    // descent: the ≤32 top cells exhaustively, then each level only the
    // current parent's children — b·(L+1) dots per vector. State is
    // (vec_id, cell) longs, pinned per level; the vector table is
    // re-joined co-partitioned on vec_id each step.
    val top = level(lmax)
    var a = Stage.materialize(s,
      e.crossJoin(broadcast(top))
        .groupBy("vec_id")
        .agg(argmin(-dot(col("v"), col("c")) / sqrt(col("cn")),
          col("cell")).as("cell")),
      s"d10a$lmax")
    for (j <- lmax - 1 to 0 by -1) {
      val cand = edges(j).join(level(j), "cell")
        .select(col("parent"), col("cell"), col("c"), col("cn"))
      a = Stage.materialize(s,
        e.join(a.select(col("vec_id"), col("cell").as("pcell")), "vec_id")
          .join(broadcast(cand), col("pcell") === col("parent"))
          .groupBy("vec_id")
          .agg(argmin(-dot(col("v"), col("c")) / sqrt(col("cn")),
            col("cell")).as("cell")),
        s"d10a$j")
    }
    val cells = Stage.materialize(s,
      e.join(a, "vec_id")
        .select(col("vec_id"), col("v"), col("cell"),
          sqrt(dot(col("v"), col("v"))).as("nrm")),
      "d10cells")
    // pair stage: norms precomputed per vector above; dot/(ni*nj) is
    // bit-identical to the sqrt(dot)*sqrt(dot) denominator it replaces
    val a2 = cells.select(col("cell"), col("vec_id").as("i"),
      col("v").as("vi"), col("nrm").as("ni"))
    val b2 = cells.select(col("cell"), col("vec_id").as("j"),
      col("v").as("vj"), col("nrm").as("nj"))
    val cos = least(greatest(
      dot(col("vi"), col("vj")) / (col("ni") * col("nj")), lit(-1.0)), lit(1.0))
    val dups = a2.join(b2, Seq("cell"))
      .filter(col("j") < col("i") && cos > 0.35)
      .select(col("i").as("vec_id")).distinct()
    val kept = cells.join(dups, Seq("vec_id"), "left_anti")
      .groupBy("cell").agg(count(lit(1)).as("n_kept"))
    cells.groupBy("cell").agg(count(lit(1)).as("n_members"))
      .join(kept, Seq("cell"), "left")
      .select(col("cell"), col("n_members"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("cell")
  }

  /** Canonical-representative selection — the step a dedup pipeline
    * runs AFTER clustering (d07): each component keeps exactly one
    * document, chosen by QUALITY rather than by arbitrary min-id —
    * here the type-token ratio (p01's quality criterion), ties to the
    * lower doc_id. Composes the d07 component computation verbatim
    * (its fn is reused directly — the catalog entries are building
    * blocks, not silos), joins the per-doc score, and takes the
    * row_number()=1 representative per component — which the
    * AutoLocalTopK rule prunes with bounded heaps below the exchange.
    * Scale shape: components and scores are (id, number) pairs; doc
    * text is touched only in the scoring scan. Oracle: d07's
    * recursive-CTE components extended with the same score + window. */
  val d12CanonicalSelect: Q = Q(
    "d12_canonical_select",
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |p AS (
      |  SELECT doc_id, array_to_string(toks[1:3], ' ') AS pre,
      |         array_to_string(toks[-3:], ' ') AS suf FROM t),
      |e0 AS (
      |  SELECT a.doc_id AS u, b.doc_id AS v FROM p a
      |    JOIN p b ON a.pre = b.pre AND a.doc_id < b.doc_id
      |  UNION
      |  SELECT a.doc_id, b.doc_id FROM p a
      |    JOIN p b ON a.suf = b.suf AND a.doc_id < b.doc_id),
      |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.id),
      |comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id),
      |q AS (SELECT doc_id,
      |        len(list_distinct(string_split(text, ' '))) /
      |          len(string_split(text, ' ')) AS ttr
      |      FROM documents),
      |sz AS (SELECT component, COUNT(*) AS n_docs FROM comp GROUP BY component),
      |r2 AS (SELECT comp.component, comp.doc_id, q.ttr, row_number() OVER (
      |         PARTITION BY comp.component ORDER BY q.ttr DESC, comp.doc_id) AS rn
      |       FROM comp JOIN q USING (doc_id))
      |SELECT r2.component, sz.n_docs, r2.doc_id AS rep_doc_id, r2.ttr AS rep_ttr
      |FROM r2 JOIN sz USING (component)
      |WHERE rn <= 1 ORDER BY component""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val comp = d07CcClusters.fn(s, d).select("doc_id", "component")
    val q = docs(s, d).select(col("doc_id"),
      (size(array_distinct(toks)) / size(toks)).as("ttr"))
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("component").orderBy(col("ttr").desc, col("doc_id"))
    // lookup sides ride ccLookup (r13 SMJ sweep): q and sizes are
    // |V|-row lean tables — broadcast under the node budget, hashed
    // above it, never a |V|-row sort
    val nDocs = docs(s, d).count()
    comp.join(ccLookup(nDocs)(q), "doc_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1)
      .join(ccLookup(nDocs)(sizes), "component")
      .select(col("component"), col("n_docs"),
        col("doc_id").as("rep_doc_id"), col("ttr").as("rep_ttr"))
      .orderBy("component")
  }

  /** Exact shared-substring detection — the ExactSubstr dedup of
    * "Deduplicating Training Data Makes Language Models Better" (Lee et
    * al., ACL 2022), re-expressed relationally: find every doc pair
    * sharing a VERBATIM run of >= 20 consecutive tokens. Suffix arrays
    * don't distribute; seed-and-chain does:
    *  1. seeds — overlapping token 8-grams, reduced to xxhash64 ids at
    *     the scan (d05's strings-never-travel rule);
    *  2. stop-seed cap — seeds in 2..64 docs survive (df=1 can't match;
    *     df>64 is boilerplate whose pair blowup is quadratic — the same
    *     discipline real ExactSubstr deploys, applied in BOTH engines so
    *     the semantics is explicit: a span every one of whose 8-windows
    *     is ultra-common is out of scope);
    *  3. chain — a shared span of length R+7 tokens is exactly R
    *     consecutive seed matches on one DIAGONAL (pa - pb constant), so
    *     max-span per pair is an island count: row_number along pa
    *     within (i,j,diag), group on pa - rn. No extension probing, no
    *     text re-reads — the classic O(matches) collinear-seed chain.
    * Scale shape: the only data-sized shuffles key on the seed hash (df
    * count + candidate join); match volume is df-capped per seed, and
    * the window/aggs downstream run on match rows only (thousands per
    * million docs). The 0-based/1-based pos difference vs the oracle is
    * invisible: diagonals and islands depend on pos DIFFERENCES only. */
  val d13SubstringSpan: Q = Q(
    "d13_substring_span",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |g AS (SELECT doc_id, i AS pos, list_reduce(toks[i:i+7], (a, b) -> a || ' ' || b) AS gr
      |      FROM t, unnest(range(1, len(toks) - 6)) AS u(i) WHERE len(toks) >= 8),
      |dfc AS (SELECT gr, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gr),
      |m AS (SELECT a.doc_id AS i, b.doc_id AS j, a.pos AS pa, a.pos - b.pos AS diag
      |      FROM g a JOIN g b ON a.gr = b.gr AND a.doc_id < b.doc_id
      |      WHERE a.gr IN (SELECT gr FROM dfc WHERE df BETWEEN 2 AND 64)),
      |r AS (SELECT i, j, diag, pa,
      |        pa - ROW_NUMBER() OVER (PARTITION BY i, j, diag ORDER BY pa) AS island
      |      FROM m),
      |runs AS (SELECT i, j, COUNT(*) + 7 AS span FROM r GROUP BY i, j, diag, island)
      |SELECT i, j, MAX(span) AS max_span FROM runs
      |GROUP BY i, j HAVING MAX(span) >= 20 ORDER BY i, j""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val k = 8
    val toksDf = Stage.materialize(s,
      docs(s, d).select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= k),
      "d13toks")
    val t = col("toks")
    val grams = transform(
      sequence(lit(1), size(t) - (k - 1)),
      i => xxhash64(concat_ws(" ", (0 until k).map(o => element_at(t, i + o)): _*)))
    val g = Stage.materialize(s,
      toksDf.select(col("doc_id"), posexplode(grams).as(Seq("pos", "gh"))),
      "d13g")
    // two-level df (per-(seed,doc) partial first): no count-distinct
    // expansion, both aggs map-side-combine on the seed key
    val dfc = g.groupBy("gh", "doc_id").agg(count(lit(1)).as("occ"))
      .groupBy("gh").agg(count(lit(1)).as("df"))
    // Both gram joins are shuffled-HASH (r13 SMJ sweep): the df lookup
    // sorted the FULL corpus gram stream (one row per token) to keep the
    // df-2..64 survivors, and the seed self-join sorted both survivor
    // streams for a df-capped match volume. Rows are lean (gh + doc_id
    // + pos, 24 B) — the d04 regime, not d03's fat-row one; A/B in
    // SCALE.md's r13 table.
    val seeds = g.join(dfc.filter(col("df").between(2, 64)).hint("shuffle_hash"), "gh")
    val m = seeds.hint("shuffle_hash").as("a").join(seeds.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.pos").as("pa"), (col("a.pos") - col("b.pos")).as("diag"))
    val w = Window.partitionBy("i", "j", "diag").orderBy("pa")
    m.withColumn("island", col("pa") - row_number().over(w))
      .groupBy("i", "j", "diag", "island")
      .agg((count(lit(1)) + lit(k - 1).cast("long")).as("span"))
      .groupBy("i", "j").agg(max(col("span")).as("max_span"))
      .filter(col("max_span") >= 20)
      .orderBy("i", "j")
  }

  /** LSH-dedup INDEX EVALUATION — v17/v18's swap-the-index discipline
    * brought to the dedup family: measure the banded-MinHash candidate
    * predicate (d06's portable 8-hash signature, 4 bands × 2 rows)
    * against exact token-set-Jaccard ground truth, as one oracle-checked
    * query. Truth is Jaccard ≥ 0.9 stated integer-exactly
    * (10·|A∩B| ≥ 9·|A∪B| — no division anywhere), and the band
    * predicate is evaluated directly on the pair frame (∃ band i with
    * both hash slots equal), so the counts decompose the confusion
    * matrix: truth, candidates, hits (recall numerator), false alarms
    * (wasted verification work). Theory says a band of 2 rows catches a
    * 0.9-Jaccard pair with 1−(1−0.9²)⁴ ≈ 0.999 probability; the entry
    * measures what this corpus actually gets. The evaluation runs on a
    * FIXED 300-doc probe sample (constant work at any corpus scale —
    * exactly how production monitors index quality; the all-pairs truth
    * is only ever computed on the sample), broadcast so the pair frame
    * is a broadcast NLJ, never a shuffled cartesian. */
  val d14LshEval: Q = Q(
    "d14_lsh_eval",
    {
      val bandEq = (0 until 4).map(b =>
        s"(a.m${2 * b} = b.m${2 * b} AND a.m${2 * b + 1} = b.m${2 * b + 1})")
        .mkString("(", " OR ", ")")
      val mins = (0 until 8).map(i =>
        s"    list_min(list_transform(toks, t -> ('0x' || substr(md5('$i:' || t), 1, 8))::BIGINT)) AS m$i")
        .mkString(",\n")
      s"""WITH t AS (
         |  SELECT doc_id, toks,
         |$mins
         |  FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
         |        FROM documents WHERE doc_id < 300)),
         |p AS (
         |  SELECT len(list_intersect(a.toks, b.toks)) AS i,
         |    len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS u,
         |    $bandEq AS cand
         |  FROM t a JOIN t b ON a.doc_id < b.doc_id)
         |SELECT COUNT(*) AS n_pairs,
         |  COUNT(*) FILTER (10*i >= 9*u) AS n_truth,
         |  COUNT(*) FILTER (cand) AS n_cand,
         |  COUNT(*) FILTER (cand AND 10*i >= 9*u) AS n_hit,
         |  COUNT(*) FILTER (cand AND 10*i < 9*u) AS n_false_alarm
         |FROM p""".stripMargin
    }) { (s, d) =>
    val toksDistinct = array_distinct(toks)
    val minCols = (0 until 8).map(i =>
      array_min(transform(col("toks"), t =>
        conv(substring(md5(concat(lit(s"$i:"), t)), 1, 8), 16, 10).cast("long"))).as(s"m$i"))
    val t = docs(s, d)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), toksDistinct.as("toks"))
      .select(col("doc_id") +: col("toks") +: minCols: _*)
    val bandEq = (0 until 4).map(b =>
      col(s"a.m${2 * b}") === col(s"b.m${2 * b}") &&
        col(s"a.m${2 * b + 1}") === col(s"b.m${2 * b + 1}"))
      .reduce(_ || _)
    val inter = size(array_intersect(col("a.toks"), col("b.toks")))
    val pairs = t.as("a")
      .join(broadcast(t.as("b")), col("a.doc_id") < col("b.doc_id"))
      .select(inter.as("i"),
        (size(col("a.toks")) + size(col("b.toks")) - inter).as("u"),
        bandEq.as("cand"))
    pairs.agg(
      count(lit(1)).as("n_pairs"),
      count(when(lit(10) * col("i") >= lit(9) * col("u"), 1)).as("n_truth"),
      count(when(col("cand"), 1)).as("n_cand"),
      count(when(col("cand") && lit(10) * col("i") >= lit(9) * col("u"), 1)).as("n_hit"),
      count(when(col("cand") && lit(10) * col("i") < lit(9) * col("u"), 1)).as("n_false_alarm"))
  }

  /** SOFT dedup — per-document sampling weights instead of hard drops
    * (the alternative modern curation pipelines use when duplicates carry
    * signal: keep every copy, down-weight each to 1/|dup group| so the
    * group contributes one document's worth of expected mass to
    * training). Groups are d07's NEAR-dup connected components (exact
    * dups are a strict subset), so Σ weight = #components — the
    * invariant a downstream sampler relies on.
    *
    * Shape at scale: rides ccLabels (star-expansion edges + O(log d)
    * pointer jumping — see d07), then ONE O(#components)-keyed hash-agg
    * for sizes and one co-partitioned join back on the same 8-byte
    * component key. The weight is a single correctly-rounded int/int
    * division — deterministic across engines. */
  val d15SoftDedupWeights: Q = Q(
    "d15_soft_dedup_weights",
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |p AS (
      |  SELECT doc_id, array_to_string(toks[1:3], ' ') AS pre,
      |         array_to_string(toks[-3:], ' ') AS suf FROM t),
      |e0 AS (
      |  SELECT a.doc_id AS u, b.doc_id AS v FROM p a
      |    JOIN p b ON a.pre = b.pre AND a.doc_id < b.doc_id
      |  UNION
      |  SELECT a.doc_id, b.doc_id FROM p a
      |    JOIN p b ON a.suf = b.suf AND a.doc_id < b.doc_id),
      |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.id),
      |comp AS (
      |  SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id),
      |sz AS (
      |  SELECT component, COUNT(*) AS group_size FROM comp GROUP BY component)
      |SELECT c.doc_id, c.component, sz.group_size,
      |  CAST(1 AS DOUBLE) / sz.group_size AS weight
      |FROM comp c JOIN sz USING (component)
      |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
    val comp = ccLabels(s, d)
      .select(col("id").as("doc_id"), col("comp").as("component"))
    val sz = comp.groupBy("component").agg(count(lit(1)).as("group_size"))
    comp.join(sz, "component")
      .select(col("doc_id"), col("component"), col("group_size"),
        (lit(1.0) / col("group_size")).as("weight"))
      .orderBy("doc_id")
  }

  /** C4-style line-level corpus dedup (Raffel et al. 2020 §2.2 drop every
    * occurrence of any "line" repeated >= 3 times corpus-wide; reference
    * has no sub-document dedup — this is the LLM-pipeline north-star op
    * that removed ~20% of C4's raw text as boilerplate). The corpus here
    * has no newlines, so a "line" is a fixed 3-token span (i = 1, 4, 7, …
    * over the whitespace tokens — the plumbing is identical to real line
    * splits, only the delimiter is synthetic; at sf0.01 ~9% of spans are
    * hot, so the drop path is genuinely exercised).
    *
    * Scale shape — two corpus passes, NEITHER shuffles document text:
    *  1. count pass: explode spans AS 8-BYTE xxhash64 keys only; hash-agg
    *     with map-side combine — the shuffle moves ints, not strings;
    *  2. rewrite pass: the hot-span set (distinct lines repeated >= 3x —
    *     boilerplate, a tiny distinct set even on huge corpora) collapses
    *     to ONE array row and broadcasts; each doc then drops its hot
    *     spans with a per-row higher-order filter(...) — no explode, no
    *     join, no shuffle on the fact side; reassembly is array_join in
    *     the SAME row, so document order never needs a groupBy to restore.
    * If the hot set ever outgrows a broadcast, the degraded plan is a
    * left-anti join on the 8-byte hash — still never the text. A cold->hot
    * hash collision would drop a good span (P ~ n_cold*n_hot/2^64); the
    * oracle counts the strings themselves, so any collision surfaces as a
    * hash mismatch — none occurs.
    *
    * The hot-set PROBE went through three generations, each a measured
    * scale lesson (this corpus's 40-word vocabulary makes the set
    * corpus-proportional — ~50k spans at sf0.1, 2.6M at sf10 — where
    * real corpora have boilerplate-sized sets, so it stress-tests the
    * probe deliberately):
    *  1. array_contains over a broadcast-joined array column: LINEAR
    *     scan, O(spans × |set|) — 77 s at sf0.1.
    *  2. [[graft.functions.SortedLongContains]] binary search over the
    *     same column: O(spans × log) — 3.6 s at sf0.1 — but the set
    *     still rides the ROW SCHEMA, and because the HOF lambda blocks
    *     codegen, the nested-loop join's interpreted path memcpys the
    *     whole set into every materialized row: rows × |set| BYTES —
    *     207 s at sf10 with a 21 MB set, the array_contains disease
    *     reborn one layer down.
    *  3. [[graft.functions.BroadcastSortedContains]]: the set lives in
    *     a Spark BROADCAST, off-row; no join exists at all. The driver
    *     materializes it once, BOUNDED by spark.graft.d16.hotBroadcastMax
    *     (default 4M entries = 32 MB); beyond the budget the entry
    *     switches to the anti-join form: span hashes explode with their
    *     positions, anti-join the hot table ((id, pos, hash) ints only),
    *     kept positions re-aggregate per doc and ONE co-partitioned join
    *     reassembles against the chunks — the only text-bearing shuffle
    *     in either path, paid only when the set outgrows any broadcast.
    *
    * The triple reference to `kept` re-evaluates the cheap lambda after
    * CollapseProject inlines it — deliberate: pinning a corpus-wide
    * stage to save a per-row filter is the wrong trade at 100 TB. */
  val d16LineDedup: Q = Q(
    "d16_line_dedup",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |ch AS (SELECT doc_id, i, array_to_string(toks[i:i+2], ' ') AS chunk
      |       FROM t, unnest(range(1, len(toks) + 1, 3)) u(i)),
      |f AS (SELECT doc_id, i, chunk,
      |        count(*) OVER (PARTITION BY chunk) AS cnt FROM ch)
      |SELECT doc_id,
      |  string_agg(chunk, ' ' ORDER BY i) FILTER (WHERE cnt < 3) AS clean_text,
      |  count(*) FILTER (WHERE cnt < 3) AS n_kept,
      |  count(*) FILTER (WHERE cnt >= 3) AS n_dropped
      |FROM f GROUP BY doc_id
      |HAVING count(*) FILTER (WHERE cnt < 3) > 0
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    def spans(c: Column): Column = transform(
      sequence(lit(1), size(c), lit(3)),
      i => concat_ws(" ", slice(c, i, lit(3))))
    // Layout.widen: the rewrite pass is deliberately shuffle-free, so its
    // parallelism IS the scan's split count — a single-row-group fixture
    // file would run the whole corpus rewrite on one core (21 min at
    // sf10, measured). One guarded repartition when the layout
    // under-splits; no-op on a real multi-file corpus.
    val base = graft.Layout.widen(s,
      docs(s, d).select(col("doc_id"), spans(toks).as("chunks")))
    val hot = Stage.materialize(s, base
      .select(explode(col("chunks")).as("chunk"))
      .select(xxhash64(col("chunk")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 3)
      .select(col("h")), "d16hot")
    val budget = s.conf.getOption("spark.graft.d16.hotBroadcastMax")
      .map(_.toLong).getOrElse(4000000L)
    if (hot.count() <= budget) {
      // broadcast path: the set lives OFF-ROW in a Spark broadcast — no
      // join, so no plan boundary can ever copy it per row
      val sorted = hot.collect().map(_.getLong(0))
      java.util.Arrays.sort(sorted)
      val bc = s.sparkContext.broadcast(sorted)
      def hotContains(v: Column): Column =
        org.apache.spark.sql.GraftPlanShim.column(
          graft.functions.BroadcastSortedContains(bc,
            org.apache.spark.sql.GraftPlanShim.expression(v)))
      val kept = filter(col("chunks"), c => not(hotContains(xxhash64(c))))
      base.select(col("doc_id"),
          array_join(kept, " ").as("clean_text"),
          size(kept).cast("long").as("n_kept"),
          (size(col("chunks")) - size(kept)).cast("long").as("n_dropped"))
        .filter(col("n_kept") > 0)
        .orderBy("doc_id")
    } else {
      // beyond-broadcast path: positions anti-join — every shuffle
      // before the final reassembly join moves (id, pos, hash) ints
      val keptPos = base
        .select(col("doc_id"), posexplode(col("chunks")).as(Seq("pos", "chunk")))
        .select(col("doc_id"), col("pos"), xxhash64(col("chunk")).as("h"))
        .join(hot, Seq("h"), "left_anti")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(col("pos"))).as("keep"))
      base.join(keptPos, Seq("doc_id"))
        .select(col("doc_id"),
          array_join(transform(col("keep"),
            p => element_at(col("chunks"), p + 1)), " ").as("clean_text"),
          size(col("keep")).cast("long").as("n_kept"),
          (size(col("chunks")) - size(col("keep"))).cast("long").as("n_dropped"))
        .filter(col("n_kept") > 0)
        .orderBy("doc_id")
    }
  }

  /** Leakage-safe train/val/test split — the eval-hygiene op q47's
    * per-document hash split cannot provide: hashing doc_id scatters the
    * members of a near-duplicate cluster independently, so ~1 −
    * (0.8² + 0.1² + 0.1²) = 34% of near-dup PAIRS straddle a split
    * boundary and the test set scores memorization, not generalization
    * (the train/test-overlap failure the decontamination entry t09
    * guards against for BENCHMARKS, applied to the corpus's own
    * near-dups). The fix is to hash the d07 CONNECTED COMPONENT, not
    * the document: every doc inherits its cluster's draw, so a cluster
    * lands wholly in one split by construction — zero straddling pairs,
    * spec-proven against the doc-hash baseline, same 80/10/10 md5
    * apportionment as q47 so the split stays engine-portable.
    *
    * Scale shape: the labels table is (8 B id, 8 B comp) rows off d07's
    * pointer-jumping loop — the join back to documents carries doc_id +
    * n_chars only (never text), and the per-split rollup is a 3-group
    * hash aggregate. Splitting cost is the clustering cost, which the
    * 1000× campaign already measured linear (SCALE.md d07). */
  val d17LeakageSplit: Q = Q(
    "d17_leakage_safe_split",
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |p AS (
      |  SELECT doc_id, array_to_string(toks[1:3], ' ') AS pre,
      |         array_to_string(toks[-3:], ' ') AS suf FROM t),
      |e0 AS (
      |  SELECT a.doc_id AS u, b.doc_id AS v FROM p a
      |    JOIN p b ON a.pre = b.pre AND a.doc_id < b.doc_id
      |  UNION
      |  SELECT a.doc_id, b.doc_id FROM p a
      |    JOIN p b ON a.suf = b.suf AND a.doc_id < b.doc_id),
      |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.id),
      |lab AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id),
      |sp AS (SELECT d.n_chars, lab.component,
      |    ('0x' || substr(md5(CAST(lab.component AS VARCHAR)), 1, 8))::BIGINT % 100 AS pct
      |  FROM documents d JOIN lab USING (doc_id))
      |SELECT CASE WHEN pct < 80 THEN 'train' WHEN pct < 90 THEN 'val' ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs, COUNT(DISTINCT component) AS n_components,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM sp GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
    val pct = conv(substring(md5(col("component").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    // the labels lookup is |V|-row lean — ccLookup (r13 SMJ sweep)
    docs(s, d).select("doc_id", "n_chars")
      .join(ccLookup(docs(s, d).count())(ccLabels(s, d)
          .select(col("id").as("doc_id"), col("comp").as("component"))),
        Seq("doc_id"))
      .select(col("n_chars"), col("component"), pct.as("pct"))
      .select(
        when(col("pct") < 80, "train").when(col("pct") < 90, "val")
          .otherwise("test").as("split"),
        col("n_chars"), col("component"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("component")).as("n_components"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("split")
  }

  /** Incremental CLUSTER maintenance — d08/d09 answer "is today's doc an
    * exact dup of history?"; d18 answers the harder standing question a
    * production near-dup index must: merge today's batch into
    * yesterday's CLUSTERING without reclustering the corpus. Reclustering
    * is O(corpus) every day; at 100 TB that is the difference between a
    * nightly job and an impossible one.
    *
    * The algorithm is CC on the CONTRACTED graph. Yesterday's labeling
    * already collapsed each old component to its min-id; a new doc can
    * only merge components it shares a blocking key with, and any two
    * OLD docs sharing a key are already co-labeled (that key made them
    * one component yesterday) — so each key touched by a new doc
    * contributes its new members plus AT MOST ONE old component id.
    * Nodes = {touched old component ids} ∪ {new doc ids}; star edges per
    * touched key; d07's pointer-jumping loop runs on THIS graph, whose
    * size follows the DELTA, not the corpus. Old labels then remap
    * through the delta roots with one join (untouched components pass
    * through a coalesce), new docs take their root directly. Component
    * ids stay canonical: every contracted node id is itself a min doc-id,
    * so the delta root is the min over the merged component — the
    * labeling is IDENTICAL to a full recompute, which is exactly what
    * the oracle (and `IncrementalCcSpec`, structurally) checks.
    *
    * "Today's batch" is the deterministic doc_id % 10 = 0 slice (d08's
    * convention); yesterday's labels are recomputed here for
    * self-containment where production reads the stored table — the
    * delta machinery after that line is the entry's point. */
  val d18IncrementalCc: Q = Q(
    "d18_incremental_cc",
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |p AS (
      |  SELECT doc_id, array_to_string(toks[1:3], ' ') AS pre,
      |         array_to_string(toks[-3:], ' ') AS suf FROM t),
      |e0 AS (
      |  SELECT a.doc_id AS u, b.doc_id AS v FROM p a
      |    JOIN p b ON a.pre = b.pre AND a.doc_id < b.doc_id
      |  UNION
      |  SELECT a.doc_id, b.doc_id FROM p a
      |    JOIN p b ON a.suf = b.suf AND a.doc_id < b.doc_id),
      |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.id)
      |SELECT id AS doc_id, MIN(r) AS component, (id % 10 = 0) AS arrived_today
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin) { (s, d) =>
    incrementalCcParts(s, d)._3
  }

  /** d18's stages, exposed to `IncrementalCcSpec`:
    * (yesterday's labels, contracted delta nodes, final labeling). */
  private[dedup] def incrementalCcParts(
      s: SparkSession, d: String): (DataFrame, DataFrame, DataFrame) = {
    val keyed = keyedOf(s, d)
    val isNew = col("doc_id") % 10 === 0
    val newKeyed = keyed.filter(isNew)
    // yesterday's stored state (recomputed for self-containment)
    val oldLabels = ccFromKeyed(s, keyed.filter(!isNew))
    // melt both channels, NAMESPACED: d07 joins pre with pre and suf with
    // suf — an unprefixed melt would let a pre string equal to some suf
    // string fabricate an edge the full graph does not have
    def melt(df: DataFrame) = df.select(
      explode(array(concat(lit("P:"), col("pre")),
        concat(lit("S:"), col("suf")))).as("key"), col("doc_id"))
    // each old doc's keys, mapped to its component: per key at most one
    // distinct comp survives the distinct (see scaladoc invariant)
    // All lookup joins below ride ccLookup (r13 SMJ sweep): the lookup
    // sides are delta-/batch-/|V|-bounded lean tables, and the audit
    // caught the un-hinted shapes sorting the melted key stream (802k
    // rows for an 18k output at sf10) and re-sorting |V|-row label
    // tables that a hash build passes through linearly.
    //
    // Each lookup gates its broadcast on a count that BOUNDS ITS OWN
    // build side (ADVICE r13: gating everything on nOld broadcast
    // unbounded new-batch tables when the old corpus was small, and
    // shuffled tiny delta tables when it was big): oldLabels is
    // nOld-row; the key melt is <=2 keys/new doc; hub <= distinct
    // touched keys <= 2*nNew; the contracted delta node set is
    // {new docs} u {touched old comps} <= 3*nNew. One agg pass
    // computes both corpus splits.
    val splitCounts = keyed.agg(count(lit(1)),
      coalesce(sum(when(isNew, 1L).otherwise(0L)), lit(0L))).collect()(0)
    val nNew = splitCounts.getLong(1)
    val nOld = splitCounts.getLong(0) - nNew
    val oldKeyComp = melt(keyed.filter(!isNew))
      .join(ccLookup(nOld)(oldLabels), col("doc_id") === col("id"))
      .select(col("key"), col("comp")).distinct()
    val newKeys = melt(newKeyed)
    // contracted members per touched key: its new docs + its old
    // component — PINNED: three consumers (hub, e0, deltaNodes) would
    // otherwise re-evaluate the melt+labels join subtree once each
    // (the audit's triplicated (doc_id, id) join)
    val members = Stage.materialize(s,
      newKeys.select(col("key"), col("doc_id").as("m"))
        .union(oldKeyComp
          .join(ccLookup(2 * nNew)(newKeys.select("key").distinct()), Seq("key"))
          .select(col("key"), col("comp").as("m"))),
      "d18members")
    val hub = members.groupBy("key")
      .agg(min(col("m")).as("u"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    val e0 = members.join(ccLookup(2 * nNew)(hub), Seq("key"))
      .filter(col("m") =!= col("u"))
      .select(col("u"), col("m").as("v")).distinct()
    val deltaNodes = members.select(col("m").as("id")).distinct()
    val deltaLabels = ccLoop(s, e0, deltaNodes)
    val remappedOld = oldLabels
      .join(ccLookup(3 * nNew)(
          deltaLabels.select(col("id").as("ocomp"), col("comp").as("root"))),
        oldLabels("comp") === col("ocomp"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("root"), col("comp")).as("component"))
    val newRows = deltaLabels
      .join(ccLookup(nNew)(newKeyed.select("doc_id")),
        deltaLabels("id") === col("doc_id"))
      .select(col("doc_id"), col("comp").as("component"))
    val result = remappedOld.union(newRows)
      .withColumn("arrived_today", col("doc_id") % 10 === 0)
      .orderBy("doc_id")
    (oldLabels, deltaNodes, result)
  }


  /** Map-only PPJoin-style build shared by d05/d19: (doc_id, ord, sz)
    * where ord holds the doc's DISTINCT 3-gram shingle hashes in one
    * GLOBAL total order — (unigram-frequency estimate, shingle hash).
    *
    * Why not true df order (the r11 build): attaching df to every
    * posting is a Σ|doc|-row explode JOINED back to per-shingle counts
    * and re-grouped through collect_list — TWO corpus-postings-scale
    * shuffles, measured by the r12 sf100 probe at 925 s of d19's
    * 1139 s wall. The prefix filter's witness argument needs only SOME
    * consistent global total order (take w = the ORDER-smallest common
    * token of a qualifying pair: w outside either prefix contradicts
    * the overlap bound regardless of what the order is); df-ascending
    * is purely a candidate-volume heuristic — but not an optional one
    * (a plain hash order bloats the prefix buckets: sf10 259 s vs 88
    * measured). The replacement rarity signal is the UNIGRAM estimate:
    * order key e = c(w1)+c(w2)+c(w3) from ONE partial-agg pass whose
    * output is VOCABULARY-sized, collected under a self-bounding budget
    * (count >= totalWords/4M caps the broadcast at 4M entries; words
    * below the floor look up as 0 = maximally rare, which only helps
    * the prefix). The key is a pure function of the shingle + one
    * broadcast, so the order is globally consistent (lossless for ANY
    * such order) and the whole build is a single map-only projection —
    * zero corpus-scale shuffles. Rare trigrams are made of rare words,
    * so the estimate tracks df where it matters (sf10 candidates 14.2M
    * vs df-order's 7.3M — the 2x bloat is absorbed by the signature
    * screen, while the build drops 91 -> ~25 s; a bigram-min estimate
    * measured 12.9M candidates for an extra corpus pass — not worth
    * it). Build-evaluation discipline: the word-count array is a
    * multi-referenced non-cheap alias (CollapseProject keeps it
    * materialized), the size filter runs on raw toks BEFORE the
    * projection, and sz derives AFTER the pin — filtering or deriving
    * on `ord` itself lets CollapseProject + predicate pushdown inline
    * the HOF subtree into each consumer and evaluate it 2-3x per row
    * (measured 129 vs ~25 s at sf10).
    *
    * `msigWords` > 0 additionally materializes an inline mini-signature
    * (msigWords x 64 bits; bit b of word t set iff some shingle hash has
    * hash mod 64*msigWords == 64t+b) alongside each doc row — d19's
    * candidate pre-screen (see d19Containment). Computed here, in the
    * build's materialized projection, for the same CollapseProject
    * reason as wcArr: derived in a consumer it would re-evaluate per
    * POSTING row after the explode (measured: the candidate stage
    * tripled at sf10), while here it is one pass per DOC over the raw
    * trigram hash stream — order/duplicate-independent (the bits OR),
    * so it needs neither the sort nor the distinct. */
  private[graft] def unigramRanked(s: SparkSession, d: String,
      tag: String, msigWords: Int = 0): DataFrame = {
    val wc = Stage.materialize(s,
      docs(s, d).select(explode(toks).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .select(xxhash64(col("w")).as("h"), col("c")),
      s"${tag}wc")
    val totalWords = wc.agg(sum(col("c"))).collect()(0).getLong(0)
    val floorT = math.max(2L, totalWords / 4000000L)
    val freq = wc.filter(col("c") >= floorT)
      .select("h", "c").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val keysBc = s.sparkContext.broadcast(freq.map(_._1))
    val valsBc = s.sparkContext.broadcast(freq.map(_._2))
    def wcount(x: Column): Column =
      org.apache.spark.sql.GraftPlanShim.column(
        graft.functions.BroadcastSortedLookup(keysBc, valsBc,
          org.apache.spark.sql.GraftPlanShim.expression(x)))
    val t = col("toks")
    def w(i: Column, off: Int) = element_at(t, i + off)
    val wcArr = transform(t, x => wcount(xxhash64(x)))
    val keyed = array_distinct(transform(
      sequence(lit(1), greatest(size(t) - 2, lit(0))),
      i => struct(
        (element_at(col("wcArr"), i) + element_at(col("wcArr"), i + 1) +
          element_at(col("wcArr"), i + 2)).as("e"),
        xxhash64(concat_ws(" ", w(i, 0), w(i, 1), w(i, 2))).as("x"))))
    // mini-sig words fold the keyed structs' ALREADY-COMPUTED trigram
    // hashes (field x) — a separate hash pass re-ran concat_ws+xxhash64
    // over all Σ|doc| trigrams and cost +2.7 s of d19's sf10 entry w3
    // (22.30 -> 19.64 after this refactor, matched calibrations), a
    // per-doc-linear term (~10x that at sf100). `keyed` becomes a
    // multi-referenced non-cheap alias exactly like wcArr
    // (CollapseProject keeps it materialized, both consumers read the
    // stored array), so the msig aggregate adds only the bit-OR fold.
    // The OR-mask is order/duplicate-independent, so folding the
    // pre-sort array is equivalent.
    def msigsOf(k: Column): Seq[Column] = (0 until msigWords).map { n =>
      aggregate(k, lit(0L), (acc, e) => {
        val x = e.getField("x")
        acc.bitwiseOR(if (msigWords == 1)
          call_function("shiftleft", lit(1L), pmod(x, lit(64L)).cast("int"))
        else
          when(floor(pmod(x, lit(64L * msigWords)) / 64L) === n,
            call_function("shiftleft", lit(1L), pmod(x, lit(64L)).cast("int")))
            .otherwise(lit(0L)))
      }).as(s"msig$n")
    }
    Stage.materialize(s,
      docs(s, d).select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= 3)
        .withColumn("wcArr", wcArr)
        .withColumn("keyed", keyed)
        .select(col("doc_id") +:
          transform(array_sort(col("keyed")), e => e.getField("x")).as("ord") +:
          msigsOf(col("keyed")): _*),
      s"${tag}ranked")
      .withColumn("sz", size(col("ord")))
  }

  /** 512-bit one-hash signature per doc (8 longs; bit = shingle mod
    * 512) for the join-back screens: a posting-level explode of the
    * PINNED ranked table + groupBy(doc_id) whose bit_or aggregates
    * partial-combine map-side (explode preserves doc locality, so the
    * shuffle is one row per doc, never Σ|doc| postings). */
  private[dedup] def shingleSigs(s: SparkSession, ranked: DataFrame,
      tag: String): DataFrame = {
    val aggs = Seq(count(lit(1)).as("ssz")) ++ (0 until 8).map(k =>
      coalesce(bit_or(when((col("slot") / 64).cast("int") === k,
        expr("shiftleft(1L, cast(slot % 64 as int))"))),
        lit(0L)).as(s"sig$k"))
    Stage.materialize(s,
      ranked.select(col("doc_id"), explode(col("ord")).as("shingle"))
        .withColumn("slot", pmod(col("shingle"), lit(512L)))
        .groupBy("doc_id")
        .agg(aggs.head, aggs.tail: _*)
        .select(col("doc_id"), col("ssz"),
          array((0 until 8).map(k => col(s"sig$k")): _*).as("sig")),
      s"${tag}sigs")
  }

  /** Asymmetric CONTAINMENT dedup — the doc-inside-doc case Jaccard
    * structurally misses: a short document quoted whole inside a long
    * one has |A∩B|/|A∪B| ≈ |A|/|B| (tiny) but |A∩B|/|A| ≈ 1. Web
    * corpora are full of exactly this (articles + their aggregator
    * pages, posts + quoted replies), and training on both leaks the
    * short doc twice. Reports every directed pair with
    * C(A→B) = |A∩B|/|A| ≥ 0.9 over 3-gram shingle sets.
    *
    * The prefix filter survives the asymmetry with ONE change: if
    * C(A→B) ≥ t then B misses at most |A| − ⌈t·|A|⌉ of A's shingles,
    * so any (|A| − ⌈t·|A|⌉ + 1)-token prefix of A must hit B — but B
    * contributes its WHOLE set to the index (no prefix on the container
    * side: containment puts no upper bound on |B|, only |B| ≥ ⌈t·|A|⌉,
    * which rides in the join). The index side is therefore the corpus
    * postings list — t15 BM25's scale class, 8-byte shingle ids only
    * (d05's hashing argument) — while the probe side explodes just the
    * order-smallest prefix (a map-only hash order with a sampled
    * frequent-head refinement; see the build below), keeping candidate
    * buckets small for the same reason d05's are. Verification is inline (ord arrays ride
    * the join); survivors dedup at ~dozens of rows. */
  val d19Containment: Q = Q(
    "d19_containment",
    """WITH sh AS (
      |  SELECT doc_id, list_sort(list_distinct(
      |           [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |            for i in range(1, len(toks) - 1)])) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 3)
      |SELECT a.doc_id AS i, b.doc_id AS j,
      |  len(list_intersect(a.s, b.s))::DOUBLE / len(a.s) AS containment
      |FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
      |WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(a.s) >= 0.9
      |ORDER BY i, j""".stripMargin) { (s, d) =>
    val theta = 0.9
    // mini-sig width for the inline candidate pre-screen (see the
    // join-back branch below); 0 disables, for counterfactual A/Bs
    val msigWords = sys.props.get("graft.d19.msigWords").map(_.toInt).getOrElse(0)
    val ranked = unigramRanked(s, d, "d19", msigWords)
    lazy val sigSide = shingleSigs(s, ranked, "d19")
    // VERIFICATION STRATEGY is corpus-size-adaptive (d05's cost-based
    // call, with a FAR lower crossover because d19's index side is
    // fatter: d05 explodes prefix rows only, while the container
    // postings here explode EVERY shingle — carrying the full jord
    // array on each posting row plans Σ|doc|² shuffle bytes, and the
    // session-9 sf100 run measured it exhausting the box's shuffle disk
    // at 5M docs (SPILL_OUT_OF_MEMORY: No space left on device; entry
    // DEAD, not slow). The scale path ships bare (8 B id, size) posting
    // rows, dedups candidate pairs while they are still ids, and
    // fetches each distinct pair's two arrays ONCE via join-backs.
    // Crossover measured per decade: inline wins 12.2 vs 15.2 s at 5k
    // docs (shuffle count dominates), join-back wins 17.0 vs 19.0 s at
    // 50k, 100 vs 141 s at 500k, and is the only LIVE plan at 5M
    // (1256.8 s, 8.9x/decade). The switch sits at 20k docs.
    val nDocs = Tables.t(s, d, "documents").count()
    val containment = size(array_intersect(col("ord"), col("jord")))
      .cast("double") / col("sz").cast("double")
    val pairs = if (nDocs <= 20000L && !sys.props.contains("graft.d19.forceJoinBack")) {
      val probe = ranked.select(col("doc_id"), col("sz"), col("ord"),
        explode(slice(col("ord"), lit(1),
          (col("sz") - ceil(col("sz") * theta) + 1).cast("int"))).as("ptok"))
      val index = ranked.select(col("doc_id").as("j"), col("sz").as("jsz"),
        col("ord").as("jord"), posexplode(col("ord")).as(Seq("jpos", "tok")))
      probe.join(index,
          col("ptok") === col("tok") && col("doc_id") =!= col("j") &&
            col("jsz") >= ceil(col("sz") * theta) &&
            // positional bound (lossless; see join-back path)
            col("jsz") - col("jpos") >= ceil(col("sz") * theta))
        .select(col("doc_id").as("i"), col("j"), containment.as("containment"))
        .filter(col("containment") >= theta)
        .dropDuplicates("i", "j")
    } else {
      // SIZE-BINNED container prefix (the r10 plan-audit's "second
      // df-rarest prefix level on the container side", realized): the
      // container previously indexed its WHOLE shingle set — Σ|doc|
      // posting rows through the bucket shuffle, the dominant term of
      // the 1256.8 s sf100 wall. Binning probes by g = ⌊log₂|A|⌋ gives
      // the container a usable overlap floor per class,
      // o_g = ⌈θ·2^g⌉ ≤ ⌈θ|A|⌉, so in the class-g index B contributes
      // only its order-smallest |B| − o_g + 1 tokens. Lossless by the
      // PPJoin witness argument applied per class: let w be the
      // order-smallest common token of a qualifying pair; if w were outside A's prefix
      // the overlap would be < ⌈θ|A|⌉, and if outside B's class-g
      // prefix it would be ≤ o_g − 1 < ⌈θ|A|⌉ — both contradictions,
      // so the (g, token) bucket join sees every true pair. Classes are
      // DATA-DRIVEN (distinct probe classes, a broadcast handful): on
      // this corpus's near-uniform lengths 1-2 classes exist and the
      // class-g prefix is ~0.1·|B|, a ~10× postings cut with matching
      // candidate shrinkage; a heavy-tailed corpus pays ~(#classes)×
      // replication on the index in exchange for the same per-class
      // trim — the classic index-size/candidate-volume trade, here
      // decided by the data.
      val gCls = floor(log2(col("sz"))).cast("long")
      // INLINE MINI-SIG PRE-SCREEN — implemented, measured, and
      // RETIRED TO A KNOB (r13 verdict item 1, resolved by
      // falsification; full table in SCALE.md r14). The named residual
      // said the ~146M candidate probes into the 440 MB broadcast sig
      // map were the sf100 wall, and prescribed W 64-bit OR-mask words
      // riding the posting rows to prune candidates inside the join
      // condition — lossless by the 512-bit screen's witness bound
      // (popcount(miniA & ~miniB) <= |A \ B|). The screen WORKS as
      // volume machinery: W=2 cuts raw candidates 55.4x at both sf10
      // (14.63M -> 264k) and sf100 (146.27M -> 2.64M), and the big
      // screen's stage collapses 92.6 -> 2.3 s. The ENTRY still loses:
      // same-session w3 at sf100, matched calibrations, W=2 333.4 s vs
      // W=0 210.9 s (+58%), and ~ties at sf10 (19.64 vs 18.90). Cause:
      // the broadcast sig probes the screen kills were PIPELINED inside
      // the candidate join's stage (the r13 "21x screen stage" came
      // from the probe's shuffle-join counterfactual shape, not the
      // shipped broadcast shape), while the +16 B the words add to each
      // of the ~500M container posting rows lands on the candidate
      // exchange — the entry's true spill term — and +40% bytes there
      // buys back more than the probes were costing. The machinery
      // stays behind -Dgraft.d19.msigWords (default 0) for corpora
      // where verification is genuinely probe-bound; the words cost
      // nothing when off (unigramRanked only folds them at W>0).
      def msigCols(prefix: String): Seq[Column] = (0 until msigWords).map(t =>
        col(s"msig$t").as(s"$prefix$t"))
      val missMini: Column =
        if (msigWords == 0) lit(0)
        else (0 until msigWords).map(t =>
          bit_count(col(s"im$t").bitwiseAND(col(s"jm$t").bitwiseXOR(lit(-1L)))))
          .reduce(_ + _)
      val probeLite = ranked.select(
        Seq(col("doc_id"), col("sz"), gCls.as("g")) ++ msigCols("im") ++
          Seq(explode(slice(col("ord"), lit(1),
            (col("sz") - ceil(col("sz") * theta) + 1).cast("int"))).as("ptok")): _*)
      val classes = ranked.select(gCls.as("jg")).distinct()
      val indexLite = ranked.crossJoin(broadcast(classes))
        .withColumn("og", ceil(lit(theta) * pow(lit(2.0), col("jg"))).cast("long"))
        .filter(col("sz") >= col("og"))
        .select(
          Seq(col("doc_id").as("j"), col("sz").as("jsz"), col("jg")) ++
            msigCols("jm") ++
            Seq(posexplode(slice(col("ord"), lit(1),
              (col("sz") - col("og") + 1).cast("int"))).as(Seq("jpos", "tok"))): _*)
      // POSITIONAL bound, the d05 PPJoin+ filter in containment form:
      // a qualifying pair's ORDER-smallest common token w sits at
      // container position p_b with nothing common before it (B's ord
      // follows the same global total order and w is the common
      // minimum), so overlap <= |B| - p_b — prune matches with
      // |B| - p_b < ceil(t*|A|). A true pair always survives via its
      // minimum-token match; other matches of the same pair may die,
      // and the dedup after makes that free. It uses A's EXACT size
      // where the class trim could only use the class floor
      // o_g = ceil(t*2^g) — up to ~5x tighter for probes near the top
      // of their class on a heavy-tailed corpus. On THIS corpus it
      // measures ~0 (71.3 -> 72.1 s at sf10, noise band): lengths are
      // near-uniform, so containers sit near their class floor and the
      // class trim already captures the bound — d05's positional-filter
      // story repeating one layer up. It stays because it rides the
      // join condition at zero cost and is the second-biggest pruner on
      // real size distributions. (The r11 PROBE_D19S claim that
      // verification dominated sf10 was a cold-page artifact — the r12
      // PROBE_D19V split re-measured the stages warm and found the
      // RANKED BUILD dominating at sf100 instead; see SCALE.md round 12
      // and unigramRanked's scaladoc.)
      // SHUFFLE-HASH, build side = the probe prefix (~6 tokens/doc vs
      // the container index's ~100 posting rows/doc): the default
      // sort-merge join SORTS the ~500M-row index side, and the r12b
      // clean-fixture probe measured that sort as the entry's actual
      // sf100 wall — 434 s SMJ vs 94 s SHJ for the identical 146.3M-row
      // candidate output. Safe at any scale: the build map is
      // per-partition (AQE sizes partitions to ~64 MB), so the probe
      // side never has to fit in one executor whole.
      //
      // Candidate pairs DEDUP AFTER THE SCREEN, not before: duplication
      // is bounded by the probe prefix length and measures 1.03x at
      // sf10 AND sf100, so a pre-screen dropDuplicates shuffles the
      // full 146M-row pair stream to remove 3% of it; post-screen it
      // deduplicates ~survivor volume (~520k rows) for free. (The probe
      // keeps a pre-screen dedup variant for counting distinct pairs.)
      val cand = probeLite.hint("shuffle_hash").join(indexLite,
          col("g") === col("jg") && col("ptok") === col("tok") &&
            col("doc_id") =!= col("j") &&
            col("jsz") >= ceil(col("sz") * theta) &&
            col("jsz") - col("jpos") >= ceil(col("sz") * theta) &&
            // the mini-sig screen rides the join condition: evaluated
            // INSIDE the shuffled-hash join's probe loop, so pruned
            // pairs never exist as rows at all — no exchange, no big-map
            // probe, no dedup traffic
            (col("sz") - missMini >= ceil(col("sz") * theta)))
        .select(col("doc_id").as("i"), col("j"))
      // SIGNATURE SCREEN (the r11 verdict's verification wall, measured
      // and fixed): the candidate count — 7.3M pairs at sf10 on this
      // bounded-vocabulary corpus — made the exact verification the
      // dominant cost: two join-backs shipping each pair's two ~1.6 KB
      // ord arrays plus a per-pair array_intersect. The screen instead
      // join-backs the 64-BYTE signatures and prunes on a LOSSLESS
      // lower bound of |A \ B|: every bit set in sigA but clear in sigB
      // is >=1 shingle of A absent from B (no B-shingle maps to a clear
      // bit), and distinct bits witness disjoint shingle groups, so
      //   |A \ B| >= popcount(sigA & ~sigB)  ==>  pruning pairs with
      //   sz - popcount < ceil(theta*sz) can never kill a true pair.
      // PROBE_D19V at sf10: 7.31M -> 50.5k survivors (145x), screen
      // 2.8 s vs 9.6 s warm / ~60 s cold for full-array verification;
      // the r11 session's failed prefilter differed exactly here — it
      // shipped a 512 B ord slice per pair through the screen where
      // this ships 64 B sigs, and bytes-per-pair is the term that
      // matters. Survivors then pay the exact array intersect, whose
      // cost is now survivor-bound, not candidate-bound.
      val missLB = aggregate(
        zip_with(col("isig"), col("jsig"),
          (a, b) => bit_count(a.bitwiseAND(b.bitwiseXOR(lit(-1L))))),
        lit(0), (acc, x) => acc + x)
      // The screen's sig lookups BROADCAST under a budget (d16's
      // gate-with-fallback pattern): the r12b sf100 probe measured the
      // two shuffle-join lookups at 159.7 s — the biggest stage once
      // the candidate join went hash — because the second join reships
      // the 146M-row pair stream carrying the first join's 88 B sig
      // payload (~13 GB). Map-side lookups keep the pair stream inside
      // the candidate join's stage with NO exchange until the tiny
      // post-screen dedup. Budget + fallback are the shared
      // sigBroadcastMaxDocs/sigLookup at the top of this file (sizing
      // rationale, HashedRelation inflation, and the sys-prop override
      // documented there).
      val screened = (if (sys.props.contains("graft.d19.noScreen")) cand
      else cand
        .join(sigLookup(nDocs)(sigSide.select(col("doc_id").as("i"),
          col("sig").as("isig"), col("ssz"))), "i")
        .join(sigLookup(nDocs)(sigSide.select(col("doc_id").as("j"),
          col("sig").as("jsig"))), "j")
        .filter(col("ssz") - missLB >= ceil(col("ssz") * theta))
        .select(col("i"), col("j"))).dropDuplicates("i", "j")
      val docsSide = ranked.select(col("doc_id"), col("ord"), col("sz"))
      screened
        .join(docsSide.select(col("doc_id").as("i"),
          col("ord").as("ord"), col("sz").as("sz")), "i")
        .join(docsSide.select(col("doc_id").as("j"),
          col("ord").as("jord")), "j")
        .select(col("i"), col("j"), containment.as("containment"))
        .filter(col("containment") >= theta)
    }
    pairs.orderBy("i", "j")
  }

  val all: Seq[Q] = Seq(d01ExactDedup, d02HashDedup, d03MinHashLsh, d04SimHash,
    d05NgramJaccard, d06MinHashPortable, d07CcClusters, d08BloomIncremental,
    d09ShardedBloom, d10SemanticDedup, d11SimHashPortable, d12CanonicalSelect,
    d13SubstringSpan, d14LshEval, d15SoftDedupWeights, d16LineDedup,
    d17LeakageSplit, d18IncrementalCc, d19Containment)
}
