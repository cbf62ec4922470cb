package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-proof data generator (dev/bench aid; not part of the shipped
  * library surface). Blows up an existing test-data directory by an
  * integer factor while keeping the statistical SHAPE of the data linear
  * in the factor — the property a real 10× corpus has and a verbatim
  * `UNION ALL` of copies does not:
  *
  *  - Every surrogate key (custkey/orderkey/partkey/suppkey/event_id/
  *    user_id/doc_id/vec_id) is offset by `rep * 10_000_000`, so foreign
  *    keys stay consistent WITHIN a replica and never collide ACROSS
  *    replicas. Entity populations (customers, users, docs, vectors)
  *    scale ×factor with per-entity cardinalities (orders per customer,
  *    events per user — including the skew tail) preserved exactly.
  *  - Document text is decorrelated across replicas by suffixing every
  *    whitespace token with an alphanumeric replica tag ("xN"): within a
  *    replica the shingle/duplicate structure is identical to the source,
  *    across replicas token sets are disjoint. Near-dup candidate volume
  *    therefore scales ×factor (like a real corpus), not ×factor² (like
  *    verbatim copies, which would turn every dup cluster into a clique
  *    across replicas and misattribute quadratic candidate blowup to the
  *    engine). n_chars is recomputed to keep its length(text) invariant.
  *    The optional 4th arg `globalTokens=N` keeps the source corpus's N
  *    most frequent tokens UNtagged in every replica — the stopword
  *    behavior of a real corpus, where "the"/"and" are global no matter
  *    how large the crawl grows. Without it, tagging splits every
  *    token's count ×factor and frequency-sketch entries (u06) go
  *    vacuous at scale: nothing can clear an n/(k+1) threshold when the
  *    corpus is 100% replica-local vocabulary (SCALE.md r8 documents
  *    the artifact). A handful of globals (default 8 when enabled)
  *    keeps near-dup decorrelation intact — shingles need runs of 3+
  *    consecutive global tokens to collide across replicas, which a
  *    stopword-sized set makes rare — while restoring the true
  *    heavy-hitter population the sketch exists to find.
  *  - Embedding vectors are decorrelated by rotating the 64 dimensions by
  *    `rep` positions: rotation preserves norms and all within-replica
  *    pair geometry bit-for-bit, while cross-replica cosines drop to the
  *    background level of unrelated vectors — again ×factor near-dup
  *    volume, not ×factor².
  *  - Fixed dimension tables (region, nation) copy through unchanged, as
  *    they would at any real scale factor.
  *  - Timestamps are NOT shifted: a 10× corpus over the same wall-clock
  *    window means 10× traffic density, which is the scale story the
  *    windowed/streaming entries need to survive.
  *
  * Usage: graft.ScaleUp <srcDir> <destDir> [factor=10] [globalTokens=0] [mode]
  * Writes Spark-style `<table>.parquet/` directories (Tables.t reads
  * either layout; tools/check.py globs both).
  *
  * `mode=cipherdocs` writes ONLY the documents table, decorrelated
  * LENGTH-STATIONARILY: instead of suffixing tokens with a replica tag
  * (which inflates per-token chars ~1.3× per decade, so text-tier
  * ladders partly measure the fixture — SCALE.md r10 flagged t14/t25/
  * t26 for exactly this), every non-global token is REPLACED by the
  * same-length prefix of md5(token ⊕ rep): per-doc token counts AND
  * char lengths are bit-stationary across replicas, within-replica
  * token-equality structure is preserved exactly (distinct tokens
  * collide with ~16^-len probability — d02's accepted hash-key
  * regime), and cross-replica token sets are disjoint whp. rep = 0
  * still copies through bit-identical. */
object ScaleUp {
  private val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.ScaleUp <srcDir> <destDir> [factor]")
    val (src, dst) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val globalTokens = if (args.length > 3) args(3).toInt else 0
    val mode = if (args.length > 4) args(4) else "tag"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Reduce-side width is ADAPTIVE, not fixed: shuffles START at 512
      // partitions and AQE coalesces down from runtime stats (to ~cores
      // at bench SF, so small-scale plans are unchanged). A fixed
      // `shuffle.partitions = cores` capped every reduce side at 32
      // regardless of volume; at the 1000x step that put ~19M fact rows
      // into each sort-merge task and the spill took q51 from ~50 s
      // expected to 279 s measured (87 s with this setting), q70 from
      // 275 to 163 s. Deliberately-sized scopes pin BOTH keys through
      // graft.Widths.withWidth.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")

    /** Source table size in bytes (file or directory-of-parts). */
    def srcBytes(t: String): Long = {
      def sz(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(sz).sum else f.length()
      sz(new java.io.File(s"$src/$t.parquet"))
    }

    // Cross product with replica ids 0..factor-1, then per-column remap.
    // The `rep` column is dropped before writing.
    //
    // The output is hash-repartitioned on the table's first surrogate key
    // into ~64 MB files before writing. The generator originally wrote
    // each table from its scan's task count — the SOURCE's file count,
    // i.e. ONE file (one row group) for every non-lineitem table at any
    // factor. A single row group is an unsplittable scan unit, so every
    // map stage over the scaled documents/events tables ran as ONE task
    // regardless of data volume — d16's shuffle-free rewrite pass (whose
    // parallelism IS the scan's) measured 26× on a 10× step purely from
    // the fixture's layout, 21 minutes of one busy core at sf10. A real
    // corpus at any of these scales is thousands of files; the fixture
    // must model that or it mis-measures the whole scan layer. Hash (not
    // round-robin) placement keeps regeneration deterministic.
    def scaled(t: String, keyCols: Seq[String])(extra: DataFrame => DataFrame): Unit = {
      val base = read(t)
      // Collision guard: remap adds rep*Stride per key, so replica key
      // ranges are disjoint ONLY if every source key < Stride. Chaining
      // ScaleUp outputs (sf1 -> sf10) violates this silently — sf1 keys
      // reach 90M > 10M, and the chained sf10 assigns the same doc_id to
      // up to 10 different documents (measured: a d19 probe on a chained
      // sf100 reported 56x candidate duplication where the prefix bound
      // caps it at ~11). Always scale single-hop from a base fixture.
      // One scan for all key maxima (not one full-table agg per key), and
      // an explicit failure on the empty/all-null case — max() returns
      // null there, and getAs[Number].longValue() would NPE with no
      // context instead of naming the broken fixture (ADVICE r12).
      if (keyCols.nonEmpty) {
        val maxRow = base.agg(max(col(keyCols.head)),
          keyCols.tail.map(k => max(col(k))): _*).collect()(0)
        keyCols.zipWithIndex.foreach { case (k, i) =>
          val v = maxRow.get(i)
          require(v != null,
            s"$t.$k: max() is null — source table is empty or the key " +
              s"column is all-null; fixture $src is unusable for scaling")
          val mx = v.asInstanceOf[Number].longValue()
          require(mx < Stride,
            s"$t.$k max=$mx >= stride=$Stride: source was already scaled; " +
              s"re-run single-hop from the base fixture with a larger factor")
        }
      }
      val reps = base.withColumn("rep", explode(sequence(lit(0L), lit(factor - 1L))))
      val remapped = keyCols.foldLeft(reps) { (df, k) =>
        df.withColumn(k, col(k) + col("rep") * Stride)
      }
      val nFiles = math.max(8L,
        math.min(512L, srcBytes(t) * factor / (64L << 20))).toInt
      write(extra(remapped).select(base.columns.map(col).toSeq: _*)
        .repartition(nFiles, col(keyCols.head)), t)
    }

    def documentGlobals(): Seq[String] =
      if (globalTokens <= 0) Nil
      else read("documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").count()
        .orderBy(desc("count"), col("w"))
        .limit(globalTokens)
        .collect().map(_.getString(0)).toSeq

    if (mode == "cipherdocs") {
      // Length-stationary documents-only blowup (see object scaladoc):
      // token -> same-length prefix of md5(token + 0x01 + rep); repeated
      // so tokens longer than one digest (32 hex chars) stay covered.
      val globals = documentGlobals()
      scaled("documents", Seq("doc_id")) { df =>
        val cipher = (w: org.apache.spark.sql.Column) => {
          val m = md5(concat(w, lit("\u0001"), col("rep").cast("string")))
          // repeat the digest ceil(len/32) times: a fixed two-digest
          // concat truncated >64-char tokens, breaking the bit-stationary
          // per-doc char-length invariant this mode exists to provide
          substring(repeat(m, ((length(w) + lit(31)) / lit(32)).cast("int")),
            lit(1), length(w))
        }
        val ciphered = array_join(
          transform(split(col("text"), " "),
            w => if (globals.isEmpty) cipher(w)
              else when(w.isin(globals: _*), w).otherwise(cipher(w))), " ")
        df.withColumn("text",
            when(col("rep") === 0, col("text")).otherwise(ciphered))
          .withColumn("n_chars", length(col("text")).cast("long"))
      }
      spark.stop()
      return
    }

    Seq("region", "nation").foreach(t => write(read(t), t))
    scaled("customer", Seq("c_custkey"))(identity)
    scaled("supplier", Seq("s_suppkey"))(identity)
    scaled("part", Seq("p_partkey"))(identity)
    scaled("orders", Seq("o_orderkey", "o_custkey"))(identity)
    scaled("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))(identity)
    // This session reads the source's timestamp[ns] ts as int64 nanos
    // (nanosAsLong); write it back as a REAL timestamp (micros) so the
    // scaled table keeps the timestamp-typed contract every ts-consuming
    // oracle (epoch_us etc.) relies on. Micros truncation is consistent
    // for both engines since both read the same scaled file.
    scaled("events", Seq("event_id", "user_id")) { df =>
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    }
    scaled("documents", Seq("doc_id")) { df =>
      // bounded driver list (N stopword-like tokens), deterministic
      // tie-break so repeated generations are identical
      val globals: Seq[String] = documentGlobals()
      val tag = (w: org.apache.spark.sql.Column) =>
        concat(w, lit("x"), col("rep").cast("string"))
      val tagged =
        if (globals.isEmpty) array_join(
          transform(split(col("text"), " "), w => tag(w)), " ")
        else array_join(
          transform(split(col("text"), " "),
            w => when(w.isin(globals: _*), w).otherwise(tag(w))), " ")
      df.withColumn("text",
          when(col("rep") === 0, col("text")).otherwise(tagged))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    scaled("embeddings", Seq("vec_id")) { df =>
      // 64 dims give 64 distinct rotations; laps beyond the first apply a
      // per-(lap, dimension) SIGN MASK on top of the rotation (sign from
      // xxhash64 parity — deterministic, so regeneration is exact).
      // Within-replica pair geometry is bit-preserved under any fixed
      // mask (signs square away in same-replica dot products: Σ xᵢyᵢsᵢ²
      // = Σ xᵢyᵢ) and norms are untouched, while cross-replica cosines
      // drop to the unrelated-vector background. Unlike the earlier
      // single-negation lap (which gave only 2·64 distinct transforms and
      // would plant EXACT cross-replica dups at factor > 128 —
      // factor²-scaling near-dup volume misattributed to the engine),
      // 2⁶⁴ masks × 64 rotations support any factor a 1000× campaign
      // needs. rep = 0 copies through bit-identical, as before.
      val dim = 64
      val rot = (col("rep") % dim).cast("int")
      val lap = (col("rep") / dim).cast("long")
      val rotated = when(rot === 0, col("embedding")).otherwise(concat(
        slice(col("embedding"), rot + 1, lit(dim) - rot),
        slice(col("embedding"), lit(1), rot)))
      val masked = zip_with(rotated,
        sequence(lit(0L), lit(dim - 1L)),
        (x, i) => when(pmod(xxhash64(lap, i), lit(2)) === 0, x).otherwise(negate(x)))
      df.withColumn("embedding",
        when(col("rep") === 0, col("embedding"))
          .otherwise(when(col("rep") < dim, rotated).otherwise(masked)))
    }
    spark.stop()
  }
}
