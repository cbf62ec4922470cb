package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The UD* extension surface (SURVEY §2.2 last row): a typed Aggregator
  * UDAF, a scalar UDF, and a typed-Dataset flatMap (the UDTF/Generator
  * shape). These exist to prove the extension points work end-to-end —
  * the engine's own operators deliberately avoid them (built-ins are
  * codegen'd; a scalar UDF boxes every row), and each entry's oracle is
  * plain SQL so the custom code is verified against the relational
  * semantics it reimplements.
  */
object UdfQueries {

  /** Typed UDAF: sum of squares. Buffer and result are exact Longs, so
    * merge order can't change the answer (partial aggregation stays
    * parallel, like any built-in). */
  private object SumSq extends Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Long): Long = b + a * a
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Long = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    def outputEncoder: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
  }

  val u01Udaf: Q = Q(
    "u01_udaf_sumsq",
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(l_linenumber * l_linenumber) AS BIGINT) AS sumsq
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val sumsq = udaf(SumSq, Encoders.scalaLong)
    Tables.t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sumsq(col("l_linenumber").cast("long")).as("sumsq"))
      .orderBy("l_returnflag")
  }

  /** Scalar UDF: slugify. The same transform is expressible with built-in
    * lower+replace (which is what the oracle uses) — the entry verifies
    * the UDF execution path, not a new capability. */
  val u02ScalarUdf: Q = Q(
    "u02_scalar_udf",
    """SELECT p_partkey, replace(lower(p_name), ' ', '-') AS slug
      |FROM part WHERE p_partkey <= 80 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val slugify = udf((name: String) =>
      if (name == null) null else name.toLowerCase.replace(' ', '-'))
    Tables.t(s, d, "part")
      .filter(col("p_partkey") <= 80)
      .select(col("p_partkey"), slugify(col("p_name")).as("slug"))
      .orderBy("p_partkey")
  }

  /** UDTF shape: a typed-Dataset flatMap fanning each row out to many
    * (the Generator contract), then a relational agg on top. */
  val u03TypedFlatMap: Q = Q(
    "u03_typed_flatmap",
    """SELECT tok, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS tok
      |      FROM documents WHERE lang = 'en')
      |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.t(s, d, "documents")
      .filter(col("lang") === "en")
      .select(col("text")).as[String]
      // split with limit -1 keeps trailing empty tokens — the exact
      // semantics of both DuckDB string_split and Spark's split()
      .flatMap(_.split(" ", -1))
      .toDF("tok")
      .groupBy("tok")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(20)
  }

  /** True custom Generator (VERDICT r3 missing #4): the native
    * graft_posexplode_ngrams table function planned as a relational
    * Generate node, verified against DuckDB's unnest-over-range bigram
    * expansion. See [[PosExplodeNgrams]]. */
  val u04Generator: Q = Q(
    "u04_generator_ngrams",
    """SELECT doc_id, CAST(i - 1 AS INT) AS pos,
      |  toks[i] || ' ' || toks[i + 1] AS ngram
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks
      |      FROM documents WHERE doc_id < 50),
      |  LATERAL unnest(range(1, len(toks))) AS t(i)
      |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
    PosExplodeNgrams.register(s)
    Tables.t(s, d, "documents")
      .filter(col("doc_id") < 50)
      .selectExpr("doc_id", "graft_posexplode_ngrams(text, 2)")
      .orderBy("doc_id", "pos")
  }

  /** Native TypedImperativeAggregate (see [[BottomKHashes]]): bottom-5
    * KMV sketch of the per-source document-hash sets. The hash is the
    * d06 md5 recipe (bit-identical in DuckDB), and bottom-k over a SET
    * is order-independent, so the sketch — normally "engine-internal by
    * nature" — verifies EXACTLY against a window-rank oracle. Output is
    * flattened (source, pos, h) rows; nested arrays aren't
    * oracle-comparable. */
  val u05BottomKSketch: Q = Q(
    "u05_bottomk_sketch",
    """SELECT source, CAST(rn - 1 AS INT) AS pos, h FROM (
      |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
      |  FROM (SELECT DISTINCT source,
      |          ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
      |        FROM documents))
      |WHERE rn <= 5 ORDER BY source, pos""".stripMargin) { (s, d) =>
    BottomKHashes.register(s)
    Tables.t(s, d, "documents")
      .select(col("source"),
        Md5PrefixLong(col("text"), 1, 8).as("h"))
      .groupBy("source")
      .agg(expr("graft_bottomk(h, 5)").as("sketch"))
      .select(col("source"), posexplode(col("sketch")).as(Seq("pos", "h")))
      .orderBy("source", "pos")
  }

  /** Certified heavy hitters via the native Misra-Gries aggregate (see
    * [[FreqSketch]]): one bounded-state pass narrows the token stream to
    * ≤ k candidates (guaranteed a superset of every token with frequency
    * > n/(k+1)), a second pass counts ONLY candidate tokens via a
    * broadcast join, and the exact-threshold filter makes the output
    * deterministic — which is what lets a sketch whose raw contents are
    * merge-order-dependent verify hash-exact against a plain GROUP BY
    * oracle. Scale shape: no token ever shuffles (the sketch pass ships
    * one O(k) buffer per partition, the certify pass broadcasts ≤ k
    * candidate strings); the oracle shuffles the whole token stream. */
  val u06HeavyHitters: Q = Q(
    "u06_heavy_hitters",
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |SELECT w, COUNT(*) AS cnt FROM w GROUP BY w
      |HAVING COUNT(*) * 65 > (SELECT COUNT(*) FROM w)
      |ORDER BY cnt DESC, w""".stripMargin) { (s, d) =>
    FreqSketch.register(s)
    val words = Tables.t(s, d, "documents")
      // limit -1 keeps trailing empty tokens (u03's string_split parity)
      .select(explode(split(col("text"), " ", -1)).as("w"))
    // one pass: MG candidate set and the exact token total together
    val sketch = words.agg(
      expr("graft_topfreq(w, 64)").as("cands"), count(lit(1)).as("n"))
    val cands = sketch.select(explode(col("cands")).as("w"), col("n"))
    words.join(broadcast(cands), "w")
      .groupBy("w", "n").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * 65 > col("n"))
      .select("w", "cnt")
      .orderBy(col("cnt").desc, col("w"))
  }

  /** SQL-defined scalar functions (Spark 4 `CREATE FUNCTION ... RETURN
    * expr`) — the portable, optimizer-transparent alternative to u02's
    * JVM scalar UDF: the analyzer INLINES the body into the plan, so the
    * revenue expression participates in whole-stage codegen, constant
    * folding, and pushdown exactly like a hand-written column (u02's
    * black-box lambda can do none of those). UdfInlineSpec asserts the
    * executed plan contains no UDF invocation node. Money math runs in
    * DECIMAL inside the function body (Det discipline, spelled in SQL),
    * so the per-flag sums are bit-identical across engines. */
  val u07SqlUdf: Q = Q(
    "u07_sql_udf",
    """SELECT l_returnflag,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      |        * (1.0 - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE)
      |    AS net_revenue,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.t(s, d, "lineitem").createOrReplaceTempView("lineitem")
    // Types sized so the product is EXACT and under precision 38 in both
    // engines: price has 2 decimals (fits (18,4)), discount 2-4 (fits
    // (6,4)); the (18,4)x(7,4) product carries scale 8 losslessly.
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_net(price DOUBLE, disc DOUBLE)
        |RETURNS DECIMAL(26,8)
        |RETURN CAST(price AS DECIMAL(18,4)) * (1.0 - CAST(disc AS DECIMAL(6,4)))
        |""".stripMargin)
    s.sql(
      """SELECT l_returnflag,
        |  CAST(CAST(SUM(graft_net(l_extendedprice, l_discount)) AS STRING) AS DOUBLE)
        |    AS net_revenue,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** Count-Min sketch (Cormode-Muthukrishnan) with md5-portable hash
    * rows — the mergeable point-frequency summary that complements u06's
    * top-k: depth 3 × width 64 counters, bucket_d(key) from the first 8
    * md5 hex digits of "d:key" (the d06/d11 portable-hash recipe), point
    * estimate = min over depths of the bucket counts. The whole sketch
    * is one map-side-combinable GROUP BY to 192 cells REGARDLESS of row
    * count — the sketch IS the shuffle-compressed representation, and
    * cellwise SUM merges sketches across partitions/days for free. The
    * query emits, per probed supplier key, the exact count next to the
    * estimate; the CM guarantee (est ≥ exact, ≤ exact + εN w.h.p.) is
    * spec-asserted, and because the hash rows are engine-portable the
    * normally "engine-internal" sketch verifies HASH-EXACT against a
    * DuckDB oracle computing the identical cells. */
  val u08CountMin: Q = Q(
    "u08_count_min",
    """WITH r AS (SELECT l_suppkey AS k FROM lineitem),
      |d AS (SELECT unnest([0, 1, 2]) AS dep),
      |cells AS (
      |  SELECT dep,
      |    ('0x' || substr(md5(CAST(dep AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 8))::BIGINT % 64 AS bucket,
      |    COUNT(*) AS c
      |  FROM r CROSS JOIN d GROUP BY dep, bucket),
      |keys AS (SELECT DISTINCT k FROM r WHERE k <= 50),
      |est AS (
      |  SELECT k, MIN(c) AS cm_est
      |  FROM keys CROSS JOIN d
      |  JOIN cells ON cells.dep = d.dep
      |    AND cells.bucket =
      |      ('0x' || substr(md5(CAST(d.dep AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 8))::BIGINT % 64
      |  GROUP BY k),
      |ex AS (SELECT k, COUNT(*) AS exact_n FROM r WHERE k <= 50 GROUP BY k)
      |SELECT ex.k AS suppkey, exact_n, cm_est
      |FROM ex JOIN est USING (k) ORDER BY suppkey""".stripMargin) { (s, d) =>
    def bucket(dep: Int, k: Column): Column =
      Md5PrefixLong(concat(lit(s"$dep:"), k.cast("string")), 1, 8) % 64
    val rows = Tables.t(s, d, "lineitem").select(col("l_suppkey").as("k"))
    // Sketch build: one explode to (depth, bucket) then a 192-cell agg —
    // partial aggregation compresses every partition to ≤192 rows before
    // the shuffle, so the network cost is O(depth·width), not O(rows).
    val cells = rows
      .select(posexplode(array((0 until 3).map(dep => bucket(dep, col("k"))): _*))
        .as(Seq("dep", "bucket")))
      .groupBy("dep", "bucket").agg(count(lit(1)).as("c"))
    val probed = rows.filter(col("k") <= 50)
    val exact = probed.groupBy("k").agg(count(lit(1)).as("exact_n"))
    // Point query: each probed key recomputes its 3 buckets and takes the
    // min cell — the 192-cell sketch broadcasts, keys never reshuffle.
    val est = exact.select(col("k"),
        posexplode(array((0 until 3).map(dep => bucket(dep, col("k"))): _*))
          .as(Seq("dep", "bucket")))
      .join(broadcast(cells), Seq("dep", "bucket"))
      .groupBy("k").agg(min(col("c")).as("cm_est"))
    exact.join(est, "k")
      .select(col("k").as("suppkey"), col("exact_n"), col("cm_est"))
      .orderBy("suppkey")
  }

  /** KMV sketch SET ALGEBRA (Beyer et al.) — the distinct-count sketch
    * family's answer to "how many customers are in BOTH segments":
    * bottom-64 md5-hash sketches of two order-priority segments
    * (u05's aggregate), combined WITHOUT touching the raw sets — the
    * union sketch is the 64 smallest of the merged sketches, θ its
    * k-th value, ρ the union-sketch members present in both input
    * sketches, and the estimates are single correctly-rounded integer
    * divisions (63·2³² /θ for the union, ρ·63·2³² /(64·θ) for the
    * intersection — numerators ≤ 2⁴⁴, exact in both int64 and double,
    * so the doubles are bit-identical across engines). Emitted next to
    * the exact counts the estimates approximate. At 100 TB each
    * segment ships ONE 64-long sketch from each partition; set
    * intersections of any two segments come from sketch algebra alone,
    * never a re-scan. */
  val u09KmvIntersect: Q = Q(
    "u09_kmv_intersect",
    """WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
      |b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderpriority = '2-HIGH'),
      |ha AS (SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT AS h FROM a),
      |hb AS (SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT AS h FROM b),
      |sa AS (SELECT list(h ORDER BY h) AS s FROM (SELECT DISTINCT h FROM ha ORDER BY h LIMIT 64)),
      |sb AS (SELECT list(h ORDER BY h) AS s FROM (SELECT DISTINCT h FROM hb ORDER BY h LIMIT 64)),
      |u AS (SELECT list(h ORDER BY h) AS s FROM (
      |  SELECT DISTINCT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
      |  ORDER BY h LIMIT 64)),
      |m AS (
      |  SELECT u.s[64] AS theta,
      |    CAST(len(list_filter(u.s,
      |      x -> list_contains(sa.s, x) AND list_contains(sb.s, x))) AS BIGINT) AS rho
      |  FROM u, sa, sb),
      |exact AS (
      |  SELECT (SELECT COUNT(*) FROM (SELECT k FROM a UNION SELECT k FROM b)) AS exact_union,
      |    (SELECT COUNT(*) FROM (SELECT k FROM a INTERSECT SELECT k FROM b)) AS exact_inter)
      |SELECT rho, theta,
      |  CAST(63 * 4294967296 AS DOUBLE) / CAST(theta AS DOUBLE) AS est_union,
      |  CAST(rho * 63 * 4294967296 AS DOUBLE) / CAST(64 * theta AS DOUBLE) AS est_inter,
      |  exact_union, exact_inter
      |FROM m, exact""".stripMargin) { (s, d) =>
    BottomKHashes.register(s)
    def sketch(priority: String) = Tables.t(s, d, "orders")
      .filter(col("o_orderpriority") === priority)
      .select(col("o_custkey").as("k")).distinct()
      .select(Md5PrefixLong(col("k").cast("string"), 1, 8).as("h"))
      .agg(expr("graft_bottomk(h, 64)").as("s"))
    val keys = Tables.t(s, d, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_custkey").as("k"), col("o_orderpriority").as("p"))
    val exact = keys.agg(
      countDistinct(col("k")).as("exact_union"),
      countDistinct(when(col("p") === "1-URGENT", col("k")))
        .+(countDistinct(when(col("p") === "2-HIGH", col("k"))))
        .-(countDistinct(col("k"))).as("exact_inter"))
    sketch("1-URGENT").select(col("s").as("sa"))
      .crossJoin(sketch("2-HIGH").select(col("s").as("sb")))
      .select(col("sa"), col("sb"),
        slice(array_sort(array_distinct(concat(col("sa"), col("sb")))), 1, 64).as("u"))
      .select(
        size(filter(col("u"), x =>
          array_contains(col("sa"), x) && array_contains(col("sb"), x)))
          .cast("long").as("rho"),
        element_at(col("u"), 64).as("theta"))
      .select(col("rho"), col("theta"),
        (lit(63L * 4294967296L).cast("double") / col("theta").cast("double"))
          .as("est_union"),
        ((col("rho") * lit(63L * 4294967296L)).cast("double")
          / (lit(64L) * col("theta")).cast("double")).as("est_inter"))
      .crossJoin(broadcast(exact))
  }

  /** KMV sketch ROLLUP — the pre-aggregation pattern that makes distinct
    * counts affordable at 100 TB: the fact table is scanned ONCE into a
    * per-month sketch table (one bounded 64-long [[BottomKHashes]] sketch
    * per month; map-side partials compress every partition to ≤ 64·months
    * longs before the only shuffle), and every date-range distinct query
    * after that is answered by SKETCH ALGEBRA alone — explode the member
    * months' sketches and re-take the bottom 64. The key identity (the
    * reason KMV rolls up losslessly, spec-asserted in `UdfRollupSpec`):
    * bottom-k of a union equals bottom-k of the per-part bottom-k's,
    * because any of the k smallest of the union is among the k smallest
    * of its own part. So the rolled-up estimate is BIT-IDENTICAL to the
    * estimate a full rescan of the range would produce — pre-aggregation
    * costs zero accuracy. Estimates use u09's correctly-rounded
    * (k-1)·2³²/θ form next to the exact distinct counts they approximate;
    * hashes are the d06 md5-portable recipe, so the whole sketch pipeline
    * verifies hash-exact against DuckDB. At 100 TB the sketch table is
    * months × 512 bytes — the fact scan happens once, not per dashboard
    * query. */
  val u10SketchRollup: Q = Q(
    "u10_sketch_rollup",
    """WITH hk AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS mon, o_custkey AS k,
      |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS h
      |  FROM orders),
      |mon_sk AS (
      |  SELECT mon, h FROM (
      |    SELECT mon, h, row_number() OVER (PARTITION BY mon ORDER BY h) AS rn
      |    FROM (SELECT DISTINCT mon, h FROM hk)) WHERE rn <= 64),
      |ranges(label, lo, hi) AS (VALUES
      |  ('all', '1995-01', '2001-12'),
      |  ('y1995_96', '1995-01', '1996-12'),
      |  ('y1997_98', '1997-01', '1998-12'),
      |  ('y1999_01', '1999-01', '2001-12')),
      |merged AS (
      |  SELECT label, h FROM (
      |    SELECT label, h, row_number() OVER (PARTITION BY label ORDER BY h) AS rn
      |    FROM (SELECT DISTINCT label, h
      |          FROM ranges JOIN mon_sk ON mon BETWEEN lo AND hi)) WHERE rn <= 64),
      |est AS (
      |  SELECT label, CAST(COUNT(*) AS BIGINT) AS sk_size, MAX(h) AS theta
      |  FROM merged GROUP BY label),
      |exact AS (
      |  SELECT label, COUNT(DISTINCT k) AS exact_distinct
      |  FROM ranges JOIN hk ON mon BETWEEN lo AND hi GROUP BY label)
      |SELECT label, sk_size, theta,
      |  CASE WHEN sk_size = 64
      |    THEN CAST(63 * 4294967296 AS DOUBLE) / CAST(theta AS DOUBLE)
      |    ELSE CAST(sk_size AS DOUBLE) END AS est_distinct,
      |  exact_distinct
      |FROM est JOIN exact USING (label) ORDER BY label""".stripMargin) { (s, d) =>
    BottomKHashes.register(s)
    import s.implicits._
    val hk = Tables.t(s, d, "orders").select(
      date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
      col("o_custkey").as("k"),
      Md5PrefixLong(col("o_custkey").cast("string"), 1, 8).as("h"))
    // The persisted sketch table: ONE fact scan, one bounded sketch/month.
    val monSk = hk.groupBy("mon").agg(expr("graft_bottomk(h, 64)").as("s"))
    val ranges = Seq(
      ("all", "1995-01", "2001-12"),
      ("y1995_96", "1995-01", "1996-12"),
      ("y1997_98", "1997-01", "1998-12"),
      ("y1999_01", "1999-01", "2001-12")).toDF("label", "lo", "hi")
    // Range answers: sketch algebra only — the fact table is NOT rescanned
    // (the exact side below rescans precisely to show what that costs).
    val merged = monSk
      .join(broadcast(ranges), col("mon").between(col("lo"), col("hi")))
      .select(col("label"), explode(col("s")).as("h"))
      .groupBy("label").agg(expr("graft_bottomk(h, 64)").as("s"))
    val est = merged.select(col("label"),
      size(col("s")).cast("long").as("sk_size"),
      element_at(col("s"), size(col("s"))).as("theta"))
    val exact = hk
      .join(broadcast(ranges), col("mon").between(col("lo"), col("hi")))
      .groupBy("label").agg(countDistinct(col("k")).as("exact_distinct"))
    est.join(exact, "label")
      .select(col("label"), col("sk_size"), col("theta"),
        when(col("sk_size") === 64,
          lit(63L * 4294967296L).cast("double") / col("theta").cast("double"))
          .otherwise(col("sk_size").cast("double")).as("est_distinct"),
        col("exact_distinct"))
      .orderBy("label")
  }

  val all: Seq[Q] = Seq(u01Udaf, u02ScalarUdf, u03TypedFlatMap, u04Generator,
    u05BottomKSketch, u06HeavyHitters, u07SqlUdf, u08CountMin, u09KmvIntersect,
    u10SketchRollup)
}
