package graft.scalar

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY.md §2.2 "Scalar fns" row): string,
  * regexp, edit distance, array higher-order functions, map, JSON over
  * `events.props` (the reference decodes JSON on every page,
  * /root/reference/fetch_articles.py:66), date/time, math.
  *
  * Everything here is a built-in `org.apache.spark.sql.functions` call —
  * codegen'd, no UDFs — so every expression stays inside whole-stage
  * codegen and the scan keeps column pruning (only referenced columns are
  * read). Oracle-parity notes are on each query; the recurring ones:
  * DuckDB returns BIGINT where Spark returns INT (cast to long), and both
  * engines' regexp/levenshtein/JSON-path semantics agree on the shapes
  * used here.
  */
object ScalarFunctionQueries {

  private def ev(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "events")
  private def part(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "part")
  private def docs(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "documents")
  private def ord(s: org.apache.spark.sql.SparkSession, d: String) = Tables.t(s, d, "orders")

  val s01StringBasics: Q = Q(
    "s01_string_basics",
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_up,
      |  lower(p_type) AS type_lo,
      |  substring(p_name, 1, 8) AS name8,
      |  length(p_name) AS name_len,
      |  concat(p_brand, ':', p_type) AS brand_type,
      |  trim(p_name) AS name_trim,
      |  replace(p_type, ' ', '_') AS type_us
      |FROM part WHERE p_partkey <= 50
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    part(s, d)
      .filter(col("p_partkey") <= 50)
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_up"),
        lower(col("p_type")).as("type_lo"),
        substring(col("p_name"), 1, 8).as("name8"),
        length(col("p_name")).cast("long").as("name_len"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        trim(col("p_name")).as("name_trim"),
        regexp_replace(col("p_type"), " ", "_").as("type_us"))
      .orderBy("p_partkey")
  }

  /** regexp_extract group capture + LIKE-class predicates on the same scan. */
  val s02Regexp: Q = Q(
    "s02_regexp_extract",
    """SELECT o_orderkey,
      |  regexp_extract(o_orderpriority, '([0-9]+)-([A-Z]+)', 1) AS prio_num,
      |  regexp_extract(o_orderpriority, '([0-9]+)-([A-Z]+)', 2) AS prio_word,
      |  CASE WHEN regexp_matches(o_orderpriority, '^[12]-') THEN 1 ELSE 0 END AS is_high
      |FROM orders WHERE o_orderkey <= 300
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    ord(s, d)
      .filter(col("o_orderkey") <= 300)
      .select(col("o_orderkey"),
        regexp_extract(col("o_orderpriority"), "([0-9]+)-([A-Z]+)", 1).as("prio_num"),
        regexp_extract(col("o_orderpriority"), "([0-9]+)-([A-Z]+)", 2).as("prio_word"),
        when(col("o_orderpriority").rlike("^[12]-"), 1).otherwise(0).as("is_high"))
      .orderBy("o_orderkey")
  }

  /** Edit distance between brand names — the classic fuzzy-match scalar. */
  val s03Levenshtein: Q = Q(
    "s03_levenshtein",
    """SELECT p_partkey, p_brand,
      |  levenshtein(p_brand, 'Brand#13') AS dist
      |FROM part WHERE p_partkey <= 100
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    part(s, d)
      .filter(col("p_partkey") <= 100)
      .select(col("p_partkey"), col("p_brand"),
        levenshtein(col("p_brand"), lit("Brand#13")).cast("long").as("dist"))
      .orderBy("p_partkey")
  }

  /** Array higher-order functions over tokenized text: transform, filter,
    * sort, slice, size. distinct-then-sort keeps order deterministic on
    * both engines (DuckDB list_distinct order is unspecified). The array
    * outputs are serialized to '|'-joined strings on BOTH engines — the
    * comparison harness can't sort raw list columns (s10's pinned-
    * serialization pattern); the arrays themselves are still the thing
    * computed, serialization is the last projection. */
  val s04ArrayFns: Q = Q(
    "s04_array_fns",
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS n_long,
      |  array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 5), '|') AS first5,
      |  array_to_string(list_transform(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 3), t -> upper(t)), '|') AS up3
      |FROM documents WHERE doc_id < 100
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = split(col("text"), " ")
    val dsort = sort_array(array_distinct(toks))
    docs(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, t => length(t) > 4)).cast("long").as("n_long"),
        concat_ws("|", slice(dsort, 1, 5)).as("first5"),
        concat_ws("|", transform(slice(dsort, 1, 3), t => upper(t))).as("up3"))
      .orderBy("doc_id")
  }

  /** Map construction + lookup: event-type weights via map_from_arrays +
    * element_at. The oracle states the same lookup as CASE — the map is
    * the Spark-side surface under test, the values are what's compared. */
  val s05MapFns: Q = Q(
    "s05_map_fns",
    """SELECT event_type,
      |  CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'signup' THEN 5
      |                  WHEN 'purchase' THEN 10 ELSE 0 END AS weight,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val wmap = map_from_arrays(
      array(lit("click"), lit("view"), lit("signup"), lit("purchase")),
      array(lit(1), lit(2), lit(5), lit(10)))
    ev(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        coalesce(element_at(wmap, col("event_type")), lit(0)).as("weight"),
        col("n"))
      .orderBy("event_type")
  }

  /** JSON path extraction over events.props ('{"k": N}'): string path via
    * get_json_object and typed decode via from_json — both O4's primitives
    * (ref fetch_articles.py:66) applied columnar. */
  val s06Json: Q = Q(
    "s06_json_extract",
    """SELECT k_bucket, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM (SELECT CAST(json_extract_string(props, '$.k') AS INT) // 10 AS k_bucket, value
      |      FROM events WHERE props IS NOT NULL)
      |GROUP BY k_bucket ORDER BY k_bucket""".stripMargin) { (s, d) =>
    val kInt = get_json_object(col("props"), "$.k").cast("int")
    ev(s, d)
      .filter(col("props").isNotNull)
      .select(floor(kInt / 10).cast("int").as("k_bucket"), col("value"))
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .orderBy("k_bucket")
  }

  /** from_json into a typed struct (schema'd decode, not just path walk),
    * then field access — the columnar analog of the reference's per-page
    * response.json() decode. */
  val s07JsonStruct: Q = Q(
    "s07_json_struct",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
      |FROM events WHERE event_id < 500 AND props IS NOT NULL
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType)))
    ev(s, d)
      .filter(col("event_id") < 500 && col("props").isNotNull)
      .select(col("event_id"),
        from_json(col("props"), schema).getField("k").as("k"))
      .orderBy("event_id")
  }

  /** Date/time kit: truncation, field extraction, day arithmetic, epoch. */
  val s08DateTime: Q = Q(
    "s08_datetime",
    """SELECT event_id,
      |  date_trunc('hour', ts) AS ts_hour,
      |  CAST(year(ts) AS INT) AS y,
      |  CAST(month(ts) AS INT) AS m,
      |  CAST(day(ts) AS INT) AS dom,
      |  CAST(ts + INTERVAL 7 DAY AS TIMESTAMP) AS ts_plus7,
      |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s,
      |  datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since
      |FROM events WHERE event_id < 300
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    ev(s, d)
      .filter(col("event_id") < 300)
      .select(col("event_id"),
        date_trunc("hour", col("ts")).as("ts_hour"),
        year(col("ts")).as("y"),
        month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("dom"),
        (col("ts") + expr("INTERVAL 7 DAY")).as("ts_plus7"),
        unix_timestamp(col("ts")).as("epoch_s"),
        datediff(col("ts").cast("date"), lit(java.sql.Date.valueOf("2024-01-01"))).cast("long").as("days_since"))
      .orderBy("event_id")
  }

  /** Math kit on exact-friendly shapes: abs/floor/ceil/sqrt are IEEE-exact,
    * round is taken on a DECIMAL so half-up ties agree across engines. */
  val s09Math: Q = Q(
    "s09_math",
    """SELECT o_orderkey,
      |  abs(o_totalprice - 3000.0) AS dist_mid,
      |  CAST(floor(o_totalprice / 100) AS BIGINT) AS price_c,
      |  CAST(ceil(o_totalprice / 1000) AS BIGINT) AS price_k,
      |  sqrt(o_totalprice) AS price_sqrt,
      |  CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) / 7, 2) AS DOUBLE) AS seventh,
      |  CASE WHEN o_totalprice > 3000 THEN 1 WHEN o_totalprice = 3000 THEN 0 ELSE -1 END AS side
      |FROM orders WHERE o_orderkey <= 400
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    ord(s, d)
      .filter(col("o_orderkey") <= 400)
      .select(col("o_orderkey"),
        abs(col("o_totalprice") - 3000.0).as("dist_mid"),
        floor(col("o_totalprice") / 100).as("price_c"),
        ceil(col("o_totalprice") / 1000).as("price_k"),
        sqrt(col("o_totalprice")).as("price_sqrt"),
        round(col("o_totalprice").cast("decimal(18,2)") / 7, 2).cast("double").as("seventh"),
        when(col("o_totalprice") > 3000, 1).when(col("o_totalprice") === 3000, 0)
          .otherwise(-1).as("side"))
      .orderBy("o_orderkey")
  }

  /** to_json serialization (the write side of the JSON kit). The oracle
    * constructs the exact serialization with string concat — engine JSON
    * writers differ on whitespace/field-order conventions, so parity is
    * pinned to Spark's compact field-ordered form rather than trusting
    * two serializers to agree. */
  val s10ToJson: Q = Q(
    "s10_to_json",
    """SELECT event_id,
      |  '{"id":' || event_id || ',"type":"' || event_type || '"}' AS j
      |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin) { (s, d) =>
    ev(s, d)
      .filter(col("event_id") < 100)
      .select(col("event_id"),
        to_json(struct(col("event_id").as("id"), col("event_type").as("type"))).as("j"))
      .orderBy("event_id")
  }

  /** The full map kit (VERDICT r3 missing #3): map_from_entries,
    * map_concat, transform_values, map_filter, map_keys, element_at over
    * a map decoded from events.props. DuckDB lacks transform_values/
    * map_filter, so — as with s05 — the oracle states the same VALUES
    * from first principles while the Spark side routes them through the
    * actual map operators; entry order in Spark maps is insertion order,
    * so the serialized forms are deterministic. */
  val s11MapKit: Q = Q(
    "s11_map_kit",
    """SELECT event_id,
      |  CAST(3 AS BIGINT) AS n_keys,
      |  2 * k AS k2,
      |  2 * u AS u2,
      |  '{"k":' || (2 * k) || ',"u":' || (2 * u) || ',"v10":' || (2 * v10) || '}' AS doubled,
      |  COALESCE(array_to_string([x FOR x IN [
      |     CASE WHEN k % 2 = 0 THEN 'k' END,
      |     CASE WHEN u % 2 = 0 THEN 'u' END,
      |     CASE WHEN v10 % 2 = 0 THEN 'v10' END] IF x IS NOT NULL], '|'), '') AS even_keys
      |FROM (SELECT event_id,
      |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |        user_id % 100 AS u,
      |        CAST(floor(value / 10) AS BIGINT) AS v10
      |      FROM events WHERE props IS NOT NULL AND event_id < 500)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val k = get_json_object(col("props"), "$.k").cast("long")
    val base = map_from_entries(array(
      struct(lit("k").as("key"), k.as("value")),
      struct(lit("u").as("key"), (col("user_id") % 100).as("value"))))
    val merged = map_concat(base, map(lit("v10"), floor(col("value") / 10).cast("long")))
    val doubled = transform_values(merged, (_, v) => v * 2)
    val evens = map_filter(merged, (_, v) => v % 2 === 0)
    ev(s, d)
      .filter(col("props").isNotNull && col("event_id") < 500)
      .select(col("event_id"),
        size(merged).cast("long").as("n_keys"),
        element_at(doubled, "k").as("k2"),
        element_at(doubled, "u").as("u2"),
        to_json(doubled).as("doubled"),
        concat_ws("|", map_keys(evens)).as("even_keys"))
      .orderBy("event_id")
  }

  /** Conditional / argument aggregates: count_if, bool_or/bool_and,
    * max_by/min_by (DuckDB arg_max/arg_min). Raw max_by ties are
    * nondeterministic on BOTH engines, so the arg extraction runs as
    * max/min over the COMPOSITE struct (o_totalprice, o_orderkey) with
    * the key projected out — structs compare lexicographically on both
    * engines (DuckDB's arg_max itself rejects struct ordering), making
    * the argmax well-defined even on data with exact price ties (the
    * shipped SFs are tie-free, but the 10× ScaleUp layer replicates
    * prices under new keys and caught the raw form diverging —
    * SCALE.md). */
  val s12ConditionalAgg: Q = Q(
    "s12_conditional_agg",
    """SELECT o_orderpriority,
      |  CAST(count_if(o_totalprice > 300000) AS BIGINT) AS n_big,
      |  bool_or(o_totalprice > 500000) AS any_huge,
      |  bool_and(o_totalprice > 0) AS all_positive,
      |  (max(struct_pack(p := o_totalprice, k := o_orderkey))).k AS top_order,
      |  (min(struct_pack(p := o_totalprice, k := o_orderkey))).k AS bottom_order
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val pk = struct(col("o_totalprice").as("p"), col("o_orderkey").as("k"))
    ord(s, d)
      .groupBy("o_orderpriority")
      .agg(
        count_if(col("o_totalprice") > 300000).as("n_big"),
        bool_or(col("o_totalprice") > 500000).as("any_huge"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        max(pk).getField("k").as("top_order"),
        min(pk).getField("k").as("bottom_order"))
      .orderBy("o_orderpriority")
  }

  /** Collection aggregate: collect_set → sort_array → serialize, the
    * deterministic form of list aggregation (raw collect_list order is
    * partition-dependent on BOTH engines; distinct+sort pins it). The
    * value>=300 filter (a thin upper tail of the distribution) keeps the per-group sets sparse so the output is
    * non-trivial. */
  val s13ArrayAgg: Q = Q(
    "s13_array_agg",
    """SELECT event_type,
      |  COUNT(*) AS n,
      |  array_to_string(list_sort(list(DISTINCT user_id % 97)), '|') AS user_res
      |FROM events WHERE value >= 300
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    ev(s, d)
      .filter(col("value") >= 300)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        concat_ws("|", sort_array(collect_set(col("user_id") % 97))).as("user_res"))
      .orderBy("event_type")
  }

  /** Formatting/padding kit — the last string-function family: lpad/
    * rpad, translate, repeat, reverse, split_part, and printf-style
    * templating (Spark format_string == DuckDB printf for %s/%0Nd).
    * Pure per-row projection over the scan; zero shuffle. */
  val s14StringKit: Q = Q(
    "s14_string_kit",
    """SELECT c_custkey,
      |  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
      |  rpad(c_mktsegment, 12, '.') AS segpad,
      |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS segxlat,
      |  repeat('-', CAST(c_custkey % 4 AS INT)) AS dashes,
      |  reverse(c_name) AS rname,
      |  split_part(c_name, '#', 2) AS custnum,
      |  printf('%s:%07d', c_mktsegment, c_custkey) AS tag
      |FROM customer WHERE c_custkey < 200
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.t(s, d, "customer")
      .filter(col("c_custkey") < 200)
      .select(
        col("c_custkey"),
        lpad(col("c_custkey").cast("string"), 12, "0").as("padded"),
        rpad(col("c_mktsegment"), 12, ".").as("segpad"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("segxlat"),
        expr("repeat('-', CAST(c_custkey % 4 AS INT))").as("dashes"),
        reverse(col("c_name")).as("rname"),
        substring_index(col("c_name"), "#", -1).as("custnum"),
        format_string("%s:%07d", col("c_mktsegment"), col("c_custkey")).as("tag"))
      .orderBy("c_custkey")
  }

  /** URL parsing kit — the first filter of every web-corpus curation
    * pipeline (domain reputation, TLD allowlists, path-depth spam
    * heuristics). URLs derive deterministically from (source, doc_id,
    * lang) so the entry is self-contained; extraction uses REGEXP in
    * the RE2/Java common dialect on BOTH engines (t10's portability
    * rule — Spark's parse_url has no DuckDB dual, and regexp is what a
    * portable pipeline ships anyway). Host, TLD, path depth, and query
    * param count per URL, aggregated per TLD; pure per-row maps + one
    * small agg. */
  val s15UrlKit: Q = Q(
    "s15_url_kit",
    """WITH u AS (
      |  SELECT doc_id,
      |    'https://' || source || CASE WHEN doc_id % 3 = 0 THEN '.org' ELSE '.com' END
      |      || '/docs/' || CAST(doc_id AS VARCHAR)
      |      || CASE WHEN doc_id % 2 = 0 THEN '/extra' ELSE '' END
      |      || '?lang=' || lang
      |      || CASE WHEN doc_id % 5 = 0 THEN '&ref=feed' ELSE '' END AS url
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, url,
      |    regexp_extract(url, 'https://([^/?]+)', 1) AS host,
      |    regexp_extract(url, '(\.[a-z]+)/', 1) AS tld,
      |    len(regexp_extract_all(url, '/[^/?]+')) - 1 AS path_depth,
      |    len(regexp_extract_all(url, '[?&][a-z]+=')) AS n_params
      |  FROM u)
      |SELECT tld, COUNT(*) AS n_urls,
      |  CAST(SUM(path_depth) AS BIGINT) AS total_depth,
      |  CAST(SUM(n_params) AS BIGINT) AS total_params,
      |  MIN(host) AS first_host
      |FROM p GROUP BY tld ORDER BY tld""".stripMargin) { (s, d) =>
    val url = concat(
      lit("https://"), col("source"),
      when(col("doc_id") % 3 === 0, ".org").otherwise(".com"),
      lit("/docs/"), col("doc_id").cast("string"),
      when(col("doc_id") % 2 === 0, "/extra").otherwise(""),
      lit("?lang="), col("lang"),
      when(col("doc_id") % 5 === 0, "&ref=feed").otherwise(""))
    graft.Tables.t(s, d, "documents")
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"), col("url"),
        regexp_extract(col("url"), "https://([^/?]+)", 1).as("host"),
        regexp_extract(col("url"), "(\\.[a-z]+)/", 1).as("tld"),
        (regexp_count(col("url"), lit("/[^/?]+")) - 1).cast("long").as("path_depth"),
        regexp_count(col("url"), lit("[?&][a-z]+=")).cast("long").as("n_params"))
      .groupBy("tld")
      .agg(count(lit(1)).as("n_urls"),
        sum(col("path_depth")).as("total_depth"),
        sum(col("n_params")).as("total_params"),
        min(col("host")).as("first_host"))
      .orderBy("tld")
  }

  /** The VARIANT type (Spark 4's open-schema JSON column): parse_json
    * decodes once into the binary variant encoding, then TYPED path
    * extraction (variant_get with a target type) replaces s06's
    * string-walking get_json_object. At 100 TB this is the
    * semi-structured-column answer: the parse is per-row and columnar,
    * the extracted key is an 8-byte long by the time anything shuffles,
    * and absent paths surface as NULLs (exercised by the `$.missing`
    * probe) instead of runtime errors. Oracle: DuckDB's JSON extraction
    * — same values, engine-neutral semantics. */
  val s16Variant: Q = Q(
    "s16_variant",
    """SELECT k, COUNT(*) AS n,
      |  MIN(event_id) AS first_event, MAX(event_id) AS last_event,
      |  COUNT(json_extract(props, '$.missing')) AS n_missing
      |FROM (SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, props
      |      FROM events WHERE props IS NOT NULL)
      |GROUP BY k ORDER BY k""".stripMargin) { (s, d) =>
    ev(s, d)
      .filter(col("props").isNotNull)
      .select(col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
        expr("try_variant_get(parse_json(props), '$.missing', 'string')").as("miss"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"),
        count(col("miss")).as("n_missing"))
      .orderBy("k")
  }

  /** Collation-aware grouping (Spark 4 `collate`/UTF8_LCASE): string
    * equality that follows a COLLATION instead of raw bytes — the
    * engine-level answer to the lower()-wrapping anti-pattern (which
    * loses pushdown and the original casing). The entry manufactures
    * real case variance (even keys upper-cased, odd lower-cased), groups
    * on the UTF8_LCASE-collated value, and the case variants land in ONE
    * group each; the displayed key is lower()ed explicitly because the
    * collated group key's representative casing is whichever variant the
    * engine saw first — nondeterministic by design, same as any
    * first-value. The oracle states the same semantics the portable way
    * (GROUP BY lower) — which is the point: collation gives the
    * optimizer a declared equivalence class, not an opaque expression. */
  val s17CollatedGroup: Q = Q(
    "s17_collated_group",
    """SELECT lower(mixed) AS brand, COUNT(*) AS n,
      |  CAST(MIN(p_partkey) AS BIGINT) AS min_key
      |FROM (SELECT p_partkey,
      |        CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
      |             ELSE lower(p_brand) END AS mixed
      |      FROM part)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val mixed = when(col("p_partkey") % 2 === 0, upper(col("p_brand")))
      .otherwise(lower(col("p_brand")))
    Tables.t(s, d, "part")
      .select(col("p_partkey"), collate(mixed, "UTF8_LCASE").as("g"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), min(col("p_partkey")).cast("long").as("min_key"))
      .select(lower(col("g")).cast("string").as("brand"), col("n"), col("min_key"))
      .orderBy("brand")
  }

  val all: Seq[Q] = Seq(
    s01StringBasics, s02Regexp, s03Levenshtein, s04ArrayFns, s05MapFns,
    s06Json, s07JsonStruct, s08DateTime, s09Math, s10ToJson, s11MapKit,
    s12ConditionalAgg, s13ArrayAgg, s14StringKit, s15UrlKit, s16Variant,
    s17CollatedGroup)
}
