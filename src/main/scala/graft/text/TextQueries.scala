package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis surface over `documents` (SURVEY.md §2.2 "Text analysis"
  * row + the LLM-pipeline north star): term frequency, n-grams, language
  * ID (stopword-lexicon heuristic), quality scoring, token counting
  * (whitespace + regex), and document fingerprinting (bag-of-words md5 and
  * a positional rolling hash).
  *
  * Scale posture: everything except the two frequency queries is a pure
  * per-row map (higher-order array functions — zero shuffles, full
  * codegen); the frequency queries are one hash-agg shuffle each, and the
  * language-ID join broadcasts a constant lexicon so the fact side never
  * moves.
  */
object TextQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.t(s, d, "documents")
  private def toks = split(col("text"), " ")

  /** Global term frequency, top 50. The count ties are broken by token, so
    * the LIMIT boundary is deterministic on both engines. */
  val t01TermFrequency: Q = Q(
    "t01_term_frequency",
    """SELECT tok, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY tok ORDER BY n DESC, tok LIMIT 50""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(explode(toks).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(50)
  }

  /** Word 3-gram frequency, top 40. Spark builds the grams per row with
    * transform(sequence) — no join, one agg shuffle. */
  val t02NgramCounts: Q = Q(
    "t02_ngram_counts",
    """SELECT ngram, COUNT(*) AS n FROM (
      |  SELECT unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                 for i in range(1, len(toks) - 1)]) AS ngram
      |  FROM (SELECT string_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 3)
      |GROUP BY ngram ORDER BY n DESC, ngram LIMIT 40""".stripMargin) { (s, d) =>
    // Tokens materialize first: the gram lambda holds three element_at
    // references, and projection collapse would inline the split() into
    // each — re-tokenizing every doc ~3x per gram (graft.Stage scaladoc).
    val toksDf = graft.Stage.materialize(s,
      docs(s, d).select(split(col("text"), " ").as("toks")).filter(size(col("toks")) >= 3),
      "t02toks")
    val t = col("toks")
    val grams = transform(
      sequence(lit(1), size(t) - 2),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))
    toksDf
      .select(explode(grams).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram"))
      .limit(40)
  }

  /** Stopword-lexicon language ID: explode tokens, join a tiny broadcast
    * lexicon, argmax hits per doc (ties by lang asc), docs with no lexicon
    * hit fall back to 'und'. The lexicon is constant and broadcast — the
    * document side shuffles once on doc_id for the per-doc argmax. */
  val t03LangId: Q = Q(
    "t03_lang_id",
    """WITH lex(word, cand) AS (VALUES
      |    ('the','en'), ('a','en'),
      |    ('le','fr'), ('la','fr'), ('et','fr'),
      |    ('der','de'), ('die','de'), ('und','de'),
      |    ('el','es'), ('los','es'), ('y','es')),
      |  hits AS (
      |    SELECT doc_id, cand, COUNT(*) AS n_hits FROM
      |      (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
      |      JOIN lex ON t.tok = lex.word
      |    GROUP BY doc_id, cand),
      |  best AS (
      |    SELECT doc_id, cand, n_hits,
      |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n_hits DESC, cand) AS rn
      |    FROM hits)
      |SELECT d.doc_id, COALESCE(b.cand, 'und') AS pred_lang, COALESCE(b.n_hits, 0) AS n_hits
      |FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val lex = Seq(
      ("the", "en"), ("a", "en"),
      ("le", "fr"), ("la", "fr"), ("et", "fr"),
      ("der", "de"), ("die", "de"), ("und", "de"),
      ("el", "es"), ("los", "es"), ("y", "es")).toDF("word", "cand")
    val hits = docs(s, d)
      .select(col("doc_id"), explode(toks).as("tok"))
      .join(broadcast(lex), col("tok") === col("word"))
      .groupBy("doc_id", "cand")
      .agg(count(lit(1)).as("n_hits"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("n_hits").desc, col("cand"))
    val best = hits.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    docs(s, d).select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cand"), lit("und")).as("pred_lang"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .orderBy("doc_id")
  }

  /** Per-doc quality scoring: token counts, type-token ratio, mean token
    * length, stopword ratio, and a keep/drop flag — the standard cheap
    * pre-training filters. Pure per-row map, no shuffle. Ratios are exact
    * int counts divided in double (IEEE-identical on both engines). */
  val t04QualityScore: Q = Q(
    "t04_quality_score",
    """SELECT doc_id,
      |  len(toks) AS n_tokens,
      |  len(list_distinct(toks)) AS n_types,
      |  len(list_distinct(toks)) / len(toks) AS type_token_ratio,
      |  (n_chars - len(toks) + 1) / len(toks) AS mean_tok_len,
      |  len(list_filter(toks, t -> t IN ('the', 'a'))) / len(toks) AS stopword_ratio,
      |  CASE WHEN len(toks) BETWEEN 10 AND 1000
      |        AND len(list_distinct(toks)) / len(toks) > 0.2 THEN 1 ELSE 0 END AS keep
      |FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val nTok = size(toks).cast("long")
    val nTypes = size(array_distinct(toks)).cast("long")
    docs(s, d)
      .select(col("doc_id"),
        nTok.as("n_tokens"),
        nTypes.as("n_types"),
        (nTypes / nTok).as("type_token_ratio"),
        ((col("n_chars") - nTok + 1) / nTok).as("mean_tok_len"),
        (size(filter(toks, t => t.isin("the", "a"))).cast("long") / nTok).as("stopword_ratio"),
        when(nTok.between(10, 1000) && nTypes / nTok > 0.2, 1).otherwise(0).as("keep"))
      .orderBy("doc_id")
  }

  /** Corpus stats by (lang, source): doc counts, char volume, length
    * distribution. One partial-aggregated shuffle on a 25-ary key. */
  val t05LangSourceStats: Q = Q(
    "t05_lang_source_stats",
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
      |  CAST(SUM(n_chars) AS BIGINT) / COUNT(*) AS avg_chars
      |FROM documents GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin) { (s, d) =>
    docs(s, d)
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        (sum(col("n_chars")) / count(lit(1))).as("avg_chars"))
      .orderBy("lang", "source")
  }

  /** Token counting, three ways (north star "whitespace + BPE-ish regex"):
    * whitespace split, regex word extraction, and a vowel-cluster subword
    * segmentation — all per-row regexp_extract_all, no shuffle. The
    * patterns stick to character classes so Java and RE2 agree. */
  val t06TokenCounting: Q = Q(
    "t06_token_counting",
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_ws,
      |  len(regexp_extract_all(text, '[a-z0-9]+')) AS n_words,
      |  len(regexp_extract_all(text, '[aeiou]+|[b-df-hj-np-tv-z]+')) AS n_subword,
      |  n_chars
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    // native zero-allocation token count (split semantics = #spaces + 1;
    // CountTokens scaladoc) — size(split()) materialized the full token
    // array per row only to read its length. The oracle keeps
    // len(string_split): same count, and CountTokensSpec pins parity.
    val nWs = org.apache.spark.sql.GraftPlanShim.column(
      graft.functions.CountTokens(
        org.apache.spark.sql.GraftPlanShim.expression(col("text"))))
    docs(s, d)
      .select(col("doc_id"),
        nWs.as("n_ws"),
        // regexp_count counts matches without materializing the match
        // array (the oracle keeps len(regexp_extract_all) — same count)
        regexp_count(col("text"), lit("[a-z0-9]+")).cast("long").as("n_words"),
        regexp_count(col("text"), lit("[aeiou]+|[b-df-hj-np-tv-z]+")).cast("long").as("n_subword"),
        col("n_chars"))
      .orderBy("doc_id")
  }

  /** Bag-of-words fingerprint: md5 over the sorted distinct token set — an
    * order-insensitive canonical content hash (the exact-dedup key for
    * shuffled-word near-identical docs). Per-row, no shuffle. */
  val t07FingerprintBow: Q = Q(
    "t07_fingerprint_bow",
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(col("doc_id"),
        md5(concat_ws(" ", sort_array(array_distinct(toks)))).as("fp"))
      .orderBy("doc_id")
  }

  /** Positional rolling hash: sum_i i * h(tok_i) with h = first 8 md5 hex
    * digits — order-sensitive, so token swaps change the fingerprint.
    * Bounded exactly (h < 2^32, i <= ~1e3, n <= ~1e3 ⇒ sum < 2^62), so
    * int64 arithmetic is exact on both engines. Per-row transform +
    * aggregate — no explode, no shuffle. */
  val t08FingerprintRolling: Q = Q(
    "t08_fingerprint_rolling",
    """SELECT doc_id,
      |  CAST(list_sum([i * (('0x' || substr(md5(toks[i]), 1, 8))::BIGINT)
      |                 for i in range(1, len(toks) + 1)]) AS BIGINT) AS fp
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val weighted = transform(toks,
      (t, i) => (i + 1).cast("long") * graft.functions.Md5PrefixLong(t, 1, 8))
    docs(s, d)
      .select(col("doc_id"),
        aggregate(weighted, lit(0L), (acc, x) => acc + x).as("fp"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination — the pre-training hygiene op: flag every
    * training doc sharing any word-5-gram with the eval set (stand-in:
    * doc_id < 10). The eval n-gram set is tiny by construction, so it
    * BROADCASTS and the training side is a per-row probe + semi join —
    * the corpus never shuffles, which is the only viable shape when the
    * corpus is 100 TB and the benchmark suite is megabytes. N-grams
    * travel as 8-byte hashes (d05's trick); the oracle restates the
    * overlap on the strings themselves, so a hash collision would show
    * up as a hash-mismatch — none occurs. */
  val t09Decontamination: Q = Q(
    "t09_decontamination",
    """WITH g AS (
      |  SELECT doc_id, [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
      |                  || toks[i+3] || ' ' || toks[i+4]
      |                  for i in range(1, len(toks) - 3)] AS grams
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 5),
      |eval_g AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 10),
      |train_g AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id >= 10)
      |SELECT DISTINCT doc_id FROM train_g WHERE gram IN (SELECT gram FROM eval_g)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    // Tokens pin FIRST (graft.Stage pattern): the gram lambda references
    // the token array 5x per element, and an inlined split(text) would
    // re-tokenize per reference — O(tokens^2) per doc, measured 6 s vs
    // ~1 s at sf0.1. The gram table pins too: both the eval set and the
    // training probe derive from it.
    val toksDf = graft.Stage.materialize(s,
      docs(s, d).select(col("doc_id"), toks.as("toks")).filter(size(toks) >= 5),
      "t09toks")
    val t = col("toks")
    val grams = transform(
      sequence(lit(1), size(t) - 4),
      i => xxhash64(concat_ws(" ", (0 until 5).map(o => element_at(t, i + o)): _*)))
    val g = toksDf.select(col("doc_id"), explode(grams).as("gh")).localCheckpoint()
    val evalG = g.filter(col("doc_id") < 10).select("gh").distinct()
    g.filter(col("doc_id") >= 10)
      .join(broadcast(evalG), Seq("gh"), "left_semi")
      .select("doc_id").distinct()
      .orderBy("doc_id")
  }

  /** PII-style scrubbing: digit runs and @-handles redacted with
    * regexp_replace before any downstream use — the earliest stage of a
    * real corpus pipeline. The patterns stay in the RE2/Java-regex
    * common dialect (char classes + quantifiers only), so both engines
    * rewrite identically; per-row map, zero shuffle. */
  val t10Redaction: Q = Q(
    "t10_redaction",
    """SELECT doc_id,
      |  regexp_replace(regexp_replace(text, '[0-9]+', '#'), '@[a-z]+', '@user') AS clean,
      |  length(text) - length(regexp_replace(text, '[0-9]', '')) AS n_digits
      |FROM documents WHERE doc_id < 200
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    docs(s, d)
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        regexp_replace(regexp_replace(col("text"), "[0-9]+", "#"), "@[a-z]+", "@user")
          .as("clean"),
        (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
          .cast("long").as("n_digits"))
      .orderBy("doc_id")
  }

  /** TF-IDF term weighting — the relevance score behind keyword
    * extraction, BM25-ish retrieval, and quality-signal features. The
    * idf here is the RATIONAL form N/df, not log(N/df): ln() is a libm
    * call whose last ulp differs across engines, which would break the
    * hash oracle for zero analytic benefit — N/df is order-isomorphic
    * to log(N/df) for fixed tf (log is monotone), and the score
    * tf·N/df is exact: all three operands are integers below 2^53, the
    * int→double conversions are exact, and one IEEE division is
    * correctly rounded identically everywhere. (A consumer who wants
    * the log form applies it AFTER the engine, to the returned tf/df
    * columns — which is why they are part of the output.)
    * Scale shape: tf is one (doc,term) hash agg; df re-aggregates tf's
    * output (already distinct doc-term pairs, no countDistinct
    * expansion); N is a one-row broadcast; the tf⋈df join shuffles on
    * the term — the vocabulary key, Zipf-skewed at corpus scale, which
    * is exactly what AQE skew splitting (q44) and salting (q31) exist
    * for. */
  val t11Tfidf: Q = Q(
    "t11_tfidf",
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY doc_id, tok),
      |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      |n AS (SELECT COUNT(*) AS n FROM documents)
      |SELECT doc_id, tok, tf, df, CAST(tf * n AS DOUBLE) / df AS tfidf
      |FROM tf JOIN df USING (tok), n
      |ORDER BY tfidf DESC, doc_id, tok LIMIT 50""".stripMargin) { (s, d) =>
    val tf = docs(s, d)
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs(s, d).agg(count(lit(1)).as("n"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"), col("tf"), col("df"),
        ((col("tf") * col("n")).cast("double") / col("df")).as("tfidf"))
      .orderBy(col("tfidf").desc, col("doc_id"), col("tok"))
      .limit(50)
  }

  /** Repetition filter — the Gopher/MassiveText quality rule family:
    * per-doc duplicate word-2-gram statistics (duplicate fraction, most
    * frequent gram's share) plus a keep flag. Repetitive generated/spam
    * text scores high and is dropped before training. One explode + one
    * (doc, gram) hash agg + one per-doc re-agg — both aggs partial-
    * aggregated, nothing else shuffles; fractions are exact int counts
    * through one IEEE division, so the hash oracle holds. */
  val t12Repetition: Q = Q(
    "t12_repetition",
    """WITH g AS (
      |  SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1]
      |                         for i in range(1, len(toks))]) AS gram
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 2),
      |c AS (SELECT doc_id, gram, COUNT(*) AS n FROM g GROUP BY doc_id, gram)
      |SELECT doc_id,
      |  CAST(SUM(n) AS BIGINT) AS n_grams,
      |  COUNT(*) AS n_distinct,
      |  CAST(SUM(n) - COUNT(*) AS BIGINT) / CAST(SUM(n) AS BIGINT) AS dup_frac,
      |  MAX(n) AS top_gram_n,
      |  MAX(n) / CAST(SUM(n) AS BIGINT) AS top_frac,
      |  CASE WHEN CAST(SUM(n) - COUNT(*) AS BIGINT) / CAST(SUM(n) AS BIGINT) < 0.5
      |       THEN 1 ELSE 0 END AS keep
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val t = col("toks")
    val grams = transform(
      sequence(lit(1), size(t) - 1),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1)))
    val counts = docs(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(t) >= 2)
      .select(col("doc_id"), explode(grams).as("gram"))
      .groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("n"))
    val nGrams = sum(col("n")).cast("long")
    val nDistinct = count(lit(1))
    counts.groupBy("doc_id")
      .agg(
        nGrams.as("n_grams"),
        nDistinct.as("n_distinct"),
        ((nGrams - nDistinct).cast("long") / nGrams).as("dup_frac"),
        max(col("n")).as("top_gram_n"),
        (max(col("n")) / nGrams).as("top_frac"),
        when((nGrams - nDistinct).cast("long") / nGrams < 0.5, 1).otherwise(0).as("keep"))
      .orderBy("doc_id")
  }

  /** BPE vocabulary bootstrap — the first merge-selection pass of
    * byte-pair-encoding training: corpus-weighted counts of adjacent
    * character pairs inside tokens. The token-frequency table aggregates
    * once (the corpus-size shuffle), then pairs explode from the DISTINCT
    * vocabulary only — at real scale the vocab is millions of rows while
    * the corpus is billions, so weighting by the pre-counted `tf` instead
    * of re-exploding the corpus is the only viable shape. Top pairs by
    * weighted count, ties by pair. */
  val t13BpePairs: Q = Q(
    "t13_bpe_pairs",
    """WITH tf AS (
      |  SELECT tok, COUNT(*) AS tf FROM
      |    (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok),
      |pairs AS (
      |  SELECT substr(tok, i, 2) AS pair, tf
      |  FROM tf, unnest(range(1, len(tok))) AS t(i)
      |  WHERE len(tok) >= 2)
      |SELECT pair, CAST(SUM(tf) AS BIGINT) AS n
      |FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 30""".stripMargin) { (s, d) =>
    val tf = docs(s, d)
      .select(explode(toks).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("tf"))
    val pairs = transform(
      sequence(lit(1), length(col("tok")) - 1),
      i => col("tok").substr(i, lit(2)))
    tf.filter(length(col("tok")) >= 2)
      .select(explode(pairs).as("pair"), col("tf"))
      .groupBy("pair")
      .agg(sum(col("tf")).cast("long").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(30)
  }

  /** Language-model-style frequency scoring — the CCNet/KenLM quality
    * filter reduced to exact arithmetic: score each doc by the MEAN
    * CORPUS FREQUENCY of its character trigrams (documents made of
    * common trigrams ≈ fluent text; rare-trigram docs ≈ noise, code,
    * mojibake). A true LM sums log-probs — a libm call whose last ulp
    * breaks cross-engine hashing (t11's reasoning) — while the mean
    * frequency is Σcount/n: integer sums < 2^53 and ONE correctly-
    * rounded division, bit-identical everywhere, and rank-usable the
    * same way. Scale shape: unlike t11's word vocabulary, the CHAR
    * trigram space is bounded (≤ |alphabet|³ ≈ 20k over lowercase+
    * space), so the count table BROADCASTS and the join-back is a
    * map-side hash probe — the exploded trigram stream never crosses
    * the wire; the only shuffles are the count aggregation (partial-
    * agged down to the bounded vocab) and the per-doc re-agg. Measured
    * dead end worth recording: folding a broadcast map COLUMN with
    * element_at instead of the join is 7x SLOWER (4 s → 30 s) —
    * Catalyst MapData has no hash lookup, so element_at linear-scans
    * the vocabulary per trigram; the broadcast hash JOIN is the O(1)
    * probe. */
  val t14LmScore: Q = Q(
    "t14_lm_score",
    """WITH tri AS (
      |  SELECT doc_id, substr(text, CAST(i AS INT), 3) AS g
      |  FROM documents, unnest(range(1, len(text) - 1)) AS t(i)
      |  WHERE len(text) >= 3),
      |c AS (SELECT g, COUNT(*) AS cnt FROM tri GROUP BY g)
      |SELECT doc_id, COUNT(*) AS n_tris,
      |  CAST(SUM(cnt) AS BIGINT) / COUNT(*) AS mean_freq
      |FROM tri JOIN c USING (g)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    // r15 opt pass: CharNgrams generator replaces the
    // explode(transform(sequence, substr)) spelling — substr walks bytes
    // from zero per position (O(len²) per doc, paid on BOTH the count
    // pass and the probe pass); the generator emits the same trigrams in
    // one O(len) byte walk as zero-copy slices. Same rows bit-for-bit
    // (CharNgrams scaladoc), oracle unchanged.
    val tris = org.apache.spark.sql.GraftPlanShim.column(
      graft.functions.CharNgrams(
        org.apache.spark.sql.GraftPlanShim.expression(col("text")),
        org.apache.spark.sql.catalyst.expressions.Literal(3)))
    val tri = docs(s, d).filter(length(col("text")) >= 3)
      .select(col("doc_id"), tris.as("g"))
    val counts = tri.groupBy("g").agg(count(lit(1)).as("cnt"))
    tri.join(broadcast(counts), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tris"),
        (sum(col("cnt")).cast("long") / count(lit(1))).as("mean_freq"))
      .orderBy("doc_id")
  }

  /** BM25 ranked retrieval — the scoring function behind production
    * keyword search (Lucene/Elasticsearch defaults k1=1.2, b=0.75),
    * over a fixed 3-term query, top 20 docs. Exact cross-engine via
    * t11's discipline, extended from one division to BM25's full form:
    *  - idf drops the log: Robertson idf ln((N-df+0.5)/(df+0.5)) uses a
    *    libm call whose last ulp differs across engines, so the entry
    *    scores with the RATIONAL argument (2N-2df+1)/(2df+1) — exact
    *    integers through one correctly-rounded division (monotone in
    *    the true idf for each term, and returned per-term so a consumer
    *    can apply log after the engine).
    *  - the tf saturation term tf·(k1+1)/(tf + k1(1-b+b·dl/avgdl)) with
    *    k1=6/5, b=3/4, avgdl=T/N clears denominators to pure integers:
    *    44·tf·T / (20·tf·T + 6·T + 18·dl·N). Every product stays below
    *    2^53 at any ScaleUp factor this repo runs (T≈2.7e7 at sf10), so
    *    the int→double conversions are exact and the single division is
    *    correctly rounded identically on both engines.
    *  - score = idf · tfn is ONE IEEE multiply of two correctly-rounded
    *    doubles; the 3-term total adds in fixed literal order. All
    *    deterministic — the hash oracle holds on doubles.
    * Scale shape: the exploded token stream is filtered to the 3 query
    * terms BEFORE the (doc,term) agg, so the shuffle carries only
    * matching postings (df and the one-row N/T corpus stats broadcast);
    * the pivot re-agg is partial-agged on doc_id. This is the
    * query-time path; t11 is the index-build path. */
  val t15Bm25: Q = Q(
    "t15_bm25",
    """WITH b AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |n AS (SELECT COUNT(*) AS n, CAST(SUM(len(toks)) AS BIGINT) AS t FROM b),
      |tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf, MAX(dl) AS dl FROM (
      |    SELECT doc_id, len(toks) AS dl, unnest(toks) AS tok FROM b)
      |  WHERE tok IN ('spark', 'vector', 'merge')
      |  GROUP BY doc_id, tok),
      |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      |s AS (
      |  SELECT doc_id, tok,
      |    (CAST(2 * n.n - 2 * df.df + 1 AS DOUBLE)
      |       / CAST(2 * df.df + 1 AS DOUBLE))
      |    * (CAST(44 * tf.tf * n.t AS DOUBLE)
      |       / CAST(20 * tf.tf * n.t + 6 * n.t + 18 * tf.dl * n.n AS DOUBLE))
      |      AS sc
      |  FROM tf JOIN df USING (tok), n),
      |p AS (
      |  SELECT doc_id,
      |    COALESCE(MAX(CASE WHEN tok = 'spark' THEN sc END), 0.0) AS s_spark,
      |    COALESCE(MAX(CASE WHEN tok = 'vector' THEN sc END), 0.0) AS s_vector,
      |    COALESCE(MAX(CASE WHEN tok = 'merge' THEN sc END), 0.0) AS s_merge
      |  FROM s GROUP BY doc_id)
      |SELECT doc_id, s_spark, s_vector, s_merge,
      |  s_spark + s_vector + s_merge AS bm25
      |FROM p ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
    val terms = Seq("spark", "vector", "merge")
    val base = docs(s, d).select(col("doc_id"), toks.as("toks"))
    val nt = base.agg(
      count(lit(1)).cast("long").as("n"),
      sum(size(col("toks"))).cast("long").as("t"))
    val tf = base
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).cast("long").as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).cast("long").as("df"))
    val sc = tf.join(broadcast(dfreq), "tok").crossJoin(broadcast(nt))
      .withColumn("sc",
        ((lit(2L) * col("n") - lit(2L) * col("df") + lit(1L)).cast("double")
          / (lit(2L) * col("df") + lit(1L)).cast("double"))
          * ((lit(44L) * col("tf") * col("t")).cast("double")
            / (lit(20L) * col("tf") * col("t") + lit(6L) * col("t")
              + lit(18L) * col("dl") * col("n")).cast("double")))
    def termScore(term: String): Column =
      coalesce(max(when(col("tok") === term, col("sc"))), lit(0.0))
    sc.groupBy("doc_id")
      .agg(termScore("spark").as("s_spark"),
        termScore("vector").as("s_vector"),
        termScore("merge").as("s_merge"))
      .withColumn("bm25", col("s_spark") + col("s_vector") + col("s_merge"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  /** Lexical-diversity quality filter — the Gopher/C4-style reject rule
    * for degenerate documents, in fully RATIONAL form so the hash oracle
    * holds: a doc is flagged when 3·n_types < n_toks (type-token ratio
    * under 1/3) or 8·top_count > n_toks (most-common token over 1/8 of
    * the text). Both predicates are pure integer comparisons — no float
    * thresholds, no libm; the reported ttr is one exact IEEE division of
    * two exact int→double conversions. Scale shape: a zero-shuffle
    * per-row map — the top-token count runs O(L²) higher-order-function
    * work INSIDE the row (L ≈ doc tokens, bounded), which beats a
    * corpus-wide (doc,token) agg precisely because it never exchanges
    * anything; the presentation sort is the only exchange. */
  val t16Diversity: Q = Q(
    "t16_diversity",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |m AS (SELECT doc_id, len(toks) AS n_toks, len(list_distinct(toks)) AS n_types,
      |        list_max([len(list_filter(toks, y -> y = x))
      |                  for x in list_distinct(toks)]) AS top_count
      |      FROM t)
      |SELECT doc_id, n_toks, n_types, top_count,
      |  CAST(n_types AS DOUBLE) / CAST(n_toks AS DOUBLE) AS ttr
      |FROM m WHERE 3 * n_types < n_toks OR 8 * top_count > n_toks
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val base = graft.Stage.materialize(s,
      docs(s, d).select(col("doc_id"), toks.as("toks")), "t16toks")
    val t = col("toks")
    val uniq = array_distinct(t)
    val m = base.select(col("doc_id"),
      size(t).cast("long").as("n_toks"),
      size(uniq).cast("long").as("n_types"),
      array_max(transform(uniq, x => size(filter(t, y => y === x))))
        .cast("long").as("top_count"))
    m.filter(lit(3) * col("n_types") < col("n_toks")
        || lit(8) * col("top_count") > col("n_toks"))
      .withColumn("ttr",
        col("n_types").cast("double") / col("n_toks").cast("double"))
      .orderBy("doc_id")
  }

  /** Bigram collocation mining by PMI — reported as the RATIONAL lift
    * n_xy·N / (n_x·n_y) rather than its log (t11's discipline: log is
    * monotone, a libm ulp would break the hash oracle for zero analytic
    * gain; a consumer applies log after the engine). n_x / n_y are the
    * left- / right-slot marginals, derived by RE-AGGREGATING the bigram
    * counts — the corpus is scanned once. Every product stays below 2^53
    * at any ScaleUp factor this repo runs (N ≈ 3e7 at sf10), so the
    * int→double conversions are exact and the single division is
    * correctly rounded identically on both engines. Scale shape: one
    * (x,y) hash agg over the exploded bigram stream (map-side combined);
    * the marginals and the scalar N are vocabulary-sized broadcasts. */
  val t17Collocations: Q = Q(
    "t17_collocations",
    """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
      |bg AS (SELECT toks[i] AS x, toks[i+1] AS y
      |       FROM t, unnest(range(1, len(toks))) AS u(i) WHERE len(toks) >= 2),
      |c AS (SELECT x, y, COUNT(*) AS nxy FROM bg GROUP BY x, y),
      |lx AS (SELECT x, SUM(nxy) AS nx FROM c GROUP BY x),
      |ry AS (SELECT y, SUM(nxy) AS ny FROM c GROUP BY y),
      |n AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM c)
      |SELECT x, y, nxy,
      |  CAST(nxy * n.n AS DOUBLE) / CAST(nx * ny AS DOUBLE) AS lift
      |FROM c JOIN lx USING (x) JOIN ry USING (y), n
      |WHERE nxy >= 5 ORDER BY lift DESC, x, y LIMIT 30""".stripMargin) { (s, d) =>
    val base = graft.Stage.materialize(s,
      docs(s, d).select(toks.as("toks")).filter(size(col("toks")) >= 2), "t17toks")
    val t = col("toks")
    val bg = base.select(explode(transform(
        sequence(lit(1), size(t) - 1),
        i => struct(element_at(t, i).as("x"), element_at(t, i + 1).as("y")))).as("b"))
      .select(col("b.x").as("x"), col("b.y").as("y"))
    val c = bg.groupBy("x", "y").agg(count(lit(1)).as("nxy"))
    val lx = c.groupBy("x").agg(sum(col("nxy")).as("nx"))
    val ry = c.groupBy("y").agg(sum(col("nxy")).as("ny"))
    val n = c.agg(sum(col("nxy")).cast("long").as("n"))
    c.join(broadcast(lx), "x").join(broadcast(ry), "y").crossJoin(broadcast(n))
      .filter(col("nxy") >= 5)
      .withColumn("lift",
        (col("nxy") * col("n")).cast("double") / (col("nx") * col("ny")).cast("double"))
      .select(col("x"), col("y"), col("nxy"), col("lift"))
      .orderBy(col("lift").desc, col("x"), col("y"))
      .limit(30)
  }

  /** Duplicated-segment suppression — the CCNet/RefinedWeb boilerplate
    * rule (drop repeated lines/paragraphs across the corpus) over this
    * corpus's newline-free docs: non-overlapping 8-token chunks, a chunk
    * appearing VERBATIM in >= 2 distinct docs is boilerplate, each doc
    * reports how much it lost plus an md5 of its retained text (trailing
    * sub-chunk tokens are out of chunking scope by definition). Scale
    * shape: every data-sized shuffle carries xxhash64 ids, never text
    * (d05's rule) — the chunk-df agg and the boilerplate membership test
    * both run on the exploded (doc, idx, hash) stream, where membership
    * is a BROADCAST HASH JOIN (O(1) per chunk; the first cut was an
    * array_contains scan over the whole boilerplate set — O(|bp|) per
    * chunk, measured 27 s at sf1 vs 3 s for this shape). The verdict
    * folds back to each doc as a sorted dropped-INDEX list (affected
    * docs only — the planted-duplication regime keeps that side
    * broadcastable; a corpus where most docs carry boilerplate upgrades
    * it to a shuffle join, one linear co-location of the corpus), so the
    * rebuild is a per-row indexed filter and document text never moves. */
  val t18Boilerplate: Q = Q(
    "t18_boilerplate",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |ch AS (SELECT doc_id, c AS idx, array_to_string(toks[c*8+1:c*8+8], ' ') AS ch
      |       FROM t, unnest(range(0, len(toks) // 8)) AS u(c) WHERE len(toks) >= 8),
      |dfc AS (SELECT ch, COUNT(DISTINCT doc_id) AS df FROM ch GROUP BY ch),
      |bp AS (SELECT ch FROM dfc WHERE df >= 2),
      |k AS (SELECT doc_id, COUNT(*) AS n_chunks,
      |        COUNT(*) FILTER (ch IN (SELECT ch FROM bp)) AS n_dropped,
      |        md5(COALESCE(string_agg(
      |          CASE WHEN ch NOT IN (SELECT ch FROM bp) THEN ch END,
      |          ' ' ORDER BY idx), '')) AS kept_hash
      |      FROM ch GROUP BY doc_id)
      |SELECT doc_id, n_chunks, n_dropped, kept_hash FROM k
      |WHERE n_dropped > 0 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val base = graft.Stage.materialize(s,
      docs(s, d).select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= 8),
      "t18toks")
    val t = col("toks")
    val chunks = transform(
      sequence(lit(0), (size(t).cast("long") / 8).cast("long") - 1),
      c => concat_ws(" ", (1 to 8).map(o => element_at(t, (c * 8 + o).cast("int"))): _*))
    val rows = graft.Stage.materialize(s,
      base.select(col("doc_id"), chunks.as("chunks")), "t18chunks")
    // chunk doc-frequency on hashes (two-level: per-(chunk,doc) partial
    // first); membership then probes the repeated set with a broadcast
    // hash join on the exploded hash stream
    val hashes = rows.select(col("doc_id"),
      posexplode(transform(col("chunks"), c => xxhash64(c))).as(Seq("idx", "h")))
    val dfc = hashes.groupBy("h", "doc_id").agg(count(lit(1)).as("occ"))
      .groupBy("h").agg(count(lit(1)).as("df"))
    val bp = dfc.filter(col("df") >= 2).select("h")
    val dropped = hashes.join(broadcast(bp), "h")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("idx"))).as("bad"))
    rows.join(broadcast(dropped), Seq("doc_id"))
      .select(col("doc_id"),
        size(col("chunks")).cast("long").as("n_chunks"),
        size(col("bad")).cast("long").as("n_dropped"),
        md5(concat_ws(" ",
          filter(col("chunks"), (_, i) => !array_contains(col("bad"), i))))
          .as("kept_hash"))
      .orderBy("doc_id")
  }

  /** Overlapping token-window chunking — the retrieval-corpus prep step
    * between cleaning and embedding: every document becomes ⌈(n−W)/S⌉+1
    * windows of W=32 tokens at stride S=24 (8-token overlap so no answer
    * span is ever split across a boundary without a copy). Pure per-row
    * explode — zero shuffles, chunk volume linear in corpus tokens; the
    * chunk text itself stays distributed (the output carries its md5,
    * the id the downstream embed/dedup stages key on). The start/count
    * arithmetic is stated identically on both engines in integer ops —
    * the last window starts at S·⌈(n−W)/S⌉ < n, so every chunk is
    * non-empty and the tail is always covered. */
  val t19ChunkOverlap: Q = Q(
    "t19_chunk_overlap",
    """WITH a AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |c AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
      |        list_slice(l, CAST(i*24 + 1 AS BIGINT), CAST(i*24 + 32 AS BIGINT)) AS sl
      |      FROM a, LATERAL unnest(range(0, 1 + greatest(0, (len(l) - 9) // 24))) AS t(i))
      |SELECT doc_id, chunk_idx, CAST(len(sl) AS INT) AS n_tok,
      |  md5(array_to_string(sl, ' ')) AS h
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("l"))
      // (n−W+S−1) div S = ceil((n−32)/24); both engines clamp the
      // negative small-doc case through greatest(0, ·)
      .select(col("doc_id"), col("l"),
        explode(sequence(lit(0L),
          expr("greatest(0L, (size(l) - 9) div 24)"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        expr("slice(l, cast(chunk_idx*24 + 1 as int), 32)").as("sl"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("sl")).as("n_tok"),
        md5(concat_ws(" ", col("sl"))).as("h"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** BPE ENCODING — t13 learns the merge table; this entry APPLIES it,
    * the tokenizer step every training pipeline runs over its whole
    * corpus. The merge list is t13's top-30 character pairs in rank
    * order, and encoding is exact BPE for such a list: because every
    * merge joins two SINGLE characters and a merged token is inert (no
    * 3-char pair exists in the table), "repeatedly merge the best-
    * ranked pair present" reduces to one replace-all pass per merge in
    * rank order — higher ranks consume characters first, lower ranks
    * get what's left, and no merge can create sites for a better one.
    * Each pass is a plain (non-regex) string replace over a delimited
    * symbol string '|t|h|e|': the pattern '|t|h|' only matches two
    * ADJACENT SINGLE-CHAR symbols, and replacing consumes the shared
    * delimiter, which is exactly left-to-right non-overlapping
    * application ('aaa' + 'aa' → ['aa','a'], verified both engines).
    * One caveat the delimiter form carries: in a run of the SAME char
    * ≥ 4, consuming the shared '|' makes the pass merge alternately
    * ('aaaa' → [aa,a,a] where a rescanning encoder gives [aa,aa]) —
    * both engines do the identical thing, so the cross-engine check is
    * unaffected; t25's doubly-delimited form is the run-exact variant.
    * Word boundaries need no special casing: spaces are symbols and
    * never appear in a within-token merge pair. The corpus pass is a
    * per-row fold of 30 replaces with the merge table broadcast — zero
    * data-path shuffles; the delimiter is safe because the corpus
    * contains no '|' (asserted cheaply by the oracle equality itself:
    * a collision would desync the two engines). */
  val t20BpeEncode: Q = Q(
    "t20_bpe_encode",
    """WITH tf AS (
      |  SELECT tok, COUNT(*) AS tf FROM
      |    (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok),
      |pr AS (
      |  SELECT substr(tok, i, 2) AS pair, tf
      |  FROM tf, unnest(range(1, len(tok))) AS t(i)
      |  WHERE len(tok) >= 2),
      |top AS (SELECT pair, SUM(tf) AS n FROM pr GROUP BY pair
      |        ORDER BY n DESC, pair LIMIT 30),
      |m AS (SELECT list(pair ORDER BY n DESC, pair) AS merges FROM top),
      |e AS (
      |  SELECT doc_id, list_reduce(
      |    list_prepend(CAST('|' || regexp_replace(text, '(.)', '\1|', 'g') AS VARCHAR),
      |                 m.merges),
      |    (s, p) -> replace(s, '|' || substr(p,1,1) || '|' || substr(p,2,1) || '|',
      |                      '|' || p || '|')) AS enc
      |  FROM documents, m),
      |tk AS (SELECT doc_id, enc,
      |         list_filter(string_split(enc, '|'), x -> x <> '') AS toks2 FROM e)
      |SELECT doc_id, CAST(len(toks2) AS BIGINT) AS n_tok,
      |  CAST(len(list_filter(toks2, x -> len(x) = 2)) AS BIGINT) AS n_merged,
      |  md5(enc) AS fp
      |FROM tk ORDER BY doc_id""".stripMargin) { (s, d) =>
    val tf = docs(s, d)
      .select(explode(toks).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("tf"))
    val pairsOf = transform(
      sequence(lit(1), length(col("tok")) - 1),
      i => col("tok").substr(i, lit(2)))
    val top = tf.filter(length(col("tok")) >= 2)
      .select(explode(pairsOf).as("pair"), col("tf"))
      .groupBy("pair")
      .agg(sum(col("tf")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(30)
    // rank-ordered merge array: struct(-n, pair) sorts ascending ==
    // (n desc, pair asc) — the LIMIT 30 boundary is tie-deterministic
    val merges = top.agg(expr(
      "transform(sort_array(collect_list(struct(-n as nn, pair))), x -> x.pair)")
      .as("merges"))
    // Encode fold rides the BpeFold kernel (r16): one byte-walk build of
    // the delimited form + 30 byte-scan merge passes per doc, replacing
    // the regex walk + 31 per-doc full-string allocations of the SQL
    // fold. Bit-identical enc (BpeFoldSpec pins it against the verbatim
    // fold on the fixture corpus; md5(enc) is the output contract).
    docs(s, d)
      .crossJoin(broadcast(merges))
      .select(col("doc_id"), org.apache.spark.sql.GraftPlanShim.column(
        graft.functions.BpeFold(
          org.apache.spark.sql.GraftPlanShim.expression(col("text")),
          org.apache.spark.sql.GraftPlanShim.expression(col("merges")))).as("enc"))
      .select(col("doc_id"), col("enc"),
        expr("filter(split(enc, '\\\\|'), x -> x != '')").as("toks2"))
      .select(col("doc_id"),
        size(col("toks2")).cast("long").as("n_tok"),
        expr("size(filter(toks2, x -> length(x) = 2))").cast("long").as("n_merged"),
        md5(col("enc")).as("fp"))
      .orderBy("doc_id")
  }

  /** Gopher-style composite quality-rule gate (Rae et al. 2021 §A1.1's
    * rule family, re-expressed over this corpus's signals) — the
    * multi-signal keep/drop decision a pre-training curation pass runs
    * after the cheap per-row filters (t04) and before dedup:
    *
    *  - `digit_ratio` / `alpha_ratio`: fraction of token OCCURRENCES
    *    that are pure digits / contain a letter (Gopher's "80% of words
    *    must contain an alphabetic character").
    *  - `max_tok_frac`: highest single-token share of the doc — the
    *    degenerate-repetition signal ("the the the…").
    *  - `simpson_repeat`: the repeat probability Σc(c−1)/(n(n−1)) (the
    *    Simpson index over the unigram distribution) — the
    *    lexical-diversity signal. Deliberately Simpson and NOT Shannon
    *    entropy: entropy needs a per-term ln() whose last ulp differs
    *    across engines (t15's idf note), while Simpson is exact integer
    *    sums through one correctly-rounded division — hash-exact by
    *    construction.
    *  - `keep`: all thresholds compare exact-int-derived doubles, so
    *    the flag is deterministic on both engines.
    *
    * Shape at scale: corpus-size-ADAPTIVE (the d05/d19 cost-based
    * call — see qualitySignals for both plans and the measured
    * crossover). Up to ~2M docs: explode → (doc, tok) hash-agg →
    * per-doc agg, the measured-fastest shape at bench SFs. Above:
    * every signal is a function of ONE document, so the scale path
    * computes them SCAN-LOCALLY with zero shuffle — run lengths over
    * each doc's sorted token hashes for the histogram stats,
    * translate()-deletion classifiers for digit/alpha. The round-11
    * length-stationary ladder is what exposed the small-shape's bend:
    * (doc_id, tok) keys are doc-local, so map-side combining only
    * merges within-doc repeats and the string-keyed partial-agg hash
    * maps blow past task memory into sort-based fallback (20.4×/decade
    * into sfc100) — a spill the plan cannot avoid because its key
    * cardinality IS the corpus token volume. */
  val t21QualityRules: Q = Q(
    "t21_quality_rules",
    """WITH tokc AS (
      |  SELECT doc_id, tok, COUNT(*) AS c FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY doc_id, tok),
      |agg AS (
      |  SELECT doc_id,
      |    CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(MAX(c) AS BIGINT) AS max_c,
      |    CAST(SUM(c * (c - 1)) AS BIGINT) AS rep_pairs,
      |    CAST(SUM(CASE WHEN regexp_full_match(tok, '[0-9]+') THEN c ELSE 0 END) AS BIGINT) AS digit_toks,
      |    CAST(SUM(CASE WHEN regexp_matches(tok, '[a-zA-Z]') THEN c ELSE 0 END) AS BIGINT) AS alpha_toks
      |  FROM tokc GROUP BY doc_id)
      |SELECT doc_id, n_tokens,
      |  digit_toks / n_tokens AS digit_ratio,
      |  alpha_toks / n_tokens AS alpha_ratio,
      |  max_c / n_tokens AS max_tok_frac,
      |  CASE WHEN n_tokens > 1 THEN rep_pairs / (n_tokens * (n_tokens - 1)) ELSE 1.0 END AS simpson_repeat,
      |  CASE WHEN n_tokens BETWEEN 10 AND 5000
      |        AND digit_toks / n_tokens < 0.3
      |        AND alpha_toks / n_tokens > 0.5
      |        AND max_c / n_tokens < 0.2
      |        AND n_tokens > 1 AND rep_pairs / (n_tokens * (n_tokens - 1)) < 0.05
      |       THEN 1 ELSE 0 END AS keep
      |FROM agg ORDER BY doc_id""".stripMargin) { (s, d) =>
    qualitySignals(s, d).orderBy("doc_id")
  }

  /** t21's per-doc signal table (unordered) — shared with t26, which
    * uses the `keep` flag as the evaluation gold standard. */
  private def qualitySignals(s: SparkSession, d: String): DataFrame = {
    // STRATEGY is corpus-size-adaptive (the d05/d19 cost-based call):
    //  - up to ~2M docs, explode -> groupBy(doc_id, tok) wins on this
    //    box (6.1 s at sfc10 vs the fold shape's 16.0) — the partial
    //    agg's doc-local keys fit task memory and the string shuffle is
    //    cheap at this volume;
    //  - above it, the same plan's partial-agg hash maps blow past task
    //    memory into sort-based fallback — the round-11 length-
    //    stationary ladder measured 20.4x/decade into sfc100 (125.2 s)
    //    because the key cardinality IS the corpus token volume — so
    //    the scale path computes every signal SCAN-LOCALLY (zero
    //    shuffle): run lengths over each doc's sorted token hashes for
    //    max_c / sum c(c-1), translate()-deletion classifiers for
    //    digit/alpha (exactly the regex predicates, minus the regex
    //    engine). Equal at sfc100 today (123.8 s) and flat-exponent
    //    beyond it, where the groupBy spill only deepens; at 100 TB it
    //    is a pure map pass vs shuffling the tokenized corpus.
    // Both paths are exact (within-doc 64-bit hash collisions sit in
    // d02's accepted regime); CurationOpsSpec pins them row-identical.
    val nDocs = Tables.t(s, d, "documents").count()
    val agg = if (nDocs <= 2000000L && !sys.props.contains("graft.t21.forceFold")) {
      // Layout.widen: the explode + map-side partial agg is this
      // entry's whole cost, and it runs at the SCAN's parallelism — 8
      // file splits at sf100 left 24 of 32 cores idle.
      val tokc = graft.Layout.widen(s, docs(s, d))
        .select(col("doc_id"), explode(toks).as("tok"))
        .groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("c"))
      tokc.groupBy("doc_id").agg(
        sum(col("c")).as("n_tokens"),
        max(col("c")).as("max_c"),
        sum(col("c") * (col("c") - 1)).as("rep_pairs"),
        sum(when(col("tok").rlike("^[0-9]+$"), col("c")).otherwise(0L)).as("digit_toks"),
        sum(when(col("tok").rlike("[a-zA-Z]"), col("c")).otherwise(0L)).as("alpha_toks"))
    } else {
      // Every HOF output is staged behind its own projection boundary
      // before being referenced twice (t02's lesson: HOFs don't CSE).
      val letters = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
      graft.Layout.widen(s, docs(s, d))
        .select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"), col("toks"),
          sort_array(transform(col("toks"), t => xxhash64(t))).as("sorted"))
        .select(col("doc_id"), col("toks"),
          filter(sequence(lit(1), size(col("sorted"))), i =>
            i === 1 ||
              element_at(col("sorted"), i) =!= element_at(col("sorted"), i - 1))
            .as("starts"),
          (size(col("sorted")) + 1).as("lp1"))
        .select(col("doc_id"), col("toks"),
          zip_with(
            concat(slice(col("starts"), lit(2),
              greatest(size(col("starts")) - 1, lit(0))), array(col("lp1"))),
            col("starts"), (e, b) => (e - b).cast("long")).as("runs"))
        .select(
          col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          coalesce(array_max(col("runs")), lit(0L)).as("max_c"),
          aggregate(col("runs"), lit(0L), (a, r) => a + r * (r - 1L))
            .as("rep_pairs"),
          size(filter(col("toks"), t =>
            length(translate(t, "0123456789", "")) === 0 && length(t) > 0))
            .cast("long").as("digit_toks"),
          size(filter(col("toks"), t =>
            length(translate(t, letters, "")) < length(t)))
            .cast("long").as("alpha_toks"))
    }
    val n = col("n_tokens")
    val digitRatio = col("digit_toks") / n
    val alphaRatio = col("alpha_toks") / n
    val maxFrac = col("max_c") / n
    val simpson = when(n > 1, col("rep_pairs") / (n * (n - 1))).otherwise(lit(1.0))
    agg.select(col("doc_id"), n,
      digitRatio.as("digit_ratio"),
      alphaRatio.as("alpha_ratio"),
      maxFrac.as("max_tok_frac"),
      simpson.as("simpson_repeat"),
      when(n.between(10, 5000) && digitRatio < 0.3 && alphaRatio > 0.5 &&
        maxFrac < 0.2 && n > 1 && col("rep_pairs") / (n * (n - 1)) < 0.05, 1)
        .otherwise(0).as("keep"))
  }

  /** HASHED LINEAR CLASSIFIER scoring — the fastText architecture
    * (Joulin et al. 2016, "Bag of Tricks for Efficient Text
    * Classification") that production quality filters (CCNet, GPT-3's
    * WebText classifier) run over every document: unigram + bigram
    * features, the hashing trick into a fixed bucket table, a linear
    * score. Weights here are a deterministic closed form over the
    * bucket id (a Knuth multiplicative mix into [-1024, 1024)) standing
    * in for trained parameters, which keeps the entry INTEGER-exact
    * end-to-end: feature hash = the catalog's md5-portable 32-bit hash
    * (d06's spelling, bit-identical in DuckDB), bucket = h % 1024,
    * logit = Σ w(bucket) over feature INSTANCES (fastText sums then
    * normalizes; the sum is the exact part, so the entry reports it
    * plus n_feats rather than dividing), keep = sign. A trained model
    * swaps the closed form for a broadcast weight array — the plan
    * shape (per-row map, zero shuffles) is identical.
    *
    * Scale posture: pure scan-local HOF fold per document — no
    * explode, no shuffle, nothing leaves the row. The t02/st21 lesson
    * applies: tokens materialize once, and the bigram array builds in
    * a staged projection so the HOF's repeated references don't
    * re-tokenize. */
  val t22HashedClassifier: Q = Q(
    "t22_hashed_classifier",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    unnest(toks || [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS feat
      |  FROM t)
      |SELECT doc_id, COUNT(*) AS n_feats,
      |  CAST(SUM(((('0x' || substr(md5(feat), 1, 8))::BIGINT % 1024)
      |            * 2654435761) % 2048 - 1024) AS BIGINT) AS logit,
      |  CASE WHEN CAST(SUM(((('0x' || substr(md5(feat), 1, 8))::BIGINT % 1024)
      |            * 2654435761) % 2048 - 1024) AS BIGINT) > 0
      |       THEN 1 ELSE 0 END AS keep
      |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    classifierScores(s, d).orderBy("doc_id")
  }

  /** t22's per-doc classifier output (unordered) — shared with t26,
    * which evaluates the `keep` prediction against t21's rule gate. */
  private def classifierScores(s: SparkSession, d: String): DataFrame = {
    val toksDf = graft.Stage.materialize(s,
      docs(s, d).select(col("doc_id"), split(col("text"), " ").as("toks")),
      "t22toks")
    val t = col("toks")
    val bigrams = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))
    def weight(f: Column): Column =
      pmod(graft.functions.Md5PrefixLong(f, 1, 8) % 1024L
        * 2654435761L, lit(2048L)) - 1024L
    toksDf
      .select(col("doc_id"), concat(t, bigrams).as("feats"))
      .select(col("doc_id"),
        size(col("feats")).cast("long").as("n_feats"),
        aggregate(col("feats"), lit(0L), (acc, f) => acc + weight(f)).as("logit"))
      .withColumn("keep", when(col("logit") > 0, 1).otherwise(0))
  }

  /** GPT-style sequence packing (concat-and-chunk): concatenate documents
    * in a deterministic order and slice the token stream into fixed
    * 256-token training sequences, emitting each document's (sequence id,
    * offset) placement. This is the layout step every pretraining run
    * needs between "clean corpus" and "batches" — the reference has
    * nothing like it.
    *
    * Scale shape: packing is per-SHARD, never global — a single global
    * prefix sum would serialize the corpus through one partition. Each
    * shard's running token count is one window over that shard
    * (production: shard count ~ O(cluster cores); 8 here to keep the
    * sf0.01 oracle readable). Sharding is doc_id % 8 so DuckDB can
    * reproduce it — production would use the same pmod over xxhash64.
    * Token counts come from the zero-allocation native CountTokens
    * (t06), not size(split(...)). The window carries (8-byte id, long
    * count) only — document text never enters the shuffle. */
  val t23SequencePack: Q = Q(
    "t23_sequence_pack",
    """WITH s AS (SELECT doc_id, doc_id % 8 AS shard,
      |    len(string_split(text, ' ')) AS n_tok FROM documents),
      |w AS (SELECT doc_id, shard, n_tok,
      |    CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
      |        ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS start_tok FROM s)
      |SELECT doc_id, shard, n_tok,
      |  start_tok // 256 AS seq_id, start_tok % 256 AS seq_off
      |FROM w ORDER BY doc_id""".stripMargin) { (s, d) =>
    val nTok = org.apache.spark.sql.GraftPlanShim.column(
      graft.functions.CountTokens(
        org.apache.spark.sql.GraftPlanShim.expression(col("text"))))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(s, d)
      .select(col("doc_id"), pmod(col("doc_id"), lit(8L)).as("shard"),
        nTok.as("n_tok"))
      .withColumn("start_tok", sum(col("n_tok")).over(w) - col("n_tok"))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        expr("start_tok div 256").as("seq_id"),
        pmod(col("start_tok"), lit(256L)).as("seq_off"))
      .orderBy("doc_id")
  }

  /** Token-budget subset selection: "give me the best 10k training tokens"
    * — rank docs by a quality score (per-mille distinct-token ratio,
    * integer arithmetic so both engines agree exactly), walk the ranking,
    * and keep the prefix whose cumulative token count fits the budget.
    * The curation step behind every quality-pareto ablation (e.g. the
    * FineWeb/DCLM "top-X%-by-classifier" recipes).
    *
    * Scale shape — the oracle's global window (one ordered prefix sum over
    * the corpus) would serialize 100 TB through a single partition, so the
    * Spark plan is the two-phase equivalent:
    *  1. aggregate token totals per score bucket (scores are already
    *     per-mille ints, so <= 1001 groups — a map-side-combined hash agg
    *     whose output is tiny), prefix-sum THAT on the driver-scale table,
    *     and keep only buckets that start under budget;
    *  2. broadcast the surviving (score -> tokens-before-this-bucket)
    *     list back, window WITHIN each score bucket (parallel across
    *     buckets, never global), and filter bucket_prior + in-bucket
    *     prefix <= budget.
    * Identical output to the global window because (score DESC, doc_id)
    * ordering is exactly (bucket, in-bucket) ordering — proven by the
    * hash match, including the reconstructed global `cum` column. */
  val t24TokenBudgetSelect: Q = Q(
    "t24_token_budget_select",
    """WITH s AS (SELECT doc_id,
      |    len(string_split(text, ' ')) AS n_tok,
      |    (1000 * len(list_distinct(string_split(text, ' '))))
      |      // len(string_split(text, ' ')) AS score
      |  FROM documents),
      |w AS (SELECT doc_id, score, n_tok,
      |    CAST(sum(n_tok) OVER (ORDER BY score DESC, doc_id
      |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM s)
      |SELECT doc_id, score, n_tok, cum FROM w
      |WHERE cum <= 10000 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val budget = 10000L
    val nTok = org.apache.spark.sql.GraftPlanShim.column(
      graft.functions.CountTokens(
        org.apache.spark.sql.GraftPlanShim.expression(col("text"))))
    val base = docs(s, d)
      .select(col("doc_id"), nTok.as("n_tok"),
        size(array_distinct(toks)).cast("long").as("n_uniq"))
      .select(col("doc_id"), col("n_tok"),
        expr("(1000 * n_uniq) div n_tok").as("score"))
    // Phase 1: <= 1001 bucket rows — the single-partition window is over
    // this tiny aggregate, never the corpus.
    val bw = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val priors = base.groupBy("score").agg(sum(col("n_tok")).as("btok"))
      .withColumn("bprior", sum(col("btok")).over(bw) - col("btok"))
      .filter(col("bprior") < budget)
      .select(col("score"), col("bprior"))
    // Phase 2: per-bucket windows, bucket-pruned by the broadcast priors.
    val ww = Window.partitionBy("score").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(priors), "score")
      .withColumn("cum", col("bprior") + sum(col("n_tok")).over(ww))
      .filter(col("cum") <= budget)
      .select(col("doc_id"), col("score"), col("n_tok"), col("cum"))
      .orderBy("doc_id")
  }

  /** CLASSIFIER EVALUATION — the step between t22 (score every doc with
    * a hashed linear classifier) and shipping it as the corpus gate:
    * score the classifier's keep/drop PREDICTION against t21's
    * quality-rule gate as the reference label, emitting the confusion
    * matrix and precision/recall/F1. No production curation pipeline
    * promotes a filter without this table (d14 is the same discipline
    * for the dedup index, v17/v18 for the ANN index); the two entries
    * this one composes are reused via shared helpers, so the evaluated
    * artifacts are BIT-IDENTICAL to what t21/t22 themselves emit.
    *
    * Exactness: the four cells are integer counts; the three rates are
    * INTEGER BASIS POINTS via `div` (exact integer division, identical
    * everywhere — not a float ratio whose last ulp could differ). Zero
    * denominators guard to 0 rather than erroring so the entry is total.
    *
    * Scale shape: t21's signal agg (vocabulary-bounded shuffle) and
    * t22's per-row fold (zero shuffles) each produce (doc_id, flag);
    * the join and final agg move 8-byte keys + one int per side, then
    * collapse to ONE row. Evaluating a 100 TB corpus costs the two
    * scoring passes plus a key-width join — document text never
    * shuffles. */
  val t26ClassifierEval: Q = Q(
    "t26_classifier_eval",
    """WITH tokc AS (
      |  SELECT doc_id, tok, COUNT(*) AS c FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY doc_id, tok),
      |agg AS (
      |  SELECT doc_id,
      |    CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(MAX(c) AS BIGINT) AS max_c,
      |    CAST(SUM(c * (c - 1)) AS BIGINT) AS rep_pairs,
      |    CAST(SUM(CASE WHEN regexp_full_match(tok, '[0-9]+') THEN c ELSE 0 END) AS BIGINT) AS digit_toks,
      |    CAST(SUM(CASE WHEN regexp_matches(tok, '[a-zA-Z]') THEN c ELSE 0 END) AS BIGINT) AS alpha_toks
      |  FROM tokc GROUP BY doc_id),
      |gold AS (
      |  SELECT doc_id,
      |    CASE WHEN n_tokens BETWEEN 10 AND 5000
      |          AND digit_toks / n_tokens < 0.3
      |          AND alpha_toks / n_tokens > 0.5
      |          AND max_c / n_tokens < 0.2
      |          AND n_tokens > 1 AND rep_pairs / (n_tokens * (n_tokens - 1)) < 0.05
      |         THEN 1 ELSE 0 END AS g
      |  FROM agg),
      |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    unnest(toks || [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS feat
      |  FROM t),
      |pred AS (
      |  SELECT doc_id,
      |    CASE WHEN CAST(SUM(((('0x' || substr(md5(feat), 1, 8))::BIGINT % 1024)
      |              * 2654435761) % 2048 - 1024) AS BIGINT) > 0
      |         THEN 1 ELSE 0 END AS p
      |  FROM f GROUP BY doc_id),
      |c AS (SELECT
      |    CAST(SUM(CASE WHEN g = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |    CAST(SUM(CASE WHEN g = 0 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |    CAST(SUM(CASE WHEN g = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
      |    CAST(SUM(CASE WHEN g = 0 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      |  FROM gold JOIN pred USING (doc_id))
      |SELECT tp, fp, fn, tn,
      |  CAST(CASE WHEN tp + fp = 0 THEN 0 ELSE (10000 * tp) // (tp + fp) END AS BIGINT) AS precision_bp,
      |  CAST(CASE WHEN tp + fn = 0 THEN 0 ELSE (10000 * tp) // (tp + fn) END AS BIGINT) AS recall_bp,
      |  CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0 ELSE (20000 * tp) // (2 * tp + fp + fn) END AS BIGINT) AS f1_bp
      |FROM c""".stripMargin) { (s, d) =>
    val gold = qualitySignals(s, d).select(col("doc_id"), col("keep").as("g"))
    val pred = classifierScores(s, d).select(col("doc_id"), col("keep").as("p"))
    def cell(g: Int, p: Int) =
      sum(when(col("g") === g && col("p") === p, 1L).otherwise(0L))
    // hash, not sort-merge (r14 heavy-tier SMJ lint): both sides are
    // |docs|-row (doc_id, bool) streams and the output is the same size
    // — sorting both buys nothing a hash build doesn't. A/B w3 at sf10:
    // 7.18 vs 7.84 s, matched calibrations; the avoided double sort is
    // corpus-sized at sfc100.
    gold.join(pred.hint("shuffle_hash"), "doc_id")
      .agg(cell(1, 1).as("tp"), cell(0, 1).as("fp"),
        cell(1, 0).as("fn"), cell(0, 0).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") === 0, 0L)
          .otherwise(expr("(10000 * tp) div (tp + fp)")).as("precision_bp"),
        when(col("tp") + col("fn") === 0, 0L)
          .otherwise(expr("(10000 * tp) div (tp + fn)")).as("recall_bp"),
        when(lit(2) * col("tp") + col("fp") + col("fn") === 0, 0L)
          .otherwise(expr("(20000 * tp) div (2 * tp + fp + fn)")).as("f1_bp"))
  }

  /** BPE TRAINING, the full iterative loop — t13 is one pair-count pass
    * and t20 applies a FIXED single-char merge table; this entry LEARNS a
    * 6-merge table the way Sennrich et al. 2016's trainer does: each
    * round counts adjacent SYMBOL pairs (symbols, not characters — round
    * 6 here picks m+er→mer, a second-level merge t13 can never produce),
    * takes the argmax (ties by pair, deterministic), merges it everywhere,
    * and repeats on the merged vocabulary.
    *
    * Exactness of the merge step: symbols are kept DOUBLY delimited
    * ('|t||h||e|'), so one non-overlapping left-to-right replace of
    * '|a||b|' with '|ab|' merges ALL occurrences in the round, including
    * consecutive ones in a run — '|a||a||a||a|' + (a,a) → '|aa||aa|',
    * which t20's shared-delimiter form cannot do (its replace consumes
    * the shared '|', so runs ≥ 4 merge only alternately; exact there
    * because its single-char merge list makes both engines agree, noted
    * in its scaladoc). One replace pass per round IS the trainer's batch
    * semantics (every implementation applies the chosen merge to all
    * sites before recounting).
    *
    * Scale shape — the reason BPE training is feasible at 100 TB: the
    * CORPUS is touched exactly once (token-frequency agg, the only
    * corpus-sized shuffle); all 6 iterations run over the VOCABULARY
    * (millions of rows against billions of corpus rows), weighted by tf.
    * Per round: pair explode + partial-agged count, a 1-row argmax via
    * TakeOrdered, and a broadcast of that single row into the rewrite —
    * no collect, no driver-side state. Round state is pinned with
    * Stage.materialize (p03's iterative-loop discipline): without it the
    * v_{r-1} lineage appears in BOTH b_r and v_r, and the corpus agg
    * re-executes 2^K times. */
  val t25BpeTrain: Q = Q(
    "t25_bpe_train", {
      val rounds = (1 to 6).map { r =>
        s"""b$r AS (
           |  SELECT a, b, CAST(SUM(tf) AS BIGINT) AS n FROM (
           |    SELECT arr[i] AS a, arr[i+1] AS b, tf FROM
           |      (SELECT string_split(trim(sym, '|'), '||') AS arr, tf FROM v${r - 1}) s,
           |      unnest(range(1, len(arr))) AS t(i))
           |  GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1),
           |v$r AS (
           |  SELECT replace(sym, '|' || a || '||' || b || '|', '|' || a || b || '|') AS sym, tf
           |  FROM v${r - 1}, b$r)""".stripMargin
      }.mkString(",\n")
      val union = (1 to 6)
        .map(r => s"SELECT $r AS rank, a, b, a || b AS merged, n FROM b$r")
        .mkString(" UNION ALL ")
      s"""WITH tf AS (
         |  SELECT tok, COUNT(*) AS tf FROM
         |    (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         |  WHERE tok NOT LIKE '%|%'
         |  GROUP BY tok),
         |v0 AS (SELECT regexp_replace(tok, '(.)', '|\\1|', 'g') AS sym, tf FROM tf),
         |$rounds
         |SELECT * FROM ($union) ORDER BY rank""".stripMargin
    }) { (s, d) =>
    // '|' is the symbol delimiter: a token CONTAINING '|' would
    // symbolize to '|||' and corrupt the pair decode (identically in
    // the SQL dual, so the oracle can't catch it) — drop such tokens
    // up front on BOTH sides instead of relying on a no-pipe corpus.
    val tf0 = docs(s, d)
      .select(explode(toks).as("tok"))
      .filter(!col("tok").contains("|"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
      .select(regexp_replace(col("tok"), "(.)", "|$1|").as("sym"), col("tf"))
    var vocab = graft.Stage.materialize(s, tf0, "t25v0")
    val bests = Seq.newBuilder[org.apache.spark.sql.DataFrame]
    for (r <- 1 to 6) {
      val arr = split(expr("trim(BOTH '|' FROM sym)"), "\\|\\|")
      val pairs = vocab
        .select(arr.as("arr"), col("tf"))
        .filter(size(col("arr")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("arr")) - 1),
          i => struct(element_at(col("arr"), i).as("a"),
            element_at(col("arr"), i + 1).as("b")))).as("p"), col("tf"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("tf")).cast("long").as("n"))
      val best = graft.Stage.materialize(s,
        pairs.orderBy(col("n").desc, col("a"), col("b")).limit(1)
          .withColumn("rank", lit(r)), s"t25b$r")
      bests += best
      if (r < 6) vocab = graft.Stage.materialize(s,
        vocab.crossJoin(broadcast(best.select("a", "b")))
          .select(expr(
            "replace(sym, concat('|',a,'||',b,'|'), concat('|',a,b,'|'))").as("sym"),
            col("tf")), s"t25v$r")
    }
    bests.result().reduce(_ unionByName _)
      .select(col("rank"), col("a"), col("b"),
        concat(col("a"), col("b")).as("merged"), col("n"))
      .orderBy("rank")
  }

  val all: Seq[Q] = Seq(
    t01TermFrequency, t02NgramCounts, t03LangId, t04QualityScore,
    t05LangSourceStats, t06TokenCounting, t07FingerprintBow,
    t08FingerprintRolling, t09Decontamination, t10Redaction, t11Tfidf,
    t12Repetition, t13BpePairs, t14LmScore, t15Bm25, t16Diversity,
    t17Collocations, t18Boilerplate, t19ChunkOverlap, t20BpeEncode,
    t21QualityRules, t22HashedClassifier, t23SequencePack,
    t24TokenBudgetSelect, t25BpeTrain, t26ClassifierEval)
}
