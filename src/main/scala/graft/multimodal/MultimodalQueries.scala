package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (LLM north star): image/audio/video payloads
  * as opaque BINARY columns with typed metadata, plus the decode /
  * feature-extract / resize / frame-sample stages a training-data
  * pipeline runs over them.
  *
  * The actual codec work is STUBBED — this container has no image/audio
  * libraries, so `decode` derives dimensions deterministically from the
  * payload (documented at each site). Everything around the stub is real:
  * the binary schema, the per-partition batch processing shape
  * (mapPartitions over an iterator — where a production impl would hand
  * each batch to a native decoder), the metadata structs, and the
  * frame-sampling explode. Payloads are synthesized from `documents.text`
  * so the fixtures stay driver-generated.
  */
object MultimodalQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.t(s, d, "documents")

  /** The synthetic asset table: binary payload + modality tag. */
  private def assets(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      col("n_chars"))

  /** Binary asset catalog: payload sizes and content digests per modality.
    * length() on BINARY is byte length (== octet_length in DuckDB). */
  val m01AssetCatalog: Q = Q(
    "m01_asset_catalog",
    """SELECT kind, COUNT(*) AS n_assets,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  MIN(md5(text)) AS min_digest
      |FROM (SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |             WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |             text
      |      FROM documents)
      |GROUP BY kind ORDER BY kind""".stripMargin) { (s, d) =>
    assets(s, d)
      .withColumn("digest", md5(col("payload")))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(length(col("payload"))).cast("long").as("total_bytes"),
        min(col("digest")).as("min_digest"))
      .orderBy("kind")
  }

  /** Decode stub → typed metadata struct. A real pipeline would parse the
    * container header here; the stub derives width/height from the first
    * 4 md5 hex digits of the payload (deterministic, engine-portable).
    * The metadata travels as a nested struct — the schema a downstream
    * trainer would consume. */
  val m02DecodeMeta: Q = Q(
    "m02_decode_meta",
    """SELECT asset_id,
      |  '{"width":' || w || ',"height":' || h || ',"channels":3}' AS meta
      |FROM (SELECT doc_id AS asset_id,
      |        64 + ('0x' || substr(md5(text), 1, 4))::BIGINT % 1857 AS w,
      |        64 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 1017 AS h
      |      FROM documents)
      |ORDER BY asset_id""".stripMargin) { (s, d) =>
    val w = lit(64L) + conv(substring(md5(col("payload")), 1, 4), 16, 10).cast("long") % 1857
    val h = lit(64L) + conv(substring(md5(col("payload")), 5, 4), 16, 10).cast("long") % 1017
    assets(s, d)
      .select(col("asset_id"),
        // the struct is the computed artifact; to_json is the last projection
        // so the comparison harness gets a sortable string (s10 pattern —
        // the oracle pins the same compact field-ordered form via concat)
        to_json(struct(w.as("width"), h.as("height"), lit(3).as("channels"))).as("meta"))
      .orderBy("asset_id")
  }

  /** Resize planning through the real batch-processing shape: mapPartitions
    * over the binary payloads — the seam where a production decoder (JNI /
    * native lib) consumes one partition-batch at a time. The "decode" in
    * the lambda is the same deterministic stub as m02 (md5 via MessageDigest
    * — byte-identical to the SQL md5); the resize math (fit longest side to
    * 224, floor) is exact integer arithmetic on both engines. */
  val m03ResizeBatch: Q = Q(
    "m03_resize_batch",
    """SELECT asset_id, w, h,
      |  CASE WHEN w >= h THEN 224 ELSE (w * 224) // h END AS out_w,
      |  CASE WHEN w >= h THEN (h * 224) // w ELSE 224 END AS out_h
      |FROM (SELECT doc_id AS asset_id,
      |        64 + ('0x' || substr(md5(text), 1, 4))::BIGINT % 1857 AS w,
      |        64 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 1017 AS h
      |      FROM documents)
      |ORDER BY asset_id""".stripMargin) { (s, d) =>
    import s.implicits._
    assets(s, d)
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // one MessageDigest per partition — the per-batch setup cost a real
        // decoder would amortize the same way
        val digest = java.security.MessageDigest.getInstance("MD5")
        batch.map { case (id, payload) =>
          digest.reset()
          val hex = digest.digest(payload).map("%02x".format(_)).mkString
          val w = 64L + java.lang.Long.parseLong(hex.substring(0, 4), 16) % 1857
          val h = 64L + java.lang.Long.parseLong(hex.substring(4, 8), 16) % 1017
          val (ow, oh) = if (w >= h) (224L, h * 224 / w) else (w * 224 / h, 224L)
          (id, w, h, ow, oh)
        }
      }
      .toDF("asset_id", "w", "h", "out_w", "out_h")
      .orderBy("asset_id")
  }

  /** Frame sampling for the video assets: fake frame count from payload
    * size, sample every 30th frame, one row per sampled frame with a
    * per-frame fingerprint — the classic explode fan-out a video pipeline
    * feeds to batched frame decoding. */
  val m04FrameSample: Q = Q(
    "m04_frame_sample",
    """SELECT asset_id, frame_idx, md5(text || ':' || frame_idx) AS frame_fp
      |FROM (SELECT doc_id AS asset_id, text,
      |        unnest(range(0, 30 + n_chars % 300, 30)) AS frame_idx
      |      FROM documents WHERE doc_id % 3 = 2)
      |ORDER BY asset_id, frame_idx""".stripMargin) { (s, d) =>
    docs(s, d)
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id").as("asset_id"), col("text"),
        explode(sequence(lit(0L), lit(29L) + col("n_chars") % 300, lit(30L))).as("frame_idx"))
      .select(col("asset_id"), col("frame_idx"),
        md5(concat(col("text"), lit(":"), col("frame_idx").cast("string"))).as("frame_fp"))
      .orderBy("asset_id", "frame_idx")
  }

  /** Heterogeneous typed metadata: each modality gets its own struct
    * (image: dims, audio: sample-rate/duration, video: dims+frames) with
    * NULL for the other modalities' fields — the union-schema shape a
    * mixed-modality training table actually has. Values derive from the
    * same md5 stub as m02. */
  val m05TypedMetaByKind: Q = Q(
    "m05_typed_meta_by_kind",
    """SELECT asset_id, kind,
      |  CASE WHEN kind = 'image' THEN '{"width":' || w || ',"height":' || h || '}' END AS image_meta,
      |  CASE WHEN kind = 'audio' THEN '{"sample_rate":' || (8000 + w * 4)
      |    || ',"duration_ms":' || (h * 100) || '}' END AS audio_meta,
      |  CASE WHEN kind = 'video' THEN '{"width":' || w || ',"height":' || h
      |    || ',"n_frames":' || (30 + n_chars % 300) || '}' END AS video_meta
      |FROM (SELECT doc_id AS asset_id, n_chars,
      |        CASE WHEN doc_id % 3 = 0 THEN 'image'
      |             WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |        64 + ('0x' || substr(md5(text), 1, 4))::BIGINT % 1857 AS w,
      |        64 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 1017 AS h
      |      FROM documents)
      |ORDER BY asset_id""".stripMargin) { (s, d) =>
    val w = lit(64L) + conv(substring(md5(col("payload")), 1, 4), 16, 10).cast("long") % 1857
    val h = lit(64L) + conv(substring(md5(col("payload")), 5, 4), 16, 10).cast("long") % 1017
    assets(s, d)
      .select(col("asset_id"), col("kind"), col("n_chars"), w.as("w"), h.as("h"))
      .select(col("asset_id"), col("kind"),
        // per-modality struct → to_json as the final projection; to_json of a
        // NULL struct is NULL, matching the oracle's CASE with no ELSE
        when(col("kind") === "image",
          to_json(struct(col("w").as("width"), col("h").as("height")))).as("image_meta"),
        when(col("kind") === "audio",
          to_json(struct((lit(8000L) + col("w") * 4).as("sample_rate"),
            (col("h") * 100).as("duration_ms")))).as("audio_meta"),
        when(col("kind") === "video",
          to_json(struct(col("w").as("width"), col("h").as("height"),
            (lit(30L) + col("n_chars") % 300).as("n_frames")))).as("video_meta"))
      .orderBy("asset_id")
  }

  /** Fixed-size binary chunking — the page-store layout for assets too
    * large for one row/cell (the way a lakehouse shreds blobs for
    * ranged reads and parallel upload): each payload splits into
    * 64-byte pages addressed by (asset_id, chunk_idx), with per-chunk
    * digests for integrity. Pure per-row explode + substring — no
    * shuffle; at scale chunk count tracks total bytes, not row count.
    * Payloads are ASCII here so the DuckDB string-side oracle sees the
    * identical bytes (m01 already pins that equivalence); digests are
    * md5 per chunk on both engines. */
  val m06AssetChunking: Q = Q(
    "m06_asset_chunking",
    """WITH a AS (SELECT doc_id AS asset_id, text FROM documents
      |           WHERE doc_id < 100 AND octet_length(encode(text)) > 0)
      |SELECT asset_id, CAST(i AS BIGINT) AS chunk_idx,
      |  CAST(octet_length(encode(substr(text, CAST(i*64 + 1 AS INT), 64))) AS BIGINT) AS chunk_len,
      |  md5(substr(text, CAST(i*64 + 1 AS INT), 64)) AS chunk_md5
      |FROM a, LATERAL unnest(range(0, (octet_length(encode(text)) + 63) // 64)) AS t(i)
      |ORDER BY asset_id, chunk_idx""".stripMargin) { (s, d) =>
    val chunk = expr("substring(payload, CAST(chunk_idx*64 + 1 AS INT), 64)")
    assets(s, d)
      // empty-payload guard on BOTH engines: Spark's sequence(0, -1)
      // DEFAULTS step to -1 when start > stop and yields [0, -1] — two
      // spurious chunk rows — where DuckDB's range(0, 0) yields none.
      .filter(col("asset_id") < 100 && length(col("payload")) > 0)
      .select(col("asset_id"), col("payload"),
        explode(sequence(lit(0L), expr("(length(payload) + 63) div 64") - 1))
          .as("chunk_idx"))
      .select(col("asset_id"), col("chunk_idx"),
        length(chunk).cast("long").as("chunk_len"),
        md5(chunk).as("chunk_md5"))
      .orderBy("asset_id", "chunk_idx")
  }

  /** Binary near-duplicate detection by CHUNK-HASH Jaccard — the
    * content-addressable-storage dedup every blob store runs (and the
    * binary analog of d05's shingle Jaccard): assets shred into the
    * m06 fixed 64-byte chunks, each chunk reduced to its md5 AT THE
    * SCAN (payload bytes never travel again), candidate pairs blocked
    * by shared chunk hash (equality join — only assets sharing at
    * least one block ever meet), exact Jaccard over the distinct chunk
    * sets, pairs >= 0.5 kept. COMMON-BLOCK SUPPRESSION first: chunks
    * present in more than 50 assets (the all-zeros block / boilerplate
    * header problem) are dropped from every set before sizing and
    * intersection — production dedup stores do exactly this because a
    * universal block makes every pair a candidate (quadratic blowup)
    * while carrying no identity signal. Exact integer counts + one
    * correctly-rounded division keep the score hash-exact (d05's
    * arithmetic discipline). */
  val m07BinaryNearDup: Q = Q(
    "m07_binary_neardup",
    """WITH a AS (SELECT doc_id AS asset_id, text FROM documents
      |           WHERE doc_id < 300 AND octet_length(encode(text)) > 0),
      |c0 AS (SELECT DISTINCT asset_id,
      |         md5(substr(text, CAST(i*64 + 1 AS INT), 64)) AS h
      |       FROM a, LATERAL unnest(range(0, (octet_length(encode(text)) + 63) // 64)) AS t(i)),
      |pop AS (SELECT h FROM c0 GROUP BY h HAVING COUNT(*) <= 50),
      |c AS (SELECT asset_id, h FROM c0 WHERE h IN (SELECT h FROM pop)),
      |s AS (SELECT asset_id, COUNT(*) AS n FROM c GROUP BY asset_id),
      |x AS (SELECT p.asset_id AS i, q.asset_id AS j, COUNT(*) AS nc
      |      FROM c p JOIN c q ON p.h = q.h AND p.asset_id < q.asset_id
      |      GROUP BY 1, 2)
      |SELECT i, j, nc / (si.n + sj.n - nc) AS jac
      |FROM x JOIN s si ON si.asset_id = i JOIN s sj ON sj.asset_id = j
      |WHERE nc / (si.n + sj.n - nc) >= 0.5
      |ORDER BY i, j""".stripMargin) { (s, d) =>
    val chunk = expr("substring(payload, CAST(chunk_idx*64 + 1 AS INT), 64)")
    val c0 = assets(s, d)
      // same empty-payload guard as m06 (sequence(0, -1) is DESCENDING)
      .filter(col("asset_id") < 300 && length(col("payload")) > 0)
      .select(col("asset_id"), col("payload"),
        explode(sequence(lit(0L), expr("(length(payload) + 63) div 64") - 1))
          .as("chunk_idx"))
      .select(col("asset_id"), md5(chunk).as("h"))
      .distinct()
    val pop = c0.groupBy("h").agg(count(lit(1)).as("na"))
      .filter(col("na") <= 50).select("h")
    val c = c0.join(pop, "h") // inner join on the unique-h keep list
    val sizes = c.groupBy("asset_id").agg(count(lit(1)).as("n"))
    val inter = c.as("p").join(c.as("q"),
        col("p.h") === col("q.h") && col("p.asset_id") < col("q.asset_id"))
      .groupBy(col("p.asset_id").as("i"), col("q.asset_id").as("j"))
      .agg(count(lit(1)).as("nc"))
    inter
      .join(broadcast(sizes.select(col("asset_id").as("i"), col("n").as("ni"))), "i")
      .join(broadcast(sizes.select(col("asset_id").as("j"), col("n").as("nj"))), "j")
      .withColumn("jac", col("nc") / (col("ni") + col("nj") - col("nc")))
      .filter(col("jac") >= 0.5)
      .select(col("i"), col("j"), col("jac"))
      .orderBy("i", "j")
  }

  /** Modality-balanced interleave — the batch-mixing schedule a
    * multimodal trainer consumes: assets sequenced so each cycle serves
    * one image, one audio, one video (while supplies last). The cycle
    * number is a PER-KIND GLOBAL RANK, and the naive plan — row_number
    * over (PARTITION BY kind) — is a 3-partition skew bomb: the whole
    * 100 TB corpus funnels through three window tasks. This entry runs
    * the scalable distributed-rank shape instead: range-bucket on
    * asset_id (order-contiguous, so per-kind order is preserved across
    * buckets), row_number WITHIN each (kind, bucket), and a broadcast
    * prefix-sum of per-bucket counts (3 × #buckets tiny rows — the only
    * thing that crosses the cluster) added as each bucket's offset.
    * Same answer as the oracle's per-kind window, shuffle-free on the
    * data path and skew-free at any scale. */
  val m08Interleave: Q = Q(
    "m08_interleave",
    """SELECT CAST(ROW_NUMBER() OVER (PARTITION BY kind ORDER BY asset_id) AS BIGINT)
      |    AS cycle,
      |  kind, asset_id
      |FROM (SELECT doc_id AS asset_id,
      |        CASE WHEN doc_id % 3 = 0 THEN 'image'
      |             WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind
      |      FROM documents)
      |ORDER BY cycle, kind""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val bucketed = assets(s, d).select(col("asset_id"), col("kind"),
      floor(col("asset_id") / 512).as("bkt"))
    val rnLocal = row_number()
      .over(Window.partitionBy("kind", "bkt").orderBy("asset_id"))
      .cast("long")
    // Per-bucket counts are 3 × #buckets rows; the running offset is a
    // window over THAT tiny relation, then broadcast back to the data.
    val offsets = bucketed.groupBy("kind", "bkt")
      .agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(sum(col("n")).over(Window.partitionBy("kind").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("kind", "bkt", "off")
    bucketed
      .withColumn("rn", rnLocal)
      .join(broadcast(offsets), Seq("kind", "bkt"))
      .select((col("off") + col("rn")).as("cycle"), col("kind"), col("asset_id"))
      .orderBy("cycle", "kind")
  }

  /** CONTENT-DEFINED CHUNKING (CDC) — the shift-resistant complement of
    * m06's fixed-size shredding and the primitive every
    * content-addressable blob store (LBFS, restic, borg, FastCDC) cuts
    * on: a chunk boundary falls wherever a hash of the trailing W-byte
    * WINDOW clears a modulus, so boundaries depend only on LOCAL content.
    * Insert one byte at the front of an asset and fixed-size chunking
    * re-hashes every chunk; CDC re-hashes only up to the first boundary
    * (CdcChunkingSpec proves exactly that). W = 16, modulus 32 → ~32-byte
    * expected chunks at this fixture size.
    *
    * The window hash here is the catalog's md5-portable form so every
    * boundary decision is bit-identical in DuckDB (one md5 per position —
    * O(L·W) hashing that the oracle can mirror); a production engine
    * swaps in a GEAR/Rabin ROLLING hash (O(L), one table lookup + shift
    * per byte) as a codegen'd Expression — the boundary CONTRACT and
    * everything downstream (chunk rows, dedup by chunk_md5) is hash-
    * function-agnostic. Per-asset work is a scan-local array program
    * (sequence → filter → zip_with → posexplode): assets never meet each
    * other, so the op is embarrassingly parallel at any corpus size; the
    * doc_id < 100 scope matches m06 (bounds the oracle, not the
    * engine). */
  val m09CdcChunking: Q = Q(
    "m09_cdc_chunking",
    """WITH a AS (SELECT doc_id AS asset_id, text, length(text) AS L
      |           FROM documents WHERE doc_id < 100 AND length(text) > 0),
      |b AS (SELECT asset_id, text, L,
      |        [p FOR p IN range(16, L)
      |         IF ('0x' || substr(md5(substr(text, CAST(p - 15 AS INT), 16)), 1, 4))::BIGINT % 32 = 0] AS bounds
      |      FROM a),
      |c AS (SELECT asset_id, text,
      |        list_prepend(CAST(1 AS BIGINT), [CAST(b + 1 AS BIGINT) FOR b IN bounds]) AS starts,
      |        list_append([CAST(b AS BIGINT) FOR b IN bounds], CAST(L AS BIGINT)) AS ends
      |      FROM b)
      |SELECT asset_id, CAST(i - 1 AS BIGINT) AS chunk_idx,
      |  starts[i] AS start_pos,
      |  ends[i] - starts[i] + 1 AS chunk_len,
      |  md5(substr(text, CAST(starts[i] AS INT),
      |             CAST(ends[i] - starts[i] + 1 AS INT))) AS chunk_md5
      |FROM c, LATERAL unnest(range(1, len(starts) + 1)) AS t(i)
      |ORDER BY asset_id, chunk_idx""".stripMargin) { (s, d) =>
    val t = col("text")
    val len = length(t)
    // position p (1-based) ends a window text[p-15..p]; p = L stays the
    // final chunk end, so candidates stop at L-1. sequence() guard: the
    // m06 lesson — Spark sequence(16, 15) DESCENDS, DuckDB range(16, 16)
    // is empty.
    val candidates = when(len >= lit(17), sequence(lit(16), len - 1))
      .otherwise(array().cast("array<int>"))
    val isBoundary = (p: org.apache.spark.sql.Column) =>
      conv(substring(md5(t.substr(p - 15, lit(16))), 1, 4), 16, 10)
        .cast("long") % 32 === 0
    val boundsL = transform(filter(candidates, isBoundary), _.cast("long"))
    // Boundary detection (an md5 per position) materializes ONCE: starts
    // and ends both reference the bounds array, and projection collapse
    // would inline the full window-hash scan into each (the t02/st21
    // recompute lesson — measured 10.3 s → ~4 s at sf0.1).
    val staged = graft.Stage.materialize(s,
      docs(s, d)
        .filter(col("doc_id") < 100 && len > 0)
        .select(col("doc_id").as("asset_id"), t,
          boundsL.as("bounds"), len.cast("long").as("len")),
      "m09bounds")
    val b = col("bounds")
    val starts = concat(array(lit(1L)), transform(b, _ + 1L))
    val ends = concat(b, array(col("len")))
    staged
      .select(col("asset_id"), t,
        zip_with(starts, ends, (a, x) => struct(a.as("st"), x.as("en"))).as("pairs"))
      .select(col("asset_id"), t, posexplode(col("pairs")))
      .select(col("asset_id"),
        col("pos").cast("long").as("chunk_idx"),
        col("col.st").as("start_pos"),
        (col("col.en") - col("col.st") + 1L).as("chunk_len"),
        md5(t.substr(col("col.st").cast("int"),
          (col("col.en") - col("col.st") + 1L).cast("int"))).as("chunk_md5"))
      .orderBy("asset_id", "chunk_idx")
  }

  val all: Seq[Q] = Seq(m01AssetCatalog, m02DecodeMeta, m03ResizeBatch,
    m04FrameSample, m05TypedMetaByKind, m06AssetChunking, m07BinaryNearDup,
    m08Interleave, m09CdcChunking)
}
