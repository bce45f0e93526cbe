"""Multimodal-pipeline query: binary payload metadata extraction.

The Spark side goes through the real multimodal plumbing — binary column +
Arrow-batched ``mapInPandas`` extraction (``multimodal/binary_ops.py``) —
and the DuckDB oracle recomputes the same metadata with SQL functions
(sha256/octet_length), proving the Pandas-UDF path value-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.multimodal.binary_ops import (
    extract_features,
    media_from_documents,
)
from f1_bigdata_pyspark_spark.queries.registry import query
from f1_bigdata_pyspark_spark.operators.join_policy import broadcast_if_small


# --------------------------------------------------------------------------
# Q: multimodal_meta — per-source payload statistics via mapInPandas.
# (source is re-joined from documents since the media table carries only
# media metadata — exercises extraction + broadcast joinback.)
# --------------------------------------------------------------------------
@query(
    "multimodal_meta",
    oracle="""
SELECT
  source,
  count(*) AS n_media,
  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
  count(DISTINCT sha256(text)) AS n_distinct_payloads
FROM documents
GROUP BY source
ORDER BY source
""",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    feats = extract_features(media)
    src = docs.select(F.col("doc_id").alias("media_id"), "source")
    return (
        feats.join(broadcast_if_small(src), "media_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("sha256").alias("n_distinct_payloads"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Q: crossmodal_retrieval_topk — the multimodal feature path COMPOSED with
# vector retrieval: media features come out of the Arrow-batched
# mapInPandas extractor (sha256-derived fake dimensions standing in for a
# real decode→measure), join the embeddings table on id, and rank by a
# blended score (0.8 · cosine-to-query + 0.2 · normalized width). This is
# the shape of a CLIP-style retrieval pipeline — decode features on one
# side, embedding similarity on the other, late fusion — with every stage
# deterministic, so the oracle rebuilds the whole thing in SQL (DuckDB
# sha256 == hashlib sha256 over the same utf-8 bytes).
# Scale: the feature pass is a narrow map; the id join is co-keyed; only
# the final top-k pays an ordering, and it's TakeOrdered on k rows.
# --------------------------------------------------------------------------
@query(
    "crossmodal_retrieval_topk",
    oracle="""
WITH feats AS (
  SELECT doc_id AS media_id,
         CAST('0x' || substr(sha256(text), 1, 4) AS INTEGER) % 1920 AS fake_width
  FROM documents
),
q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT vec_id,
         round(0.8 * list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv)
               + 0.2 * (fake_width / 1920.0), 6) AS score,
         fake_width
  FROM embeddings
  JOIN feats ON media_id = vec_id
  CROSS JOIN q
)
SELECT vec_id, score, fake_width
FROM scored
ORDER BY score DESC, vec_id ASC
LIMIT 10
""",
)
def crossmodal_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.functions.vectors import cosine

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(media_from_documents(docs)).select(
        "media_id", "fake_width"
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qv_row = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    qv = F.array(*[F.lit(float(x)) for x in qv_row["embedding"]])
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (
        emb.join(feats, feats.media_id == emb.vec_id)
        .select(
            "vec_id",
            F.round(
                0.8 * cosine(v, qv) + 0.2 * (F.col("fake_width") / F.lit(1920.0)),
                6,
            ).alias("score"),
            "fake_width",
        )
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q: media_header_dims — REAL container-header parsing, no codec: payloads
# carry genuine PNG (signature+IHDR), JPEG (SOI/APP0/SOF0), and RIFF/WAVE
# (fmt chunk) layouts; the parser recovers width/height/channels/sample-
# rate/bits FROM THE BYTES with built-in hex/substring/locate/conv only.
# The oracle constructs bit-identical blobs in SQL and re-parses them the
# same way — so a Spark-side offset or endianness mistake cannot hash
# green. An independent struct.pack golden test (tests/test_multimodal.py)
# pins the parser against genuine files so a shared synthesis bug can't
# hide either. Scale: one narrow codegen map over the payload column — the
# shape of a petabyte corpus-intake validation pass.
# --------------------------------------------------------------------------
@query(
    "media_header_dims",
    oracle="""
WITH base AS (
  SELECT doc_id,
         doc_id % 3 AS kindsel,
         16 + doc_id % 2048 AS w,
         16 + (doc_id * 7) % 2048 AS h,
         1 + doc_id % 2 AS ch,
         8000 * (1 + doc_id % 5) AS sr,
         16 + 8 * (doc_id % 2) AS bits,
         lower(hex(md5(text))) AS body
  FROM documents
),
hx AS (
  SELECT doc_id, kindsel,
         lpad(to_hex(w), 8, '0') AS w32, lpad(to_hex(h), 8, '0') AS h32,
         lpad(to_hex(w), 4, '0') AS w16, lpad(to_hex(h), 4, '0') AS h16,
         lpad(to_hex(ch), 4, '0') AS ch16,
         lpad(to_hex(sr), 8, '0') AS sr32,
         lpad(to_hex(CAST(sr * ch * bits / 8 AS BIGINT)), 8, '0') AS br32,
         lpad(to_hex(CAST(ch * bits / 8 AS BIGINT)), 4, '0') AS ba16,
         lpad(to_hex(bits), 4, '0') AS bi16,
         body
  FROM base
),
built AS (
  SELECT doc_id, unhex(CASE kindsel
    WHEN 0 THEN
      '89504e470d0a1a0a' || '0000000d' || '49484452'
      || w32 || h32 || '0806000000' || '00000000' || body
    WHEN 1 THEN
      'ffd8' || 'ffe0' || '0010' || '4a46494600' || '0101'
      || '00' || '0001' || '0001' || '0000'
      || 'ffc0' || '0011' || '08' || h16 || w16
      || '03' || '011100' || '021101' || '031101' || body
    ELSE
      '52494646' || '44000000' || '57415645' || '666d7420'
      || '10000000' || '0100'
      || substr(ch16,3,2) || substr(ch16,1,2)
      || substr(sr32,7,2) || substr(sr32,5,2) || substr(sr32,3,2) || substr(sr32,1,2)
      || substr(br32,7,2) || substr(br32,5,2) || substr(br32,3,2) || substr(br32,1,2)
      || substr(ba16,3,2) || substr(ba16,1,2)
      || substr(bi16,3,2) || substr(bi16,1,2)
      || '64617461' || '20000000' || body
  END) AS payload
  FROM hx
),
ph AS (
  SELECT doc_id AS media_id, lower(hex(payload)) AS p FROM built
),
parsed AS (
  SELECT media_id,
    CASE WHEN substr(p,1,16) = '89504e470d0a1a0a' THEN 'png'
         WHEN substr(p,1,4)  = 'ffd8' THEN 'jpeg'
         WHEN substr(p,1,8)  = '52494646' AND substr(p,17,8) = '57415645'
              THEN 'wav'
         ELSE 'unknown' END AS container,
    strpos(p, 'ffc0') AS sof, p
  FROM ph
)
SELECT media_id, container,
  CASE container
    WHEN 'png'  THEN CAST(('0x' || substr(p, 33, 8)) AS BIGINT)
    WHEN 'jpeg' THEN CAST(('0x' || substr(p, sof + 14, 4)) AS BIGINT)
  END AS width,
  CASE container
    WHEN 'png'  THEN CAST(('0x' || substr(p, 41, 8)) AS BIGINT)
    WHEN 'jpeg' THEN CAST(('0x' || substr(p, sof + 10, 4)) AS BIGINT)
  END AS height,
  CASE WHEN container = 'wav'
       THEN CAST(('0x' || substr(p,47,2) || substr(p,45,2)) AS BIGINT)
  END AS channels,
  CASE WHEN container = 'wav'
       THEN CAST(('0x' || substr(p,55,2) || substr(p,53,2)
                        || substr(p,51,2) || substr(p,49,2)) AS BIGINT)
  END AS sample_rate,
  CASE WHEN container = 'wav'
       THEN CAST(('0x' || substr(p,71,2) || substr(p,69,2)) AS BIGINT)
  END AS bits_per_sample
FROM parsed
ORDER BY media_id
""",
)
def media_header_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.multimodal.binary_ops import (
        parse_media_headers,
        synth_container_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    return parse_media_headers(synth_container_media(docs)).orderBy("media_id")


# --------------------------------------------------------------------------
# Q: wav_duration_stats — audio corpus timing readout from the BYTES: for
# every RIFF/WAVE payload, recover byte-rate + data-chunk size from the
# container (parse_wav_timing — hex/substring/conv, no codec) and roll up
# listening time per (sample_rate, channels, bits) format cell. The
# oracle synthesizes bit-identical WAV blobs in SQL (same layout as
# media_header_dims) and re-parses them — a Spark-side offset or
# endianness slip cannot hash green. Scale: narrow codegen map + one
# small aggregate; the shape of a petabyte audio-intake audit.
# --------------------------------------------------------------------------
@query(
    "wav_duration_stats",
    oracle="""
WITH base AS (
  SELECT doc_id,
         1 + doc_id % 2 AS ch,
         8000 * (1 + doc_id % 5) AS sr,
         16 + 8 * (doc_id % 2) AS bits,
         lower(hex(md5(text))) AS body
  FROM documents
  WHERE doc_id % 3 = 2
),
hx AS (
  SELECT doc_id,
         lpad(to_hex(ch), 4, '0') AS ch16,
         lpad(to_hex(sr), 8, '0') AS sr32,
         lpad(to_hex(CAST(sr * ch * bits / 8 AS BIGINT)), 8, '0') AS br32,
         lpad(to_hex(CAST(ch * bits / 8 AS BIGINT)), 4, '0') AS ba16,
         lpad(to_hex(bits), 4, '0') AS bi16,
         body
  FROM base
),
ph AS (
  SELECT doc_id AS media_id,
         '52494646' || '44000000' || '57415645' || '666d7420'
         || '10000000' || '0100'
         || substr(ch16,3,2) || substr(ch16,1,2)
         || substr(sr32,7,2) || substr(sr32,5,2)
           || substr(sr32,3,2) || substr(sr32,1,2)
         || substr(br32,7,2) || substr(br32,5,2)
           || substr(br32,3,2) || substr(br32,1,2)
         || substr(ba16,3,2) || substr(ba16,1,2)
         || substr(bi16,3,2) || substr(bi16,1,2)
         || '64617461' || '20000000' || body AS p
  FROM hx
),
parsed AS (
  SELECT media_id,
    CAST(('0x' || substr(p,47,2) || substr(p,45,2)) AS BIGINT) AS channels,
    CAST(('0x' || substr(p,55,2) || substr(p,53,2)
          || substr(p,51,2) || substr(p,49,2)) AS BIGINT) AS sample_rate,
    CAST(('0x' || substr(p,71,2) || substr(p,69,2)) AS BIGINT)
      AS bits_per_sample,
    CAST(('0x' || substr(p,63,2) || substr(p,61,2)
          || substr(p,59,2) || substr(p,57,2)) AS BIGINT) AS byte_rate,
    CAST(('0x' || substr(p,87,2) || substr(p,85,2)
          || substr(p,83,2) || substr(p,81,2)) AS BIGINT) AS data_bytes
  FROM ph
)
SELECT sample_rate, channels, bits_per_sample,
       count(*) AS n_files,
       CAST(sum(data_bytes) AS BIGINT) AS total_bytes,
       round(sum(data_bytes * 1000.0 / byte_rate), 6) AS total_ms,
       round(avg(data_bytes * 1000.0 / byte_rate), 6) AS avg_ms
FROM parsed
GROUP BY sample_rate, channels, bits_per_sample
ORDER BY sample_rate, channels, bits_per_sample
""",
)
def wav_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.multimodal.binary_ops import (
        parse_wav_timing,
        synth_container_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    timing = parse_wav_timing(synth_container_media(docs))
    return (
        timing.groupBy("sample_rate", "channels", "bits_per_sample")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("data_bytes").alias("total_bytes"),
            F.round(F.sum("duration_ms"), 6).alias("total_ms"),
            F.round(F.avg("duration_ms"), 6).alias("avg_ms"),
        )
        .orderBy("sample_rate", "channels", "bits_per_sample")
    )


# --------------------------------------------------------------------------
# Q: mp4_duration_stats — video corpus timing from ISO-BMFF bytes: locate
# the mvhd box by tag scan (no trusted offsets), read movie timescale +
# duration (big-endian u32 at the version-0 layout), roll up playback
# time per timescale cell. Completes the image (PNG/JPEG dims) / audio
# (WAV timing) / video triad of codec-free container audits. The oracle
# synthesizes bit-identical box layouts in SQL and re-parses them with
# the same tag scan. Scale: one hex pass per payload + a tiny aggregate.
# --------------------------------------------------------------------------
@query(
    "mp4_duration_stats",
    oracle="""
WITH base AS (
  SELECT doc_id,
         1000 * (1 + doc_id % 4) AS tscale,
         500 + doc_id % 100000 AS dur,
         lower(hex(md5(text))) AS body
  FROM documents
),
ph AS (
  SELECT doc_id AS media_id,
         '00000014' || '66747970' || '69736f6d' || '00000200' || '69736f6d'
         || '00000074' || '6d6f6f76'
         || '0000006c' || '6d766864' || '00000000'
         || '00000000' || '00000000'
         || lpad(to_hex(tscale), 8, '0') || lpad(to_hex(dur), 8, '0')
         || '00010000' || '0100' || repeat('0', 20)
         || '00010000000000000000000000000000'
         || '00010000000000000000000000000000' || '40000000'
         || repeat('0', 48) || '00000002'
         || '00000028' || '6d646174' || body AS p
  FROM base
),
parsed AS (
  SELECT media_id,
         CAST(('0x' || substr(p, strpos(p, '6d766864') + 32, 8)) AS BIGINT)
           AS timescale,
         CAST(('0x' || substr(p, strpos(p, '6d766864') + 40, 8)) AS BIGINT)
           AS duration_units
  FROM ph
  WHERE substr(p, 9, 8) = '66747970' AND strpos(p, '6d766864') > 0
)
SELECT timescale,
       count(*) AS n_files,
       CAST(sum(duration_units) AS BIGINT) AS total_units,
       round(sum(duration_units * 1000.0 / timescale), 6) AS total_ms,
       round(avg(duration_units * 1000.0 / timescale), 6) AS avg_ms
FROM parsed
GROUP BY timescale
ORDER BY timescale
""",
)
def mp4_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.multimodal.binary_ops import (
        parse_mp4_timing,
        synth_mp4_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    timing = parse_mp4_timing(synth_mp4_media(docs))
    return (
        timing.groupBy("timescale")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("duration_units").alias("total_units"),
            F.round(F.sum("duration_ms"), 6).alias("total_ms"),
            F.round(F.avg("duration_ms"), 6).alias("avg_ms"),
        )
        .orderBy("timescale")
    )


# --------------------------------------------------------------------------
# Q: payload_byte_entropy — per-container byte-distribution entropy over
# the raw payload bytes: the standard corruption / wrong-codec screen for
# a media-intake pipeline (a PNG whose byte entropy collapses is a
# truncated or zero-filled transfer; one whose entropy is ~8 bits is
# double-compressed). Bytes come out of ONE hex() pass + a fixed-fanout
# position explode (payload length is bounded by the container synth);
# counts per (container, byte) are exact integers. Determinism: grouped
# DOUBLE sums are not order-stable across engines, so each Shannon term
# p·log2(p) is quantized to a 1e-12 BIGINT before the per-container sum —
# exact in any accumulation order (|term| ≤ 0.54 → |tq| ≤ 5.4e11, ×256
# cells ≤ 1.4e14, far inside int64). Scale: narrow map + two keyed
# aggregates; the per-container marginal joins back through the size
# policy (256·containers rows — small forever, but policied on principle).
# --------------------------------------------------------------------------
@query(
    "payload_byte_entropy",
    oracle="""
WITH base AS (
  SELECT doc_id,
         doc_id % 3 AS kindsel,
         16 + doc_id % 2048 AS w,
         16 + (doc_id * 7) % 2048 AS h,
         1 + doc_id % 2 AS ch,
         8000 * (1 + doc_id % 5) AS sr,
         16 + 8 * (doc_id % 2) AS bits,
         lower(hex(md5(text))) AS body
  FROM documents
),
hx AS (
  SELECT doc_id, kindsel,
         lpad(to_hex(w), 8, '0') AS w32, lpad(to_hex(h), 8, '0') AS h32,
         lpad(to_hex(w), 4, '0') AS w16, lpad(to_hex(h), 4, '0') AS h16,
         lpad(to_hex(ch), 4, '0') AS ch16,
         lpad(to_hex(sr), 8, '0') AS sr32,
         lpad(to_hex(CAST(sr * ch * bits / 8 AS BIGINT)), 8, '0') AS br32,
         lpad(to_hex(CAST(ch * bits / 8 AS BIGINT)), 4, '0') AS ba16,
         lpad(to_hex(bits), 4, '0') AS bi16,
         body
  FROM base
),
ph AS (
  SELECT doc_id AS media_id, lower(CASE kindsel
    WHEN 0 THEN
      '89504e470d0a1a0a' || '0000000d' || '49484452'
      || w32 || h32 || '0806000000' || '00000000' || body
    WHEN 1 THEN
      'ffd8' || 'ffe0' || '0010' || '4a46494600' || '0101'
      || '00' || '0001' || '0001' || '0000'
      || 'ffc0' || '0011' || '08' || h16 || w16
      || '03' || '011100' || '021101' || '031101' || body
    ELSE
      '52494646' || '44000000' || '57415645' || '666d7420'
      || '10000000' || '0100'
      || substr(ch16,3,2) || substr(ch16,1,2)
      || substr(sr32,7,2) || substr(sr32,5,2) || substr(sr32,3,2) || substr(sr32,1,2)
      || substr(br32,7,2) || substr(br32,5,2) || substr(br32,3,2) || substr(br32,1,2)
      || substr(ba16,3,2) || substr(ba16,1,2)
      || substr(bi16,3,2) || substr(bi16,1,2)
      || '64617461' || '20000000' || body
  END) AS p
  FROM hx
),
tagged AS (
  SELECT media_id,
    CASE WHEN substr(p,1,16) = '89504e470d0a1a0a' THEN 'png'
         WHEN substr(p,1,4)  = 'ffd8' THEN 'jpeg'
         WHEN substr(p,1,8)  = '52494646' AND substr(p,17,8) = '57415645'
              THEN 'wav'
         ELSE 'unknown' END AS container,
    p
  FROM ph
),
bytes AS (
  SELECT container, substr(p, 2 * i - 1, 2) AS b
  FROM tagged,
       (SELECT unnest(range(1, CAST((SELECT max(len(p)) FROM tagged) / 2 AS BIGINT) + 1)) AS i)
  WHERE i <= len(p) / 2
),
cnt AS (
  SELECT container, b, count(*) AS c FROM bytes GROUP BY container, b
),
marg AS (
  SELECT container, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_distinct_bytes
  FROM cnt GROUP BY container
),
terms AS (
  SELECT cnt.container,
         CAST(round((c * 1.0 / n) * log2(c * 1.0 / n) * 1e12) AS BIGINT)
           AS tq
  FROM cnt JOIN marg ON cnt.container = marg.container
)
SELECT marg.container, n AS n_bytes, n_distinct_bytes,
       round(-sum_tq / 1e12, 6) AS byte_entropy
FROM marg
JOIN (SELECT container, CAST(sum(tq) AS BIGINT) AS sum_tq
      FROM terms GROUP BY container) s
  ON marg.container = s.container
ORDER BY marg.container
""",
)
def payload_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.multimodal.binary_ops import (
        synth_container_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = synth_container_media(docs)
    ph = F.lower(F.hex(F.col("payload")))
    is_png = F.substring(ph, 1, 16) == "89504e470d0a1a0a"
    is_jpeg = F.substring(ph, 1, 4) == "ffd8"
    is_wav = (F.substring(ph, 1, 8) == "52494646") & (
        F.substring(ph, 17, 8) == "57415645"
    )
    tagged = media.select(
        F.when(is_png, "png")
        .when(is_jpeg, "jpeg")
        .when(is_wav, "wav")
        .otherwise("unknown")
        .alias("container"),
        ph.alias("p"),
    )
    bytes_ = tagged.select(
        "container",
        F.explode(
            F.sequence(F.lit(1), (F.length("p") / 2).cast("int"))
        ).alias("i"),
        "p",
    ).select("container", F.expr("substring(p, 2 * i - 1, 2)").alias("b"))
    cnt = bytes_.groupBy("container", "b").agg(F.count(F.lit(1)).alias("c"))
    marg = cnt.groupBy("container").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_bytes"),
    )
    terms = cnt.join(broadcast_if_small(marg.select("container", "n")), "container").select(
        "container",
        F.round(
            (F.col("c") * 1.0 / F.col("n"))
            * F.log2(F.col("c") * 1.0 / F.col("n"))
            * F.lit(1e12)
        )
        .cast("long")
        .alias("tq"),
    )
    sums = terms.groupBy("container").agg(F.sum("tq").cast("long").alias("sum_tq"))
    return (
        marg.join(broadcast_if_small(sums), "container")
        .select(
            "container",
            F.col("n").alias("n_bytes"),
            "n_distinct_bytes",
            F.round(-F.col("sum_tq") / F.lit(1e12), 6).alias("byte_entropy"),
        )
        .orderBy("container")
    )


# --------------------------------------------------------------------------
# Q: media_av_sync_audit — cross-container consistency audit: each media
# item's AUDIO duration (parsed from its RIFF/WAVE bytes) joined against
# its VIDEO duration (parsed from its ISO-BMFF mvhd bytes), with the A/V
# drift rolled up per movie-timescale cell — the sync screen an intake
# pipeline runs before pairing modalities for training. The Spark side
# works ONLY from bytes (parse_wav_timing + parse_mp4_timing, codegen hex
# arithmetic); the oracle states the synthesizers' closed-form ground
# truth — parse-vs-ground-truth, stronger than parse-vs-parse (an offset
# slip in EITHER parser breaks the hash; the parsers' own faces pin the
# byte layouts). Determinism: durations are identical IEEE doubles from
# exact integers in both engines; per-cell sums quantize each duration to
# 1e-6 BIGINTs first. Scale: two narrow payload maps + one co-partitioned
# join on media_id + a timescale-cell rollup.
# --------------------------------------------------------------------------
@query(
    "media_av_sync_audit",
    oracle="""
WITH au AS (
  SELECT doc_id AS media_id,
         32 * 1000.0
           / ((8000 * (1 + doc_id % 5)) * (1 + doc_id % 2)
              * (16 + 8 * (doc_id % 2)) / 8) AS audio_ms
  FROM documents WHERE doc_id % 3 = 2
),
vi AS (
  SELECT doc_id AS media_id,
         CAST(1000 * (1 + doc_id % 4) AS BIGINT) AS timescale,
         (500 + doc_id % 100000) * 1000.0
           / (1000 * (1 + doc_id % 4)) AS video_ms
  FROM documents
),
j AS (
  SELECT vi.timescale,
         CAST(round(au.audio_ms * 1000000) AS BIGINT) AS aq,
         CAST(round(vi.video_ms * 1000000) AS BIGINT) AS vq
  FROM au JOIN vi ON au.media_id = vi.media_id
)
SELECT timescale,
       CAST(count(*) AS BIGINT) AS n_media,
       round(sum(aq) / (count(*) * 1000000.0), 6) AS avg_audio_ms,
       round(sum(vq) / (count(*) * 1000000.0), 6) AS avg_video_ms,
       round(sum(vq - aq) / (count(*) * 1000000.0), 6) AS avg_drift_ms,
       CAST(count_if(abs(vq - aq) > 100000000) AS BIGINT) AS n_drift_over_100ms
FROM j
GROUP BY timescale
ORDER BY timescale
""",
)
def media_av_sync_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.multimodal.binary_ops import (
        parse_mp4_timing,
        parse_wav_timing,
        synth_container_media,
        synth_mp4_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    audio = parse_wav_timing(synth_container_media(docs)).select(
        "media_id",
        F.round(F.col("duration_ms") * 1000000).cast("long").alias("aq"),
    )
    video = parse_mp4_timing(synth_mp4_media(docs)).select(
        "media_id",
        "timescale",
        F.round(F.col("duration_ms") * 1000000).cast("long").alias("vq"),
    )
    j = audio.join(video, "media_id")
    return (
        j.groupBy("timescale")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.round(F.sum("aq") / (F.count(F.lit(1)) * 1000000.0), 6).alias(
                "avg_audio_ms"
            ),
            F.round(F.sum("vq") / (F.count(F.lit(1)) * 1000000.0), 6).alias(
                "avg_video_ms"
            ),
            F.round(
                F.sum(F.col("vq") - F.col("aq"))
                / (F.count(F.lit(1)) * 1000000.0),
                6,
            ).alias("avg_drift_ms"),
            F.count_if(
                F.abs(F.col("vq") - F.col("aq")) > 100000000
            )
            .cast("long")
            .alias("n_drift_over_100ms"),
        )
        .orderBy("timescale")
    )


# --------------------------------------------------------------------------
# Q: image_patch_grid — ViT-style patch planning from the parsed container
# dims: for every image payload (PNG IHDR / JPEG SOF0, parsed from the
# BYTES by parse_media_headers — correctness of that parse is pinned
# bit-level by media_header_dims), compute the 224×224 patch grid a vision
# encoder would see: patches per axis (ceil division in exact integer
# arithmetic), total patches, and the padding fraction wasted by rounding
# the image up to whole patches. Rolled up per container format. This is
# the capacity-planning pass of a multimodal training pipeline — "how many
# ViT tokens does this corpus cost" — and runs as a narrow codegen map +
# one small aggregate; the pixel DECODE stays behind the codec gate, the
# PLAN never needs it. The oracle derives dims from the synth generator's
# formula (parse==formula is what media_header_dims pins), then replays
# the same integer grid math.
# --------------------------------------------------------------------------
@query(
    "image_patch_grid",
    oracle="""
WITH dims AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'png' ELSE 'jpeg' END AS container,
         CAST(16 + doc_id % 2048 AS BIGINT) AS w,
         CAST(16 + (doc_id * 7) % 2048 AS BIGINT) AS h
  FROM documents WHERE doc_id % 3 IN (0, 1)
),
grid AS (
  SELECT container, w, h,
         (w + 223) // 224 AS nx,
         (h + 223) // 224 AS ny
  FROM dims
)
SELECT container,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(nx * ny) AS BIGINT) AS total_patches,
       round(avg(CAST(nx * ny AS DOUBLE)), 6) AS avg_patches,
       round(avg(1.0 - CAST(w * h AS DOUBLE) / (nx * ny * 224 * 224)), 6)
         AS avg_pad_frac,
       CAST(max(nx) AS BIGINT) AS max_nx,
       CAST(max(ny) AS BIGINT) AS max_ny
FROM grid
GROUP BY container
ORDER BY container
""",
)
def image_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.multimodal.binary_ops import (
        parse_media_headers,
        synth_container_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    dims = parse_media_headers(synth_container_media(docs)).filter(
        F.col("container").isin("png", "jpeg")
    )
    nx = F.expr("(width + 223) div 224")
    ny = F.expr("(height + 223) div 224")
    grid = dims.select(
        "container",
        F.col("width").alias("w"),
        F.col("height").alias("h"),
        nx.alias("nx"),
        ny.alias("ny"),
    )
    return (
        grid.groupBy("container")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.sum(F.col("nx") * F.col("ny")).cast("long").alias("total_patches"),
            F.round(F.avg((F.col("nx") * F.col("ny")).cast("double")), 6).alias(
                "avg_patches"
            ),
            F.round(
                F.avg(
                    F.lit(1.0)
                    - (F.col("w") * F.col("h")).cast("double")
                    / (F.col("nx") * F.col("ny") * 224 * 224)
                ),
                6,
            ).alias("avg_pad_frac"),
            F.max("nx").cast("long").alias("max_nx"),
            F.max("ny").cast("long").alias("max_ny"),
        )
        .orderBy("container")
    )


# --------------------------------------------------------------------------
# Q: audio_stft_frame_plan — STFT framing plan from the parsed WAV header:
# samples per clip = data_bytes div block_align (both recovered from the
# RIFF bytes by parse_wav_timing / the fmt chunk), then the sliding-window
# frame count for an 8-sample window with hop 4 — the exact shape every
# speech pipeline computes before any DSP runs (frames = tokens = cost).
# All integer arithmetic, per (sample_rate, channels, bits) format cell.
# Scale: narrow codegen map + one aggregate keyed on the format cell
# (bounded cardinality); no Python, no codec, no decode.
# --------------------------------------------------------------------------
@query(
    "audio_stft_frame_plan",
    oracle="""
WITH wavs AS (
  SELECT doc_id,
         CAST(1 + doc_id % 2 AS BIGINT) AS ch,
         CAST(8000 * (1 + doc_id % 5) AS BIGINT) AS sr,
         CAST(16 + 8 * (doc_id % 2) AS BIGINT) AS bits
  FROM documents WHERE doc_id % 3 = 2
),
plan AS (
  SELECT sr, ch, bits,
         32 // (ch * bits // 8) AS n_samples
  FROM wavs
),
framed AS (
  SELECT sr, ch, bits, n_samples,
         CASE WHEN n_samples >= 8 THEN 1 + (n_samples - 8) // 4
              ELSE 0 END AS n_frames
  FROM plan
)
SELECT sr AS sample_rate, ch AS channels, bits AS bits_per_sample,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(max(n_samples) AS BIGINT) AS samples_per_clip,
       CAST(max(n_frames) AS BIGINT) AS frames_per_clip,
       CAST(sum(n_frames) AS BIGINT) AS total_frames
FROM framed
GROUP BY sr, ch, bits
ORDER BY sample_rate, channels, bits_per_sample
""",
)
def audio_stft_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.multimodal.binary_ops import (
        parse_wav_timing,
        synth_container_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    wav = parse_wav_timing(synth_container_media(docs))
    block_align = F.expr("channels * bits_per_sample div 8")
    n_samples = F.expr(
        "data_bytes div (channels * bits_per_sample div 8)"
    )
    plan = wav.select(
        "sample_rate",
        "channels",
        "bits_per_sample",
        n_samples.alias("n_samples"),
    ).withColumn(
        "n_frames",
        F.when(
            F.col("n_samples") >= 8,
            F.lit(1) + F.expr("(n_samples - 8) div 4"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return (
        plan.groupBy("sample_rate", "channels", "bits_per_sample")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clips"),
            F.max("n_samples").cast("long").alias("samples_per_clip"),
            F.max("n_frames").cast("long").alias("frames_per_clip"),
            F.sum("n_frames").cast("long").alias("total_frames"),
        )
        .orderBy("sample_rate", "channels", "bits_per_sample")
    )


# --------------------------------------------------------------------------
# Q: video_frame_sample_plan — fixed-rate frame-sampling plan from the
# parsed mvhd timing: one frame every 250 ms of movie time, with the count
# computed ENTIRELY in integer space (frames = (duration_units * 4) div
# timescale + 1 — 1000ms/250ms = 4 sample points per second of units), so
# no float-division boundary can diverge between engines. This is the
# "how many frames will the vision tower see" pass of a video-training
# pipeline; the frame DECODE is the codec-gated step, the sampling plan
# never needs it. Rolled up per timescale with the exact sampled-frame
# total and the per-video max.
# --------------------------------------------------------------------------
@query(
    "video_frame_sample_plan",
    oracle="""
WITH base AS (
  SELECT CAST(1000 * (1 + doc_id % 4) AS BIGINT) AS timescale,
         CAST(500 + doc_id % 100000 AS BIGINT) AS dur
  FROM documents
),
plan AS (
  SELECT timescale, dur,
         (dur * 4) // timescale + 1 AS n_frames
  FROM base
)
SELECT timescale,
       CAST(count(*) AS BIGINT) AS n_videos,
       CAST(sum(n_frames) AS BIGINT) AS total_frames,
       round(avg(CAST(n_frames AS DOUBLE)), 6) AS avg_frames,
       CAST(max(n_frames) AS BIGINT) AS max_frames
FROM plan
GROUP BY timescale
ORDER BY timescale
""",
)
def video_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.multimodal.binary_ops import (
        parse_mp4_timing,
        synth_mp4_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    timing = parse_mp4_timing(synth_mp4_media(docs))
    plan = timing.select(
        "timescale",
        (
            F.expr("(duration_units * 4) div timescale") + F.lit(1)
        ).alias("n_frames"),
    )
    return (
        plan.groupBy("timescale")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_videos"),
            F.sum("n_frames").cast("long").alias("total_frames"),
            F.round(F.avg(F.col("n_frames").cast("double")), 6).alias(
                "avg_frames"
            ),
            F.max("n_frames").cast("long").alias("max_frames"),
        )
        .orderBy("timescale")
    )
