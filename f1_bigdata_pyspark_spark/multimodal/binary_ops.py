"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

North-star scope: a 100 TB training-data pipeline carries image/audio/video
as binary columns and runs decode / feature-extract / resize / frame-sample
as Arrow-batched Pandas functions over ``mapInPandas``. Container-header
parsing (``parse_media_headers``: PNG IHDR, JPEG SOF0, RIFF/WAVE fmt) is
REAL — bytes in, typed metadata out, built-in expressions only, verified
against genuine zlib/wave/struct-built files. Only the pixel/sample
*decode* is codec-gated (no image/audio libraries in this container):
``decode_payload`` raises for non-fake codecs; everything Spark-side —
schema, batch iteration, partition preservation, UDF signatures — is real
and tested.

Scale notes: ``mapInPandas`` streams Arrow record batches; peak memory per
task is one batch (tune ``spark.sql.execution.arrow.maxRecordsPerBatch`` for
fat payloads). No shuffle is introduced — extraction is a narrow map, and
downstream aggregations see ordinary columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# payload + typed metadata, the multimodal table shape
MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<codec: string, n_bytes: long>"
)

EXTRACTED_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "fake_width int, fake_height int"
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents fixture: the
    utf-8 bytes of ``text`` play the role of an encoded payload."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fake").alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake").alias("codec"),
            F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, codec: str) -> bytes:
    """Real decode would dispatch to an image/audio library; none ships in
    this container. ``fake`` payloads pass through; anything else is an
    explicit stub."""
    if codec == "fake":
        return payload
    raise NotImplementedError(
        f"codec {codec!r}: real decoders (PIL/ffmpeg) are not available in "
        "this environment; only the deterministic 'fake' codec is wired"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas: byte length,
    sha256, and deterministic fake dimensions derived from the digest (the
    stand-in for a real decode→measure step)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            digests = [hashlib.sha256(bytes(p)).hexdigest() for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": digests,
                    # fake decode: dims derived from the first digest bytes
                    "fake_width": [int(d[:4], 16) % 1920 for d in digests],
                    "fake_height": [int(d[4:8], 16) % 1080 for d in digests],
                }
            )

    return media.mapInPandas(batches, schema=EXTRACTED_SCHEMA)


AUDIO_SCHEMA = (
    "media_id long, n_samples long, rms double, zero_crossings long, "
    "peak int"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Audio-analysis stand-in over mapInPandas: interpret the payload as
    signed 8-bit PCM samples and compute RMS energy, zero-crossing count,
    and peak amplitude — vectorized numpy per Arrow batch, exactly the
    shape a real loudness/VAD feature pass has (swap the byte view for a
    proper codec decode when one is available). Narrow map, no shuffle."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_samples, rms, zc, peak = [], [], [], []
            for p in pdf["payload"]:
                x = np.frombuffer(bytes(p), dtype=np.int8).astype(np.float64)
                if x.size == 0:
                    x = np.zeros(1)
                n_samples.append(int(x.size))
                rms.append(round(float(np.sqrt(np.mean(x * x))), 6))
                zc.append(int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1]))))
                peak.append(int(np.max(np.abs(x))))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": n_samples,
                    "rms": rms,
                    "zero_crossings": zc,
                    "peak": peak,
                }
            )

    return media.mapInPandas(batches, schema=AUDIO_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<codec: string, n_bytes: long>, "
    "target_width int, target_height int"
)


def resize(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stand-in over mapInPandas: a real pipeline decodes, resamples
    to (width, height), and re-encodes; without codecs the deterministic
    fake resamples the BYTE stream to the target pixel count (truncate or
    cycle-repeat), preserving the real pipeline's shape — binary in, binary
    out, meta updated, one narrow Arrow-batched map, no shuffle. Payload
    size becomes exactly width·height bytes (one fake byte per pixel)."""
    n_out = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p in pdf["payload"]:
                b = bytes(p)
                if not b:
                    b = b"\x00"
                reps = -(-n_out // len(b))  # ceil division
                out.append((b * reps)[:n_out])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out,
                    "meta": [
                        {"codec": m["codec"], "n_bytes": n_out}
                        for m in pdf["meta"]
                    ],
                    "target_width": width,
                    "target_height": height,
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling stand-in: emit one row per sampled offset of the
    payload (what a video pipeline does per keyframe). Pure Spark-side
    explode — the per-frame decode would slot into ``extract_features``."""
    n_frames = F.greatest(
        F.floor(F.octet_length("payload") / F.lit(every_n_bytes)).cast("int"),
        F.lit(1),
    )
    return (
        media.withColumn("__n", n_frames)
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("__n") - 1)).alias("frame_idx"),
        )
        .withColumn("byte_offset", F.col("frame_idx") * F.lit(every_n_bytes))
    )


# --------------------------------------------------------------------------
# Real container-header parsing — bytes in, typed metadata out, NO codec.
#
# A 100 TB ingest's first multimodal pass is exactly this: sniff the magic
# number and pull dimensions / sample formats out of the container header
# (PNG IHDR, JPEG SOF0 segment, RIFF/WAVE fmt chunk) without decoding any
# pixels or samples. Both functions below are pure built-in expressions
# (hex / substring / locate / conv) — whole-stage codegen, narrow map, no
# Python — so they run at scan speed; the pixel/sample DECODE remains the
# only codec-gated step (decode_payload above).
# --------------------------------------------------------------------------


def _be32(c):
    return F.lower(F.lpad(F.hex(c), 8, "0"))


def _be16(c):
    return F.lower(F.lpad(F.hex(c), 4, "0"))


def _le(hex_col, n_bytes: int):
    """Byte-swap a fixed-width big-endian hex string to little-endian."""
    return F.concat(
        *[
            F.substring(hex_col, 2 * i + 1, 2)
            for i in reversed(range(n_bytes))
        ]
    )


def _hex_at(ph, pos, n_hex: int):
    return F.substring(ph, pos, n_hex)


def _u_be(ph, pos, n_hex: int):
    return F.conv(F.substring(ph, pos, n_hex), 16, 10).cast("long")


def _u_le(ph, pos, n_bytes: int):
    le = F.concat(
        *[
            F.substring(ph, pos + 2 * i, 2)
            for i in reversed(range(n_bytes))
        ]
    )
    return F.conv(le, 16, 10).cast("long")


def synth_container_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table whose payloads carry REAL container
    layouts: PNG signature + IHDR, JPEG SOI/APP0/SOF0 segments, RIFF/WAVE
    fmt chunk — with dimensions and sample formats derived from doc_id
    and a 32-byte md5-hex body standing in for compressed data. Built
    entirely in hex-string space with ONE unhex at the end, so a SQL
    oracle can construct bit-identical blobs. The body bytes are ASCII
    hex characters (0x30-0x39, 0x61-0x66), which can never contain 0xFF —
    so JPEG marker scanning cannot false-positive inside the body (real
    JPEG entropy data escapes 0xFF as FF00 for the same reason)."""
    d = F.col("doc_id")
    w = (F.lit(16) + d % 2048).cast("long")
    h = (F.lit(16) + (d * 7) % 2048).cast("long")
    ch = (F.lit(1) + d % 2).cast("long")
    sr = (F.lit(8000) * (F.lit(1) + d % 5)).cast("long")
    bits = (F.lit(16) + F.lit(8) * (d % 2)).cast("long")
    byte_rate = (sr * ch * bits / F.lit(8)).cast("long")
    block_align = (ch * bits / F.lit(8)).cast("long")
    body = F.lower(F.hex(F.md5(F.col("text"))))  # 32 ASCII chars -> 64 hex
    png = F.concat(
        F.lit("89504e470d0a1a0a"),           # signature
        F.lit("0000000d"), F.lit("49484452"),  # IHDR length + type
        _be32(w), _be32(h),
        F.lit("0806000000"),                  # depth/color/comp/filter/interlace
        F.lit("00000000"),                    # CRC slot (not validated here)
        body,
    )
    jpeg = F.concat(
        F.lit("ffd8"),                        # SOI
        F.lit("ffe0"), F.lit("0010"),         # APP0, length 16
        F.lit("4a46494600"), F.lit("0101"),   # 'JFIF\0', version
        F.lit("00"), F.lit("0001"), F.lit("0001"), F.lit("0000"),
        F.lit("ffc0"), F.lit("0011"),         # SOF0, length 17
        F.lit("08"),                          # precision
        _be16(h), _be16(w),                   # SOF stores HEIGHT first
        F.lit("03"),                          # 3 components
        F.lit("011100"), F.lit("021101"), F.lit("031101"),
        body,
    )
    wav = F.concat(
        F.lit("52494646"),                    # 'RIFF'
        F.lit("44000000"),                    # chunk size 36+32, LE
        F.lit("57415645"), F.lit("666d7420"),  # 'WAVE' 'fmt '
        F.lit("10000000"),                    # fmt length 16, LE
        F.lit("0100"),                        # PCM, LE
        _le(_be16(ch), 2),
        _le(_be32(sr), 4),
        _le(_be32(byte_rate), 4),
        _le(_be16(block_align), 2),
        _le(_be16(bits), 2),
        F.lit("64617461"), F.lit("20000000"),  # 'data', size 32 LE
        body,
    )
    payload_hex = (
        F.when(d % 3 == 0, png).when(d % 3 == 1, jpeg).otherwise(wav)
    )
    return docs.select(
        d.alias("media_id"), F.unhex(payload_hex).alias("payload")
    )


def parse_media_headers(media: DataFrame) -> DataFrame:
    """Container sniff + header parse from the BYTES alone: magic-number
    dispatch, then PNG IHDR width/height (big-endian u32 at fixed
    offsets), JPEG SOF0 height/width (segment located by marker scan —
    sound because encoders escape 0xFF in entropy data), WAV fmt-chunk
    channels/sample-rate/bits (little-endian). Built-ins only: one hex()
    per payload, substring/locate/conv arithmetic after that — codegen
    end to end, no Python, no codec."""
    ph = F.lower(F.hex(F.col("payload")))
    is_png = F.substring(ph, 1, 16) == "89504e470d0a1a0a"
    is_jpeg = F.substring(ph, 1, 4) == "ffd8"
    is_wav = (F.substring(ph, 1, 8) == "52494646") & (
        F.substring(ph, 17, 8) == "57415645"
    )
    sof = F.locate("ffc0", ph)  # 1-based hex-char position of the SOF0 marker
    null_l = F.lit(None).cast("long")
    return media.select(
        "media_id",
        F.when(is_png, "png")
        .when(is_jpeg, "jpeg")
        .when(is_wav, "wav")
        .otherwise("unknown")
        .alias("container"),
        F.when(is_png, _u_be(ph, 33, 8))
        .when(is_jpeg, _u_be(ph, sof + 14, 4))
        .otherwise(null_l)
        .alias("width"),
        F.when(is_png, _u_be(ph, 41, 8))
        .when(is_jpeg, _u_be(ph, sof + 10, 4))
        .otherwise(null_l)
        .alias("height"),
        F.when(is_wav, _u_le(ph, 45, 2)).otherwise(null_l).alias("channels"),
        F.when(is_wav, _u_le(ph, 49, 4)).otherwise(null_l).alias("sample_rate"),
        F.when(is_wav, _u_le(ph, 69, 2)).otherwise(null_l).alias("bits_per_sample"),
    )


PAYLOAD_STATS_SCHEMA = (
    "media_id long, n_bytes long, first_byte int, byte_xor int"
)


def payload_stats_arrow(media: DataFrame) -> DataFrame:
    """Per-payload byte statistics via ``mapInArrow`` — the zero-copy tier
    below mapInPandas: batches arrive as ``pyarrow.RecordBatch`` and never
    materialize a pandas object, so binary payloads are sliced directly
    from the Arrow buffers. Right tier for pure byte-level passes (codec
    sniffing, magic-number checks, checksums) where pandas conversion is
    measurable overhead at 100 TB; the stand-ins here (length, first byte,
    xor fold) occupy the slot of those real checks."""
    import pyarrow as pa

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            ids = batch.column(batch.schema.get_field_index("media_id"))
            payloads = batch.column(batch.schema.get_field_index("payload"))
            n_bytes, first, xor = [], [], []
            for p in payloads:
                buf = p.as_py()
                n_bytes.append(len(buf))
                first.append(buf[0] if buf else None)
                acc = 0
                for b in buf:
                    acc ^= b
                xor.append(acc)
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(n_bytes, pa.int64()),
                    pa.array(first, pa.int32()),
                    pa.array(xor, pa.int32()),
                ],
                ["media_id", "n_bytes", "first_byte", "byte_xor"],
            )

    return media.select("media_id", "payload").mapInArrow(
        batches, schema=PAYLOAD_STATS_SCHEMA
    )


def parse_wav_timing(media: DataFrame) -> DataFrame:
    """WAV playback timing FROM THE BYTES: byte-rate (fmt chunk, LE u32 at
    byte 29) and data-chunk size (LE u32 at byte 41) recovered with the
    same hex/substring/conv arithmetic as ``parse_media_headers``, then
    duration_ms = data_bytes * 1000 / byte_rate — the corpus-intake
    "how many listening hours is this bucket" pass, codegen end to end.
    Non-WAV payloads are dropped (sniffed by magic, not trusted metadata),
    and so are non-canonical layouts: the fixed offsets are only valid for
    the classic 44-byte header (16-byte PCM fmt chunk immediately followed
    by ``data``), so the sniff also pins ``fmt `` at byte 13 with chunk
    size 16 and ``data`` at byte 37 — a WAV with a ``fact``/``LIST`` chunk
    or extensible fmt is explicitly dropped rather than silently misread.
    byte_rate = 0 rows are dropped too (duration is undefined, and a
    malformed fmt chunk should not survive into the hours rollup)."""
    ph = F.lower(F.hex(F.col("payload")))
    is_wav = (
        (F.substring(ph, 1, 8) == "52494646")
        & (F.substring(ph, 17, 8) == "57415645")
        # canonical layout only: 'fmt ' at byte 13 with LE chunk size 16,
        # 'data' chunk header at byte 37
        & (F.substring(ph, 25, 8) == "666d7420")
        & (F.substring(ph, 33, 8) == "10000000")
        & (F.substring(ph, 73, 8) == "64617461")
    )
    byte_rate = _u_le(ph, 57, 4)
    data_bytes = _u_le(ph, 81, 4)
    return media.filter(is_wav & (byte_rate > 0)).select(
        "media_id",
        _u_le(ph, 45, 2).alias("channels"),
        _u_le(ph, 49, 4).alias("sample_rate"),
        _u_le(ph, 69, 2).alias("bits_per_sample"),
        byte_rate.alias("byte_rate"),
        data_bytes.alias("data_bytes"),
        (data_bytes * F.lit(1000.0) / byte_rate).alias("duration_ms"),
    )


def synth_mp4_media(docs: DataFrame) -> DataFrame:
    """Deterministic ISO-BMFF (MP4) table: every payload carries a REAL
    box layout — ftyp, then moov containing a version-0 mvhd (full 100-byte
    payload with rate/volume/matrix), then an mdat with a 32-byte md5-hex
    body — built in hex-string space with one final unhex so a SQL oracle
    constructs bit-identical blobs. Movie timescale and duration derive
    from doc_id. The body's hex encoding contains no 'd' character (body
    bytes are ASCII hex digits, whose own hex digits are 3/6 + 0-9/1-6),
    so the SQL ORACLE's strpos scan for the 'mvhd' tag (6d766864) cannot
    false-positive inside the body; the Spark-side parser no longer needs
    that guarantee — it walks the size-prefixed box chain and never looks
    inside mdat."""
    d = F.col("doc_id")
    timescale = (F.lit(1000) * (F.lit(1) + d % 4)).cast("long")
    duration = (F.lit(500) + d % 100000).cast("long")
    body = F.lower(F.hex(F.md5(F.col("text"))))
    mvhd = F.concat(
        F.lit("0000006c"), F.lit("6d766864"),  # size 108, 'mvhd'
        F.lit("00000000"),                     # version 0 + flags
        F.lit("00000000"), F.lit("00000000"),  # ctime, mtime
        _be32(timescale), _be32(duration),
        F.lit("00010000"), F.lit("0100"),      # rate 1.0, volume 1.0
        F.lit("0" * 20),                       # 10 reserved bytes
        F.lit("00010000000000000000000000000000"
              "00010000000000000000000000000000"
              "40000000"),                     # identity matrix
        F.lit("0" * 48),                       # 24 pre_defined bytes
        F.lit("00000002"),                     # next_track_ID
    )
    payload_hex = F.concat(
        F.lit("00000014"), F.lit("66747970"),  # ftyp box, size 20
        F.lit("69736f6d"), F.lit("00000200"), F.lit("69736f6d"),
        F.lit("00000074"), F.lit("6d6f6f76"),  # moov box, size 116
        mvhd,
        F.lit("00000028"), F.lit("6d646174"),  # mdat box, size 40
        body,
    )
    return docs.select(
        d.alias("media_id"), F.unhex(payload_hex).alias("payload")
    )


def _u_be_at(ph, pos, n_hex: int):
    """Big-endian unsigned int of ``n_hex`` hex chars at COLUMN-valued
    1-based hex position ``pos``."""
    return F.conv(ph.substr(pos.cast("int"), F.lit(n_hex)), 16, 10).cast("long")


def _fold_box_walk(ph, start, limit, tag_hex: str, hops: int):
    """1-based hex position of the SIZE field of the first box whose 4-byte
    tag hex-encodes to ``tag_hex``, walking the ISO-BMFF size-prefixed box
    chain from hex position ``start`` while headers fit at or before hex
    index ``limit``; 0 when absent within ``hops`` boxes. Implemented as a
    RUNTIME FOLD — ``F.aggregate`` over a constant hop sequence threading a
    (pos, found) struct — so the expression tree is constant-size and the
    iteration happens at evaluation time. The alternatives both go
    exponential in Catalyst: an unrolled when/otherwise chain duplicates
    the position subtree ~5x per hop (analysis never returns at 8 hops),
    and a per-hop projection chain gets re-inlined by filter pushdown /
    alias substitution the moment anything selective sits above it
    (measured 480 s on a 1-row frame). A box that declares a size too
    small to be a header (< 8 bytes) halts the walk instead of looping in
    place."""

    def step(acc, _i):
        pos, found = acc["pos"], acc["found"]
        live = (found == 0) & (pos > 0) & (pos + 15 <= limit)
        tag = ph.substr((pos + 8).cast("int"), F.lit(8))
        size_hex = _u_be_at(ph, pos, 8) * 2  # box size in hex chars
        hit = live & (tag == tag_hex)
        return F.struct(
            F.when(live & (tag != tag_hex) & (size_hex >= 16), pos + size_hex)
            .otherwise(F.lit(0).cast("long"))
            .alias("pos"),
            F.when(hit, pos).otherwise(found).alias("found"),
        )

    init = F.struct(
        start.cast("long").alias("pos"), F.lit(0).cast("long").alias("found")
    )
    return F.aggregate(F.sequence(F.lit(1), F.lit(hops)), init, step)["found"]


def parse_mp4_timing(media: DataFrame) -> DataFrame:
    """MP4 playback timing FROM THE BYTES: walk the top-level size-prefixed
    box chain to the ``moov`` box, then walk moov's children to the
    version-0 ``mvhd``, and read the big-endian u32 timescale and duration
    at their fixed offsets past the version/created/modified words.
    duration_ms = units * 1000 / timescale. The walk (not a raw substring
    scan) means an ``mdat`` body that happens to contain the bytes
    ``mvhd`` — or an mdat-before-moov layout — parses correctly: payload
    bytes are skipped by declared box size, never inspected. Dropped rows:
    non-BMFF payloads (no ftyp at byte 5), containers without moov/mvhd in
    the first 8 boxes of each level, and version-1 mvhd (64-bit times use
    different offsets; dropping beats silently misreading)."""
    ph = F.lower(F.hex(F.col("payload")))
    is_mp4 = F.substring(ph, 9, 8) == "66747970"  # 'ftyp' at byte 5
    df = media.filter(is_mp4).select("media_id", ph.alias("_ph"))
    ph = F.col("_ph")
    moov = _fold_box_walk(ph, F.lit(1), F.length(ph), "6d6f6f76", hops=8)
    # Materialize the first walk's result as COLUMNS before the second walk
    # references it: pyspark lambda parameters are named from the python
    # function signature, so embedding one fold's (unresolved) lambda
    # expression inside another fold's lambda body mis-binds the inner
    # ``acc`` to the outer lambda (observed: the normal moov-before-mdat
    # layout silently dropped). Through a projection the second lambda is
    # analyzed against plain attributes and resolution is unambiguous.
    df = df.select(
        "media_id",
        "_ph",
        moov.alias("_moov"),
        # last valid hex index inside moov, clamped to the payload
        F.least(moov + _u_be_at(ph, moov, 8) * 2 - 1, F.length(ph)).alias(
            "_moov_last"
        ),
    )
    # children start after moov's 8-byte header (16 hex chars)
    df = df.select(
        "media_id",
        "_ph",
        F.when(
            F.col("_moov") > 0,
            _fold_box_walk(
                ph, F.col("_moov") + 16, F.col("_moov_last"), "6d766864", hops=8
            ),
        )
        .otherwise(F.lit(0))
        .alias("_mvhd"),
    )
    mvhd = F.col("_mvhd")
    version0 = ph.substr((mvhd + 16).cast("int"), F.lit(2)) == "00"
    # mvhd layout (v0): size(4) tag(4) version+flags(4) created(4)
    # modified(4) timescale(4) duration(4) — offsets in hex chars below
    timescale = _u_be_at(ph, mvhd + 40, 8)
    duration = _u_be_at(ph, mvhd + 48, 8)
    return df.filter((mvhd > 0) & version0).select(
        "media_id",
        timescale.alias("timescale"),
        duration.alias("duration_units"),
        (duration * F.lit(1000.0) / timescale).alias("duration_ms"),
    )
