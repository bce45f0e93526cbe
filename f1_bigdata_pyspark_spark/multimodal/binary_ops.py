"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

North-star scope: a 100 TB training-data pipeline carries image/audio/video
as binary columns and runs decode / feature-extract / resize / frame-sample
as Arrow-batched Pandas functions over ``mapInPandas``. The image/audio
codecs are not in this container, so the *decode* step is stubbed (a
deterministic fake, or ``NotImplementedError`` when a real codec is
demanded); everything Spark-side — schema, batch iteration, partition
preservation, UDF signatures — is real and tested.

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
