"""Multimodal column plumbing [EXT]: image/audio/video as opaque binary
columns with typed metadata.

The decode kernels (image decode, audio resample, video frame extraction)
need native libraries that are usually NOT in this container, so the
*kernels* are stubbed — a deterministic fake when ``fake=True`` (for
tests), else NotImplementedError. Exception: the IMAGE decode path is
fully wired — when Pillow is importable on the executor, ``fake=False``
decodes real payload bytes (width × height × mode feature); the
NotImplementedError guard remains for environments without the lib and
for the audio/video kernels. Everything Spark-side is real and tested:
the asset schema, Arrow-batched ``mapInPandas`` plumbing, batch shapes,
partition-size control for large blobs.

Scale notes: binary payloads dominate row size, so assets are repartitioned
by byte budget before any UDF stage (`target_partition_bytes`), and metadata
extraction keeps payloads out of the exchange (select only what moves).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal asset schema: payload + typed metadata
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("mime_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("byte_len", LongType(), True),
        StructField("feature", StringType(), True),
    ]
)


def _fake_decode(payload: bytes | None, modality: str) -> str:
    """Deterministic stand-in for a real decode: stable digest of the bytes."""
    import hashlib

    if payload is None:
        return "empty"
    return f"{modality}:{hashlib.md5(payload).hexdigest()[:12]}"


def decode_features(
    assets: DataFrame,
    *,
    fake: bool = False,
    batch_hint: int = 64,
    target_partition_bytes: int = 256 * 1024 * 1024,
    total_bytes: int | None = None,
) -> DataFrame:
    """Extract per-asset features from binary payloads via ``mapInPandas``.

    Arrow streams column batches into pandas; each batch yields one output
    frame — the UDF never holds more than a batch of payloads in memory.
    With ``fake=False`` this raises NotImplementedError inside the executor
    (the image/audio libraries are not installed here); the plumbing —
    schema, batching, partition sizing — is the tested surface.

    ``total_bytes`` (when known, e.g. from table stats) drives a
    repartition so each task holds ~``target_partition_bytes`` of payload.
    """
    if total_bytes:
        parts = max(1, total_bytes // target_partition_bytes)
        assets = assets.repartition(int(parts))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # fake mode stays self-contained (pandas/hashlib only); the real
        # path references _real_image_decoder, so executors need the
        # package importable — true in local mode and on any cluster the
        # package is deployed to
        import hashlib

        import pandas as _pd

        def fake_decode(payload, modality):
            if payload is None:
                return "empty"
            return f"{modality}:{hashlib.md5(payload).hexdigest()[:12]}"

        real = None
        if not fake:
            real = _real_image_decoder()  # None when Pillow is absent

        for pdf in batches:
            if not fake and real is None:
                raise NotImplementedError(
                    "real decode requires image/audio libraries not present in this environment"
                )
            decode = fake_decode if fake else real
            out = _pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "byte_len": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": [
                        decode(b, m)
                        for b, m in zip(pdf["payload"], pdf["modality"])
                    ],
                }
            )
            yield out

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def _real_image_decoder():
    """Executor-side real image decode kernel, or None when Pillow is absent.

    Returned callable maps (payload, modality) -> feature string: images
    decode to ``image:<width>x<height>:<mode>`` from the actual bytes; the
    audio/video kernels stay unimplemented (their codecs are genuinely not
    wired), and an unparseable image payload raises ValueError rather than
    silently degrading — a corrupt blob in a curation pipeline should
    quarantine, not pass."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None

    def decode(payload, modality):
        if payload is None:
            return "empty"
        if modality != "image":
            raise NotImplementedError(
                f"real decode wired for images only (got modality={modality!r})"
            )
        with Image.open(io.BytesIO(bytes(payload))) as img:
            return f"image:{img.width}x{img.height}:{img.mode.lower()}"

    return decode


def decode_features_arrow(assets: DataFrame, *, fake: bool = False) -> DataFrame:
    """Arrow-native variant of ``decode_features`` via ``mapInArrow``.

    Skips the Arrow->pandas->Arrow conversion entirely: batches arrive as
    ``pyarrow.RecordBatch`` and leave as RecordBatch, so binary payloads are
    never copied into pandas object arrays — the right shape when the UDF is
    byte-oriented (codecs, hashing, tensor packing) rather than
    dataframe-oriented. Same output schema and values as ``decode_features``
    (asserted equal in tests).
    """

    def run(batches):
        import hashlib

        import pyarrow as pa

        real = None if fake else _real_image_decoder()

        for batch in batches:
            if not fake and real is None:
                raise NotImplementedError(
                    "real decode requires image/audio libraries not present in this environment"
                )
            payloads = batch.column("payload").to_pylist()
            modalities = batch.column("modality").to_pylist()
            if fake:
                feats = [
                    f"{m}:{hashlib.md5(b).hexdigest()[:12]}" if b is not None else "empty"
                    for b, m in zip(payloads, modalities)
                ]
            else:
                feats = [real(b, m) for b, m in zip(payloads, modalities)]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("asset_id"),
                    batch.column("modality"),
                    pa.array(
                        [len(b) if b is not None else 0 for b in payloads],
                        type=pa.int64(),
                    ),
                    pa.array(feats, type=pa.string()),
                ],
                names=["asset_id", "modality", "byte_len", "feature"],
            )

    return assets.mapInArrow(run, FEATURE_SCHEMA)


def resize_images(assets: DataFrame, *, width: int, height: int, fake: bool = False) -> DataFrame:
    """Image resize stub: same plumbing pattern, payload->payload.

    Fake mode passes payloads through and rewrites metadata (deterministic);
    real mode raises NotImplementedError in the executor.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("image decode libraries unavailable")
            pdf = pdf.copy()
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return assets.mapInPandas(run, assets.schema)


def frame_sample(assets: DataFrame, *, every_ms: int, fake: bool = False) -> DataFrame:
    """Video frame-sampling stub: one output row per sampled frame.

    Demonstrates the 1->N batch shape (explode inside the UDF); fake mode
    fabricates frame ids from duration metadata.
    """
    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("ts_ms", LongType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("video decode libraries unavailable")
            rows: list[dict[str, Any]] = []
            for _, r in pdf.iterrows():
                dur = int(r["duration_ms"] or 0)
                for i, ts in enumerate(range(0, dur, every_ms)):
                    rows.append(
                        {"asset_id": r["asset_id"], "frame_idx": i, "ts_ms": ts, "frame": None}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return assets.mapInPandas(run, out_schema)


def asset_metadata_summary(assets: DataFrame) -> DataFrame:
    """Metadata-only rollup — projects payload OUT before the shuffle so the
    exchange moves kilobytes, not blobs."""
    return (
        assets.select("modality", F.octet_length("payload").alias("bytes"), "duration_ms")
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("assets"),
            F.sum("bytes").alias("total_bytes"),
            F.avg("bytes").alias("avg_bytes"),
        )
    )


def audio_window_energy(
    assets: DataFrame, *, window_bytes: int = 1024, fake: bool = False
) -> DataFrame:
    """Audio windowed-energy stub: RMS energy per fixed-size sample window.

    The audio member of the decode trio (image resize / video frame-sample /
    audio windowing): 1->N like ``frame_sample`` but over the PAYLOAD rather
    than metadata. Real decode (codec -> PCM) is unavailable in this
    container; fake mode treats the raw payload bytes as unsigned 8-bit PCM,
    which keeps the whole path — Arrow batch transfer, numpy vectorization
    per window, 1->N output shape — executable and deterministic.

    Output: (asset_id, window_idx, n_samples, rms) — rms rounded to 6
    decimals so results are comparable across runs.
    """
    import numpy as np

    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("window_idx", IntegerType(), False),
            StructField("n_samples", IntegerType(), False),
            StructField("rms", DoubleType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("audio decode libraries unavailable")
            rows: list[dict[str, Any]] = []
            for _, r in pdf.iterrows():
                payload = r["payload"]
                if payload is None:
                    continue
                samples = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float64)
                for i in range(0, len(samples), window_bytes):
                    w = samples[i : i + window_bytes]
                    rows.append(
                        {
                            "asset_id": r["asset_id"],
                            "window_idx": i // window_bytes,
                            "n_samples": len(w),
                            "rms": round(float(np.sqrt(np.mean(w * w))), 6),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return assets.mapInPandas(run, out_schema)
