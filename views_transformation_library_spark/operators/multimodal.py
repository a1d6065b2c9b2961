"""Multimodal column plumbing (beyond-reference surface).

Images/audio/video are opaque `binary` columns plus typed metadata; the
Spark-side machinery — schema, partition sizing, Arrow batch shape, UDF
signatures — is real and tested, while the actual media decoding is stubbed
(no image/audio libraries in this environment): `decode_stub=True` swaps in
a deterministic fake decoder; `False` raises NotImplementedError at the
clearly marked point where PIL/ffmpeg would plug in.

At scale the pattern is `mapInPandas` (per-partition Arrow batches, constant
memory per task) rather than per-row UDFs; binary payloads stay in the JVM
until the Arrow transfer and partitions should be sized by
`spark.sql.files.maxPartitionBytes` so one batch of blobs fits comfortably
in executor memory.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _try_import_pil():
    """Import-gated real image decoder: PIL when present (absent in this
    container — verified), else None and the deterministic fake carries
    the tests. Module-level so executors resolve it the same way."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except Exception:
        return None


_PIL = _try_import_pil()

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum long, feat0 double, feat1 double"
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media-shaped frame from any table (testdata has no binary
    column, so payloads are utf-8 encoded text — deterministic stand-ins
    with real `binary` Spark type)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("blob").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _fake_decode(payload: bytes) -> tuple[int, float, float]:
    """Deterministic stand-in for a media decoder: byte checksum and two
    'features' derived from byte statistics."""
    if payload is None:
        return 0, 0.0, 0.0
    checksum = sum(payload) % 1_000_000_007
    n = len(payload)
    feat0 = (sum(payload) / n) if n else 0.0  # mean byte value
    feat1 = float(payload[0]) if n else 0.0  # first byte
    return checksum, feat0, feat1


def _real_decode(payload: bytes) -> tuple[int, float, float]:
    """PIL-backed image decode: (byte checksum, mean grayscale pixel,
    width/height aspect). Only payloads PIL cannot PARSE (non-image blobs:
    UnidentifiedImageError / truncated-stream OSError / ValueError) fall
    back to the deterministic byte-statistics fake, so mixed-media tables
    never fail the whole partition — genuine failures in the real path
    (numpy errors, MemoryError, bugs) propagate instead of being silently
    masked as 'non-image payload'."""
    if payload is None:
        return 0, 0.0, 0.0
    parse_errors = (OSError, ValueError)
    unidentified = getattr(_PIL, "UnidentifiedImageError", None)
    if unidentified is not None:  # PIL >= 7; subclass of OSError, listed
        parse_errors = (unidentified, *parse_errors)  # for explicitness
    try:
        img = _PIL.open(io.BytesIO(bytes(payload)))
        arr_src = img.convert("L")
    except parse_errors:
        return _fake_decode(payload)
    import numpy as np

    arr = np.asarray(arr_src, dtype=np.float64)
    checksum = sum(payload) % 1_000_000_007
    return checksum, float(arr.mean()) if arr.size else 0.0, float(
        img.width / img.height
    )


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode/feature-extract over binary payloads via mapInPandas.

    ``decode_stub=True`` (default, and the oracle-gated configuration)
    uses the deterministic byte-statistics fake. ``decode_stub=False``
    selects the REAL decoder path: import-gated on PIL — raises
    NotImplementedError at plan build when the library is absent (as in
    this container), decodes images and byte-falls-back on non-image
    payloads when present. The Spark plumbing (Arrow batches, schema,
    narrow numeric output) is identical on both paths.

    Arrow-batched: each pandas chunk carries the binary column zero-copy
    from the JVM; output is a narrow numeric frame (blobs do not survive
    past this operator, keeping downstream shuffles small)."""
    if not decode_stub and _PIL is None:
        raise NotImplementedError(
            "real media decoding needs PIL, which is not present in this "
            "environment; use decode_stub=True"
        )
    decode = _fake_decode if decode_stub else _real_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                checksum, feat0, feat1 = decode(payload)
                rows.append(
                    (mid, kind, len(payload) if payload is not None else 0, checksum, feat0, feat1)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "n_bytes", "checksum", "feat0", "feat1"],
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: passes payloads through mapInPandas and stamps
    the target dimensions; the pixel work is the stubbed step."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            yield out

    return df.mapInPandas(run, schema=df.schema)


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled timestamp
    (deterministic from duration metadata; decoding stubbed). Explodes
    JVM-side — no Python needed for the fan-out itself."""
    n_frames = F.greatest(
        F.lit(1), (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    )
    out = df.select(
        "media_id", "kind", F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")
    )
    return out.withColumn("ts_ms", F.col("frame_idx") * every_ms)
