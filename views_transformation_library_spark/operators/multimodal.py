"""Multimodal column plumbing (beyond-reference surface).

Images/audio/video are opaque `binary` columns plus typed metadata. Since
r6/r8 the media operations are REAL byte-level implementations, not stubs:
a pure-python binary-PPM/BMP raster decoder (`decode_ppm` / `decode_bmp`,
no image library needed), `resize_image` (decode → integer nearest-neighbor
resample → PPM re-encode), and `frame_sample` (concatenated-PPM video
container split + nearest-frame index) — all gated byte-exact against
md5(payload) VALUES goldens. `extract_features(decode_stub=True)` (the
default) still offers a deterministic byte-statistics fake for when inputs
are arbitrary blobs rather than parseable rasters; `decode_stub=False`
runs the real decoder (PIL is picked up via an import gate if ever
present, but is not required).

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


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary (P6) PPM encoder — pure python, used by `attach_image` and
    the round-trip tests. `rgb` is 3·width·height bytes, row-major."""
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length must be 3*width*height")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Uncompressed 24-bit bottom-up BMP encoder — pure python. `rgb` is
    row-major top-down RGB; rows are flipped and channel-swapped to the
    BMP's bottom-up BGR layout with 4-byte row padding."""
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length must be 3*width*height")
    stride = (3 * width + 3) // 4 * 4
    pad = b"\x00" * (stride - 3 * width)
    rows = []
    for y in range(height - 1, -1, -1):
        row = rgb[y * 3 * width : (y + 1) * 3 * width]
        # RGB -> BGR per pixel
        bgr = b"".join(row[i : i + 3][::-1] for i in range(0, len(row), 3))
        rows.append(bgr + pad)
    pixels = b"".join(rows)
    offset = 14 + 40
    size = offset + len(pixels)
    file_header = b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00" + offset.to_bytes(4, "little")
    info = (
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(pixels).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return file_header + info + pixels


def decode_image_bytes(payload: bytes) -> tuple[int, int, int, int]:
    """Pure-python image decoder for binary PPM (P6) and uncompressed
    24-bit BMP: (width, height, pixel_byte_sum, n_pixel_bytes). No
    image library needed — this is what makes ``decode_stub=False`` REAL
    in a bare container. Raises ValueError for any other format (callers
    fall back to PIL when present, else the byte-statistics fake)."""
    if payload is None or len(payload) < 2:
        raise ValueError("not an image payload")
    buf = bytes(payload)
    if buf[:2] == b"P6":
        # header: magic, whitespace/comment-separated width height maxval,
        # ONE whitespace byte, then raw RGB samples
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(buf) and buf[pos : pos + 1].isspace():
                pos += 1
            if pos < len(buf) and buf[pos : pos + 1] == b"#":
                while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(buf) and not buf[pos : pos + 1].isspace():
                pos += 1
            if pos == start:
                raise ValueError("truncated PPM header")
            fields.append(int(buf[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = fields
        if not (0 < maxval < 256) or w <= 0 or h <= 0:
            raise ValueError("unsupported PPM (need 1-byte samples)")
        n = 3 * w * h
        pix = buf[pos : pos + n]
        if len(pix) != n:
            raise ValueError("truncated PPM pixel data")
        return w, h, sum(pix), n
    if buf[:2] == b"BM" and len(buf) >= 54:
        offset = int.from_bytes(buf[10:14], "little")
        w = int.from_bytes(buf[18:22], "little", signed=True)
        h = int.from_bytes(buf[22:26], "little", signed=True)
        bpp = int.from_bytes(buf[28:30], "little")
        compression = int.from_bytes(buf[30:34], "little")
        if bpp != 24 or compression != 0 or w <= 0 or h == 0:
            raise ValueError("unsupported BMP (need 24bpp uncompressed)")
        height = abs(h)
        stride = (3 * w + 3) // 4 * 4
        if len(buf) < offset + stride * height:
            raise ValueError("truncated BMP pixel data")
        total = 0
        for y in range(height):
            row = buf[offset + y * stride : offset + y * stride + 3 * w]
            total += sum(row)
        return w, height, total, 3 * w * height
    raise ValueError("not a PPM/BMP payload")


def attach_image(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 16,
) -> DataFrame:
    """Deterministic REAL-image synthesis: each row becomes a binary P6
    PPM whose pixel bytes are the doc's md5 hex digest tiled to fill the
    raster (height varies with the id: 8 + id % 8 rows). The payloads are
    genuine image files — `extract_features(decode_stub=False)` parses
    the header and raster for real — while staying exactly reproducible
    from (id, text) alone, which is what lets a SQL oracle replicate the
    decoded statistics byte-for-byte. Runs in mapInPandas like every
    other media stage (bytes never leave the worker as python objects
    row-by-row)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if did is None or pd.isna(did):
                    continue  # null ids can't be keyed — skip, don't fail the partition
                h = 8 + int(did) % 8
                n = 3 * width * h
                digest = hashlib.md5(
                    ("" if text is None else str(text)).encode("utf-8")
                ).hexdigest().encode("ascii")
                rgb = (digest * (n // len(digest) + 1))[:n]
                out.append((int(did), "image", encode_ppm(width, h, rgb), width, h, None))
            yield pd.DataFrame(
                out,
                columns=["media_id", "kind", "payload", "width", "height", "duration_ms"],
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=MEDIA_SCHEMA)


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
    """REAL image decode: (byte checksum, mean pixel-byte value, width/
    height aspect). The pure-python PPM/BMP parser handles those formats
    with no library at all (r6 — ``decode_stub=False`` works in a bare
    container); other formats go to PIL when present. Only payloads
    NEITHER path can PARSE (non-image blobs) fall back to the
    deterministic byte-statistics fake, so mixed-media tables never fail
    the whole partition — genuine failures in the real path (MemoryError,
    bugs) propagate instead of being silently masked."""
    if payload is None:
        return 0, 0.0, 0.0
    try:
        w, h, pix_sum, n_pix = decode_image_bytes(payload)
        checksum = sum(payload) % 1_000_000_007
        # one integer sum, one division: bit-reproducible anywhere
        return checksum, (pix_sum / n_pix) if n_pix else 0.0, w / h
    except ValueError:
        pass
    if _PIL is None:
        return _fake_decode(payload)
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

    ``decode_stub=True`` (default) uses the deterministic byte-statistics
    fake. ``decode_stub=False`` selects the REAL decoder path: binary PPM
    (P6) and uncompressed 24-bit BMP decode with the pure-python parser
    (no image library needed — r6, previously this raised without PIL),
    other formats decode via PIL when present, and unparseable payloads
    byte-fall-back so mixed tables never fail a partition. The Spark
    plumbing (Arrow batches, schema, narrow numeric output) is identical
    on both paths.

    Arrow-batched: each pandas chunk carries the binary column zero-copy
    from the JVM; output is a narrow numeric frame (blobs do not survive
    past this operator, keeping downstream shuffles small)."""
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


def decode_image_rgb(payload: bytes) -> tuple[int, int, bytes]:
    """Full raster decode to row-major top-down RGB bytes for binary PPM
    (P6) and uncompressed 24-bit BMP — the pixel-level companion of
    `decode_image_bytes` (which only needs byte statistics). Pure python;
    raises ValueError for anything else."""
    if payload is None or len(payload) < 2:
        raise ValueError("not an image payload")
    buf = bytes(payload)
    if buf[:2] == b"P6":
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(buf) and buf[pos : pos + 1].isspace():
                pos += 1
            if pos < len(buf) and buf[pos : pos + 1] == b"#":
                while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(buf) and not buf[pos : pos + 1].isspace():
                pos += 1
            if pos == start:
                raise ValueError("truncated PPM header")
            fields.append(int(buf[start:pos]))
        pos += 1
        w, h, maxval = fields
        if not (0 < maxval < 256) or w <= 0 or h <= 0:
            raise ValueError("unsupported PPM (need 1-byte samples)")
        n = 3 * w * h
        pix = buf[pos : pos + n]
        if len(pix) != n:
            raise ValueError("truncated PPM pixel data")
        return w, h, pix
    if buf[:2] == b"BM" and len(buf) >= 54:
        offset = int.from_bytes(buf[10:14], "little")
        w = int.from_bytes(buf[18:22], "little", signed=True)
        h = int.from_bytes(buf[22:26], "little", signed=True)
        bpp = int.from_bytes(buf[28:30], "little")
        compression = int.from_bytes(buf[30:34], "little")
        if bpp != 24 or compression != 0 or w <= 0 or h == 0:
            raise ValueError("unsupported BMP (need 24bpp uncompressed)")
        height = abs(h)
        stride = (3 * w + 3) // 4 * 4
        if len(buf) < offset + stride * height:
            raise ValueError("truncated BMP pixel data")
        rows = []
        # BMP stores bottom-up BGR (positive h); negative h is top-down
        ys = range(height - 1, -1, -1) if h > 0 else range(height)
        for y in ys:
            row = buf[offset + y * stride : offset + y * stride + 3 * w]
            rows.append(
                b"".join(row[i : i + 3][::-1] for i in range(0, len(row), 3))
            )
        return w, height, b"".join(rows)
    raise ValueError("not a PPM/BMP payload")


def resize_rgb(
    rgb: bytes, w: int, h: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample of a row-major RGB raster — pure integer
    source mapping src = (dst * src_dim) // dst_dim, so the output bytes
    are engine- and platform-exact (no float rounding anywhere)."""
    if new_w <= 0 or new_h <= 0:
        raise ValueError("target dimensions must be positive")
    out = bytearray(3 * new_w * new_h)
    pos = 0
    for y in range(new_h):
        sy = y * h // new_h
        row_off = sy * 3 * w
        for x in range(new_w):
            sx = x * w // new_w
            o = row_off + 3 * sx
            out[pos : pos + 3] = rgb[o : o + 3]
            pos += 3
    return bytes(out)


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize (r8 — replaces the r6 `resize_stub`): decode each
    PPM/BMP payload to its raster, nearest-neighbor resample to
    (width, height) with pure-integer source mapping, and re-encode as
    binary P6 PPM. Runs in `mapInPandas` (Arrow batches; payload bytes
    make exactly one JVM->Python->JVM round trip, constant memory per
    batch). Unparseable payloads pass through UNCHANGED — mixed-media
    tables keep their non-image rows instead of failing the partition,
    mirroring `extract_features`' fallback contract.

    Output schema is the input MEDIA_SCHEMA with payload/width/height
    replaced for the resized rows. Determinism: decode, the integer NN
    map and the PPM encoder are all byte-exact pure functions, so the
    resized payload — and any statistic computed from it — is strictly
    reproducible by an external golden oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for payload, w0, h0 in zip(pdf["payload"], pdf["width"], pdf["height"]):
                try:
                    w, h, rgb = decode_image_rgb(payload)
                    payloads.append(
                        encode_ppm(width, height, resize_rgb(rgb, w, h, width, height))
                    )
                    widths.append(width)
                    heights.append(height)
                except ValueError:
                    payloads.append(payload)
                    widths.append(w0)
                    heights.append(h0)
            out = pdf.copy()
            out["payload"] = payloads
            out["width"] = pd.array(widths, dtype="Int32")
            out["height"] = pd.array(heights, dtype="Int32")
            yield out

    return df.mapInPandas(run, schema=df.schema)


FRAME_SCHEMA = (
    "media_id long, kind string, frame_idx int, ts_ms int, "
    "width int, height int, payload binary"
)


def split_video_frames(payload: bytes) -> list[bytes]:
    """Split a concatenated-PPM video container (back-to-back binary P6
    frames — the container `attach_video` writes) into per-frame payloads
    by walking the headers. Raises ValueError if the payload is not a
    clean PPM concatenation."""
    buf = bytes(payload or b"")
    frames, pos = [], 0
    while pos < len(buf):
        w, h, pix = decode_image_rgb(buf[pos:])
        hdr = b"P6\n%d %d\n255\n" % (w, h)
        # frames are written by encode_ppm, so the header is canonical
        if buf[pos : pos + len(hdr)] != hdr:
            raise ValueError("non-canonical PPM frame header")
        frames.append(buf[pos : pos + len(hdr) + len(pix)])
        pos += len(hdr) + len(pix)
    if not frames:
        raise ValueError("empty video payload")
    return frames


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL video frame sampling (r8 — replaces the r6
    `frame_sample_stub`): decode the concatenated-PPM container, assume
    uniformly spaced frames across `duration_ms`, and emit one row per
    sample timestamp t ∈ {0, every_ms, 2·every_ms, …} < duration with the
    ACTUAL nearest-frame payload: frame_idx = t · n_frames // duration
    (pure integer; frame i covers [i·d/n, (i+1)·d/n)).

    `mapInPandas`, not a JVM explode: the fan-out must open the container
    bytes anyway, and emitting only the sampled frames keeps the output a
    fraction of the input (a JVM explode of the full container would ship
    every frame). Rows whose payload is not a PPM container degrade to
    the metadata-only fan-out (frame_idx = sample ordinal, null
    payload/dims) — the r6 stub behavior, preserved as the fallback
    contract for blob rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["duration_ms"]
            ):
                if mid is None or pd.isna(mid):
                    # null-id rows can't be keyed; skip rather than fail
                    # the whole partition (only ValueError is caught below)
                    continue
                d = 0 if dur is None or pd.isna(dur) else int(dur)
                n_samples = max(1, d // int(every_ms))
                try:
                    frames = split_video_frames(payload)
                    metas = [decode_image_rgb(f)[:2] for f in frames]
                    n = len(frames)
                    for j in range(n_samples):
                        t = j * int(every_ms)
                        fi = min(n - 1, t * n // d) if d > 0 else 0
                        w, h = metas[fi]
                        rows.append(
                            (int(mid), kind, fi, t, w, h, frames[fi])
                        )
                except ValueError:
                    for j in range(n_samples):
                        rows.append(
                            (int(mid), kind, j, j * int(every_ms), None, None, None)
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "frame_idx", "ts_ms",
                    "width", "height", "payload",
                ],
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def attach_video(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 16,
    frame_ms: int = 40,
) -> DataFrame:
    """Deterministic REAL-video synthesis (the video companion of
    `attach_image`): each row becomes a concatenated-PPM container of
    n = 2 + id % 4 frames, frame f's raster the md5 hex digest of
    f\"{f}:{text}\" tiled over a (width × 8 + id % 8) raster, duration =
    n · frame_ms. Genuine multi-frame video bytes — `frame_sample`
    splits and decodes them for real — yet exactly reproducible from
    (id, text), which is what lets a golden oracle replicate sampled-
    frame statistics byte-for-byte."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if did is None or pd.isna(did):
                    continue  # null ids can't be keyed — skip, don't fail the partition
                h = 8 + int(did) % 8
                n_frames = 2 + int(did) % 4
                npix = 3 * width * h
                frames = []
                for f in range(n_frames):
                    digest = hashlib.md5(
                        (f"{f}:" + ("" if text is None else str(text))).encode("utf-8")
                    ).hexdigest().encode("ascii")
                    rgb = (digest * (npix // len(digest) + 1))[:npix]
                    frames.append(encode_ppm(width, h, rgb))
                out.append(
                    (int(did), "video", b"".join(frames), width, h,
                     n_frames * frame_ms)
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "kind", "payload", "width", "height", "duration_ms"],
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=MEDIA_SCHEMA)
