"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed in Arrow batches via mapInPandas.

The decode kernels are REAL for every format a pure-numpy codec can
handle — binary PPM/PGM, 24-bit BMP, PCM-16 WAV (functions/codecs.py)
— covering decode, feature extraction, bilinear resize + re-encode, and
frame sampling end-to-end with no external media library. Compressed
formats (PNG/JPEG/...) route through PIL when it is importable and
raise a format-naming NotImplementedError when it is not (this
container ships no PIL). ``fake=True`` still selects the seeded
stand-in kernels that exercise the distributed plumbing with arbitrary
bytes.

Reference parity note: silvanoneto/etl-rs has no media handling; this
module is part of the training-data operator suite beyond parity.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rs_spark.functions import codecs
from etl_rs_spark.plans import spread_for_cpu as _spread

# every kernel below runs via mapInPandas with the INPUT's partitioning:
# a small asset table arriving as one scan task (e.g. a single-row-group
# parquet) would run the whole decode/resize pass on one core. _spread
# is the size-gated repartition fixing exactly that; at scale it is a
# no-op (guide: CPU-heavy small scans).

#: canonical multimodal schemas: payload bytes + typed metadata
IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)
AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_DIM = 16


def _have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_any_image(blob: bytes) -> np.ndarray:
    """Decode via the numpy codecs, falling back to PIL for compressed
    formats when it is importable; raises naming the format otherwise."""
    try:
        return codecs.decode_image(blob)
    except NotImplementedError:
        if not _have_pil():
            raise
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(bytes(blob))))


def _as_rgb(px: np.ndarray) -> np.ndarray:
    """(h, w) gray or (h, w, n>=3) -> (h, w, 3) float64."""
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    return px[:, :, :3].astype(np.float64)


def _fake_features(blobs: pd.Series, dim: int) -> list[list[float]]:
    """Deterministic stand-in 'decoder': bytes -> unit feature vector via
    sha256 expansion. Stable across runs/machines; exercises the exact
    Arrow batch shapes the real decoder produces."""
    out = []
    for b in blobs:
        if b is None:
            out.append(None)
            continue
        h = hashlib.sha256(bytes(b)).digest()
        raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
        v = (raw.astype(np.float64) / np.iinfo(np.uint32).max) * 2 - 1
        v /= np.linalg.norm(v) or 1.0
        out.append([float(x) for x in v])
    return out


def _real_features(blobs: pd.Series, dim: int) -> list[list[float] | None]:
    """Real kernel: decode, then [w, h, channel means (3), channel stds
    (3), 8-bin normalized luminance histogram] padded/truncated to dim."""
    out: list[list[float] | None] = []
    for b in blobs:
        if b is None:
            out.append(None)
            continue
        px = _as_rgb(_decode_any_image(b))
        h, w = px.shape[:2]
        means = px.reshape(-1, 3).mean(axis=0)
        stds = px.reshape(-1, 3).std(axis=0)
        lum = px.mean(axis=2)
        hist, _ = np.histogram(lum, bins=8, range=(0.0, 256.0))
        hist = hist / lum.size
        v = np.concatenate(([float(w), float(h)], means, stds, hist))
        if len(v) < dim:
            v = np.pad(v, (0, dim - len(v)))
        out.append([float(x) for x in v[:dim]])
    return out


def extract_image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "asset_id",
    dim: int = FEATURE_DIM,
    fake: bool = False,
) -> DataFrame:
    """(id, content-binary) -> (id, features array<double>). Arrow
    batches through mapInPandas; one numpy pass per image. The real
    kernel decodes ppm/pgm/bmp natively (PIL for compressed formats)."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def gen(batches: Iterable[pd.DataFrame]):
        kern = _fake_features if fake else _real_features
        for b in batches:
            yield pd.DataFrame({id_col: b[id_col], "features": kern(b[content_col], dim)})

    return _spread(df.select(id_col, content_col)).mapInPandas(gen, schema)


def image_stats(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """Real decode kernel -> (id, fmt, width, height, mean_r/g/b).

    Per-channel means of a decoded image are analytically predictable
    for synthetic solid-color assets, which makes this the oracle-
    checkable face of the decoder (entry ``image_decode_stats``)."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
        ]
    )

    def gen(batches: Iterable[pd.DataFrame]):
        for b in batches:
            rows = []
            for aid, blob in zip(b[id_col], b[content_col]):
                px = _as_rgb(_decode_any_image(blob))
                m = px.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (aid, codecs.sniff(blob), px.shape[1], px.shape[0], m[0], m[1], m[2])
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "fmt", "width", "height", "mean_r", "mean_g", "mean_b"]
            )

    return _spread(df.select(id_col, content_col)).mapInPandas(gen, schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """Resize kernel. Real path: decode (numpy codecs, PIL fallback),
    bilinear resample, re-encode in the SAME format; width/height
    metadata columns updated. ``fake=True`` keeps the byte-passthrough
    stand-in for plumbing tests with arbitrary blobs."""
    out_schema = df.schema

    def resize_one(blob):
        if blob is None:
            return None
        fmt = codecs.sniff(blob)
        if fmt in ("ppm", "pgm", "bmp"):
            px = codecs.decode_image(blob)
            return codecs.encode_image(codecs.resize_bilinear(px, width, height), fmt)
        if _have_pil():
            import io

            from PIL import Image

            im = Image.open(io.BytesIO(bytes(blob)))
            buf = io.BytesIO()
            im.resize((width, height)).save(buf, format=im.format)
            return buf.getvalue()
        raise NotImplementedError(
            f"no built-in resize for format '{fmt}' and PIL is unavailable"
        )

    def gen(batches: Iterable[pd.DataFrame]):
        for b in batches:
            b = b.copy()
            if not fake:
                b[content_col] = [resize_one(x) for x in b[content_col]]
            if "width" in b.columns:
                b["width"] = np.int32(width)
            if "height" in b.columns:
                b["height"] = np.int32(height)
            yield b

    # fake=True is a passthrough (no per-row kernel work): spreading
    # it would shuffle the binary payload for nothing
    return (df if fake else _spread(df)).mapInPandas(gen, out_schema)


def sample_audio_frames(
    df: DataFrame,
    every_ms: int = 1000,
    content_col: str = "content",
    id_col: str = "asset_id",
    fake: bool = False,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame with a
    deterministic frame fingerprint (UDTF-style 1->N expansion through
    mapInPandas). Real path decodes PCM-16 WAV with the numpy codec and
    fingerprints the actual PCM frame bytes; fake path derives frames
    from duration metadata for arbitrary blobs."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_hash", T.LongType()),
        ]
    )

    def fingerprint(raw: bytes, i: int) -> int:
        digest = hashlib.sha256(raw + i.to_bytes(4, "little")).digest()
        return int.from_bytes(digest[:8], "little", signed=True)

    def gen(batches: Iterable[pd.DataFrame]):
        for b in batches:
            ids, idxs, hashes = [], [], []
            durs = b.get("duration_ms", pd.Series([1000] * len(b)))
            for aid, blob, dur in zip(b[id_col], b[content_col], durs):
                if fake:
                    n = max(int((dur or 1000) // every_ms), 1)
                    for i in range(n):
                        ids.append(aid)
                        idxs.append(i)
                        hashes.append(fingerprint(bytes(blob or b""), i))
                    continue
                samples, rate = codecs.decode_wav(blob)
                mono = samples if samples.ndim == 1 else samples.mean(axis=1).astype(np.int16)
                step = max(int(rate * every_ms / 1000), 1)
                n = max(-(-len(mono) // step), 1)
                for i in range(n):
                    ids.append(aid)
                    idxs.append(i)
                    hashes.append(fingerprint(mono[i * step : (i + 1) * step].tobytes(), i))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_hash": hashes})

    return (df if fake else _spread(df)).mapInPandas(gen, schema)


def wav_frames(
    df: DataFrame,
    every_ms: int = 25,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """Real WAV frame analysis -> (id, frame_idx, n_samples, rms).

    RMS is over int16 samples normalized by 32768, exact for the
    constant-amplitude synthetic assets so the DuckDB oracle can verify
    the decoder analytically (entry ``audio_frame_rms``)."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("rms", T.DoubleType()),
        ]
    )

    def gen(batches: Iterable[pd.DataFrame]):
        for b in batches:
            rows = []
            for aid, blob in zip(b[id_col], b[content_col]):
                samples, rate = codecs.decode_wav(blob)
                mono = samples if samples.ndim == 1 else samples[:, 0]
                step = max(int(rate * every_ms / 1000), 1)
                for i in range(max(-(-len(mono) // step), 1)):
                    fr = mono[i * step : (i + 1) * step].astype(np.float64)
                    rms = float(np.sqrt(np.mean(fr * fr)) / 32768.0) if len(fr) else 0.0
                    rows.append((aid, i, len(fr), rms))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "n_samples", "rms"])

    return _spread(df.select(id_col, content_col)).mapInPandas(gen, schema)


# ----------------------------------------------------------- test fixtures --


def gen_fake_assets(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic binary asset table matching IMAGE_SCHEMA — test
    fixture for the multimodal plumbing (no external data)."""
    base = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.sha2(F.concat(F.lit(seed), F.col("id")), 256).cast("binary").alias("content"),
        F.lit("image/fake").alias("mime"),
        (F.pmod(F.xxhash64(F.lit(seed), F.col("id")), F.lit(512)) + 64)
        .cast("int")
        .alias("width"),
        (F.pmod(F.xxhash64(F.lit(seed + 1), F.col("id")), F.lit(512)) + 64)
        .cast("int")
        .alias("height"),
    )
    return base


def image_assets_from_ids(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Attach REAL encoded image blobs to an id column, deterministically:
    format cycles ppm/bmp/pgm by id%3, width=8+id%9, height=8+id%7,
    solid color r=id%256 g=(7*id)%256 b=(13*id)%256 (gray = id%256).

    Solid colors make every decoded statistic a closed-form function of
    the id — the basis of the analytic DuckDB oracles."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def gen(batches: Iterable[pd.DataFrame]):
        for b in batches:
            blobs = []
            for aid in b[id_col]:
                i = int(aid)
                w, h = 8 + i % 9, 8 + i % 7
                if i % 3 == 2:
                    px = np.full((h, w), i % 256, dtype=np.uint8)
                    blobs.append(codecs.encode_pgm(px))
                else:
                    color = np.array([i % 256, (7 * i) % 256, (13 * i) % 256], dtype=np.uint8)
                    px = np.broadcast_to(color, (h, w, 3)).copy()
                    blobs.append(codecs.encode_ppm(px) if i % 3 == 0 else codecs.encode_bmp(px))
            yield pd.DataFrame({id_col: b[id_col], "content": blobs})

    return _spread(df.select(F.col(id_col).cast("long").alias(id_col))).mapInPandas(gen, schema)


def wav_assets_from_ids(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Attach REAL PCM-16 WAV blobs to an id column, deterministically:
    8 kHz mono, constant amplitude (id%2000)-1000, duration
    25ms * (2 + id%3) — so every 25 ms frame has exactly 200 samples
    and RMS |amp|/32768, closed-form for the oracle."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def gen(batches: Iterable[pd.DataFrame]):
        for b in batches:
            blobs = []
            for aid in b[id_col]:
                i = int(aid)
                amp = i % 2000 - 1000
                n = 200 * (2 + i % 3)
                blobs.append(codecs.encode_wav(np.full(n, amp, dtype=np.int16), 8000))
            yield pd.DataFrame({id_col: b[id_col], "content": blobs})

    return _spread(df.select(F.col(id_col).cast("long").alias(id_col))).mapInPandas(gen, schema)
