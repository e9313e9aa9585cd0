"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed in Arrow batches via mapInPandas.

The Spark-side plumbing is real and tested — schemas, partition-aware
batch iteration, UDF signatures, output shapes. The decode kernels
themselves are gated: this container ships no image/audio libraries, so
decode attempts raise NotImplementedError unless ``fake=True`` selects
the deterministic stand-in (a seeded feature vector derived from the
byte content) that exercises the full distributed path end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def _fake_features(blobs: pd.Series, dim: int) -> list[list[float]]:
    """Deterministic stand-in 'decoder': bytes -> unit feature vector via
    sha256 expansion. Stable across runs/machines; exercises the exact
    Arrow batch shapes a real decoder would produce."""
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


def extract_image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "asset_id",
    dim: int = FEATURE_DIM,
    fake: bool = False,
) -> DataFrame:
    """(id, content-binary) -> (id, features array<double>). Arrow
    batches through mapInPandas; one numpy pass per batch."""
    use_fake = fake or not _have_pil()
    if not fake and not _have_pil():
        raise NotImplementedError(
            "image decode requires PIL/pillow (not in this container); "
            "pass fake=True for the deterministic stand-in decoder"
        )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def gen(batches: Iterable[pd.DataFrame]):
        for b in batches:
            if not use_fake:
                # no real PIL kernel exists yet: failing loudly beats
                # silently emitting NULL features the day PIL appears
                raise NotImplementedError(
                    "real image feature kernel not implemented; "
                    "pass fake=True for the deterministic stand-in"
                )
            feats = _fake_features(b[content_col], dim)
            yield pd.DataFrame({id_col: b[id_col], "features": feats})

    return df.select(id_col, content_col).mapInPandas(gen, schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """Resize kernel: real plumbing (schema preserved, width/height
    metadata updated), stub kernel (content passthrough) without PIL."""
    if not fake and not _have_pil():
        raise NotImplementedError(
            "image resize requires PIL/pillow; pass fake=True to exercise "
            "the pipeline with passthrough bytes"
        )
    out_schema = df.schema

    def gen(batches: Iterable[pd.DataFrame]):
        for b in batches:
            if not fake:
                # PIL may be importable, but no real resize kernel is
                # implemented — passthrough bytes must stay opt-in
                raise NotImplementedError(
                    "real image resize kernel not implemented; "
                    "pass fake=True for passthrough bytes"
                )
            b = b.copy()
            if "width" in b.columns:
                b["width"] = width
            if "height" in b.columns:
                b["height"] = height
            yield b

    return df.mapInPandas(gen, out_schema)


def sample_audio_frames(
    df: DataFrame,
    every_ms: int = 1000,
    content_col: str = "content",
    id_col: str = "asset_id",
    fake: bool = False,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame with a
    deterministic frame fingerprint (UDTF-style 1->N expansion through
    mapInPandas)."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires an audio library (not in this "
            "container); pass fake=True for the deterministic stand-in"
        )
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_hash", T.LongType()),
        ]
    )

    def gen(batches: Iterable[pd.DataFrame]):
        for b in batches:
            ids, idxs, hashes = [], [], []
            for aid, blob, dur in zip(
                b[id_col], b[content_col], b.get("duration_ms", pd.Series([1000] * len(b)))
            ):
                n = max(int((dur or 1000) // every_ms), 1)
                for i in range(n):
                    ids.append(aid)
                    idxs.append(i)
                    digest = hashlib.sha256(bytes(blob or b"") + i.to_bytes(4, "little")).digest()
                    hashes.append(int.from_bytes(digest[:8], "little", signed=True))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_hash": hashes})

    return df.mapInPandas(gen, schema)


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
