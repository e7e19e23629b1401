"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video ride as ``binary`` columns with a typed metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages.  The actual codec step is STUBBED
(no image/audio libraries in this container): ``decode_fn`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic hash-derived feature vector — the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is real and tested, and
swapping in PIL/ffmpeg later only replaces the inner function.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("media", BinaryType(), True),  # opaque payload
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id string, kind string, feature array<float>, n_bytes int"
FRAME_SCHEMA = "media_id string, frame_idx int, frame binary"


def _decode_stub(payload: bytes, kind: str, fake: bool, dim: int = 16) -> np.ndarray:
    if not fake:
        # real decoders (PIL / torchaudio / ffmpeg) are not available in
        # this environment — the plumbing around this call is the product
        raise NotImplementedError(
            f"no {kind} codec available in this environment; pass fake=True"
        )
    # deterministic fake: md5-seeded feature vector (stable across runs)
    h = hashlib.md5(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(df: DataFrame, fake: bool = False, dim: int = 16) -> DataFrame:
    """media table → per-item feature vector (Arrow-batched)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(m, k, fake, dim).tolist()
                for m, k in zip(pdf["media"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": pdf["media"].map(lambda b: len(b) if b is not None else 0),
                }
            )

    return df.mapInPandas(gen, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """video rows → (media_id, frame_idx, frame) rows; frame count from
    meta.duration_ms, payload sliced deterministically in the stub."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                # Arrow hands nullable int struct fields to pandas as
                # floats — coerce before integer arithmetic
                dur = int((r.meta["duration_ms"] if r.meta is not None else 0) or 0)
                n = max(1, dur // every_ms)
                if not fake:
                    raise NotImplementedError("no video codec; pass fake=True")
                payload = r.media or b""
                step = max(1, len(payload) // n) if payload else 1
                for i in range(n):
                    ids.append(r.media_id)
                    idxs.append(i)
                    frames.append(payload[i * step : (i + 1) * step])
            if ids:
                yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(gen, FRAME_SCHEMA)


def make_fake_media(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8))
        meta = {
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
            "width": 64 if kind == "image" else None,
            "height": 64 if kind == "image" else None,
            "duration_ms": int(rng.integers(1000, 8000)) if kind != "image" else None,
        }
        rows.append((f"m{i:04d}", kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
