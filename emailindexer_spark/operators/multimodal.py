"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video ride as ``binary`` columns with a typed metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages.  The codec step is REAL for the
formats decodable with stdlib+numpy — WAV PCM audio, BMP and PGM/PPM
images (``functions/codecs.py``) — including real resampling and real
signal features (RMS / zero-crossing / spectral bands for audio, luma
grids for images).  Formats that genuinely need external libraries
(JPEG/PNG/MP4) raise ``NotImplementedError`` unless ``fake=True``, which
substitutes a deterministic hash-derived vector so the Spark-side
plumbing stays exercisable for any payload.
"""

from __future__ import annotations

import hashlib
import struct
import wave
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

from ..functions import codecs

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


def _decode_media(
    payload: bytes, kind: str, fmt: str, fake: bool, dim: int = 16
) -> tuple[str, object]:
    """Decode step only → ``('image', rgb_array)`` /
    ``('audio', (samples, rate))`` / ``('vec', fake_feature_vector)``;
    raises (loudly) for undecodable or corrupt input at ``fake=False``."""
    fmt = (fmt or "").lower()
    decodable = (kind == "image" and fmt in codecs.DECODABLE_IMAGE) or (
        kind == "audio" and fmt in codecs.DECODABLE_AUDIO
    )
    if decodable:
        try:
            if kind == "image":
                return "image", codecs.decode_image(payload, fmt)
            return "audio", codecs.decode_wav(payload)
        except (
            ValueError,
            EOFError,
            IndexError,
            struct.error,
            wave.Error,
            NotImplementedError,
        ):
            # corrupt payload claiming a decodable format — or one whose
            # sub-variant the codec rejects (compressed/8bpp BMP, 16-bit
            # netpbm, odd WAV widths): loud at fake=False,
            # deterministic-fake fallback at fake=True
            if not fake:
                raise
    if not fake:
        raise NotImplementedError(
            f"no {kind}/{fmt} codec available in this environment; "
            f"pass fake=True (real codecs: wav, bmp, pgm, ppm)"
        )
    # deterministic fake: md5-seeded feature vector (stable across runs)
    h = hashlib.md5(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return "vec", rng.standard_normal(dim).astype(np.float32)


def _decode_features(
    payload: bytes, kind: str, fmt: str, fake: bool, dim: int = 16
) -> np.ndarray:
    """Real features when the format is stdlib-decodable; otherwise the
    deterministic fake (if allowed) or a loud NotImplementedError."""
    tag, val = _decode_media(payload, kind, fmt, fake, dim)
    if tag == "image":
        return codecs.image_features(val, dim)
    if tag == "audio":
        samples, rate = val
        return codecs.audio_features(samples, rate, dim)
    return val


def extract_features(df: DataFrame, fake: bool = False, dim: int = 16) -> DataFrame:
    """media table → per-item feature vector (Arrow-batched).  WAV/BMP/
    PGM/PPM payloads get REAL decoded signal features; others fall back
    to the deterministic fake (or raise, when ``fake=False``).

    Decode is per item (variable-length binary), but the feature math
    runs on STACKED same-shape arrays per Arrow batch via the
    ``*_features_batch`` kernels — bit-for-bit equal to the per-item
    functions (pinned in tests/test_codecs.py)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats: list[np.ndarray | None] = [None] * len(pdf)
            img_buckets: dict[tuple, list] = {}
            aud_buckets: dict[tuple, list] = {}
            for i, (m, k, meta) in enumerate(
                zip(pdf["media"], pdf["kind"], pdf["meta"])
            ):
                tag, val = _decode_media(m, k, (meta or {}).get("format"), fake, dim)
                if tag == "image":
                    img_buckets.setdefault(val.shape, []).append((i, val))
                elif tag == "audio":
                    samples, rate = val
                    aud_buckets.setdefault((samples.shape, rate), []).append(
                        (i, samples)
                    )
                else:
                    feats[i] = val
            for items in img_buckets.values():
                if len(items) == 1:
                    i, arr = items[0]
                    feats[i] = codecs.image_features(arr, dim)
                else:
                    fb = codecs.image_features_batch(
                        np.stack([a for _, a in items]), dim
                    )
                    for j, (i, _) in enumerate(items):
                        feats[i] = fb[j]
            for (_, rate), items in aud_buckets.items():
                if len(items) == 1:
                    i, s = items[0]
                    feats[i] = codecs.audio_features(s, rate, dim)
                else:
                    fb = codecs.audio_features_batch(
                        np.stack([s for _, s in items]), rate, dim
                    )
                    for j, (i, _) in enumerate(items):
                        feats[i] = fb[j]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f in feats],
                    "n_bytes": pdf["media"].map(lambda b: len(b) if b is not None else 0),
                }
            )

    return df.mapInPandas(gen, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id string, media binary, width int, height int, format string"
)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Real image resize: decode BMP/PGM/PPM payloads, box-sample to
    (out_w, out_h), re-encode as BMP.  Non-image rows and undecodable
    formats are dropped (select them out upstream if needed)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for r in pdf.itertuples(index=False):
                fmt = ((r.meta or {}).get("format") or "").lower()
                if r.kind != "image" or fmt not in codecs.DECODABLE_IMAGE:
                    continue
                arr = codecs.decode_image(r.media, fmt)
                ids.append(r.media_id)
                blobs.append(codecs.encode_bmp(codecs.resize_image(arr, out_w, out_h)))
            if ids:
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "media": blobs,
                        "width": out_w,
                        "height": out_h,
                        "format": "bmp",
                    }
                )

    return df.mapInPandas(gen, RESIZED_SCHEMA)


AUDIO_WINDOW_SCHEMA = (
    "media_id string, window_idx int, start_ms int, rms float, zcr float"
)


def sample_audio_windows(df: DataFrame, window_ms: int = 250) -> DataFrame:
    """Real audio windowing: decode WAV rows, split into fixed windows,
    emit per-window RMS and zero-crossing rate — the shape a 100 TB
    speech-data pipeline needs (VAD-ish pre-filtering) with the decode
    genuinely performed."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, starts, rmss, zcrs = [], [], [], [], []
            for r in pdf.itertuples(index=False):
                fmt = ((r.meta or {}).get("format") or "").lower()
                if r.kind != "audio" or fmt not in codecs.DECODABLE_AUDIO:
                    continue
                samples, rate = codecs.decode_wav(r.media)
                mono = samples.mean(axis=1)
                step = max(1, rate * window_ms // 1000)
                for i in range(0, max(1, mono.size), step):
                    win = mono[i : i + step]
                    if win.size == 0:
                        break
                    ids.append(r.media_id)
                    idxs.append(i // step)
                    starts.append(int(i * 1000 / rate))
                    rmss.append(float(np.sqrt(np.mean(win**2))))
                    zcrs.append(
                        float(np.mean(np.signbit(win[1:]) != np.signbit(win[:-1])))
                        if win.size > 1
                        else 0.0
                    )
            if ids:
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "window_idx": idxs,
                        "start_ms": starts,
                        "rms": np.asarray(rmss, dtype=np.float32),
                        "zcr": np.asarray(zcrs, dtype=np.float32),
                    }
                )

    return df.mapInPandas(gen, AUDIO_WINDOW_SCHEMA)


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


def synth_media_row(doc_id: int) -> tuple[str, str, str, bytes, dict]:
    """Pure deterministic media payload for one doc_id → (media_id, kind,
    format, payload, meta).  Same bytes whether evaluated on an executor
    or on the driver — this is what lets the DuckDB gate inline the
    expected decode/feature/resize outputs as literals while the Spark
    side genuinely synthesises, decodes and featurises distributed
    (reference parity: attachments keyed by message id,
    EmailIndexer.java:71-83; we go further and decode them)."""
    which = doc_id % 3
    if which == 0:  # 16-bit PCM WAV, 8 kHz mono sine burst
        rate = 8000
        dur_ms = 200 + (doc_id % 7) * 100
        t = np.arange(rate * dur_ms // 1000, dtype=np.float64) / rate
        freq = 100.0 + (doc_id % 11) * 97.0
        payload = codecs.encode_wav(
            (0.5 * np.sin(2 * np.pi * freq * t)).reshape(-1, 1), rate
        )
        meta = {"format": "wav", "width": None, "height": None, "duration_ms": dur_ms}
        return f"m{doc_id:06d}", "audio", "wav", payload, meta
    if which == 1:  # 24-bit BMP gradient tile (closed-form, no RNG)
        w, h = 8 + doc_id % 17, 8 + (doc_id // 3) % 17
        gx = np.linspace(0, 255, w, dtype=np.float64)
        gy = np.linspace(0, 255, h, dtype=np.float64)
        arr = np.stack(
            [np.add.outer(gy, gx) / 2, np.tile(gx, (h, 1)), np.tile(gy[:, None], (1, w))],
            axis=2,
        ).astype(np.uint8)
        meta = {"format": "bmp", "width": w, "height": h, "duration_ms": None}
        return f"m{doc_id:06d}", "image", "bmp", codecs.encode_bmp(arr), meta
    # P6 PPM noise tile, seeded by doc_id only
    rng = np.random.default_rng((doc_id * 2654435761) % (2**32))
    w, h = 8 + doc_id % 13, 8 + (doc_id // 5) % 13
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    meta = {"format": "ppm", "width": w, "height": h, "duration_ms": None}
    return f"m{doc_id:06d}", "image", "ppm", codecs.encode_netpbm(arr), meta


def media_from_ids(ids_df: DataFrame) -> DataFrame:
    """(doc_id) rows → deterministic real-media table (MEDIA_SCHEMA),
    synthesised executor-side via ``synth_media_row`` — no driver
    collect, partitioning inherited from the id source."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [synth_media_row(int(d)) for d in pdf["doc_id"]]
            if rows:
                yield pd.DataFrame(
                    {
                        "media_id": [r[0] for r in rows],
                        "kind": [r[1] for r in rows],
                        "media": [r[3] for r in rows],
                        "meta": [r[4] for r in rows],
                    }
                )

    return ids_df.mapInPandas(gen, MEDIA_SCHEMA)


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


def make_real_media(spark, n: int = 12, seed: int = 7) -> DataFrame:
    """Deterministic REAL media table: decodable WAV (sine bursts), BMP
    (gradient tiles), and PPM (noise tiles) payloads — every row round-
    trips through the pure-numpy codecs."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        which = i % 3
        if which == 0:  # 16-bit PCM WAV, 8 kHz mono sine
            rate, dur_ms = 8000, int(rng.integers(200, 900))
            t = np.arange(rate * dur_ms // 1000) / rate
            freq = float(rng.integers(100, 1200))
            wavb = codecs.encode_wav(
                (0.5 * np.sin(2 * np.pi * freq * t)).reshape(-1, 1), rate
            )
            rows.append(
                (f"r{i:04d}", "audio", wavb,
                 {"format": "wav", "width": None, "height": None,
                  "duration_ms": dur_ms})
            )
        elif which == 1:  # 24-bit BMP gradient
            w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
            gx = np.linspace(0, 255, w, dtype=np.float64)
            gy = np.linspace(0, 255, h, dtype=np.float64)
            arr = np.stack(
                [np.add.outer(gy, gx) / 2,
                 np.tile(gx, (h, 1)),
                 np.tile(gy[:, None], (1, w))],
                axis=2,
            ).astype(np.uint8)
            rows.append(
                (f"r{i:04d}", "image", codecs.encode_bmp(arr),
                 {"format": "bmp", "width": w, "height": h,
                  "duration_ms": None})
            )
        else:  # P6 PPM noise
            w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows.append(
                (f"r{i:04d}", "image", codecs.encode_netpbm(arr),
                 {"format": "ppm", "width": w, "height": h,
                  "duration_ms": None})
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
