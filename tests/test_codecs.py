"""Pure-python media codec tests (no SparkSession needed)."""

from __future__ import annotations

import numpy as np
import pytest

from emailindexer_spark.functions import codecs as C


# ---------------------------------------------------------------- WAV

def test_wav_roundtrip_16bit():
    rate = 8000
    t = np.arange(rate) / rate
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).reshape(-1, 1).astype(np.float32)
    samples, r = C.decode_wav(C.encode_wav(x, rate))
    assert r == rate and samples.shape == x.shape
    # 16-bit quantization error bound
    assert np.abs(samples - x).max() < 1.5 / 32768


def test_wav_stereo_and_8bit():
    rate = 4000
    x = np.stack(
        [np.linspace(-0.9, 0.9, 100), np.linspace(0.9, -0.9, 100)], axis=1
    ).astype(np.float32)
    samples, r = C.decode_wav(C.encode_wav(x, rate))
    assert samples.shape == (100, 2) and r == rate
    # hand-built 8-bit unsigned PCM
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(rate)
        w.writeframes(bytes([0, 128, 255]))
    samples, _ = C.decode_wav(buf.getvalue())
    assert samples.shape == (3, 1)
    assert samples[1, 0] == pytest.approx(0.0)
    assert samples[0, 0] == pytest.approx(-1.0)


def test_wav_float32_ieee():
    # hand-built WAVE_FORMAT_IEEE_FLOAT file (wave module can't write it)
    import struct

    rate, x = 8000, np.linspace(-1, 1, 64).astype("<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
    data = x.tobytes()
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    samples, r = C.decode_wav(payload)
    assert r == rate and np.allclose(samples.ravel(), x, atol=1e-7)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        C.decode_wav(b"\x01\x02\x03\x04" * 32)


def test_wav_multichunk_list_before_data():
    # RIFF files may carry LIST/INFO (or any) chunks between fmt and
    # data; the chunk walk must skip them — and odd-sized chunks are
    # word-aligned with a pad byte.  Exercises BOTH tag paths: the
    # IEEE-float decoder's own walk and wave-module PCM.
    import struct

    rate = 8000
    # --- IEEE float with a LIST chunk (odd payload -> pad byte) ahead of data
    x = np.linspace(-1, 1, 32).astype("<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
    info = b"INFOICMT" + struct.pack("<I", 5) + b"hello" + b"\x00"  # word-aligned
    data = x.tobytes()
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(info) - 1) + info[: len(info) - 1] + b"\x00"
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    samples, r = C.decode_wav(payload)
    assert r == rate and np.allclose(samples.ravel(), x, atol=1e-7)
    # _wav_fmt_tag's walk must have skipped LIST to find the tag
    assert C._wav_fmt_tag(payload) == 3

    # --- 16-bit PCM with the same LIST chunk layout (wave-module path)
    pcm = (np.linspace(-0.5, 0.5, 16) * 32767).astype("<i2").tobytes()
    fmt16 = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body16 = (
        b"fmt " + struct.pack("<I", len(fmt16)) + fmt16
        + b"LIST" + struct.pack("<I", len(info) - 1) + info[: len(info) - 1] + b"\x00"
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    payload16 = b"RIFF" + struct.pack("<I", 4 + len(body16)) + b"WAVE" + body16
    samples16, r16 = C.decode_wav(payload16)
    assert r16 == rate and samples16.shape == (16, 1)
    assert np.abs(samples16.ravel() - np.linspace(-0.5, 0.5, 16)).max() < 1.5 / 32768


# ---------------------------------------------------------------- BMP

def test_bmp_roundtrip():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(13, 10, 3), dtype=np.uint8)  # w forces stride pad
    out = C.decode_bmp(C.encode_bmp(arr))
    assert np.array_equal(out, arr)


def test_bmp_topdown_and_32bit():
    import struct

    arr = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)  # BGRA source
    h, w = 2, 3
    body = arr.reshape(h, w * 4).tobytes()  # stride = 12, already 4-aligned
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(body), 0, 0, 0, 0)
    out = C.decode_bmp(header + info + body)
    assert out.shape == (2, 3, 3)
    # top-down: row 0 of the file IS row 0 of the array; BGR→RGB swap
    assert out[0, 0, 0] == arr[0, 0, 2] and out[0, 0, 2] == arr[0, 0, 0]


# ------------------------------------------------------------- netpbm

def test_netpbm_roundtrip_and_comments():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert np.array_equal(C.decode_netpbm(C.encode_netpbm(rgb)), rgb)
    gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    assert np.array_equal(C.decode_netpbm(C.encode_netpbm(gray)), gray)
    # header comments are legal netpbm
    with_comment = b"P5\n# a comment\n6 4\n255\n" + gray.tobytes()
    assert np.array_equal(C.decode_netpbm(with_comment), gray)


# ------------------------------------------------------------- resize

def test_resize_constant_image_stays_constant():
    arr = np.full((17, 11, 3), 93, dtype=np.uint8)
    out = C.resize_image(arr, 4, 5)
    assert out.shape == (5, 4, 3) and (out == 93).all()


def test_resize_downsample_means():
    # 4x4 → 2x2 exact box means
    a = np.arange(16, dtype=np.uint8).reshape(4, 4)
    arr = np.repeat(a[:, :, None], 3, axis=2)
    out = C.resize_image(arr, 2, 2)
    expect = np.array([[2.5, 4.5], [10.5, 12.5]]).round()
    assert np.array_equal(out[:, :, 0], expect.astype(np.uint8))


def test_resize_upsample_shape():
    arr = np.random.default_rng(2).integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    out = C.resize_image(arr, 9, 6)
    assert out.shape == (6, 9, 3)
    # corners preserved under nearest-ish upsampling
    assert out[0, 0, 0] == arr[0, 0, 0] and out[-1, -1, 0] == arr[-1, -1, 0]


# ------------------------------------------------------------ features

def test_audio_features_sine_centroid_orders():
    rate = 8000
    t = np.arange(rate) / rate
    lo = C.audio_features(np.sin(2 * np.pi * 200 * t).reshape(-1, 1), rate)
    hi = C.audio_features(np.sin(2 * np.pi * 2000 * t).reshape(-1, 1), rate)
    assert lo.shape == (16,) and hi.shape == (16,)
    # same amplitude → same RMS; higher frequency → higher centroid + zcr
    assert lo[0] == pytest.approx(hi[0], rel=1e-3)
    assert hi[1] > lo[1] and hi[2] > lo[2]


def test_image_features_bright_vs_dark():
    bright = C.image_features(np.full((8, 8, 3), 250, dtype=np.uint8))
    dark = C.image_features(np.full((8, 8, 3), 5, dtype=np.uint8))
    assert bright.shape == (16,)
    assert bright[:16].max() <= 1.0 and (bright[:4] > dark[:4]).all()


# ------------------------------------------------- deterministic synth

def test_synth_media_row_deterministic_and_decodable():
    from emailindexer_spark.operators.multimodal import synth_media_row

    for did in range(12):
        a = synth_media_row(did)
        b = synth_media_row(did)
        assert a[3] == b[3] and a[:3] == b[:3] and a[4] == b[4]
        mid, kind, fmt, payload, meta = a
        assert mid == f"m{did:06d}"
        if kind == "audio":
            samples, rate = C.decode_wav(payload)
            assert rate == 8000 and samples.shape[1] == 1
            assert samples.shape[0] == 8000 * meta["duration_ms"] // 1000
        else:
            arr = C.decode_image(payload, fmt)
            assert arr.shape == (meta["height"], meta["width"], 3)


# ------------------------------------------------- batched feature math

def test_image_features_batch_bit_equal():
    rng = np.random.default_rng(7)
    for h, w in [(5, 9), (16, 16), (3, 31), (1, 1), (40, 7)]:
        stack = rng.integers(0, 256, size=(6, h, w, 3), dtype=np.uint8)
        got = C.image_features_batch(stack, dim=16)
        for j in range(stack.shape[0]):
            ref = C.image_features(stack[j], dim=16)
            assert np.array_equal(got[j], ref), (h, w, j)
    # dim larger than the grid
    stack = rng.integers(0, 256, size=(3, 8, 8, 3), dtype=np.uint8)
    got = C.image_features_batch(stack, dim=32)
    for j in range(3):
        assert np.array_equal(got[j], C.image_features(stack[j], dim=32))


def test_audio_features_batch_bit_equal():
    rng = np.random.default_rng(11)
    for n, ch, rate in [(1000, 1, 8000), (333, 2, 44100), (1, 1, 8000), (64, 2, 16000)]:
        stack = (rng.standard_normal((5, n, ch)) * 0.3).astype(np.float32)
        got = C.audio_features_batch(stack, rate, dim=16)
        for j in range(stack.shape[0]):
            ref = C.audio_features(stack[j], rate, dim=16)
            assert np.array_equal(got[j], ref), (n, ch, rate, j)
    # silence (centroid guard) and tiny dim
    stack = np.zeros((4, 128, 1), dtype=np.float32)
    got = C.audio_features_batch(stack, 8000, dim=3)
    for j in range(4):
        assert np.array_equal(got[j], C.audio_features(stack[j], 8000, dim=3))


def test_extract_features_batched_equals_per_item_path():
    # the bucketing in operators.multimodal must route every item to a
    # feature identical to the sequential _decode_features result
    from emailindexer_spark.operators.multimodal import _decode_features

    rng = np.random.default_rng(3)
    rows = []
    for i in range(4):  # two shared BMP shapes
        arr = rng.integers(0, 256, size=(10 + (i % 2), 8, 3), dtype=np.uint8)
        rows.append(("image", "bmp", C.encode_bmp(arr)))
    for i in range(4):  # two shared WAV lengths
        x = (rng.standard_normal((200 + (i % 2) * 50, 1)) * 0.2).astype(np.float32)
        rows.append(("audio", "wav", C.encode_wav(x, 8000)))
    rows.append(("image", "jpeg", b"\xff\xd8 garbage"))  # fake-vector path
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "media_id": [f"m{i}" for i in range(len(rows))],
            "kind": [r[0] for r in rows],
            "media": [r[2] for r in rows],
            "meta": [{"format": r[1]} for r in rows],
        }
    )
    # drive the mapInPandas generator directly (no Spark needed)
    from emailindexer_spark.operators import multimodal as MM

    gen = None
    captured = {}

    class _FakeDF:
        def mapInPandas(self, g, schema):
            captured["gen"] = g
            return None

    MM.extract_features(_FakeDF(), fake=True, dim=16)
    gen = captured["gen"]
    (out,) = list(gen(iter([pdf])))
    for i, r in enumerate(rows):
        ref = _decode_features(r[2], r[0], r[1], True, 16)
        assert np.array_equal(np.asarray(out["feature"][i], dtype=np.float32), ref), i
