"""Pure-numpy/stdlib media codecs for the multimodal column pipeline.

The container has no PIL/ffmpeg/torchaudio, but several real formats are
fully decodable with the standard library plus numpy:

* WAV (RIFF PCM, 8/16/32-bit int and 32-bit float) via ``wave``/``struct``
* BMP (Windows BITMAPINFOHEADER, uncompressed 24/32-bit) via ``struct``
* PGM/PPM (netpbm P5/P6 binary, 8-bit) via a tiny header parse

These are the *real* codec step for the multimodal operators in
``operators/multimodal.py`` (reference parity: the reference treats
attachments as opaque blobs + sniffed metadata; we go further and decode
the self-describing formats).  Formats that genuinely need external
libraries (JPEG/PNG/MP4/…) still raise ``NotImplementedError`` — the
dispatch is explicit about which is which.

Everything here is driver/executor-side pure Python over one Arrow batch
at a time; no Spark imports (keeps the module unit-testable without a
session).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# formats decode_media can really decode in this environment
DECODABLE_IMAGE = frozenset({"bmp", "pgm", "ppm"})
DECODABLE_AUDIO = frozenset({"wav"})


# ---------------------------------------------------------------- WAV

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → (float32 samples in [-1, 1], shape (n, channels)),
    sample_rate.  Supports 8-bit unsigned, 16/32-bit signed PCM and
    32-bit IEEE float (format tag 3 — ``wave`` exposes it as sampwidth 4;
    we sniff the fmt chunk tag ourselves because ``wave`` rejects it)."""
    # sniff the fmt tag: wave.open raises on WAVE_FORMAT_IEEE_FLOAT
    tag = _wav_fmt_tag(payload)
    if tag == 3:
        return _decode_wav_float(payload)
    with wave.open(io.BytesIO(payload), "rb") as w:
        n, ch, width, rate = (
            w.getnframes(), w.getnchannels(), w.getsampwidth(), w.getframerate(),
        )
        raw = w.readframes(n)
    if width == 1:  # unsigned 8-bit
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    return x.reshape(-1, ch), rate


def _wav_fmt_tag(payload: bytes) -> int:
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off = 12
    while off + 8 <= len(payload):
        cid, size = payload[off : off + 4], struct.unpack_from("<I", payload, off + 4)[0]
        if cid == b"fmt ":
            return struct.unpack_from("<H", payload, off + 8)[0]
        off += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAVE payload has no fmt chunk")


def _decode_wav_float(payload: bytes) -> tuple[np.ndarray, int]:
    off, ch, rate, data = 12, 1, 0, b""
    while off + 8 <= len(payload):
        cid, size = payload[off : off + 4], struct.unpack_from("<I", payload, off + 4)[0]
        body = payload[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            _, ch, rate = struct.unpack_from("<HHI", body, 0)
        elif cid == b"data":
            data = body
        off += 8 + size + (size & 1)
    x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    return x.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float32 [-1, 1] (n, ch) → 16-bit PCM RIFF bytes (test synthesis)."""
    samples = np.atleast_2d(np.asarray(samples, dtype=np.float32))
    if samples.shape[0] == 1 and samples.ndim == 2 and samples.shape[1] > 8:
        samples = samples.T  # tolerate (n,) / (1, n) shapes
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(pcm.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------- BMP

def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → uint8 RGB array (h, w, 3).
    Handles bottom-up (positive height) and top-down rows and the 4-byte
    row stride padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        rows = rows[::-1]
    # BGR(A) → RGB
    return np.ascontiguousarray(rows[:, :, 2::-1][:, :, :3])


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 RGB (h, w, 3) → 24-bit bottom-up BMP bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    bgr = arr[:, :, ::-1]
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = bgr.reshape(h, w * 3)
    body = body[::-1].tobytes()  # bottom-up row order
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


# ---------------------------------------------------------------- netpbm

def decode_netpbm(payload: bytes) -> np.ndarray:
    """P5 (gray) / P6 (RGB) binary netpbm, 8-bit maxval → uint8 array
    (h, w) or (h, w, 3)."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    vals, pos = [], 2
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    nch = 3 if magic == b"P6" else 1
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * nch, offset=pos)
    return arr.reshape((h, w, 3) if nch == 3 else (h, w)).copy()


def encode_netpbm(arr: np.ndarray) -> bytes:
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 3:
        magic, h, w = b"P6", arr.shape[0], arr.shape[1]
    else:
        magic, h, w = b"P5", arr.shape[0], arr.shape[1]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


# ------------------------------------------------------------ dispatch

def decode_image(payload: bytes, fmt: str) -> np.ndarray:
    """format-dispatched image decode → uint8 RGB (h, w, 3)."""
    fmt = (fmt or "").lower()
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt in ("pgm", "ppm"):
        arr = decode_netpbm(payload)
        if arr.ndim == 2:  # gray → RGB for a uniform feature contract
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        return arr
    raise NotImplementedError(f"no {fmt!r} image codec in this environment")


def resize_image(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Box-sample resize (area-average down, nearest up) in pure numpy.
    Deterministic and endian-stable — the point is a real, testable
    resample, not PIL parity."""
    h, w = arr.shape[:2]
    # index map: for each output pixel, the [start, stop) source span
    ys = (np.arange(out_h + 1) * h / out_h).round().astype(np.int64)
    xs = (np.arange(out_w + 1) * w / out_w).round().astype(np.int64)
    ys, xs = np.clip(ys, 0, h), np.clip(xs, 0, w)
    # every span is at least one source cell and stays inside the image
    x0 = np.minimum(xs[:-1], w - 1)
    x1 = np.clip(np.maximum(x0 + 1, xs[1:]), 1, w)
    out = np.empty((out_h, out_w, arr.shape[2]), dtype=np.uint8)
    a = arr.astype(np.float64)
    for i in range(out_h):
        y0 = min(int(ys[i]), h - 1)
        y1 = min(max(y0 + 1, int(ys[i + 1])), h)
        row = a[y0:y1]
        # cumulative sum over x lets every output cell be a 2-read span mean
        cs = np.concatenate(
            [np.zeros((1, arr.shape[2])), row.sum(axis=0).cumsum(axis=0)], axis=0
        )
        span = (cs[x1] - cs[x0]) / ((x1 - x0) * (y1 - y0))[:, None]
        out[i] = np.clip(span.round(), 0, 255).astype(np.uint8)
    return out


def image_features(arr: np.ndarray, dim: int = 16) -> np.ndarray:
    """Real image features: 4×4 luma grid (box-sampled) padded/truncated
    to ``dim``, scaled to [0, 1]."""
    luma = (
        0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    ).astype(np.float64)
    grid = resize_image(
        np.repeat(luma[:, :, None], 1, axis=2).astype(np.uint8), 4, 4
    )[:, :, 0].ravel() / 255.0
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, grid.size)] = grid[:dim]
    return out


def audio_features(samples: np.ndarray, rate: int, dim: int = 16) -> np.ndarray:
    """Real audio features: RMS, zero-crossing rate, spectral centroid
    (normalized to Nyquist), then log-energy in ``dim - 3`` linear bands
    of the magnitude spectrum."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = mono.size
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    rms = float(np.sqrt(np.mean(mono**2)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(mono * np.hanning(n)))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    centroid = float((spec * freqs).sum() / spec.sum() / (rate / 2)) if spec.sum() > 0 else 0.0
    nb = max(0, dim - 3)
    bands = np.zeros(nb)
    if nb and spec.size:
        edges = np.linspace(0, spec.size, nb + 1).astype(np.int64)
        for b in range(nb):
            seg = spec[edges[b] : max(edges[b] + 1, edges[b + 1])]
            bands[b] = np.log1p(float((seg**2).sum()))
    out = np.concatenate([[rms, zcr, centroid], bands]).astype(np.float32)
    return out[:dim]


# ------------------------------------------------- batched feature math
#
# Same-shape media items inside one Arrow batch can run their feature
# math on STACKED arrays (decode stays per item — variable-length binary
# is inherently per-payload).  These kernels are bit-for-bit equal to
# mapping the per-item functions: every reduction runs over the same
# elements along an axis of the same length (numpy's pairwise summation
# blocking depends only on that length), every elementwise op is
# identical, and the FFT is computed per row at the same transform size.
# Lock-step equality is pinned by tests/test_codecs.py.


def image_features_batch(stack: np.ndarray, dim: int = 16) -> np.ndarray:
    """``image_features`` over a (n, h, w, 3) uint8 stack → (n, dim)."""
    n, h, w = stack.shape[:3]
    luma = (
        0.299 * stack[:, :, :, 0] + 0.587 * stack[:, :, :, 1] + 0.114 * stack[:, :, :, 2]
    ).astype(np.float64).astype(np.uint8)
    # resize_image(luma, 4, 4) on every item, batched: same span maths
    out_h = out_w = 4
    ys = (np.arange(out_h + 1) * h / out_h).round().astype(np.int64)
    xs = (np.arange(out_w + 1) * w / out_w).round().astype(np.int64)
    ys, xs = np.clip(ys, 0, h), np.clip(xs, 0, w)
    x0 = np.minimum(xs[:-1], w - 1)
    x1 = np.clip(np.maximum(x0 + 1, xs[1:]), 1, w)
    a = luma.astype(np.float64)
    grid = np.empty((n, out_h, out_w), dtype=np.uint8)
    for i in range(out_h):
        y0 = min(int(ys[i]), h - 1)
        y1 = min(max(y0 + 1, int(ys[i + 1])), h)
        row = a[:, y0:y1, :]
        cs = np.concatenate(
            [np.zeros((n, 1)), row.sum(axis=1).cumsum(axis=1)], axis=1
        )
        span = (cs[:, x1] - cs[:, x0]) / ((x1 - x0) * (y1 - y0))[None, :]
        grid[:, i, :] = np.clip(span.round(), 0, 255).astype(np.uint8)
    flat = grid.reshape(n, -1) / 255.0
    out = np.zeros((n, dim), dtype=np.float32)
    take = min(dim, flat.shape[1])
    out[:, :take] = flat[:, :take]
    return out


def audio_features_batch(stack: np.ndarray, rate: int, dim: int = 16) -> np.ndarray:
    """``audio_features`` over a (m, n) or (m, n, ch) float stack of
    equal-length clips at one rate → (m, dim)."""
    mono = stack.mean(axis=2) if stack.ndim == 3 else stack
    m, n = mono.shape
    if n == 0:
        return np.zeros((m, dim), dtype=np.float32)
    rms = np.sqrt(np.mean(mono**2, axis=1))
    if n > 1:
        zcr = np.mean(np.signbit(mono[:, 1:]) != np.signbit(mono[:, :-1]), axis=1)
    else:
        zcr = np.zeros(m)
    spec = np.abs(np.fft.rfft(mono * np.hanning(n)[None, :], axis=1))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    ssum = spec.sum(axis=1)
    centroid = np.where(ssum > 0, (spec * freqs[None, :]).sum(axis=1) / np.where(ssum > 0, ssum, 1.0) / (rate / 2), 0.0)
    nb = max(0, dim - 3)
    bands = np.zeros((m, nb))
    if nb and spec.shape[1]:
        edges = np.linspace(0, spec.shape[1], nb + 1).astype(np.int64)
        for b in range(nb):
            seg = spec[:, edges[b] : max(edges[b] + 1, edges[b + 1])]
            bands[:, b] = np.log1p((seg**2).sum(axis=1))
    out = np.concatenate([np.stack([rms, zcr, centroid], axis=1), bands], axis=1).astype(
        np.float32
    )
    return out[:, :dim]
