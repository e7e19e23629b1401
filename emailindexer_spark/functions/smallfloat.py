"""Lucene SmallFloat 1-byte norm codec (public algorithm, Lucene 9).

Lucene stores a text field's per-document length (number of tokens) as a
single lossy byte via ``SmallFloat.intToByte4`` and decodes it back with a
256-entry table (``BM25Similarity`` / ``SmallFloat.byte4ToInt``).  Exact
BM25 score parity with the reference (which never overrides the default
similarity — SURVEY.md §1.2) requires replicating this encode/decode
exactly: two documents of length 17 and 16 share a bucket and therefore
share a norm.

The encoding keeps the 4 most significant bits of the integer (one of
them implicit) — a tiny float with a 3-bit mantissa and no sign:

  encode(i) = i                       if i < 8
            = ((i >> s) & 7) | (s+1)<<3   where s = bit_length(i) - 4
  decode(b) = b                       if b < 8
            = ((b & 7) | 8) << ((b >> 3) - 1)

and decode(encode(i)) == (i >> s) << s — i.e. i with all but its top
4 bits cleared.  This identity is what the SQL oracles use.
"""

from __future__ import annotations

import numpy as np


def int_to_byte4(i: int) -> int:
    """Lossy-encode a non-negative int to one byte (0..255)."""
    if i < 0:
        raise ValueError("int_to_byte4 requires a non-negative value")
    nb = i.bit_length()
    if nb < 4:
        return i
    shift = nb - 4
    if shift + 1 > 31:
        raise ValueError("value out of range for 4-bit SmallFloat")
    return ((i >> shift) & 0x07) | ((shift + 1) << 3)


def byte4_to_int(b: int) -> int:
    """Decode one byte back to the bucket's representative length."""
    bits = b & 0x07
    shift = (b >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


#: 256-entry decode table, exactly Lucene's ``BM25Similarity.LENGTH_TABLE``.
LENGTH_TABLE: np.ndarray = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)


def encode_lengths(dl: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over an int array (doc lengths)."""
    dl = np.asarray(dl, dtype=np.int64)
    if (dl < 0).any():
        raise ValueError("negative doc length")
    # bit_length via the exponent of the float representation is unsafe at
    # boundaries; use a log-free formula: int(dl).bit_length() vectorized.
    nb = np.zeros_like(dl)
    nz = dl > 0
    nb[nz] = np.floor(np.log2(dl[nz].astype(np.float64))).astype(np.int64) + 1
    # np.log2 of an exact power of two is exact in float64 for < 2^53,
    # but guard the off-by-one anyway:
    too_hi = nz & (dl < (1 << np.maximum(nb - 1, 0)))
    nb[too_hi] -= 1
    too_lo = nz & (dl >= (1 << nb))
    nb[too_lo] += 1
    shift = np.maximum(nb - 4, 0)
    small = nb < 4
    out = np.where(
        small,
        dl,
        ((dl >> shift) & 0x07) | ((shift + 1) << 3),
    )
    return out.astype(np.int64)


def decode_lengths(norm: np.ndarray) -> np.ndarray:
    """Vectorized byte4ToInt via the table."""
    return LENGTH_TABLE[np.asarray(norm, dtype=np.int64)]
