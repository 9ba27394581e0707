"""Delta+varint posting-list codecs (numpy-vectorized).

north_rule requirement: "sorted, delta+varint-compressed posting lists
(term -> [docID, tf, positions])". The reference compresses postings
with RoaringBitmap run-optimization
(/root/reference/src/lib/internal/segments/immutable-segment.ts:245,268);
bitmaps carry no tf/positions, so the on-disk format here is new design,
not a port: classic Lucene-style blocks of LEB128 varints over
first-order deltas.

Encoding is vectorized with numpy (byte-length classing + cumsum offset
scatter); decoding uses a tight numpy scan. Both round-trip-tested with
hypothesis (tests/test_codec.py).
"""

from __future__ import annotations

import numpy as np

_MASKS = np.array([0x7F], dtype=np.uint64)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array → bytes (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length of each varint: ceil(bitlen/7), min 1
    bitlen = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp != 0
        if not nz.any():
            break
        bitlen[nz] += 1
        tmp >>= np.uint64(1)
    nbytes = np.maximum((bitlen + 6) // 7, 1)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    # scatter each byte position k of each value
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    maxb = int(nbytes.max())
    for k in range(maxb):
        sel = nbytes > k
        idx = starts[sel] + k
        chunk = (v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[sel] - 1 > k).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array (vectorized)."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    n = ends.size
    vals = np.zeros(n, dtype=np.uint64)
    lengths = ends - starts + 1
    maxb = int(lengths.max())
    for k in range(maxb):
        sel = lengths > k
        chunk = b[starts[sel] + k].astype(np.uint64) & np.uint64(0x7F)
        vals[sel] |= chunk << np.uint64(7 * k)
    return vals


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """Strictly-increasing int array → delta + varint bytes."""
    a = np.asarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return b""
    deltas = np.empty_like(a)
    deltas[0] = a[0]
    np.subtract(a[1:], a[:-1], out=deltas[1:])
    return varint_encode(deltas)


def delta_decode(buf: bytes) -> np.ndarray:
    deltas = varint_decode(buf)
    if deltas.size == 0:
        return deltas
    return np.cumsum(deltas, dtype=np.uint64)


def encode_positions(positions_per_doc: list) -> bytes:
    """Concatenate per-doc sorted position lists, each delta-encoded.

    Lengths are recoverable from the tf array (len(positions) == tf),
    so no extra length prefix is stored — mirrors Lucene's .prx layout.
    """
    flat = []
    for pos in positions_per_doc:
        p = np.asarray(pos, dtype=np.uint64)
        if p.size:
            d = np.empty_like(p)
            d[0] = p[0]
            np.subtract(p[1:], p[:-1], out=d[1:])
            flat.append(d)
    if not flat:
        return b""
    return varint_encode(np.concatenate(flat))


def decode_positions(buf: bytes, tfs: np.ndarray) -> list:
    """Inverse of encode_positions: list of numpy position arrays per doc."""
    flat = varint_decode(buf)
    out = []
    off = 0
    for tf in np.asarray(tfs, dtype=np.int64):
        d = flat[off : off + tf]
        out.append(np.cumsum(d, dtype=np.uint64))
        off += tf
    return out
