"""Delta + variable-byte posting compression (numpy-vectorized, no per-row
Python in the encode/decode hot loop).

The reference stores postings inside Elasticsearch/Lucene, whose posting format
is delta + (FOR/varbyte) blocks; this module is our native equivalent per
BASELINE.json north_star ("delta-encode + varbyte-compress postings into a
Spark-managed segment store"). Classic VByte: 7 payload bits per byte,
continuation bit 0x80 on the LAST byte of each value (little-endian groups).

Encode: compute per-value byte length, exclusive-scan offsets, scatter shifted
7-bit groups into a flat uint8 buffer — O(total_bytes) numpy ops, no Python
loop over values. Decode: vectorized via terminator mask + segmented polynomial
accumulation (loop over max_bytes_per_value ≤ 10, not over values).
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # 63-bit values need at most ceil(63/7) = 9; 10 is safe for uint64


def vb_encode_with_offsets(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Varbyte-encode a 1-D array; returns (uint8 buffer, per-value offsets of
    length n+1) so callers can slice out contiguous value ranges (blocks)
    without re-encoding — the whole-partition vectorized path."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    mask = tmp > 0
    while mask.any():
        nbits[mask] += 1
        tmp >>= np.uint64(1)
        mask = tmp > 0
    nbytes = np.maximum((nbits + 6) // 7, 1)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    buf = np.zeros(int(offsets[-1]), dtype=np.uint8)
    # scatter the k-th 7-bit group of every value that has one
    for k in range(int(nbytes.max())):
        sel = nbytes > k
        idx = offsets[:-1][sel] + k
        group = (v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)
        buf[idx] = group.astype(np.uint8)
    # continuation: set 0x80 on the last byte of each value
    buf[offsets[1:] - 1] |= 0x80
    return buf, offsets


def vb_encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a 1-D array of non-negative ints."""
    buf, _ = vb_encode_with_offsets(values)
    return buf.tobytes()


def vb_decode(data: bytes) -> np.ndarray:
    """Decode varbyte bytes back to a uint64 array."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = np.flatnonzero(buf & 0x80)
    starts = np.concatenate(([0], ends[:-1] + 1))
    out = np.zeros(ends.size, dtype=np.uint64)
    lengths = ends - starts + 1
    for k in range(int(lengths.max())):
        sel = lengths > k
        b = buf[starts[sel] + k].astype(np.uint64) & np.uint64(0x7F)
        out[sel] |= b << np.uint64(7 * k)
    return out


def vb_decode_concat(buffers) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY varbyte streams in one vectorized pass (each stream holds
    whole values, so concatenation parses identically). Returns (values,
    per-stream value counts) — the per-block Python-call loop this replaces
    dominated serving-path latency at 10⁴+ blocks per query."""
    if len(buffers) == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    lens = np.fromiter((len(b) for b in buffers), dtype=np.int64, count=len(buffers))
    try:
        joined = b"".join(buffers)  # no per-block bytes() call (~0.3 s/1M blocks)
    except TypeError:  # memoryview/bytearray blocks
        joined = b"".join(bytes(b) for b in buffers)
    buf = np.frombuffer(joined, dtype=np.uint8)
    if buf.size == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(len(buffers), dtype=np.int64)
    hi = buf & np.uint8(0x80)  # shared by the fast-path test AND `ends`
    if hi.all():
        # every byte is a terminator → every value is a single byte (the
        # NORMAL case for tf streams, where tf < 128 almost always): values
        # are just the payload bits and per-stream counts are the byte
        # lengths. Skips the ends/starts/lengths index arrays — 3×8 B/value
        # (~1.5 GB on a 65M-value batched fill) of allocation and passes.
        return (buf & np.uint8(0x7F)).astype(np.uint64), lens
    ends = np.flatnonzero(hi)
    starts = np.concatenate(([0], ends[:-1] + 1))
    out = np.empty(ends.size, dtype=np.uint64)  # every slot written below
    lengths = ends - starts + 1
    # Layout-aware decode, two measured wins on multi-million-value batches
    # (the serving tier's batched wide-OR fill):
    # - byte 0 exists for EVERY value, so it's one unmasked gather + a
    #   widening copy, no boolean select at all; continuation bytes (k ≥ 1,
    #   a minority for delta/tf/doclen streams) use COMPACT flatnonzero
    #   indices instead of repeated boolean-mask gathers.
    # - the k ≥ 1 passes run over L2-sized chunks so their temporaries stay
    #   cache-resident (a full-batch pass spilled to DRAM: ~6× slower), and
    #   each chunk bounds max length locally so a lone 5-byte value doesn't
    #   add passes over the whole batch.
    # Net: 0.089 s → 0.039 s per 2.7M 1-2-byte values. Identical arithmetic
    # → identical outputs.
    low = buf & np.uint8(0x7F)
    np.copyto(out, low[starts], casting="unsafe")
    CH = 1 << 18
    for a in range(0, ends.size, CH):
        b_hi = min(a + CH, ends.size)
        st = starts[a:b_hi]
        ln = lengths[a:b_hi]
        o = out[a:b_hi]
        for k in range(1, int(ln.max())):
            idx = np.flatnonzero(ln > k)
            o[idx] |= low[st[idx] + k].astype(np.uint64) << np.uint64(7 * k)
    # values per stream: count of terminator bytes inside each byte range
    byte_bounds = np.cumsum(lens)
    counts = np.diff(np.concatenate(([0], np.searchsorted(ends, byte_bounds - 1, side="right"))))
    return out, counts


def decode_doc_ids_concat(buffers) -> tuple[np.ndarray, np.ndarray]:
    """Batched decode_doc_ids: one varbyte pass over all blocks, then the
    per-block delta restart applied vectorized (global cumsum minus each
    block's preceding cumulative value)."""
    gaps, counts = vb_decode_concat(buffers)
    if gaps.size == 0:
        return gaps, counts
    csum = np.cumsum(gaps, dtype=np.uint64)
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    base = np.zeros(len(counts), dtype=np.uint64)
    nz = starts > 0
    base[nz] = csum[starts[nz] - 1]
    return csum - np.repeat(base, counts), counts


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """First value + successive gaps (input must be strictly increasing)."""
    a = np.asarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.uint64)
    return np.cumsum(g, dtype=np.uint64)


def encode_doc_ids(sorted_doc_ids: np.ndarray) -> bytes:
    return vb_encode(delta_encode(sorted_doc_ids))


def decode_doc_ids(data: bytes) -> np.ndarray:
    return delta_decode(vb_decode(data))
