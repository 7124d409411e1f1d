"""Delta + variable-byte posting-block codec with block-max metadata.

The reference keeps postings as in-memory docID-sorted adjacency lists
(src/bm25invfile.jl:61-71,133-139). At 10^12-file scale the north rule
requires compressed docID runs: this codec packs a docID-sorted block of
postings into a binary blob —

    [n | len(doc_stream) | len(tf_stream)]  (vbyte header)
    doc_stream: vbyte(delta(doc_ids))       (first value absolute)
    tf_stream:  vbyte(tf)
    dl_stream:  vbyte(doclen)               (doc length stored inline so
                                             scoring never needs a random
                                             doclens lookup at query time)

All encode/decode paths are vectorized numpy over Arrow batches — no
per-row Python.
"""

from __future__ import annotations

import numpy as np


def vbyte_encode(values: np.ndarray) -> bytes:
    """Little-endian 7-bit varint encoding; continuation bit 0x80 on all
    but the last byte of each value. Vectorized over the whole array."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    nb = np.ones(n, dtype=np.int64)
    t = v >> np.uint64(7)
    while t.any():
        nb += (t > 0).astype(np.int64)
        t >>= np.uint64(7)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    rem = v.copy()
    alive = np.arange(n)
    k = 0
    while len(alive):
        idx = starts[alive] + k
        byte = (rem[alive] & np.uint64(0x7F)).astype(np.uint8)
        last = k == (nb[alive] - 1)
        out[idx] = byte | np.where(last, 0, 0x80).astype(np.uint8)
        rem[alive] >>= np.uint64(7)
        alive = alive[~last]
        k += 1
    return out.tobytes()


def vbyte_decode(buf: bytes, offset: int = 0, count: int | None = None,
                 end: int | None = None):
    """Decode varints from ``buf[offset:end]``; returns
    (values, end_offset). When ``count`` is given, decodes exactly that
    many values and raises ``ValueError`` if the stream holds fewer —
    a truncated/corrupt blob must fail loudly, not return short arrays
    that silently mis-score downstream (the WAND kernel would add
    mismatched-length score arrays). ``end`` bounds the scan: without
    it every call runs the continuation-bit pass over the WHOLE
    remaining buffer even for a 3-value header."""
    n_bytes = -1 if end is None else max(0, end - offset)
    b = np.frombuffer(buf, dtype=np.uint8, offset=offset, count=n_bytes)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    if count is not None:
        ends = ends[:count]
        if len(ends) != count:
            raise ValueError(
                f"truncated varint stream: expected {count} values, "
                f"found {len(ends)} (blob corrupt or cut short)")
    n = len(ends)
    if n == 0:
        return np.empty(0, dtype=np.uint64), offset
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    vals = np.zeros(n, dtype=np.uint64)
    alive = np.arange(n)
    k = 0
    while len(alive):
        vals[alive] |= (b[starts[alive] + k] & 0x7F).astype(np.uint64) << np.uint64(7 * k)
        k += 1
        alive = alive[lens[alive] > k]
    return vals, offset + int(ends[n - 1]) + 1


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray) -> bytes:
    """Encode one docID-sorted posting block (n == 0 is valid and
    round-trips to empty arrays)."""
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    n = len(doc_ids)
    # diff with prepend=0 already yields deltas[0] == doc_ids[0], and
    # handles the empty block (the old explicit deltas[0] assignment
    # crashed on n == 0)
    deltas = np.diff(doc_ids, prepend=np.uint64(0))
    doc_stream = vbyte_encode(deltas)
    tf_stream = vbyte_encode(np.asarray(tfs, dtype=np.uint64))
    dl_stream = vbyte_encode(np.asarray(doclens, dtype=np.uint64))
    header = vbyte_encode(np.array([n, len(doc_stream), len(tf_stream)], dtype=np.uint64))
    return header + doc_stream + tf_stream + dl_stream


def decode_block(blob: bytes):
    """Returns (doc_ids, tfs, doclens) as uint64 arrays. Raises
    ``ValueError`` on a truncated/corrupt blob (count validation in
    vbyte_decode). Each stream's scan is bounded by the header's stored
    byte lengths — the query hot path decodes thousands of blocks per
    bucket, and unbounded scans cost ~3-4x the necessary byte traffic."""
    # header: 3 varints, <= 10 bytes each
    hdr, off = vbyte_decode(blob, 0, count=3, end=min(len(blob), 30))
    n, dlen, tlen = int(hdr[0]), int(hdr[1]), int(hdr[2])
    deltas, _ = vbyte_decode(blob, off, count=n, end=off + dlen)
    doc_ids = np.cumsum(deltas, dtype=np.uint64)
    tfs, _ = vbyte_decode(blob, off + dlen, count=n, end=off + dlen + tlen)
    doclens, _ = vbyte_decode(blob, off + dlen + tlen, count=n, end=len(blob))
    return doc_ids, tfs, doclens
