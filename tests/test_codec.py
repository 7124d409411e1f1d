"""Codec roundtrip properties (pure numpy, no Spark)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from textsearch_spark.functions.codec import (
    decode_block,
    encode_block,
    vbyte_decode,
    vbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**56 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_vbyte_roundtrip(values):
    buf = vbyte_encode(np.array(values, dtype=np.uint64))
    out, end = vbyte_decode(buf)
    assert list(out) == values
    assert end == len(buf)


def test_vbyte_empty():
    assert vbyte_encode(np.array([], dtype=np.uint64)) == b""
    out, end = vbyte_decode(b"")
    assert len(out) == 0 and end == 0


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=100_000),
            st.integers(min_value=1, max_value=1_000_000),
        ),
        min_size=1,
        max_size=500,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(entries):
    entries.sort()
    docs = np.array([e[0] for e in entries], dtype=np.uint64)
    tfs = np.array([e[1] for e in entries], dtype=np.uint64)
    dls = np.array([e[2] for e in entries], dtype=np.uint64)
    blob = encode_block(docs, tfs, dls)
    d, t, l = decode_block(blob)
    assert (d == docs).all() and (t == tfs).all() and (l == dls).all()


def test_block_compresses_dense_runs():
    docs = np.arange(100_000, 104_096, dtype=np.uint64)
    tfs = np.ones(len(docs), dtype=np.uint64)
    dls = np.full(len(docs), 120, dtype=np.uint64)
    blob = encode_block(docs, tfs, dls)
    # dense run: 1-byte deltas + 1-byte tf + 1-byte doclen ~= 3 bytes/post
    assert len(blob) < len(docs) * 4
