"""Regression tests for the round-4 review pass over the functions
layer: codec truncation/empty-block handling, null messages in
multi-message docs, dot_products disjoint-vector semantics, and
multi-aware model fitting."""

import numpy as np
import pytest

from textsearch_spark.config import TextConfig
from textsearch_spark.functions.codec import decode_block, encode_block
from textsearch_spark.functions.tokenizer import tokenize

CFG = TextConfig(nlist=[1])


def test_decode_block_truncated_raises():
    blob = encode_block(np.array([3, 7, 100], dtype=np.uint64),
                        np.array([1, 2, 3], dtype=np.uint64),
                        np.array([5, 5, 5], dtype=np.uint64))
    d, t, l = decode_block(blob)
    assert list(d) == [3, 7, 100] and list(t) == [1, 2, 3]
    # cutting the tail must fail loudly, never return short arrays that
    # silently mis-score in the WAND kernel
    with pytest.raises(ValueError):
        decode_block(blob[:-2])


def test_encode_block_empty_roundtrip():
    blob = encode_block(np.array([], dtype=np.uint64),
                        np.array([], dtype=np.uint64),
                        np.array([], dtype=np.uint64))
    d, t, l = decode_block(blob)
    assert len(d) == len(t) == len(l) == 0


def test_tokenize_null_message_element():
    """A null element inside an array<string> document is skipped, not
    a task-aborting AttributeError."""
    assert tokenize(CFG, ["hola mundo", None, "adios"]) == \
        tokenize(CFG, ["hola mundo", "adios"])
    assert tokenize(CFG, [None]) == []


def test_dot_products_disjoint_vectors_zero(spark):
    from textsearch_spark.functions.weighting import dot_products

    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0)], "doc_id long, token string, weight double")
    b = spark.createDataFrame(
        [(1, "x", 3.0), (2, "z", 4.0), (3, "w", 5.0)],
        "doc_id long, token string, weight double")
    out = {r.doc_id: r.dot for r in dot_products(a, b).collect()}
    # doc 1 shares 'x'; doc 2 is disjoint (reference dot = 0.0, not a
    # dropped row); doc 3 exists only in b -> 0.0
    assert out == {1: 3.0, 2: 0.0, 3: 0.0}


def test_fit_vector_model_multi(spark):
    """Fitting and vectorizing a multi-message corpus must use the same
    tokenization (fit_vector_model grew vectorize's ``multi`` flag)."""
    from textsearch_spark.functions.weighting import fit_vector_model, vectorize

    rows = [(1, ["la casa", "roja"]), (2, ["la pera verde"])]
    df = spark.createDataFrame(rows, "doc_id long, text array<string>")
    m = fit_vector_model(df, CFG, multi=True)
    toks = {r.token for r in m.vocab.collect()}
    assert {"casa", "roja", "pera", "verde", "la"} <= toks
    v = vectorize(m, df, multi=True)
    # 'la' has idf 0 (in both docs) and thresholds out; casa/roja stay
    assert {r.token for r in v.filter("doc_id = 1").collect()} == {"casa", "roja"}
