"""Round-trip pinning for the r05 package operators:

- EncodedCorpus (operators/corpus_encode.py vs src/tokcorpus.jl:21-69):
  decode(encode(doc)) == the tokenized kept tokens, empty docs keep an
  empty slice, CSR offsets are the reference's cumulative layout.
- SparseVector edge converters (operators/dvec.py to_ml_vectors /
  from_ml_vectors vs src/sparseconversions.jl:12-37): long form <->
  pyspark.ml SparseVector round-trips exactly, the empty-doc sentinel
  becomes an all-zero vector, and SparseVector dot products match
  pairwise_dot on the same table.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from textsearch_spark.config import TextConfig
from textsearch_spark.functions.udfs import with_tokens
from textsearch_spark.operators import dvec as dv
from textsearch_spark.operators.corpus_encode import (
    decode_corpus, encode_corpus, encode_corpus_csr, with_csr_offsets,
)
from textsearch_spark.operators.vocab import build_vocab, with_term_ids

CFG = TextConfig(nlist=[1])


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "la casa roja"),
        (2, "la casa verde verde"),
        (3, ""),                      # empty doc: offset still pushed
        (4, "manzana"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def vocab_ids(spark, corpus):
    return with_term_ids(build_vocab(corpus, CFG)).cache()


def test_encode_long_positions_and_ids(corpus, vocab_ids):
    long = encode_corpus(corpus, CFG, vocab_ids)
    rows = {(r.doc_id, r.pos): r.term_id for r in long.collect()}
    # doc 2 tokenizes to [la, casa, verde, verde] — positions 1..4 over
    # kept tokens (full-corpus vocab: nothing OOV)
    ids = {r.token: r.term_id for r in vocab_ids.collect()}
    assert rows[(2, 1)] == ids["la"]
    assert rows[(2, 2)] == ids["casa"]
    assert rows[(2, 3)] == ids["verde"] == rows[(2, 4)]
    assert (3, 1) not in rows  # empty doc contributes no long rows


def test_encode_oov_positions_reranked(spark, corpus):
    # vocabulary missing 'casa': kept-token positions must re-rank
    # (the reference's seq skips i==0 entirely, src/tokcorpus.jl:38-43)
    voc = with_term_ids(
        build_vocab(corpus, CFG).filter(F.col("token") != "casa"))
    long = encode_corpus(corpus, CFG, voc)
    doc1 = sorted((r.pos, r.term_id) for r in long.filter("doc_id = 1").collect())
    ids = {r.token: r.term_id for r in voc.collect()}
    assert doc1 == [(1, ids["la"]), (2, ids["roja"])]  # 'casa' gap closed


def test_csr_fetch_view_and_offsets(corpus, vocab_ids):
    csr = encode_corpus_csr(corpus, CFG, vocab_ids)
    rows = {r.doc_id: (r.term_ids, r.n_terms) for r in csr.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[3] == ([], 0)          # empty doc present, empty slice
    assert rows[2][1] == 4
    ids = {r.token: r.term_id for r in vocab_ids.collect()}
    assert rows[1][0] == [ids["la"], ids["casa"], ids["roja"]]
    off = {r.doc_id: r.offset for r in with_csr_offsets(csr).collect()}
    # cumulative end offsets in doc_id order: 3, 3+4, 7+0, 7+1
    assert [off[i] for i in (1, 2, 3, 4)] == [3, 7, 7, 8]


def test_decode_roundtrip(corpus, vocab_ids):
    csr = encode_corpus_csr(corpus, CFG, vocab_ids)
    dec = {r.doc_id: r.tokens for r in decode_corpus(csr, vocab_ids).collect()}
    want = {r.doc_id: r.tokens
            for r in with_tokens(corpus, CFG).select("doc_id", "tokens").collect()}
    assert dec == want  # full-corpus vocab: decode == tokenize exactly
    # long-form input decodes identically
    long = encode_corpus(corpus, CFG, vocab_ids)
    dec2 = {r.doc_id: r.tokens for r in decode_corpus(long, vocab_ids).collect()}
    assert dec2 == {k: v for k, v in want.items() if v}  # no rows for empty docs


# ------------------------------------------------------- ml vectors

@pytest.fixture(scope="module")
def weighted(spark):
    """Long-form weighted vectors incl. a sentinel-only (empty) doc."""
    from textsearch_spark.functions.weighting import EMPTY_SENTINEL

    rows = [
        (0, "a", 0.6), (0, "b", 0.8),
        (1, "b", 1.0),
        (2, EMPTY_SENTINEL, 1.0),       # empty-doc sentinel
        (3, "a", 0.3), (3, "c", 0.4), (3, "d", 0.5),
    ]
    return spark.createDataFrame(rows, "doc_id long, token string, weight double").cache()


@pytest.fixture(scope="module")
def tok_ids(spark):
    # 1-based ids on purpose: the converter must shift to 0-based
    return spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), ("d", 4)], "token string, token_id int").cache()


def test_to_ml_vectors_shapes(weighted, tok_ids):
    from pyspark.ml.linalg import SparseVector

    out = {r.doc_id: r.vector for r in dv.to_ml_vectors(weighted, tok_ids).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert isinstance(out[0], SparseVector) and out[0].size == 4
    assert out[0].toArray().tolist() == [0.6, 0.8, 0.0, 0.0]
    assert out[2].numNonzeros() == 0      # sentinel-only -> all-zero vector
    assert out[3].toArray().tolist() == [0.3, 0.0, 0.4, 0.5]


def test_ml_roundtrip_and_dot_golden(weighted, tok_ids):
    from textsearch_spark.functions.weighting import EMPTY_SENTINEL

    vecs = dv.to_ml_vectors(weighted, tok_ids)
    back = dv.from_ml_vectors(vecs, tok_ids)
    got = {(r.doc_id, r.token): r.weight for r in back.collect()}
    want = {(r.doc_id, r.token): r.weight
            for r in weighted.filter(F.col("token") != EMPTY_SENTINEL).collect()}
    assert got == want  # exact float round-trip; zero vector -> no rows

    # SparseVector.dot must match the long-form pairwise_dot golden
    mv = {r.doc_id: r.vector for r in vecs.collect()}
    a = weighted.filter(F.col("token") != EMPTY_SENTINEL).select(
        F.col("doc_id").alias("a_id"), "token", "weight")
    b = weighted.filter(F.col("token") != EMPTY_SENTINEL).select(
        F.col("doc_id").alias("b_id"), "token", "weight")
    golden = {(r.a_id, r.b_id): r.dot for r in dv.pairwise_dot(a, b).collect()}
    for (i, j), d in golden.items():
        assert abs(float(mv[i].dot(mv[j])) - d) < 1e-12


def test_from_ml_dense_vectors(spark, tok_ids):
    from pyspark.ml.linalg import DenseVector, VectorUDT
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("doc_id", LongType()),
                         StructField("vector", VectorUDT())])
    df = spark.createDataFrame(
        [(7, DenseVector([0.0, 2.0, 0.0, 1.5]))], schema)
    got = sorted((r.token, r.weight)
                 for r in dv.from_ml_vectors(df, tok_ids).collect())
    assert got == [("b", 2.0), ("d", 1.5)]  # zeros stay absent


def test_ml_vectors_explicit_base_and_empty_map(spark, weighted):
    """r05 review: inference is min>=1, so a 0-based SUBSET map lacking
    id 0 needs one_based=False — passing it must keep ids unshifted;
    and an empty token_ids map without dim raises instead of crashing
    on int(None)."""
    import pytest
    from pyspark.ml.linalg import SparseVector, VectorUDT
    from pyspark.sql.types import LongType, StructField, StructType

    # 0-based subset {b:1, c:2} (no id 0 present): inference would
    # wrongly shift; the explicit flag must not
    sub = spark.createDataFrame([("b", 1), ("c", 2)], "token string, token_id int")
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("vector", VectorUDT())])
    df = spark.createDataFrame([(1, SparseVector(4, [1, 2], [2.0, 3.0]))], schema)
    got = sorted((r.token, r.weight)
                 for r in dv.from_ml_vectors(df, sub, one_based=False).collect())
    assert got == [("b", 2.0), ("c", 3.0)]
    # and the inferred (default) call on the same map decodes shifted —
    # the documented sharp edge the flag exists for
    inferred = sorted((r.token, r.weight)
                      for r in dv.from_ml_vectors(df, sub).collect())
    assert inferred != got

    empty = spark.createDataFrame([], "token string, token_id int")
    with pytest.raises(ValueError, match="dim"):
        dv.to_ml_vectors(weighted, empty)
    out = {r.doc_id: r.vector for r in
           dv.to_ml_vectors(weighted, empty, dim=5).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert all(v.size == 5 and v.numNonzeros() == 0 for v in out.values())
