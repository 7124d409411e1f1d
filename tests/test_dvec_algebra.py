"""DVEC algebra identities vs dense numpy vectors — transcribed from the
reference's randomized dense/sparse cross-checks (test/tok.jl:2-41) and
the operations golden (test/vec.jl:103-115)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from textsearch_spark.operators import dvec as dv


def _vec_table(spark, arrays, id_start=0):
    """Dense numpy rows -> long-form (doc_id, token, weight), dropping
    exact zeros (DVEC stores only present keys)."""
    rows = []
    for i, arr in enumerate(arrays):
        for j, v in enumerate(arr):
            if v != 0.0:
                rows.append((id_start + i, f"t{j:03d}", float(v)))
    return spark.createDataFrame(rows, "doc_id long, token string, weight double")


@pytest.fixture(scope="module")
def dense_and_sparse(spark):
    rng = np.random.RandomState(7)
    dense = rng.rand(6, 50)
    return dense, _vec_table(spark, dense).cache()


def test_norms_and_l1(dense_and_sparse):
    dense, vecs = dense_and_sparse
    got = {r.doc_id: r.norm for r in dv.norms(vecs).collect()}
    l1 = {r.doc_id: r.l1norm for r in dv.l1norm(vecs).collect()}
    for i in range(len(dense)):
        assert abs(got[i] - np.linalg.norm(dense[i])) < 1e-9
        assert abs(l1[i] - np.abs(dense[i]).sum()) < 1e-9


def test_l1_normalize(dense_and_sparse):
    dense, vecs = dense_and_sparse
    out = dv.l1norm(dv.l1_normalize(vecs)).collect()
    for r in out:
        assert abs(r.l1norm - 1.0) < 1e-9


def test_extrema_matches_numpy(dense_and_sparse):
    dense, vecs = dense_and_sparse
    ex = {r.doc_id: r for r in dv.vec_extrema(vecs).collect()}
    for i in range(len(dense)):
        assert abs(ex[i].max_weight - dense[i].max()) < 1e-12
        assert ex[i].argmax_token == f"t{int(np.argmax(dense[i])):03d}"
        assert abs(ex[i].min_weight - dense[i].min()) < 1e-12
        assert ex[i].argmin_token == f"t{int(np.argmin(dense[i])):03d}"


def test_nnz(dense_and_sparse, spark):
    dense, vecs = dense_and_sparse
    nz = {r.doc_id: r.nnz for r in dv.nnz(vecs).collect()}
    for i in range(len(dense)):
        assert nz[i] == int((dense[i] != 0).sum())


def test_operations_golden(spark):
    """u + u == 2u, u * u == u^2, u * (1/9), dot identities —
    test/vec.jl:103-115."""
    u = {"el": 0.1, "hola": 0.2, "mundo": 0.4}
    ut = spark.createDataFrame([(1, k, v) for k, v in u.items()],
                               "doc_id long, token string, weight double").cache()
    plus = {r.token: r.weight for r in dv.add(ut, ut).collect()}
    assert plus == pytest.approx({k: 2 * v for k, v in u.items()})

    prod = {r.token: r.weight for r in dv.mul(ut, ut).collect()}
    assert prod == pytest.approx({k: v * v for k, v in u.items()})

    ninth = {r.token: r.weight for r in dv.scalar_mul(ut, 1 / 9).collect()}
    assert ninth == pytest.approx({k: v / 9 for k, v in u.items()})
    div = {r.token: r.weight for r in dv.scalar_div(ut, 9.0).collect()}
    assert div == pytest.approx(ninth)

    # dot(normalize(u + v - v), normalize(u)) > 0.99 (test/vec.jl:114)
    vt = dv.scalar_mul(ut, 2.0)
    w = dv.sub(dv.add(ut, vt), vt)
    wn = dv.l2_normalize(w)
    un = dv.l2_normalize(ut)
    d = (
        wn.select("token", F.col("weight").alias("wa"))
        .join(un.select("token", F.col("weight").alias("wb")), "token")
        .agg(F.sum(F.col("wa") * F.col("wb")))
        .collect()[0][0]
    )
    assert d > 0.99


def test_sub_keeps_b_only_keys(spark):
    a = spark.createDataFrame([(1, "x", 1.0)], "doc_id long, token string, weight double")
    b = spark.createDataFrame([(1, "x", 0.25), (1, "y", 0.5), (1, "z", 0.0)],
                              "doc_id long, token string, weight double")
    got = {r.token: r.weight for r in dv.sub(a, b).collect()}
    # y appears negated, z (zero in b) is skipped like the reference's
    # `w != 0` guard (src/dvec.jl:252-256)
    assert got == pytest.approx({"x": 0.75, "y": -0.5})


def test_sum_vectors(dense_and_sparse):
    dense, vecs = dense_and_sparse
    s = {r.token: r.weight for r in dv.sum_vectors(vecs).collect()}
    expect = dense.sum(axis=0)
    for j, v in enumerate(expect):
        assert abs(s[f"t{j:03d}"] - v) < 1e-9


def test_indexed_roundtrip(dense_and_sparse, spark):
    dense, vecs = dense_and_sparse
    token_ids = spark.createDataFrame(
        [(f"t{j:03d}", j + 1) for j in range(dense.shape[1])], "token string, token_id int"
    )
    ix = dv.to_indexed(vecs, token_ids).collect()
    by_id = {r.doc_id: r for r in ix}
    for i in range(len(dense)):
        r = by_id[i]
        assert list(r.indices) == sorted(r.indices)  # index-sorted CSC order
        got = np.zeros(dense.shape[1])
        got[np.array(r.indices) - 1] = r.values
        assert np.allclose(got, dense[i])
    back = dv.from_indexed(
        spark.createDataFrame(ix, "doc_id long, indices array<int>, values array<double>"),
        token_ids,
    )
    assert back.count() == vecs.count()
    j = (
        back.withColumnRenamed("weight", "wb")
        .join(vecs, ["doc_id", "token"])
        .filter(F.abs(F.col("wb") - F.col("weight")) > 1e-12)
    )
    assert j.count() == 0


def test_sparse_coo_filters(spark):
    from textsearch_spark.functions.weighting import EMPTY_SENTINEL

    vecs = spark.createDataFrame(
        [(1, "a", 0.5), (1, "b", 1e-12), (2, EMPTY_SENTINEL, 1.0)],
        "doc_id long, token string, weight double",
    )
    got = dv.sparse_coo(vecs).collect()
    assert [(r.doc_id, r.token) for r in got] == [(1, "a")]
