"""Round-4 simsearch hardening (r03 verdict item 2 + ADVICE item 2):

- ``ivf_cosine_topk`` / ``lsh_cosine_topk`` score per inverted list /
  bucket with a broadcast query matrix inside ``applyInPandas`` — no
  ``qvec`` column may appear anywhere in the candidate exchange;
- a dim-2048 differential pins the kernel math against an independent
  numpy replay of the probe semantics;
- ``lsh_near_dup_pairs`` chunks the Gram matmul (bounded task memory)
  and carries a bucket-size skew guard;
- none of the simsearch/dedup operators leaks a cached frame.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from textsearch_spark.operators import simsearch as ss
from textsearch_spark.operators.simsearch import (
    ivf_assign,
    ivf_cosine_topk,
    lsh_cosine_topk,
    lsh_near_dup_pairs,
)


def _rand_emb(spark, n, dim, seed=7):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    return df, mat


def _no_qvec_in_plan(df):
    plan = df._jdf.queryExecution().toString()
    assert "qvec" not in plan, f"query vector rides the candidate exchange:\n{plan}"


def test_ivf_topk_dim2048_matches_numpy_replay(spark):
    """The per-list kernel at a real embedding width: results must equal
    an independent numpy replay of (assign -> probe -> exact cosine in
    probed lists -> top-k), and the plan must carry no qvec column."""
    n, dim, k, nprobe, n_centroids = 120, 2048, 4, 2, 8
    emb, mat = _rand_emb(spark, n, dim)
    qids = [0, 3, 11, 42]

    res = ivf_cosine_topk(emb, qids, k=k, n_centroids=n_centroids, nprobe=nprobe)
    _no_qvec_in_plan(res)
    got = {(r.query_id, r.rank): (r.neighbor_id, round(r.cos, 9)) for r in res.collect()}

    # numpy replay: reuse the library's assignment (it is itself
    # oracle-pinned) but redo probing + scoring + top-k independently
    assign = {r.vec_id: r.centroid_id
              for r in ivf_assign(emb, n_centroids).collect()}
    c_ids, c_mat = ss._resolve_centroids(emb, n_centroids, None, "vec_id", "embedding")
    c_sq = 0.5 * np.einsum("ij,ij->i", c_mat, c_mat)
    for q in qids:
        x = mat[q]
        scores = c_mat @ x - c_sq
        order = np.lexsort((c_ids, -scores))[:nprobe]
        probed = set(int(c) for c in c_ids[order])
        cand = [i for i in range(n) if assign[i] in probed and i != q]
        cos = np.array([
            float(mat[i] @ x / (np.linalg.norm(mat[i]) * np.linalg.norm(x)))
            for i in cand
        ])
        top = sorted(zip(-cos, cand))[:k]
        for rank, (negc, i) in enumerate(top, start=1):
            ni, gc = got[(q, rank)]
            assert ni == i, f"q{q} rank{rank}: {ni} != {i}"
            assert gc == pytest.approx(-negc, abs=1e-8)


def test_lsh_topk_dim2048_no_qvec_and_bucket_parity(spark):
    """lsh_cosine_topk's driver-side query bucketing must agree with the
    corpus-side UDF bucketing (same hyperplanes), results must match a
    numpy replay, and no qvec column may ship."""
    n, dim, k = 100, 2048, 3
    emb, mat = _rand_emb(spark, n, dim, seed=11)
    qids = [1, 5, 9]
    n_planes = 4

    res = lsh_cosine_topk(emb, qids, k=k, n_planes=n_planes, dim=dim)
    _no_qvec_in_plan(res)
    got = {(r.query_id, r.rank): (r.neighbor_id, round(r.cos, 9)) for r in res.collect()}

    planes_t = ss._hyperplanes(n_planes, dim).T
    buckets = ["".join(((mat[i] @ planes_t) >= 0).astype(np.uint8).astype("U1"))
               for i in range(n)]
    for q in qids:
        cand = [i for i in range(n) if buckets[i] == buckets[q] and i != q]
        cos = np.array([
            float(mat[i] @ mat[q] / (np.linalg.norm(mat[i]) * np.linalg.norm(mat[q])))
            for i in cand
        ])
        top = sorted(zip(-cos, cand))[:k]
        for rank, (negc, i) in enumerate(top, start=1):
            ni, gc = got[(q, rank)]
            assert ni == i
            assert gc == pytest.approx(-negc, abs=1e-8)


def test_near_dup_chunked_gram_matches_unchunked(spark, monkeypatch):
    """Forcing tiny Gram chunks must not change the emitted pairs."""
    n, dim = 60, 32
    rng = np.random.default_rng(3)
    base = rng.normal(size=(6, dim))
    # near-dup clusters: small perturbations of 6 base vectors
    mat = np.vstack([base[i % 6] + 0.01 * rng.normal(size=dim) for i in range(n)])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    full = sorted((r.vec_a, r.vec_b, round(r.cos, 6))
                  for r in lsh_near_dup_pairs(emb, 0.9, n_planes=3, dim=dim).collect())
    assert full, "fixture should produce near-dup pairs"
    monkeypatch.setattr(ss, "_GRAM_CHUNK_ELEMS", 64)  # chunk = max(16, 64//n) = 16 rows
    chunked = sorted((r.vec_a, r.vec_b, round(r.cos, 6))
                     for r in lsh_near_dup_pairs(emb, 0.9, n_planes=3, dim=dim).collect())
    assert chunked == full


def test_near_dup_bucket_skew_guard(spark):
    """The guard fires only on SKEW — a bucket both over the cap and
    >8x the all-bucket mean (correlated embeddings collapsed into one
    bucket) — and fails fast driver-side, before the quadratic kernel
    launches. A uniformly large corpus whose buckets all exceed the cap
    is legitimate work and must NOT raise."""
    dim = 16
    rng = np.random.default_rng(5)

    # skewed: every vector is a perturbation of one base -> one bucket
    # of 30 rows; with 2^4 = 16 buckets the all-bucket mean is 1.875,
    # so 30 > cap AND 30 > 8 x mean -> raise, at call time
    n = 30
    v = rng.normal(size=dim)
    mat = np.vstack([v + 1e-4 * rng.normal(size=dim) for _ in range(n)])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="max_bucket_rows"):
        lsh_near_dup_pairs(emb, 0.5, n_planes=4, dim=dim, max_bucket_rows=8)

    # uniform: random vectors over 2^2 = 4 buckets, every bucket ~15
    # rows > cap=4 but none skewed -> runs to completion
    emb_u, _ = _rand_emb(spark, 60, dim, seed=7)
    df = lsh_near_dup_pairs(emb_u, 0.99, n_planes=2, dim=dim, max_bucket_rows=4)
    df.collect()  # must not raise


def test_no_cached_frame_leaks(spark):
    """Repeated calls to the operators that formerly cached internally
    must not grow the persisted-RDD set (r03 verdict item 6)."""
    from textsearch_spark.operators.dedup import minhash_lsh_dedup, ngram_jaccard_pairs

    emb, _ = _rand_emb(spark, 40, 16, seed=2)
    docs = spark.createDataFrame(
        [(i, f"w{i % 5} x{i % 3} y z a b c") for i in range(30)],
        "doc_id long, text string",
    )
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    for _ in range(2):
        lsh_cosine_topk(emb, [0, 1], k=2, n_planes=3, dim=16).collect()
        minhash_lsh_dedup(docs, n_hashes=4, n_bands=2, threshold=0.3).collect()
        ngram_jaccard_pairs(docs, shingle_n=2, threshold=0.3, max_df_ratio=0.5).collect()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == before, f"cached frames leaked: {before} -> {after}"

def test_query_broadcast_stores_each_vector_once(spark):
    """nprobe>1 puts the same query in several probe lists; the
    broadcast must hold its vector ONCE with per-key row indices, not a
    copy per probed list (at 65536 queries x dim 4096 x nprobe 4 the
    per-key packing is ~8.6 GB vs ~2.1 GB)."""
    v0 = np.arange(4, dtype=np.float64)
    v1 = np.arange(4, dtype=np.float64) + 1.0
    probes = {0: [(10, v0), (11, v1)], 1: [(10, v0)], 2: [(11, v1), (10, v0)]}
    bq = ss._query_broadcast(spark, probes)
    ids, mat, norms, key_rows = bq.value
    assert mat.shape == (2, 4), "5 probe entries but only 2 distinct queries"
    assert len(ids) == len(norms) == 2
    for key, lst in probes.items():
        rows = key_rows[key]
        assert [int(ids[r]) for r in rows] == [q for q, _ in lst]
        np.testing.assert_allclose(mat[rows], np.vstack([v for _, v in lst]))
