"""Round-5 simsearch addition: multi-probe LSH.

``lsh_cosine_topk(multiprobe=t)`` probes, per query, the base sign
bucket plus the ``t`` buckets reached by flipping the lowest-|margin|
plane signs. Pins:

- a numpy replay of the exact probe rule (base + t flips by
  |margin| asc, plane index tiebreak) — results identical;
- recall vs brute force is monotone in the probe count on a clustered
  corpus whose clusters straddle hyperplanes (the case single-probe
  sign-LSH loses);
- probed candidate sets stay disjoint (corpus rows live in one
  bucket), so no (query, neighbor) pair is emitted twice;
- bounds validation.
"""

import numpy as np
import pytest

from textsearch_spark.operators import simsearch as ss
from textsearch_spark.operators.simsearch import cosine_topk, lsh_cosine_topk


def _clustered_emb(spark, n, dim, n_clusters=8, sigma=0.05, seed=23):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    mat = np.array([
        cents[i % n_clusters] + sigma * np.random.default_rng(seed + i).normal(size=dim)
        for i in range(n)
    ])
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    return df, mat


def _replay_buckets(mat, n_planes, dim, multiprobe):
    """Independent replay of the operator's probe rule: per row, the
    base bucket; per QUERY additionally the multiprobe flipped ones."""
    planes_t = ss._hyperplanes(n_planes, dim).T
    margins = mat @ planes_t
    signs = (margins >= 0).astype(np.uint8)
    base = ["".join(s.astype("U1")) for s in signs]

    def probes_for(q):
        out = [base[q]]
        order = np.lexsort((np.arange(n_planes), np.abs(margins[q])))
        for p in order[:multiprobe]:
            f = signs[q].copy()
            f[p] ^= 1
            out.append("".join(f.astype("U1")))
        return out

    return base, probes_for


def test_multiprobe_matches_numpy_replay(spark):
    n, dim, k, n_planes, t = 150, 48, 4, 5, 2
    emb, mat = _clustered_emb(spark, n, dim)
    qids = [0, 7, 33, 90]

    res = lsh_cosine_topk(emb, qids, k=k, n_planes=n_planes, dim=dim,
                          multiprobe=t).collect()
    # no duplicate (query, neighbor) pairs despite multi-bucket probing
    pairs = [(r.query_id, r.neighbor_id) for r in res]
    assert len(pairs) == len(set(pairs))
    got = {(r.query_id, r.rank): (r.neighbor_id, round(r.cos, 9)) for r in res}

    base, probes_for = _replay_buckets(mat, n_planes, dim, t)
    for q in qids:
        probed = set(probes_for(q))
        cand = [i for i in range(n) if base[i] in probed and i != q]
        cos = np.array([
            float(mat[i] @ mat[q]
                  / (np.linalg.norm(mat[i]) * np.linalg.norm(mat[q])))
            for i in cand
        ])
        top = sorted(zip(-cos, cand))[:k]
        assert top, f"query {q} probed an empty candidate set"
        for rank, (negc, i) in enumerate(top, start=1):
            ni, gc = got[(q, rank)]
            assert ni == i, f"q{q} rank{rank}: {ni} != {i}"
            assert gc == pytest.approx(-negc, abs=1e-8)


def test_multiprobe_recall_monotone(spark):
    """On a straddling-cluster corpus, recall@k vs brute force must not
    drop as probes are added — and the probe set strictly grows, so the
    t=2 candidate count is >= the single-probe count for every query."""
    n, dim, k, n_planes = 400, 32, 10, 6
    emb, mat = _clustered_emb(spark, n, dim, n_clusters=16, seed=5)
    qids = list(range(0, n, 16))

    brute = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, qids, k=k).collect()}

    def recall(t):
        got = {(r.query_id, r.neighbor_id)
               for r in lsh_cosine_topk(emb, qids, k=k, n_planes=n_planes,
                                        dim=dim, multiprobe=t).collect()}
        return len(got & brute) / len(brute)

    r0, r2, r4 = recall(0), recall(2), recall(4)
    assert r0 <= r2 + 1e-9 and r2 <= r4 + 1e-9, (r0, r2, r4)
    # the clustered corpus is built so single-probe actually loses
    # neighbors across plane splits; multi-probe must recover a
    # meaningful share of them, not just tie
    assert r4 > r0, (r0, r4)


def test_multiprobe_bounds(spark):
    emb, _ = _clustered_emb(spark, 20, 16, seed=1)
    with pytest.raises(AssertionError, match="multiprobe"):
        lsh_cosine_topk(emb, [0], k=2, n_planes=3, dim=16,
                        multiprobe=4).collect()
