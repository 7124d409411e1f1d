"""Round-3 similarity-search hardening: trained IVF quantizer (recall
vs brute force on clustered embeddings), inverted-list skew guard, and
the bucket-kernel near-dup path at high dimension."""

import numpy as np
import pytest


def _clustered(rng, n, dim, n_clusters, spread=0.05):
    """n points around n_clusters unit-sphere centers — the realistic
    embedding shape where an untrained quantizer skews."""
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, n_clusters, n)
    pts = centers[assign] + spread * rng.randn(n, dim)
    return pts


@pytest.fixture(scope="module")
def clustered_emb(spark):
    rng = np.random.RandomState(5)
    pts = _clustered(rng, 1200, 32, 12)
    df = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(len(pts))],
        "vec_id long, embedding array<double>",
    ).repartition(8).cache()
    df.count()
    return df


def test_trained_ivf_recall(spark, clustered_emb):
    """Lloyd-trained centroids must reach recall@10 >= 0.9 at nprobe=4
    vs exact brute force on clustered embeddings (r02 verdict item 3)."""
    from textsearch_spark.operators.simsearch import (
        cosine_topk, ivf_cosine_topk, train_ivf_centroids,
    )

    cents = train_ivf_centroids(clustered_emb, 16, n_iter=5)
    assert cents.shape == (16, 32)
    qids = list(range(20))
    exact = cosine_topk(clustered_emb, qids, k=10).collect()
    approx = ivf_cosine_topk(clustered_emb, qids, k=10, n_centroids=16,
                             nprobe=4, centroids=cents).collect()

    def by_q(rows):
        out = {}
        for r in rows:
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    e, a = by_q(exact), by_q(approx)
    recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_trained_ivf_balances_lists(spark, clustered_emb):
    """Training must tighten list balance vs the sampled quantizer on
    clustered data (the r02 'one list absorbs the corpus' failure)."""
    from textsearch_spark.operators.simsearch import (
        ivf_assign, ivf_list_stats, train_ivf_centroids,
    )

    sampled = ivf_list_stats(ivf_assign(clustered_emb, 16)).collect()
    cents = train_ivf_centroids(clustered_emb, 16, n_iter=5)
    trained = ivf_list_stats(ivf_assign(clustered_emb, 16, centroids=cents)).collect()
    max_s = max(r.n for r in sampled)
    max_t = max(r.n for r in trained)
    assert max_t <= max_s  # training never worsens the largest list here
    # trained largest list is within a reasonable factor of the mean
    mean_t = sum(r.n for r in trained) / len(trained)
    assert max_t <= 4 * mean_t


def test_ivf_preassigned_matches_inline(spark, clustered_emb):
    """A persisted/pre-computed assignment table must give identical
    results to the inline quantizer pass (the once-per-lifetime vs
    once-per-batch cost split)."""
    from textsearch_spark.operators.simsearch import (
        ivf_assign, ivf_cosine_topk, train_ivf_centroids,
    )

    cents = train_ivf_centroids(clustered_emb, 8, n_iter=2)
    pre = ivf_assign(clustered_emb, centroids=cents).cache()
    pre.count()
    qids = list(range(10))
    inline = sorted((r.query_id, r.rank, r.neighbor_id, round(r.cos, 9))
                    for r in ivf_cosine_topk(clustered_emb, qids, k=5,
                                             centroids=cents, nprobe=3).collect())
    reused = sorted((r.query_id, r.rank, r.neighbor_id, round(r.cos, 9))
                    for r in ivf_cosine_topk(clustered_emb, qids, k=5,
                                             centroids=cents, assigned=pre,
                                             nprobe=3).collect())
    pre.unpersist()
    assert inline == reused and inline
    with pytest.raises(ValueError, match="centroids"):
        ivf_cosine_topk(clustered_emb, qids, k=5, assigned=pre)


def test_centroid_persistence_roundtrip(spark, clustered_emb, tmp_path):
    """Trained quantizers persist exactly and reproduce identical
    assignments when reloaded (train offline once, query many times)."""
    from textsearch_spark.operators.simsearch import (
        ivf_assign, load_centroids, save_centroids, train_ivf_centroids,
    )

    cents = train_ivf_centroids(clustered_emb, 8, n_iter=2)
    p = str(tmp_path / "centroids.json")
    save_centroids(cents, p)
    back = load_centroids(p)
    assert np.array_equal(cents, back)  # exact float64 round-trip
    a1 = {r.vec_id: r.centroid_id
          for r in ivf_assign(clustered_emb, centroids=cents).collect()}
    a2 = {r.vec_id: r.centroid_id
          for r in ivf_assign(clustered_emb, centroids=back).collect()}
    assert a1 == a2


def test_ivf_skew_guard_raises(spark):
    """check_skew must refuse a quantizer whose lists collapse."""
    from textsearch_spark.operators.simsearch import ivf_cosine_topk

    rng = np.random.RandomState(9)
    # every point in one tight blob; explicit centroids put one near the
    # blob and 15 far away -> one list absorbs everything
    pts = 0.01 * rng.randn(300, 8) + np.ones(8)
    far = [(-10.0 + i) * np.ones(8) for i in range(15)]
    cents = np.vstack([np.ones(8)] + far)
    emb = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="skew"):
        ivf_cosine_topk(emb, [0, 1], k=3, centroids=cents,
                        check_skew=True, skew_warn_ratio=8.0)
    # without the guard the call still answers (documented recall risk)
    assert ivf_cosine_topk(emb, [0, 1], k=3, centroids=cents).count() > 0


def test_near_dup_bucket_kernel_dim1024(spark):
    """The per-bucket Gram-matmul kernel must equal the brute-force
    bucket-restricted pair set at real embedding width (r02 item 6)."""
    from textsearch_spark.operators.simsearch import (
        _hyperplanes, lsh_near_dup_pairs,
    )

    rng = np.random.RandomState(21)
    dim, n = 1024, 120
    mat = rng.randn(n, dim)
    # plant near-duplicate pairs
    mat[50] = mat[10] + 0.01 * rng.randn(dim)
    mat[51] = mat[11] + 0.01 * rng.randn(dim)
    emb = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(6)

    got = {(r.vec_a, r.vec_b): r.cos
           for r in lsh_near_dup_pairs(emb, 0.9, n_planes=6, dim=dim).collect()}

    # brute-force reference restricted to shared buckets
    planes = _hyperplanes(6, dim).T
    signs = (mat @ planes) >= 0
    buckets = ["".join("1" if s else "0" for s in row) for row in signs]
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    want = {}
    for i in range(n):
        for j in range(i + 1, n):
            if buckets[i] == buckets[j] and sims[i, j] >= 0.9:
                want[(i, j)] = sims[i, j]
    assert set(got) == set(want)
    assert (10, 50) in got and (11, 51) in got  # planted dups found
    for key in want:
        assert got[key] == pytest.approx(want[key], rel=1e-9)
