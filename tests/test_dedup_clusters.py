"""Connected-component duplicate clustering (round-5 addition).

``duplicate_clusters`` resolves near-dup PAIRS into components via
alternating large-star/small-star (Kiveris et al. SoCC'14) — the
closure step pair detection alone lacks (A~B, B~C must yield one
keeper even when A~C was never emitted). Pins:

- hand graphs: chain, two components, triangle+isolated edge,
  duplicate/reversed/self input pairs, empty input;
- a randomized differential vs a pure-python union-find over 60
  random graphs (the ground-truth replay);
- a 400-node PATH graph — the worst case for diameter-bound label
  propagation — must converge well inside the iteration cap (the
  O(log^2 n) claim, observable);
- ``dedup_keep_canonical`` keeps exactly the cluster minima plus all
  unpaired docs;
- no persisted frame leaks to the caller (r03 leaked-cache class).
"""

import random

import pytest
from pyspark.sql import functions as F

from textsearch_spark.operators.dedup import (
    dedup_keep_canonical, duplicate_clusters,
)


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs] or [],
        "doc_a long, doc_b long",
    )


def _clusters(spark, pairs, **kw):
    df = duplicate_clusters(_pairs_df(spark, pairs), **kw)
    return {r.doc_id: r.cluster_id for r in df.collect()}


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a == b:
            parent.setdefault(a, a)
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_chain_resolves_to_min(spark):
    # A~B, B~C, C~D: one component labelled by its smallest id, even
    # though A~D was never an input pair
    assert _clusters(spark, [(1, 2), (2, 3), (3, 4)]) == {
        1: 1, 2: 1, 3: 1, 4: 1,
    }


def test_two_components_and_shapes(spark):
    got = _clusters(spark, [(5, 9), (9, 7), (20, 30), (30, 21), (21, 20)])
    assert got == {5: 5, 9: 5, 7: 5, 20: 20, 30: 20, 21: 20}


def test_input_noise_is_canonicalized(spark):
    # duplicates, both orientations, and self-pairs must not matter
    got = _clusters(spark, [(2, 1), (1, 2), (2, 1), (3, 3), (2, 3), (9, 9)])
    # (3,3) adds no edge (3 enters via (2,3)); the isolated self-pair
    # (9,9) still names 9, which becomes its own singleton cluster
    assert got == {1: 1, 2: 1, 3: 1, 9: 9}


def test_empty_pairs(spark):
    assert _clusters(spark, []) == {}


def test_randomized_vs_union_find(spark):
    rng = random.Random(20260820)
    for trial in range(60):
        n = rng.randint(2, 40)
        m = rng.randint(1, 60)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        expect = _union_find(pairs)
        got = _clusters(spark, pairs)
        assert got == expect, f"trial {trial}: {pairs}"


def test_path_graph_beats_diameter(spark):
    # a 400-node path has diameter 399; min-label propagation would
    # need ~399 rounds. The star algorithm must finish far inside the
    # default cap of 50 — tightened to 15 here so a silent regression
    # to diameter-bound behavior fails loudly.
    pairs = [(i, i + 1) for i in range(400)]
    got = _clusters(spark, pairs, max_iter=15)
    assert got == {i: 0 for i in range(401)}


def test_nonconvergence_guard_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(_pairs_df(spark, [(i, i + 1) for i in range(64)]),
                           max_iter=1).collect()


def test_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string")
    pairs = _pairs_df(spark, [(1, 2), (2, 3), (7, 8)])
    kept = sorted(
        r.doc_id
        for r in dedup_keep_canonical(docs, pairs).collect()
    )
    # clusters {1,2,3}->keep 1, {7,8}->keep 7; unpaired docs untouched
    assert kept == [0, 1, 4, 5, 6, 7, 9]


def test_string_ids_cluster_lexicographically(spark):
    # the operator is id-type generic (no numeric cast): string ids
    # resolve to the lexicographic minimum of their component
    pairs = spark.createDataFrame(
        [("url/b", "url/a"), ("url/a", "url/c"), ("x", "y")],
        "doc_a string, doc_b string",
    )
    from textsearch_spark.operators.dedup import duplicate_clusters

    got = {r.doc_id: r.cluster_id
           for r in duplicate_clusters(pairs).collect()}
    assert got == {"url/a": "url/a", "url/b": "url/a", "url/c": "url/a",
                   "x": "x", "y": "x"}


def test_composes_with_simhash_pairs(spark):
    # the resolver is pair-source agnostic: feed it SimHash banding
    # pairs (hamming col is just ignored) and collapse the corpus
    from textsearch_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "pack my box with five dozen liquor jugs"),
            (4, "sphinx of black quartz judge my vow"),
        ],
        "doc_id long, text string",
    )
    pairs = simhash_near_dup_pairs(docs, bits=16, max_hamming=0)
    clusters = {r.doc_id: r.cluster_id
                for r in duplicate_clusters(pairs).collect()}
    # the three identical docs form one cluster labelled 0
    assert clusters[0] == clusters[1] == clusters[2] == 0
    kept = sorted(r.doc_id
                  for r in dedup_keep_canonical(docs, pairs).collect())
    assert 0 in kept and 1 not in kept and 2 not in kept
    assert {3, 4} <= set(kept)


def test_no_leaked_persisted_frames(spark):
    def persisted_ids():
        return {int(k) for k in
                spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}

    # track the SET of rdd ids created by this test, not a total count:
    # in full-suite runs the ContextCleaner may free an UNRELATED
    # earlier relation during the wait below, which moves a count-based
    # baseline and fails the test for shrinkage that is not ours.
    base_ids = persisted_ids()
    df = duplicate_clusters(_pairs_df(spark, [(1, 2), (2, 3), (8, 9)]))
    rows = df.collect()
    assert len(rows) == 5
    # consuming the result twice must work after internal releases
    assert df.count() == 5
    # intermediate rounds' checkpoint blocks are RDD-level storage the
    # operator cannot unpersist through the DataFrame API; they are
    # freed by the ContextCleaner once driver GC drops their refs.
    # While `df` is alive its final-round leaf is legitimately
    # retained, and dead-round blocks drain on GC with NONDETERMINISTIC
    # latency (py4j finalizer queue + ContextCleaner cadence — observed
    # > 30 s under full-suite load), so the sharp, reliably-testable
    # invariant is: once the caller drops the result, EVERYTHING this
    # operator persisted drains. A genuinely leaked internal frame
    # (the r03 bug class) would survive this forever.
    import gc
    import time

    del df
    deadline = time.time() + 90
    leaked = persisted_ids() - base_ids
    while leaked and time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        leaked = persisted_ids() - base_ids
    assert not leaked, f"leaked checkpoint RDDs: {sorted(leaked)}"
