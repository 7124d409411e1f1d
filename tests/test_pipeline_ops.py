"""Training-data pipeline operators: dedup, similarity search, text
stats, multimodal plumbing, approx vocab."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_exact_duplicates(spark):
    from textsearch_spark.operators.dedup import exact_duplicates

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y"), (4, "a b c"), (5, "x z")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.dup_group, r.group_size) for r in exact_duplicates(df).collect()}
    assert rows == {1: (1, 3), 2: (1, 3), 4: (1, 3)}


def test_minhash_lsh_finds_near_dups(spark, docs):
    from textsearch_spark.operators.dedup import minhash_lsh_dedup, ngram_jaccard_pairs

    base = docs.limit(40)
    # append slightly perturbed copies with shifted doc ids
    perturbed = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token tail")).alias("text"),
    )
    both = base.select("doc_id", "text").unionByName(perturbed)
    found = minhash_lsh_dedup(both, n_hashes=16, n_bands=8, threshold=0.6).collect()
    pairs = {(r.doc_a, r.doc_b) for r in found}
    # each doc should pair with its perturbed twin
    twins = {(r.doc_id, r.doc_id + 100000) for r in base.collect()}
    assert len(pairs & twins) >= 30  # LSH recall on near-identical docs
    for r in found:
        assert r.jaccard >= 0.6
    # LSH output is a subset of the exhaustive baseline
    exact = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(both, threshold=0.6).collect()}
    assert pairs <= exact


def test_simhash_close_for_near_dups(spark):
    from textsearch_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "completely different words entirely unrelated content")],
        "doc_id long, text string",
    )
    h = {r.doc_id: r.simhash for r in simhash(df, bits=16).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h[1], h[2]) < ham(h[1], h[3])


def test_cosine_topk_matches_numpy(spark, embeddings):
    import numpy as np

    from textsearch_spark.operators.simsearch import cosine_topk

    res = cosine_topk(embeddings, [0, 1, 2], k=5).collect()
    rows = embeddings.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in [0, 1, 2]:
        sims = mat @ mat[ids == qid][0]
        order = np.lexsort((ids, -sims))
        expected = [int(ids[i]) for i in order if ids[i] != qid][:5]
        got = [r.neighbor_id for r in sorted(res, key=lambda r: r.rank) if r.query_id == qid]
        assert got == expected


def test_lsh_cosine_recall(spark, embeddings):
    from textsearch_spark.operators.simsearch import cosine_topk, lsh_cosine_topk

    exact = cosine_topk(embeddings, list(range(10)), k=3).collect()
    approx = lsh_cosine_topk(embeddings, list(range(10)), k=3, n_planes=2).collect()
    ex = {(r.query_id, r.neighbor_id) for r in exact}
    ap = {(r.query_id, r.neighbor_id) for r in approx}
    # random 64-dim embeddings have weak neighbors (cos ~0.4): sign-LSH
    # with 2 planes collides such pairs w.p. ~0.4 — expect partial recall
    assert len(ex & ap) >= 6
    # approximate scores must be exact cosines (verification is exact)
    exd = {(r.query_id, r.neighbor_id): r.cos for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exd:
            assert abs(exd[(r.query_id, r.neighbor_id)] - r.cos) < 1e-9


def test_textstats(spark, docs):
    from textsearch_spark.operators.textstats import (
        fingerprint_winnow, lang_id, quality_score, token_counts,
    )

    li = lang_id(docs).collect()
    assert all(r.lang_pred in ("en", "es", "fr", "und") for r in li)
    qs = quality_score(docs).collect()
    assert all(0.0 <= r.quality <= 1.0 for r in qs)
    tc = token_counts(docs).collect()
    assert all(r.subword_tokens >= r.ws_tokens for r in tc)
    fp = fingerprint_winnow(docs)
    # identical docs -> identical fingerprint sets
    assert fp.count() > 0
    a = {r.fingerprint for r in fp.filter("doc_id = 0").collect()}
    assert len(a) > 0


def test_multimodal_plumbing(spark, docs):
    from textsearch_spark.operators.multimodal import (
        as_media_column, decode_stub, extract_media_meta,
    )

    media = as_media_column(docs.limit(20))
    meta = extract_media_meta(media, deterministic_fake=True).collect()
    assert len(meta) == 20
    for r in meta:
        assert r.n_bytes > 0 and len(r.content_sha) == 64
        assert 64 <= r.width < 256 and 64 <= r.height < 256
    with pytest.raises(NotImplementedError):
        decode_stub(b"payload")


def test_approx_vocab_lookup(spark, golden_corpus_df):
    from textsearch_spark.config import TextConfig
    from textsearch_spark.operators.approxvoc import approx_lookup
    from textsearch_spark.operators.vocab import build_vocab

    voc = build_vocab(golden_corpus_df, TextConfig(nlist=[1]))
    qs = spark.createDataFrame(
        [("casa",), ("acasa",), ("manxzanas",), ("abracadabra",), ("",)],
        "qtoken string",
    )
    res = {r.qtoken: r.match_token for r in approx_lookup(voc, qs).collect()}
    # reference: test/voc.jl:21-32
    assert res["casa"] == "casa"
    assert res["acasa"] == "casa"
    assert res["manxzanas"] == "manzana"
    assert "abracadabra" not in res
    assert "" not in res
