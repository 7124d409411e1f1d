"""Regression tests for the round-4 review pass over the pipeline
operators (dedup, simsearch, textstats, multimodal): empty-input
guards, case-insensitive stopwords, whitespace-token hygiene, and
full-window winnowing."""

from pyspark.sql import functions as F


def test_lsh_dedup_empty_shingles_no_crash(spark):
    """Docs shorter than the shingle width produce an empty signature
    table; the pipeline must return no pairs, not TypeError on
    NULL + 1."""
    from textsearch_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_lsh_dedup, minhash_signatures,
        word_shingles,
    )

    docs = spark.createDataFrame([(1, "one two"), (2, "uno")],
                                 "doc_id long, text string")
    assert minhash_lsh_dedup(docs, shingle_n=3).count() == 0
    sig = minhash_signatures(word_shingles(docs, 3))
    assert lsh_candidate_pairs(sig).count() == 0  # derive-n_hashes path


def test_exact_duplicates_groupby_semantics(spark):
    from textsearch_spark.operators.dedup import exact_duplicates

    docs = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other"), (4, "same")],
        "doc_id long, text string")
    out = {r.doc_id: (r.dup_group, r.group_size)
           for r in exact_duplicates(docs).collect()}
    assert out == {1: (1, 3), 2: (1, 3), 4: (1, 3)}


def test_cosine_topk_missing_and_zero_queries(spark):
    from textsearch_spark.operators.simsearch import cosine_topk

    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # no matching query id: empty frame, not a driver AxisError
    assert cosine_topk(emb, [999], k=2).count() == 0
    # zero-vector query: cos 0 everywhere, never NaN
    out = cosine_topk(emb, [3], k=2).collect()
    assert len(out) == 2 and all(r.cos == 0.0 for r in out)


def test_media_meta_null_payload(spark):
    from textsearch_spark.operators.multimodal import extract_media_meta

    media = spark.createDataFrame(
        [(1, bytearray(b"payload-bytes"), "image/fake"), (2, None, "image/fake")],
        "doc_id long, payload binary, media_type string")
    rows = {r.doc_id: r for r in extract_media_meta(media).collect()}
    assert rows[1].n_bytes == 13 and rows[1].width is not None
    assert rows[2].n_bytes is None and rows[2].content_sha is None \
        and rows[2].width is None


def test_lang_id_case_insensitive_stopwords(spark):
    from textsearch_spark.operators.textstats import lang_id

    docs = spark.createDataFrame(
        [(1, "The cat sat on The mat"), (2, "xq zz ww")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in lang_id(docs).collect()}
    assert out[1].lang_pred == "en" and out[1].hit_ratio > 0.0
    assert out[2].lang_pred == "und"


def test_token_counts_whitespace_runs(spark):
    from textsearch_spark.operators.textstats import token_counts

    docs = spark.createDataFrame([(1, "a  b"), (2, " x ")],
                                 "doc_id long, text string")
    out = {r.doc_id: r for r in token_counts(docs).collect()}
    # empty tokens from the double/leading/trailing spaces are excluded,
    # so the subword >= ws invariant holds
    assert out[1].ws_tokens == 2 and out[1].subword_tokens >= out[1].ws_tokens
    assert out[2].ws_tokens == 1


def test_fingerprint_winnow_full_windows_only(spark):
    from textsearch_spark.operators.textstats import fingerprint_winnow

    # 8 tokens -> 5 shingles (k=4) -> exactly one full window of 5;
    # the old partial-trailing-window code emitted up to 5 fingerprints
    text8 = "t1 t2 t3 t4 t5 t6 t7 t8"
    # 5 tokens -> 2 shingles -> no full window: whole-doc-min fallback
    text5 = "s1 s2 s3 s4 s5"
    docs = spark.createDataFrame([(1, text8), (2, text5)],
                                 "doc_id long, text string")
    out = fingerprint_winnow(docs, k=4, window=5)
    counts = {r.doc_id: r.c for r in
              out.groupBy("doc_id").agg(F.count("*").alias("c")).collect()}
    assert counts[1] == 1  # min of the single full window
    assert counts[2] == 1  # fallback: one fingerprint, not per-suffix minima
