"""Cosine WeightedInvertedFile path + centroid + filter_tokens ops."""

from textsearch_spark.config import TextConfig
from textsearch_spark.functions.weighting import fit_vector_model, vectorize
from textsearch_spark.operators.cosine_search import search_cosine


def test_cosine_invindex_golden(spark, golden_corpus_df):
    # reference: test/search.jl:2-14 — idf x tf model over _corpus,
    # query "la casa roja", k=4 -> docs {1,2,3,4}
    model = fit_vector_model(golden_corpus_df, TextConfig(nlist=[1]),
                             local_weighting="tf", global_weighting="idf")
    vecs = vectorize(model, golden_corpus_df).cache()
    qs = spark.createDataFrame([(0, "la casa roja")], "query_id long, qtext string")
    res = search_cosine(model, vecs, qs, k=4).collect()
    assert sorted(r.doc_id for r in res) == [1, 2, 3, 4]
    # self-query: the exact doc text ranks itself first with cos ~ 1
    qs2 = spark.createDataFrame([(0, "la casa roja")], "query_id long, qtext string")
    top = search_cosine(model, vecs, qs2, k=1).collect()[0]
    assert top.doc_id == 1 and abs(top.cos - 1.0) < 1e-9


def test_cosine_oov_query_empty(spark, golden_corpus_df):
    model = fit_vector_model(golden_corpus_df, TextConfig(nlist=[1]),
                             local_weighting="tf", global_weighting="idf")
    vecs = vectorize(model, golden_corpus_df)
    qs = spark.createDataFrame([(0, "xyzzy")], "query_id long, qtext string")
    assert search_cosine(model, vecs, qs, k=3).count() == 0


def test_centroid_operator(spark, golden_corpus_df):
    # same golden as test_weighting.test_centroid_golden, via the operator
    from textsearch_spark.operators.dvec import centroid

    model = fit_vector_model(golden_corpus_df, TextConfig(nlist=[1]),
                             local_weighting="freq", global_weighting="binary")
    vecs = vectorize(model, golden_corpus_df)
    c = {r.token: r.weight for r in centroid(vecs).collect()}
    expected = {"la": 0.7366651330405098, "verde": 0.39921969741172364,
                "casa": 0.33744543562878626}
    for t, w in expected.items():
        assert abs(c[t] - w) < 1e-9
    assert abs(sum(w * w for w in c.values()) - 1.0) < 1e-9


def test_filter_tokens_df(spark, golden_corpus_df):
    from textsearch_spark.functions.udfs import exploded_tokens
    from textsearch_spark.operators.vocab import build_vocab, filter_tokens_df, filter_vocab

    voc = filter_vocab(build_vocab(golden_corpus_df, TextConfig(nlist=[1])), "ndocs > 1")
    toks = exploded_tokens(golden_corpus_df, TextConfig(nlist=[1]))
    kept = filter_tokens_df(toks, voc)
    kept_set = {r.token for r in kept.select("token").distinct().collect()}
    voc_set = {r.token for r in voc.collect()}
    assert kept_set <= voc_set
    assert "azul" not in kept_set  # ndocs == 1 -> filtered
