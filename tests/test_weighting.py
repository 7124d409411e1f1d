"""Weighting-scheme golden tests (reference: test/vec.jl)."""

import pytest

from textsearch_spark.config import TextConfig
from textsearch_spark.functions.weighting import (
    EMPTY_SENTINEL,
    dot_products,
    filter_model_tokens,
    fit_vector_model,
    vectorize,
)

from .conftest import CORPUS3, SENTIMENT_CORPUS, SENTIMENT_LABELS

CFG = TextConfig(group_usr=True, nlist=[1])


@pytest.fixture(scope="module")
def sentiment_df(spark):
    rows = [(i + 1, t, l) for i, (t, l) in enumerate(zip(SENTIMENT_CORPUS, SENTIMENT_LABELS))]
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def _dot34(spark, model):
    """dot(vectorize(doc3), vectorize(doc4)) — test/vec.jl:57-60."""
    docs = spark.createDataFrame(
        [(1, SENTIMENT_CORPUS[2]), (2, SENTIMENT_CORPUS[3])], "doc_id long, text string"
    )
    vecs = vectorize(model, docs).cache()
    a = vecs.filter("doc_id = 1").drop("doc_id").withColumnRenamed("weight", "wa")
    b = vecs.filter("doc_id = 2").drop("doc_id").withColumnRenamed("weight", "wb")
    row = (
        a.join(b, "token")
        .selectExpr("sum(wa * wb) as dot")
        .collect()[0]
    )
    return row.dot or 0.0


GOLDEN_DOTS = [
    ("binary", "freq", 0.3162),
    ("binary", "tf", 0.3162),
    ("binary", "tp", 0.3162),
    ("idf", "binary", 0.3668),
    ("idf", "tf", 0.2053),
    ("entropy", "freq", 0.44456),
    ("entropy", "tf", 0.44456),
    ("entropy", "tp", 0.44456),
    ("entropy", "binary", 0.7029),
]


@pytest.mark.parametrize("gw,lw,expected", GOLDEN_DOTS)
def test_weighting_scheme_goldens(spark, sentiment_df, gw, lw, expected):
    # test/vec.jl:34-61
    kwargs = dict(local_weighting=lw, global_weighting=gw)
    if gw == "entropy":
        kwargs.update(label_col="label", smooth=0, mindocs=1)
    model = fit_vector_model(sentiment_df, CFG, **kwargs)
    assert abs(_dot34(spark, model) - expected) < 1e-3


def test_entropy_weight_sum(spark, sentiment_df):
    # test/vec.jl:28-31. NOTE: the reference's assertion is one-sided —
    # `(7.059714 - sum(model.weight)) < 1e-5`, no abs() — so it passes
    # for any sum >= ~7.0597. The abs()-checked dot goldens above pin
    # distinct-per-doc label counting (src/emodel.jl:68-73), under which
    # the exact sum is 7 + w(esto) = 7.1095093. We assert both the
    # reference's (one-sided) golden and our exact value.
    model = fit_vector_model(
        sentiment_df, CFG, local_weighting="binary", global_weighting="entropy",
        label_col="label", smooth=0, mindocs=1,
    )
    total = model.vocab.selectExpr("sum(gweight) as s").collect()[0].s
    assert (7.059714 - total) < 1e-5  # the reference's literal assertion
    assert abs(total - 7.1095093) < 1e-5


def test_empty_vector_sentinel(spark):
    # test/vec.jl:2-14: an all-OOV text vectorizes to the {0: 1.0} sentinel
    corpus = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(CORPUS3)], "doc_id long, text string"
    )
    model = fit_vector_model(corpus, CFG, local_weighting="freq", global_weighting="binary")
    text2 = spark.createDataFrame([(1, "a b c d e f g h i j k l m n o p q")],
                                  "doc_id long, text string")
    rows = vectorize(model, text2).collect()
    assert len(rows) == 1
    assert rows[0].token == EMPTY_SENTINEL and rows[0].weight == 1.0


def test_multi_message_vectorize_parity(spark):
    # test/vec.jl:16-20
    cfg = TextConfig(nlist=[1], mark_token_type=False)
    corpus = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(CORPUS3)], "doc_id long, text string"
    )
    model = fit_vector_model(corpus, cfg, local_weighting="freq", global_weighting="binary")
    single = spark.createDataFrame([(1, "hello ;) #jello world.")], "doc_id long, text string")
    multi = spark.createDataFrame([(1, ["hello ;)", "#jello world."])],
                                  "doc_id long, text array<string>")
    va = {(r.token, round(r.weight, 9)) for r in vectorize(model, single).collect()}
    vb = {(r.token, round(r.weight, 9)) for r in vectorize(model, multi, multi=True).collect()}
    assert va == vb


def test_quantile_pruning_goldens(spark, sentiment_df):
    # test/vec.jl:63-89: keep weights >= 0.9-quantile, re-vectorize
    import numpy as np

    for gw, lw, expected, p in [
        ("entropy", "binary", 0.7071067690849304, 0.9),
        ("idf", "tf", 0.0, 0.9),
    ]:
        kwargs = dict(local_weighting=lw, global_weighting=gw)
        if gw == "entropy":
            kwargs.update(label_col="label", smooth=0, mindocs=1)
        model = fit_vector_model(sentiment_df, CFG, **kwargs)
        weights = np.array([r.gweight for r in model.vocab.select("gweight").collect()])
        q = float(np.quantile(weights, p))
        pruned = filter_model_tokens(model, f"gweight >= {q!r}")
        assert pruned.vocab.count() < model.vocab.count()
        assert abs(_dot34(spark, pruned) - expected) < 1e-3


def test_centroid_golden(spark, golden_corpus_df):
    # test/search.jl:17-25: normalized sum of freq/binary vectors
    model = fit_vector_model(golden_corpus_df, TextConfig(nlist=[1]),
                             local_weighting="freq", global_weighting="binary")
    vecs = vectorize(model, golden_corpus_df)
    from pyspark.sql import functions as F

    summed = vecs.groupBy("token").agg(F.sum("weight").alias("w"))
    norm = summed.selectExpr("sqrt(sum(w*w)) as n").collect()[0].n
    centroid = {r.token: r.w / norm for r in summed.collect()}
    expected = {
        "la": 0.7366651330405098, "verde": 0.39921969741172364,
        "azul": 0.11248181187626208, "pera": 0.08712803682959973,
        "esta": 0.17425607365919946, "roja": 0.22496362375252416,
        "hoja": 0.11248181187626208, "casa": 0.33744543562878626,
        "rica": 0.17425607365919946, "manzana": 0.19960984870586182,
    }
    dot = sum(centroid.get(t, 0.0) * w for t, w in expected.items())
    assert dot > 0.999
