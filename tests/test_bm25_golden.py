"""End-to-end BM25 golden tests (reference: test/search.jl:27-70).

The reference pins, for the 7-doc Spanish corpus with doc-frequency
pruning 1 < ndocs < 5 and query "la casa de la manzana verde", k=3:
docIDs [6, 2, 4] and negated scores [-3.3956785, -3.1118512, -2.5816276]
within SqL2 1e-4.
"""

import math

import pytest

from textsearch_spark.config import TextConfig
from textsearch_spark.operators.search import search_bm25, search_bm25_text
from textsearch_spark.plans.build import build_bm25_index, filter_lists

QUERY = "la casa de la manzana verde"
GOLDEN_IDS = [6, 2, 4]
GOLDEN_NEG_SCORES = [-3.3956785, -3.1118512, -2.5816276]


@pytest.fixture(scope="module")
def index(golden_corpus_df):
    return build_bm25_index(
        golden_corpus_df,
        TextConfig(nlist=[1]),
        vocab_filter="ndocs > 1 AND ndocs < 5",
    )


def test_fit_stats(index):
    # 7 docs; 25 total tokens -> avgdl over *unfiltered* counts
    assert index.n_docs == 7
    assert abs(index.avgdl - 25 / 7) < 1e-12
    # pruned vocabulary: tokens with 1 < ndocs < 5
    toks = {r.token for r in index.vocab.collect()}
    assert toks == {"casa", "roja", "manzana", "esta", "rica"} | {"verde"} - {"la"}


def test_golden_topk(index):
    res = search_bm25_text(index, QUERY, k=3).orderBy("rank").collect()
    assert [r.doc_id for r in res] == GOLDEN_IDS
    sql2 = sum(((-r.score) - g) ** 2 for r, g in zip(res, GOLDEN_NEG_SCORES))
    assert sql2 <= 1e-4


def test_golden_after_filter_lists(index):
    # reference: test/search.jl:43-53 (tiny thresholds, same ranking)
    pruned = filter_lists(
        index,
        list_min_length_for_checking=2,
        list_max_allowed_length=3,
        doc_min_freq=1,
        doc_max_freq=3,
    )
    res = search_bm25_text(pruned, QUERY, k=3).orderBy("rank").collect()
    assert [r.doc_id for r in res] == GOLDEN_IDS


def test_unfiltered_index_and_oov(golden_corpus_df):
    idx = build_bm25_index(golden_corpus_df, TextConfig(nlist=[1]))
    # all-OOV query -> empty result (src/bm25invfilesearch.jl:39-41)
    assert search_bm25_text(idx, "xyzzy plugh", k=3).count() == 0
    # empty-after-normalization query
    assert search_bm25_text(idx, "!!!", k=3).count() == 0
    # every doc contains "la": k=7 returns all docs
    assert search_bm25_text(idx, "la", k=10).count() == 7


def test_batch_queries(index, spark):
    qs = spark.createDataFrame(
        [(1, QUERY), (2, "pera rica"), (3, "zzz")],
        "query_id long, qtext string",
    )
    res = search_bm25(index, qs, k=3).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    assert [d for _, d, _ in sorted(by_q[1])] == GOLDEN_IDS
    assert sorted(by_q[2])[0][1] == 5  # doc 5 is the only one with 'pera'
    assert 3 not in by_q


def test_accept_posting_list_veto(index):
    # vetoing lists with ndocs >= 3 drops 'verde' (ndocs=4); query terms
    # casa (3)... use max_ndocs=3 -> keeps casa, roja, manzana, esta, rica
    res = search_bm25_text(index, QUERY, k=7)
    full = {r.doc_id for r in res.collect()}
    from textsearch_spark.operators.search import search_bm25 as sb
    q = index.spark.createDataFrame([(0, QUERY)], "query_id long, qtext string")
    vetoed = sb(index, q, k=7, accept_max_ndocs=3).collect()
    assert {r.doc_id for r in vetoed} <= full
    # doc 7 ("la hoja verde") matches only via 'verde' -> gone when vetoed
    assert 7 in full and 7 not in {r.doc_id for r in vetoed}
