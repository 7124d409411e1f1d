"""Physical-plan assertions: the plans we want, not just plans that pass.

- query-term IN filters reach the parquet scan of a persisted index
  (PushedFilters) so row groups prune by min/max token stats;
- the query side joins via BroadcastHashJoin (postings never shuffle at
  query time);
- the scoring expression stays inside whole-stage codegen.
"""

import io
from contextlib import redirect_stdout

import pytest

from textsearch_spark.config import TextConfig
from textsearch_spark.operators.search import search_bm25
from textsearch_spark.plans.build import build_bm25_index
from textsearch_spark.sources.io import load_index, save_index


def _explain(df, mode="formatted"):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def persisted_index(spark, golden_corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx"))
    idx = build_bm25_index(golden_corpus_df, TextConfig(nlist=[1]))
    save_index(idx, d, postings_partitions=2)
    return load_index(spark, d)


def test_query_terms_pushed_to_postings_scan(spark, persisted_index):
    qs = spark.createDataFrame([(1, "la casa verde")], "query_id long, qtext string")
    plan = _explain(search_bm25(persisted_index, qs, k=3))
    assert "PushedFilters" in plan
    # the IN(token, ...) predicate must reach the parquet scan
    assert "In(token" in plan or "in(token" in plan.lower()


def test_query_join_is_broadcast(spark, persisted_index):
    qs = spark.createDataFrame([(1, "la casa verde")], "query_id long, qtext string")
    plan = _explain(search_bm25(persisted_index, qs, k=3))
    assert "BroadcastHashJoin" in plan
    # the big postings relation must not be exchanged for the join:
    # no shuffle between the scan and the join on the postings side
    scan_to_join = plan.split("BroadcastHashJoin")[0]
    assert "SortMergeJoin" not in plan


def test_scoring_in_wholestage_codegen(spark, persisted_index):
    qs = spark.createDataFrame([(1, "la casa verde")], "query_id long, qtext string")
    res = search_bm25(persisted_index, qs, k=3)
    res.collect()  # AQE reveals codegen spans only in the executed plan
    plan = res._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark whole-stage-codegen spans in the final plan
    assert "*(" in plan
    # no python evaluation on the postings side of the broadcast join —
    # the tokenize UDF runs only on the tiny query side; and the rank
    # filter compiles to a partial top-k (WindowGroupLimit)
    simple = _explain(search_bm25(persisted_index, qs, k=3), mode="simple")
    postings_side = simple.split("BroadcastExchange")[0]
    assert "ArrowEvalPython" not in postings_side
    assert "WindowGroupLimit" in simple


def test_build_shuffle_count(spark, golden_corpus_df):
    """The cached (default) postings build shuffles three times: the
    (doc,token) BOW agg, the token vocab agg, and the doc_id window.
    Without the BOW cache Catalyst duplicates the BOW subplan on both
    sides of the vocab join (5 exchanges + double tokenization) — which
    is exactly why build_bm25_index caches it; this test pins both
    counts so a regression in either direction is visible."""
    import re

    def n_exchanges(postings):
        plan = _explain(postings, mode="simple")
        return len(set(re.findall(
            r"Exchange hashpartitioning\([^)]*\)[^\[]*\[plan_id=(\d+)\]", plan)))

    uncached = build_bm25_index(golden_corpus_df, TextConfig(nlist=[1]), cache=False)
    assert n_exchanges(uncached.postings) <= 6

    cached = build_bm25_index(golden_corpus_df, TextConfig(nlist=[1]), cache=True)
    cached.postings.count()
    # cached build: the only live exchange feeding postings is the
    # doc_id window (bow/vocab exchanges live inside cached relations)
    assert n_exchanges(cached.postings) <= 3


def test_load_index_prebucket_serving_shape(spark, golden_corpus_df, tmp_path):
    """load_index(prebucket=True) returns an index whose blocks are
    partition-resident: golden [6,2,4] still exact, residency adopted."""
    from textsearch_spark.operators.wand import search_bm25_wand

    d = str(tmp_path / "idx")
    idx = build_bm25_index(golden_corpus_df, TextConfig(nlist=[1]),
                           vocab_filter="ndocs > 1 AND ndocs < 5")
    from textsearch_spark.operators.postings import build_posting_blocks

    idx.blocks = build_posting_blocks(idx.postings, span=4)
    save_index(idx, d, postings_partitions=2)
    loaded = load_index(spark, d, prebucket=True)
    assert loaded.prebucket_n is not None
    assert "bucket" in loaded.blocks.columns
    qs = spark.createDataFrame(
        [(1, "la casa de la manzana verde")], "query_id long, qtext string")
    res = search_bm25_wand(loaded, qs, k=3).orderBy("rank").collect()
    assert [r.doc_id for r in res] == [6, 2, 4]
    loaded.blocks.unpersist(blocking=False)
