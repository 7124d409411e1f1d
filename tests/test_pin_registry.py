"""The per-query pin registry (operators/search.pin_query_relation):
every search call persists its tokenized-query relation; the registry
must EVICT older pins so a long-lived serving session holds at most
_PIN_CAP cached query batches — and eviction must not change results
(persist keeps lineage; an evicted relation recomputes).
"""

import pytest
from pyspark.sql import functions as F

from textsearch_spark.config import TextConfig
from textsearch_spark.operators import search as searchmod
from textsearch_spark.operators.search import pin_query_relation, search_bm25
from textsearch_spark.plans.build import build_bm25_index


def _cached_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_pin_registry_bounded(spark):
    searchmod._pinned.clear()
    base = _cached_count(spark)
    dfs = [spark.range(i + 1).withColumn("x", F.lit(i)) for i in range(12)]
    pinned = [pin_query_relation(df) for df in dfs]
    assert len(searchmod._pinned) == searchmod._PIN_CAP
    # at most CAP new persisted RDDs survive (evicted ones unpersisted)
    assert _cached_count(spark) - base <= searchmod._PIN_CAP
    # an evicted relation still computes correctly from lineage
    assert pinned[0].count() == 1
    for df in searchmod._pinned:
        df.unpersist(blocking=False)
    searchmod._pinned.clear()


def test_search_does_not_accumulate_pins(spark, golden_corpus_df):
    idx = build_bm25_index(golden_corpus_df, TextConfig(nlist=[1]))
    searchmod._pinned.clear()
    expect = None
    counts = []
    # distinct query text per batch so no two pinned plans are
    # cache-manager duplicates of each other
    texts = ["casa verde", "manzana roja", "pera rica", "hoja verde"]
    for i in range(searchmod._PIN_CAP + 4):
        q = spark.createDataFrame([(1, texts[i % len(texts)])],
                                  "query_id long, qtext string")
        rows = search_bm25(idx, q, k=3).orderBy("rank").collect()
        if i % len(texts) == 0:
            got = [(r.rank, r.doc_id) for r in rows]
            if expect is None:
                expect = got
            assert got == expect  # eviction never changes any result
        counts.append(_cached_count(spark))
    # once the cap is reached, each new pin evicts one: the persistent-
    # RDD count PLATEAUS instead of growing per query batch
    assert len(searchmod._pinned) == searchmod._PIN_CAP
    assert counts[-1] <= counts[searchmod._PIN_CAP - 1] + 1
    for df in searchmod._pinned:
        df.unpersist(blocking=False)
    searchmod._pinned.clear()
