"""Top-k BM25 retrieval — the query path (reference lifecycle C, SURVEY §3C).

Two physical strategies, rank-identical by construction:

- ``search_bm25`` (this module): the Catalyst-native path. Query texts
  are tokenized with the index's TextConfig, de-duplicated (the
  reference ignores query-side term frequency, src/bm25.jl:29), then
  broadcast-joined against the long-form postings; the per-posting
  ``impact`` column is pre-folded BM25, so scoring is a sum-aggregate
  and top-k is a window — all whole-stage-codegen, no Python.
- ``search_bm25_wand`` (operators/wand.py): block-max WAND over the
  compressed posting blocks inside ``applyInPandas``, for the
  at-scale path. Differential-tested against this one.

Tie order is pinned to ascending docID (the reference's KnnResult scans
in ascending docID and keeps the earlier doc on equal scores,
src/bm25invfilesearch.jl:23,43; golden test/search.jl:36-38).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.udfs import exploded_tokens
from ..plans.build import BM25Index

def materialize_query_relation(df: DataFrame) -> DataFrame:
    """Evaluate the (bounded) tokenized-query relation EXACTLY ONCE —
    one collect — and rebuild it as a local-rows DataFrame.

    Every downstream consumer (the IN-pushdown term collect, the
    broadcast scoring join) then reads frozen driver-side rows, so a
    non-deterministic queries source (sample(), unordered limit())
    can never be re-evaluated into an inconsistent term set — not by
    a second consumer, not by cache eviction, not by executor loss.
    This is the same driver-materialization contract as the WAND
    scorer's query map (operators/wand.py): bounded by batch size x
    distinct query terms; callers with 10^6+ query batches use the
    chunked drivers. Earlier designs (localCheckpoint: executor loss
    fails the query; bounded persist registry: eviction re-exposed
    the recompute hazard for results collected late) both lost a
    property this keeps."""
    rows = df.collect()
    return df.sparkSession.createDataFrame(rows, df.schema)


def query_tokens(index: BM25Index, queries: DataFrame, *, query_col: str = "qtext",
                 id_col: str = "query_id", typo_tolerant: bool = False,
                 maxdist: float = 0.7) -> DataFrame:
    """(query_id, token) — distinct query terms. OOV terms drop at the
    postings join (token2id -> 0 -> skipped in the reference,
    src/voc.jl:21, src/bow.jl:14-23).

    ``typo_tolerant=True`` swaps the exact token2id for the reference's
    QgramsLookup-as-token2id (src/approxvoc.jl:46-57): each query term
    resolves to its nearest vocabulary token under character-3-gram
    Jaccard distance (exact hits at distance 0), terms whose best match
    exceeds ``maxdist`` drop. Cost shape: one bounded set-similarity
    join over the distinct term set of the batch against the PERSISTED
    vocabulary q-gram table (``index.qgrams``, built once at save time
    like the reference's construct-once QgramsLookup); only a
    never-persisted index falls back to deriving it from the vocabulary
    inline."""
    toks = (
        exploded_tokens(queries, index.cfg, doc_col=id_col, text_col=query_col)
        .select(id_col, "token")
        .distinct()
    )
    if not typo_tolerant:
        return toks
    from .approxvoc import approx_lookup

    resolved = approx_lookup(
        index.vocab,
        toks.select(F.col("token").alias("qtoken")).distinct(),
        maxdist=maxdist,
        qgram_index=index.qgrams,
    )
    return (
        toks.join(resolved, toks.token == resolved.qtoken)
        .select(id_col, F.col("match_token").alias("token"))
        .distinct()
    )


PRUNE_MAX_TERMS = 500


def prune_postings_by_terms(postings: DataFrame, q: DataFrame) -> DataFrame:
    """Push the distinct query-term set down to the postings scan as an
    IN filter. On a persisted index (parquet/Iceberg sorted by token)
    this prunes row groups / files via min-max statistics — the
    distributed analogue of the reference fetching only the query
    terms' lists (select_posting_lists, src/bm25invfilesearch.jl:38).

    Skipped for batches with many distinct terms: the driver
    round-trip plus a thousands-of-literals Catalyst expression costs
    seconds of SERIAL planning time while pruning almost nothing (a
    dense batch touches most row groups anyway), and the downstream
    broadcast join restricts tokens regardless — results are identical
    either way. 500 keeps the pushdown for the common small-batch case."""
    toks = [r.token for r in q.select("token").distinct().limit(PRUNE_MAX_TERMS + 1).collect()]
    if 0 < len(toks) <= PRUNE_MAX_TERMS:
        return postings.filter(F.col("token").isin(toks))
    return postings


def search_bm25(
    index: BM25Index,
    queries: DataFrame,
    k: int = 10,
    *,
    query_col: str = "qtext",
    id_col: str = "query_id",
    accept_min_ndocs: Optional[int] = None,
    accept_max_ndocs: Optional[int] = None,
    typo_tolerant: bool = False,
    maxdist: float = 0.7,
) -> DataFrame:
    """Returns (query_id, rank, doc_id, score) with rank 1..k by
    descending BM25 (the reference stores negated scores so its
    "smallest distance" == our largest score).

    ``accept_min_ndocs``/``accept_max_ndocs`` express the reference's
    ``accept_posting_list`` veto (src/bm25invfilesearch.jl:32-38) as a
    pushed-down predicate on list length — e.g. skipping stop-wordish
    very long lists at query time.
    """
    q = query_tokens(index, queries, query_col=query_col, id_col=id_col,
                     typo_tolerant=typo_tolerant, maxdist=maxdist)
    # evaluate ONCE, freeze on the driver: q is consumed twice (the
    # IN-pushdown collect below and the scoring join), so the expensive
    # tokenization — and the whole typo-tolerant similarity join — must
    # not re-run per consumer, and a non-deterministic queries source
    # must not be able to yield a prune term set inconsistent with the
    # join's (silent truncation). See materialize_query_relation.
    q = materialize_query_relation(q)

    p = index.postings
    if accept_min_ndocs is not None:
        p = p.filter(F.col("ndocs") >= accept_min_ndocs)
    if accept_max_ndocs is not None:
        p = p.filter(F.col("ndocs") <= accept_max_ndocs)
    p = prune_postings_by_terms(p, q)

    # queries are the tiny side: broadcast them so the big postings
    # relation is never shuffled — the join degenerates to a hash-probe
    # per postings partition (the distributed select_posting_lists)
    joined = p.join(F.broadcast(q), "token")
    scored = joined.groupBy(id_col, "doc_id").agg(F.sum("impact").alias("score"))
    return salted_topk(scored, id_col, "score", k)


def salted_topk(scored: DataFrame, id_col: str, score_col: str,
                k: int) -> DataFrame:
    """Salted two-phase top-k over ``(id_col, doc_id, score_col)`` rows
    — shared by the BM25 and cosine scorers so the tie-order argument
    below can never diverge between them.

    The final per-query window alone would shuffle EVERY scored
    (query, doc) row of one query into a single task — a query
    containing a stop-wordish term scores a large fraction of the
    corpus, so at 100× that one straggler task holds millions of rows.
    Phase 1 takes the top-k per (query, input partition) — any row in
    the global top-k beats fewer than k rows globally, hence fewer
    than k within its own partition, so the local top-k is a superset
    of the global answer and ranks are identical by construction.
    Phase 2's window then sees at most k × shuffle_partitions rows per
    query. Tie order (score desc, doc_id asc) is applied in BOTH
    phases — the superset argument needs the IDENTICAL total order, so
    a tie-break change must land in both or ranks break."""
    order = (F.desc(score_col), F.asc("doc_id"))
    w_local = Window.partitionBy(id_col, "_pid").orderBy(*order)
    pre = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrank", F.row_number().over(w_local))
        .filter(F.col("_lrank") <= k)
        .drop("_pid", "_lrank")
    )
    w = Window.partitionBy(id_col).orderBy(*order)
    return (
        pre.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "doc_id", score_col)
    )


def search_bm25_text(index: BM25Index, qtext: str, k: int = 10) -> DataFrame:
    """One-off single-query convenience (reference: search entry,
    src/bm25invfilesearch.jl:32-35)."""
    spark = index.spark
    q = spark.createDataFrame([(0, qtext)], "query_id long, qtext string")
    return search_bm25(index, q, k).select("rank", "doc_id", "score")
