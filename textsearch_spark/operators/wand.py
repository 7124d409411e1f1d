"""Block-max WAND top-k scorer over compressed posting blocks.

Replaces the reference's k-way union merge + KnnResult
(xmerge! at src/bm25invfilesearch.jl:37-45, onmatch! at :10-24) with a
distributed, pruned equivalent:

1. query terms (tiny, broadcast) join the block table on token — the
   distributed ``select_posting_lists``;
2. candidate blocks are grouped by (query_id, bucket) where
   ``bucket = block_id mod n_buckets``: each group owns complete doc
   ranges, so every document's full score is computable locally
   (ranges are aligned across terms, see operators/postings.py);
3. inside each group an Arrow-batched kernel runs range-synchronized
   block-max WAND: doc ranges are visited in descending upper bound
   (sum of the participating terms' block maxima); once the running
   k-th best score exceeds the next range's bound, the remaining
   ranges — and their decompression — are skipped. Rank-safe: a
   skipped doc's true score is <= its range bound < theta;
4. a final top-k window merges the per-bucket candidates.

Scores are float64 and per-doc summation is done in a fixed token
order, so results are rank-identical to the naive Catalyst scorer
(operators/search.py) — differential-tested in tests/test_wand.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import FoldedBM25
from ..functions.bm25 import tokenscore_np
from ..functions.codec import decode_block
from ..plans.build import BM25Index
from .search import query_tokens

_OUT_SCHEMA = "query_id long, doc_id long, score double"


def _score_ranges_kernel(bm25: FoldedBM25, k: int):
    """Returns the applyInPandas kernel: candidate blocks of one
    (query, bucket) group -> local top-k (query_id, doc_id, score)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []})
        qid = int(pdf["query_id"].iloc[0])

        # upper bound per doc range = sum of block maxima in the range
        ub = pdf.groupby("block_id")["max_impact"].sum().sort_values(ascending=False)

        top_docs = np.empty(0, dtype=np.int64)
        top_scores = np.empty(0, dtype=np.float64)
        theta = -np.inf

        by_block = pdf.groupby("block_id", sort=False)
        for block_id, bound in ub.items():
            if len(top_docs) >= k and bound < theta:
                break  # every remaining range is bounded lower — skip (BMW prune)
            rows = by_block.get_group(block_id)
            # deterministic per-doc summation order: sort terms by token
            rows = rows.sort_values("token", kind="mergesort")
            docs_l, scores_l = [], []
            for blob, nd in zip(rows["blob"], rows["ndocs"]):
                d, tf, dl = decode_block(bytes(blob))
                docs_l.append(d.astype(np.int64))
                scores_l.append(tokenscore_np(bm25, np.full(len(d), float(nd)), dl, tf))
            docs = np.concatenate(docs_l)
            scores = np.concatenate(scores_l)
            # complete within-range scores: stable group-sum keyed by doc
            order = np.argsort(docs, kind="mergesort")
            docs, scores = docs[order], scores[order]
            uniq, inv = np.unique(docs, return_inverse=True)
            sums = np.zeros(len(uniq))
            np.add.at(sums, inv, scores)

            top_docs = np.concatenate([top_docs, uniq])
            top_scores = np.concatenate([top_scores, sums])
            if len(top_docs) > k:
                # keep local top-k: sort by (-score, doc) and truncate
                sel = np.lexsort((top_docs, -top_scores))[:k]
                top_docs, top_scores = top_docs[sel], top_scores[sel]
            if len(top_docs) >= k:
                theta = top_scores.min()

        return pd.DataFrame({
            "query_id": np.full(len(top_docs), qid, dtype=np.int64),
            "doc_id": top_docs,
            "score": top_scores,
        })

    return kernel


def search_bm25_wand(
    index: BM25Index,
    queries: DataFrame,
    k: int = 10,
    *,
    query_col: str = "qtext",
    id_col: str = "query_id",
    n_buckets: Optional[int] = None,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — rank-identical to search_bm25.

    ``n_buckets`` controls the per-query parallelism of the scoring
    stage (default: the session's shuffle partitions). More buckets =
    more parallelism but weaker pruning (theta is per bucket).
    """
    assert index.blocks is not None, "build_posting_blocks first (or io.load_index)"
    spark = index.spark
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    q = query_tokens(index, queries, query_col=query_col, id_col=id_col)
    if id_col != "query_id":
        q = q.withColumnRenamed(id_col, "query_id")

    from .search import prune_postings_by_terms

    blocks = prune_postings_by_terms(index.blocks, q)
    cand = blocks.join(F.broadcast(q), "token").withColumn(
        "bucket", F.pmod(F.col("block_id"), F.lit(n_buckets))
    )
    local = cand.groupBy("query_id", "bucket").applyInPandas(
        _score_ranges_kernel(index.bm25, k), _OUT_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("query_id").alias(id_col), "rank", "doc_id", "score")
    )
    return out
