"""Compressed posting-block construction (the north rule's at-scale path).

The reference stores postings as docID-sorted in-memory adjacency lists
(src/bm25invfile.jl:61-71, add_edge! at :133-139). Here postings become
**doc-range-aligned compressed blocks**:

    blocks(token, block_id, n, first_doc, last_doc, ndocs, max_impact, blob)

with ``block_id = doc_id div span``. Design properties, chosen for
10^12-doc scale:

- **bounded groups, no term skew**: the groupBy key is (token,
  block_id); a group holds at most ``span`` postings, no matter how
  frequent the term. A stop-wordish term that appears in 10^11 docs
  simply produces many block rows spread over the cluster — no giant
  single-reducer list, which is the salted two-phase pattern the north
  rule requires. Sorted runs are built per shuffle partition and the
  block table is itself the hierarchically-merged result.
- **aligned ranges across terms**: every term's block b covers the same
  doc interval [b*span, (b+1)*span). The WAND scorer exploits this: the
  upper bound of a doc range is the sum of the participating terms'
  block maxima, and a document's full score is computable within one
  range — block-max pruning without cross-range state.
- **doclen inlined**: each posting carries (delta docID, tf, doclen)
  (codec.py), so query-time scoring never needs a random lookup into a
  10^12-row doclens table.
- **block-max metadata**: max_impact = max BM25 contribution within the
  block, delta term included (it is part of every match's score).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

from ..functions.codec import encode_block

DEFAULT_BLOCK_SPAN = 4096


@pandas_udf(BinaryType())
def _encode_entries(entries: pd.Series) -> pd.Series:
    import numpy as np

    def enc(arr):
        # arr: list of Rows (doc_id, tf, doclen), already docID-sorted
        docs = np.fromiter((e["doc_id"] for e in arr), dtype=np.uint64, count=len(arr))
        tfs = np.fromiter((e["tf"] for e in arr), dtype=np.uint64, count=len(arr))
        dls = np.fromiter((e["doclen"] for e in arr), dtype=np.uint64, count=len(arr))
        return encode_block(docs, tfs, dls)

    return entries.map(enc)


def build_posting_blocks(postings: DataFrame, *, span: int = DEFAULT_BLOCK_SPAN) -> DataFrame:
    """postings (token, doc_id, tf, doclen, ndocs, impact) -> block table.

    One shuffle on (token, block_id); sort_array produces the docID
    order inside each block (the reference's IdOrder insert,
    src/bm25invfile.jl:133-139), and the vbyte encode runs vectorized
    per block in an Arrow UDF.
    """
    p = postings.withColumn("block_id", (F.col("doc_id") / span).cast("long"))
    agg = p.groupBy("token", "block_id").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "tf", "doclen"))).alias("entries"),
        F.count("*").alias("n"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.first("ndocs").alias("ndocs"),
        F.max("impact").alias("max_impact"),
    )
    return agg.select(
        "token", "block_id", "n", "first_doc", "last_doc", "ndocs", "max_impact",
        F.lit(span).alias("span"),
        _encode_entries(F.col("entries")).alias("blob"),
    )
