"""Typo-tolerant vocabulary lookup via character 3-gram Jaccard.

Mirrors the reference's QgramsLookup (src/approxvoc.jl:25-57): vocabulary
tokens are indexed by their binary 3-gram sets (TextConfig(qlist=[3]),
boundary blanks included); an unknown query token resolves to the
nearest vocabulary token under Jaccard distance, accepted when
dist <= maxdist (default 0.7). Popular q-grams are pruned on the index
side (doc_max_ratio, src/approxvoc.jl:31) — the same stop-term guard the
BM25 side uses.

Expressed as a set-similarity join: explode both sides' q-gram sets,
count shared grams per (query, token), Jaccard from set sizes. Ties
break by (distance, token) for determinism (the reference's KnnResult(1)
tie order is unspecified).

The vocabulary-side q-gram inverted file is INDEX-TIME state, exactly
like the reference building QgramsLookup once at construction
(src/approxvoc.jl:25-44): ``build_qgram_index`` materializes the pruned
(gram, vtoken, vsz) relation, ``sources.io.save_index`` persists it
under ``qgrams/`` next to postings/blocks, and the typo-tolerant query
path reads that table — the per-batch plan never re-explodes the whole
vocabulary (r03 verdict item 4; the pre-r04 shape paid a full
vocab-scan explode+groupBy tax on every typo-tolerant batch).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import TextConfig
from ..functions.udfs import exploded_tokens

_QCFG = TextConfig(qlist=[3])


def _qgram_sets(tokens_df: DataFrame, key: str) -> DataFrame:
    """(key, gram) distinct q-gram rows for each token string."""
    g = exploded_tokens(tokens_df, _QCFG, doc_col=key, text_col="token")
    return g.withColumnRenamed("token", "gram").distinct()


def build_qgram_index(
    vocab: DataFrame,
    *,
    doc_min_freq: int = 1,
    doc_max_ratio: float = 0.4,
) -> DataFrame:
    """The construct-once vocabulary 3-gram inverted file
    (src/approxvoc.jl:25-44): (gram, vtoken, vsz) with stop-grams
    pruned (grams hitting more than ``doc_max_ratio`` of the vocabulary
    or fewer than ``doc_min_freq`` tokens), ``vsz`` = the token's
    surviving gram-set size. One vocab-wide pass; persist the result
    with the index and reuse it for every typo-tolerant batch."""
    vtok = vocab.select("token")
    vgrams = _qgram_sets(vtok.withColumnRenamed("token", "vtoken").withColumn(
        "token", F.col("vtoken")).select("vtoken", "token"), key="vtoken")
    n_tokens = vtok.count()
    gram_df = vgrams.groupBy("gram").agg(F.count("*").alias("gdf"))
    keep = gram_df.filter(
        (F.col("gdf") >= doc_min_freq) & (F.col("gdf") <= doc_max_ratio * n_tokens)
    ).select("gram")
    vgrams = vgrams.join(keep, "gram")
    wsz = Window.partitionBy("vtoken")
    return vgrams.withColumn("vsz", F.count("*").over(wsz)).select("gram", "vtoken", "vsz")


def approx_lookup(
    vocab: DataFrame,
    query_tokens: DataFrame,
    *,
    maxdist: float = 0.7,
    doc_min_freq: int = 1,
    doc_max_ratio: float = 0.4,
    qgram_index: Optional[DataFrame] = None,
) -> DataFrame:
    """vocab (token, occs, ndocs) × query_tokens (qtoken) ->
    (qtoken, match_token, dist); exact hits resolve at distance 0,
    misses with best dist > maxdist are dropped (id 0 in the reference).

    ``qgram_index``: a persisted ``build_qgram_index`` table. When
    given, the per-batch plan joins against it directly (one scan of a
    vocab-sized table, prunable by gram); when None, it is derived from
    ``vocab`` inline — correct but a vocab-wide explode per call.
    """
    vtok = vocab.select("token")
    if qgram_index is None:
        qgram_index = build_qgram_index(
            vocab, doc_min_freq=doc_min_freq, doc_max_ratio=doc_max_ratio)
    vgrams = qgram_index.select("gram", "vtoken")
    vsizes = qgram_index.select("vtoken", "vsz").distinct()
    keep = qgram_index.select("gram").distinct()

    qtok = query_tokens.select("qtoken").distinct()
    exact = qtok.join(vtok, qtok.qtoken == vtok.token, "inner").select(
        "qtoken", F.col("token").alias("match_token"), F.lit(0.0).alias("dist")
    )
    # reference short-circuit (src/approxvoc.jl token2id: an exact hit
    # returns before any q-gram work): only the OOV tail enters the
    # set-similarity join. In-vocab terms — the overwhelming majority
    # of a typical batch — never pay the explode/join/window; the
    # pre-r04 shape ran the full fuzzy join for every term and
    # anti-joined the exact hits away afterwards.
    miss = qtok.join(vtok, qtok.qtoken == vtok.token, "left_anti")
    qgrams = _qgram_sets(miss.withColumn("token", F.col("qtoken")).select("qtoken", "token"),
                         key="qtoken").join(keep, "gram")
    qsizes = qgrams.groupBy("qtoken").agg(F.count("*").alias("qsz"))

    inter = (
        qgrams.join(vgrams, "gram")
        .groupBy("qtoken", "vtoken")
        .agg(F.count("*").alias("inter"))
    )
    dist = (
        inter.join(qsizes, "qtoken").join(vsizes, "vtoken")
        .withColumn("dist", 1.0 - F.col("inter") / (F.col("qsz") + F.col("vsz") - F.col("inter")))
    )
    w = Window.partitionBy("qtoken").orderBy(F.asc("dist"), F.asc("vtoken"))
    best = dist.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1").drop("__rn")

    fuzzy = (
        best.filter(F.col("dist") <= maxdist)
        .select("qtoken", F.col("vtoken").alias("match_token"), F.round("dist", 4).alias("dist"))
    )
    return exact.unionByName(fuzzy)
