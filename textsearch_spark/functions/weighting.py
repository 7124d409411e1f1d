"""VectorModel weighting schemes and the vectorize pipeline.

Mirrors the reference's VectorModel (src/vmodel.jl:88-254) and
EntropyWeighting (src/emodel.jl) over long-form sparse vectors
``(doc_id, token, weight)``:

- local weightings (src/vmodel.jl:249-252): tf = freq/max-freq-in-doc,
  tp = freq/doc-token-count, freq, binary;
- global weightings: idf = log2((0.5+N)/(0.5+ndocs_t))
  (src/vmodel.jl:253), binary, entropy (label-conditional, src/emodel.jl);
- combine w = lw*gw, keep w >= minweight, then L2-normalize per doc;
  an empty vector gets the sentinel entry {0: 1.0}
  (src/vmodel.jl:196-206) — represented here by the reserved token
  ``EMPTY_SENTINEL`` so dot products between empty vectors equal 1.

All math is native Spark columns/windows; the only Python is the
tokenizer UDF upstream.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import TextConfig
from ..functions.udfs import exploded_tokens
from ..operators.vocab import bow_from_tokens, vocab_from_bow

LOCAL_WEIGHTINGS = ("tf", "tp", "freq", "binary")
GLOBAL_WEIGHTINGS = ("idf", "binary", "entropy")

# stands in for the reference's OOV id 0 used as the empty-vector
# sentinel key; NUL never appears in real tokens
EMPTY_SENTINEL = "\x00"


@dataclass
class VectorModel:
    """(reference: src/vmodel.jl:88-110). ``vocab`` carries the
    precomputed global weight per token in ``gweight``."""

    cfg: TextConfig
    local_weighting: str
    global_weighting: str
    vocab: DataFrame          # (token, occs, ndocs, gweight)
    corpuslen: int
    maxoccs: int


def _global_weight_col(global_weighting: str, corpuslen: int):
    if global_weighting == "idf":
        return F.log2((0.5 + corpuslen) / (0.5 + F.col("ndocs")))
    if global_weighting == "binary":
        return F.lit(1.0)
    raise ValueError(f"unknown global weighting {global_weighting!r}")


def fit_vector_model(
    df: DataFrame,
    cfg: TextConfig,
    *,
    local_weighting: str = "tf",
    global_weighting: str = "idf",
    doc_col: str = "doc_id",
    text_col: str = "text",
    label_col: Optional[str] = None,
    multi: bool = False,
    smooth: float = 3.0,
    mindocs: int = 3,
    class_weights: str = "balance",
    comb: str = "normalized_entropy",
    lowerweight: float = 0.0,
) -> VectorModel:
    """Fit vocabulary + global weights (reference: VectorModel
    constructor src/vmodel.jl:96-110; entropy variant src/emodel.jl:51-81).

    ``comb`` selects the entropy CombineWeighting (src/emodel.jl:6-16);
    ``lowerweight`` is the weight assigned below ``mindocs``
    (src/emodel.jl:19-22 docstring parameter; reference default 0.0).
    """
    assert local_weighting in LOCAL_WEIGHTINGS
    assert global_weighting in GLOBAL_WEIGHTINGS
    corpuslen = df.count()
    # ``multi`` mirrors vectorize(): the model must be FIT with the same
    # tokenization it will vectorize with, or multi-message corpora fit
    # through an accidental duck-typed path
    tokens = exploded_tokens(df, cfg, doc_col=doc_col, text_col=text_col,
                             multi=multi)
    bow = bow_from_tokens(tokens, doc_col=doc_col)
    if global_weighting == "entropy":
        # only the entropy branch reads bow twice (vocab + label join);
        # caching it for the single-consumer idf/binary path pinned the
        # fit's largest intermediate for nothing
        bow = bow.cache()
    vocab = vocab_from_bow(bow)

    if global_weighting == "entropy":
        if label_col is None:
            raise ValueError("entropy weighting needs label_col")
        labels = df.select(F.col(doc_col), F.col(label_col).alias("label"))
        vocab = _entropy_weights(
            bow.withColumnRenamed(doc_col, "doc_id") if doc_col != "doc_id" else bow,
            vocab, labels.withColumnRenamed(doc_col, "doc_id") if doc_col != "doc_id" else labels,
            smooth=smooth, mindocs=mindocs, class_weights=class_weights,
            comb=comb, lowerweight=lowerweight,
        )
    else:
        vocab = vocab.withColumn("gweight", _global_weight_col(global_weighting, corpuslen))

    vocab = vocab.cache()
    maxoccs = vocab.agg(F.max("occs")).collect()[0][0] or 0  # fills the cache
    if global_weighting == "entropy":
        bow.unpersist()  # vocab is materialized; bow has no more readers
    return VectorModel(cfg, local_weighting, global_weighting, vocab, corpuslen, int(maxoccs))


ENTROPY_COMBINERS = (
    "normalized_entropy", "penalize_few_samples", "sigmoid_penalize_few_samples",
)


def _entropy_weights(bow: DataFrame, vocab: DataFrame, labels: DataFrame, *,
                     smooth: float, mindocs: int, class_weights: str,
                     comb: str = "normalized_entropy",
                     lowerweight: float = 0.0) -> DataFrame:
    """Label-conditional entropy weighting (src/emodel.jl:51-111).

    D[class, token] = smooth + #docs of that class containing token
    (distinct per doc, src/emodel.jl:68-73). With :balance class
    weights W_c = sum(W)/W_c where W_c = sum_t D[c, t]. The per-token
    weight applies the selected CombineWeighting (src/emodel.jl:6-16):

    - ``normalized_entropy``: 1 - H/maxent
    - ``penalize_few_samples``: (maxent - H) * log2(ndocs_t)
    - ``sigmoid_penalize_few_samples``:
      (1 - H/maxent) * (1 - 1/(1 + log2(ndocs_t)))

    with ``lowerweight`` assigned when ndocs_t < mindocs
    (src/emodel.jl:19-22, default 0.0).
    """
    classes = [r.label for r in labels.select("label").distinct().orderBy("label").collect()]
    nclasses = len(classes)
    vocsize = vocab.count()

    # distinct (doc, token) -> per (token, class) doc counts
    dt = bow.select("doc_id", "token").join(labels, "doc_id")
    counts = dt.groupBy("token", "label").agg(F.count("*").alias("cnt"))

    # class weights need per-class totals over the *smoothed* matrix
    totals = {r.label: r.total for r in counts.groupBy("label").agg(F.sum("cnt").alias("total")).collect()}
    w_c = {c: smooth * vocsize + float(totals.get(c, 0)) for c in classes}
    if class_weights == "balance":
        s = sum(w_c.values())
        w_c = {c: (s / w) if w else 0.0 for c, w in w_c.items()}
    elif class_weights in ("none", None):
        w_c = {c: 1.0 for c in classes}
    else:
        raise ValueError(f"unknown class_weights {class_weights!r}")

    maxent = math.log2(nclasses) if nclasses > 1 else 1.0

    # pivot to one row per token with per-class smoothed+weighted counts,
    # then the entropy is a closed-form column expression
    pivoted = counts.groupBy("token").pivot("label", classes).agg(F.first("cnt"))
    pivoted = vocab.join(pivoted, "token", "left")
    dist_cols = [
        ((F.coalesce(F.col(f"`{c}`"), F.lit(0)) + F.lit(smooth)) * F.lit(w_c[c])).alias(f"__d{i}")
        for i, c in enumerate(classes)
    ]
    pivoted = pivoted.select("token", "occs", "ndocs", *dist_cols)
    total = sum((F.col(f"__d{i}") for i in range(nclasses)), F.lit(0.0))
    ent = sum(
        (
            F.when(
                F.col(f"__d{i}") > 0,
                -(F.col(f"__d{i}") / total) * F.log2(F.col(f"__d{i}") / total),
            ).otherwise(0.0)
            for i in range(nclasses)
        ),
        F.lit(0.0),
    )
    if comb == "normalized_entropy":
        combined = 1.0 - ent / maxent
    elif comb == "penalize_few_samples":
        combined = (F.lit(maxent) - ent) * F.log2(F.col("ndocs"))
    elif comb == "sigmoid_penalize_few_samples":
        combined = (1.0 - ent / maxent) * (1.0 - 1.0 / (1.0 + F.log2(F.col("ndocs"))))
    else:
        raise ValueError(f"unknown entropy combiner {comb!r}; one of {ENTROPY_COMBINERS}")
    gw = F.when(F.col("ndocs") < mindocs, F.lit(float(lowerweight))).otherwise(combined)
    return pivoted.withColumn("gweight", gw).select("token", "occs", "ndocs", "gweight")


def vectorize(
    model: VectorModel,
    df: DataFrame,
    *,
    doc_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
    minweight: float = 1e-6,
    multi: bool = False,
) -> DataFrame:
    """docs -> (doc_id, token, weight) sparse vectors
    (reference: vectorize_corpus, src/vmodel.jl:181-244)."""
    tokens = exploded_tokens(df, model.cfg, doc_col=doc_col, text_col=text_col, multi=multi)
    bow = bow_from_tokens(tokens, doc_col=doc_col)
    return vectorize_bow(model, bow, doc_col=doc_col, normalize=normalize,
                         minweight=minweight, all_docs=df.select(doc_col))


def vectorize_bow(
    model: VectorModel,
    bow: DataFrame,
    *,
    doc_col: str = "doc_id",
    normalize: bool = True,
    minweight: float = 1e-6,
    all_docs: Optional[DataFrame] = None,
) -> DataFrame:
    """Weight + threshold + L2-normalize a BOW (src/vmodel.jl:181-209).

    ``all_docs``: when given, docs whose vector comes out empty get the
    sentinel entry (EMPTY_SENTINEL, 1.0) like the reference's {0: 1f0}.
    """
    # OOV drops via the inner vocab join (bagofwords semantics)
    x = bow.join(model.vocab.select("token", "gweight"), "token")

    wdoc = Window.partitionBy(doc_col)
    lw = model.local_weighting
    if lw == "tf":
        local = F.col("tf") / F.max("tf").over(wdoc)
    elif lw == "tp":
        local = F.col("tf") / F.sum("tf").over(wdoc)
    elif lw == "freq":
        local = F.col("tf").cast("double")
    elif lw == "binary":
        local = F.lit(1.0)
    else:
        raise ValueError(lw)

    x = x.withColumn("__w", local * F.col("gweight")).filter(F.col("__w") >= minweight)
    if normalize:
        norm = F.sqrt(F.sum(F.col("__w") * F.col("__w")).over(wdoc))
        x = x.withColumn("__w", F.col("__w") / norm)
    out = x.select(doc_col, "token", F.col("__w").alias("weight"))

    if all_docs is not None:
        empty = all_docs.select(doc_col).join(out.select(doc_col).distinct(), doc_col, "left_anti")
        sentinel = empty.select(
            doc_col, F.lit(EMPTY_SENTINEL).alias("token"), F.lit(1.0).alias("weight")
        )
        out = out.unionByName(sentinel)
    return out


def filter_model_tokens(model: VectorModel, predicate_sql: str) -> VectorModel:
    """Keep vocab entries satisfying a predicate over
    (token, occs, ndocs, gweight) — the reference's
    filter_tokens(pred, model) (src/vmodel.jl:164-178)."""
    return replace(model, vocab=model.vocab.filter(predicate_sql))


def prune_model_quantile(model: VectorModel, p: float) -> VectorModel:
    """Drop vocab entries whose global weight falls below the p-quantile
    of the model's weights — the reference's quantile pruning
    ``q = quantile(model.weight, p); filter_tokens(t -> q <= t.weight, model)``
    (/root/reference/test/vec.jl:63-89). Spark's ``percentile`` and
    Julia's default quantile are both type-7 linear interpolation."""
    q = model.vocab.agg(F.expr(f"percentile(gweight, {p})")).collect()[0][0]
    return replace(model, vocab=model.vocab.filter(F.col("gweight") >= q))


def dot_products(a: DataFrame, b: DataFrame, *, doc_col: str = "doc_id") -> DataFrame:
    """Pairwise dot products of equal-doc_id vectors from two vector
    tables — (doc_id, dot). Long-form join+agg (src/dvec.jl:124-136).

    Matches the reference's dot semantics for disjoint vectors: every
    doc_id present in EITHER table gets a row, with dot = 0.0 when the
    two vectors share no token (the reference returns 0.0 there; a bare
    inner join would silently drop those docs from the output)."""
    aa = a.select(doc_col, "token", F.col("weight").alias("wa"))
    bb = b.select(doc_col, "token", F.col("weight").alias("wb"))
    ids = aa.select(doc_col).union(bb.select(doc_col)).distinct()
    dots = (
        aa.join(bb, [doc_col, "token"])
        .groupBy(doc_col)
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    return ids.join(dots, doc_col, "left").withColumn(
        "dot", F.coalesce(F.col("dot"), F.lit(0.0)))
