"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All are pure column/window expressions (whole-stage codegen; no Python),
and each has an exact DuckDB oracle in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# compact stopword profiles for the n-gram/stopword-ratio heuristic
LANG_PROFILES = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "for", "with", "this", "that", "it"],
    "es": ["la", "el", "de", "que", "y", "en", "un", "una", "es", "los", "del", "se"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "que", "dans", "pour"],
}


def _tokens(df: DataFrame, doc_col: str, text_col: str) -> DataFrame:
    return df.select(F.col(doc_col), F.explode(F.split(F.col(text_col), " ")).alias("w"))


def lang_id(df: DataFrame, *, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, hit_ratio) — language with the highest
    stopword hit ratio; ties break alphabetically, no hits -> 'und'."""
    toks = _tokens(df, doc_col, text_col)
    # case-insensitive match: the profiles are lowercase, and counting
    # 'The' as a miss systematically deflates hit ratios (a short doc
    # whose only stopwords are sentence-initial would land on 'und')
    hits = [
        F.avg(F.when(F.lower(F.col("w")).isin(LANG_PROFILES[lang]), 1.0)
              .otherwise(0.0)).alias(f"r_{lang}")
        for lang in sorted(LANG_PROFILES)
    ]
    agg = toks.groupBy(doc_col).agg(*hits)
    langs = sorted(LANG_PROFILES)
    best = F.greatest(*[F.col(f"r_{l}") for l in langs])
    pred = F.when(best <= 0.0, F.lit("und"))
    for l in langs:  # alphabetical: first match wins ties
        pred = pred.when(F.col(f"r_{l}") == best, F.lit(l))
    return agg.select(
        doc_col, pred.alias("lang_pred"), F.round(best, 4).alias("hit_ratio"),
    )


def quality_score(df: DataFrame, *, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, mean_word_len, stopword_ratio, ttr, quality) —
    simple composable quality heuristics: type-token ratio, stopword
    ratio, mean word length, combined into [0,1]."""
    toks = _tokens(df, doc_col, text_col)
    sw = LANG_PROFILES["en"]
    agg = toks.groupBy(doc_col).agg(
        F.count("*").alias("n_words"),
        F.avg(F.length("w")).alias("mwl"),
        F.avg(F.when(F.lower(F.col("w")).isin(sw), 1.0).otherwise(0.0)).alias("swr"),
        (F.count_distinct("w") / F.count("*")).alias("ttr"),
    )
    # the composite is computed from the 4dp-rounded components so it is
    # bit-reproducible across engines/summation orders (oracle parity)
    agg = agg.select(
        doc_col,
        F.col("n_words").cast("long").alias("n_words"),
        F.round("mwl", 4).alias("mean_word_len"),
        F.round("swr", 4).alias("stopword_ratio"),
        F.round("ttr", 4).alias("ttr"),
    )
    quality = (
        F.least(F.col("n_words") / 100.0, F.lit(1.0)) * 0.3
        + F.least(F.col("mean_word_len") / 8.0, F.lit(1.0)) * 0.2
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.2
        + F.col("ttr") * 0.3
    )
    # deliberately UNROUNDED: the inputs are 4dp-rounded deterministic
    # doubles and the op order is fixed, so the composite is bit-identical
    # across engines — while rounding it would land exactly on decimal
    # rounding boundaries (it lives on a fine decimal grid) where Spark's
    # BigDecimal-HALF_UP and DuckDB's multiply-then-round disagree
    return agg.withColumn("quality", quality)


def token_counts(df: DataFrame, *, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, subword_tokens, n_chars) — whitespace token
    count and a BPE-ish subword proxy: each NON-EMPTY whitespace token
    contributes ceil(len/4) pieces (a length-calibrated approximation
    of typical byte-pair merge counts, not run segmentation). Empty
    strings from consecutive/leading/trailing spaces are excluded —
    counting them inflated ws_tokens past subword_tokens, violating
    the subword >= ws invariant the proxy guarantees."""
    piece = F.explode(F.split(F.col(text_col), " "))
    pieces = df.select(F.col(doc_col), piece.alias("w")).filter(F.col("w") != "")
    sub = pieces.groupBy(doc_col).agg(
        F.count("*").alias("ws_tokens"),
        F.sum(F.ceil(F.length("w") / 4.0)).cast("long").alias("subword_tokens"),
    )
    return sub.join(
        df.select(F.col(doc_col), F.length(text_col).cast("long").alias("n_chars")), doc_col
    ).select(doc_col, "ws_tokens", "subword_tokens", "n_chars")


def fingerprint_winnow(df: DataFrame, *, doc_col: str = "doc_id", text_col: str = "text",
                       k: int = 4, window: int = 5) -> DataFrame:
    """Winnowing document fingerprints: hash k-token shingles (md5 hex,
    engine-portable), take the min hash in every FULL sliding window of
    ``window`` shingles, emit the distinct fingerprint set per doc:
    (doc_id, fingerprint). Partial trailing windows are excluded —
    suffix minima that are not the min of any full window would inflate
    fingerprint overlap between docs sharing only trailing text. A doc
    with fewer than ``window`` shingles (no full window at all) emits
    the min over its whole shingle set, so every doc with at least one
    shingle keeps a fingerprint."""
    toks = df.select(
        F.col(doc_col), F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w")
    )
    wdoc = Window.partitionBy(doc_col).orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(wdoc) for i in range(1, k)]
    sh = toks.select(
        doc_col, "pos", F.concat_ws(" ", *parts).alias("shingle"),
        F.lead("w", k - 1).over(wdoc).alias("__last"),
    ).filter(F.col("__last").isNotNull())
    hashed = sh.select(doc_col, "pos", F.md5("shingle").alias("h"))
    wwin = Window.partitionBy(doc_col).orderBy("pos").rowsBetween(0, window - 1)
    fp = hashed.select(
        doc_col,
        F.min("h").over(wwin).alias("fingerprint"),
        F.count("*").over(wwin).alias("__wn"),
        F.count("*").over(Window.partitionBy(doc_col)).alias("__total"),
        F.row_number().over(Window.partitionBy(doc_col).orderBy("pos")).alias("__rn"),
    ).filter(
        (F.col("__wn") == window)
        | ((F.col("__total") < window) & (F.col("__rn") == 1))
    )
    return fp.select(doc_col, "fingerprint").distinct()
