"""Vectorized Arrow/pandas UDF wrappers around the pure tokenizer kernel.

The reference parallelizes tokenization with ``Threads.@threads`` over an
in-memory corpus (src/tokenize.jl:92-105); here Spark's partition/task
parallelism plays that role and the kernel runs over Arrow batches, never
per-row Python on the driver.
"""

from __future__ import annotations

from typing import Union

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from ..config import TextConfig
from .normalize import normalize_text
from .tokenizer import tokenize


def tokenize_udf(cfg: TextConfig):
    """Returns a pandas UDF ``string -> array<string>`` tokenizing with
    ``cfg``. The config is captured in the closure and shipped once per
    task via Spark's broadcast of the serialized function."""

    @pandas_udf(ArrayType(StringType()))
    def _tok(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: tokenize(cfg, t))

    return _tok


def tokenize_multi_udf(cfg: TextConfig):
    """Tokenize an ``array<string>`` multi-message document into one
    token stream (reference: src/tokenize.jl:50-61)."""

    @pandas_udf(ArrayType(StringType()))
    def _tok(msgs: pd.Series) -> pd.Series:
        return msgs.map(lambda arr: tokenize(cfg, None if arr is None else list(arr)))

    return _tok


def normalize_udf(cfg: TextConfig, limits: bool = False):
    """Returns a pandas UDF ``string -> string`` applying only the
    normalization pipeline (reference: src/normalize.jl:50-66)."""

    @pandas_udf(StringType())
    def _norm(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: "" if t is None else normalize_text(cfg, t, limits=limits))

    return _norm


def with_tokens(df: DataFrame, cfg: TextConfig, *, text_col: str = "text",
                out_col: str = "tokens", multi: bool = False) -> DataFrame:
    """Adds an ``array<string>`` token column."""
    udf = tokenize_multi_udf(cfg) if multi else tokenize_udf(cfg)
    return df.withColumn(out_col, udf(F.col(text_col)))


def bow_long(df: DataFrame, cfg: TextConfig, *, doc_col: str = "doc_id",
             text_col: str = "text", multi: bool = False) -> DataFrame:
    """(doc_id, token, tf, doclen) computed entirely inside the Arrow
    batch: the per-doc bag-of-words is a Counter where the doc already
    lives, so the (doc_id, token) aggregation needs NO shuffle — the
    reference's per-thread BOW accumulation (src/bow.jl:14-23) without
    the shared-dict locks. ``doclen`` is the doc's total (pre-filter)
    token count."""
    from collections import Counter

    import numpy as np

    schema = f"{doc_col} long, token string, tf long, doclen long"

    def gen(batches):
        for pdf in batches:
            docs, toks, tfs, dls = [], [], [], []
            for did, text in zip(pdf[doc_col], pdf[text_col]):
                tokens = tokenize(cfg, None if text is None else (list(text) if multi else text))
                if not tokens:
                    continue
                c = Counter(tokens)
                docs.extend([did] * len(c))
                toks.extend(c.keys())
                tfs.extend(c.values())
                dls.extend([len(tokens)] * len(c))
            yield pd.DataFrame({
                doc_col: np.asarray(docs, dtype=np.int64),
                "token": toks,
                "tf": np.asarray(tfs, dtype=np.int64),
                "doclen": np.asarray(dls, dtype=np.int64),
            })

    return df.select(doc_col, text_col).mapInPandas(gen, schema)


def exploded_tokens(df: DataFrame, cfg: TextConfig, *, doc_col: str = "doc_id",
                    text_col: str = "text", multi: bool = False) -> DataFrame:
    """Long-form ``(doc_id, token)`` rows — Spark's idiom for the
    reference's per-doc token vectors. Docs that tokenize to nothing
    contribute no rows (they still count toward corpus size, which is
    taken from the source DataFrame)."""
    tok = with_tokens(df, cfg, text_col=text_col, multi=multi)
    return tok.select(F.col(doc_col), F.explode("tokens").alias("token"))
