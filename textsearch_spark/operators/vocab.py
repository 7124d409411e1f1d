"""Vocabulary construction as native Spark aggregations.

The reference builds its Vocabulary with a lock-striped shared hash
aggregate across threads (src/voc.jl:106-158); Spark's partial+final
hash aggregation computes the identical statistics with no locks — the
map-side partial agg collapses each token within a partition *before*
the shuffle, which is exactly the salted partial->final merge pattern
the north rule asks for, and it is what makes high-frequency terms
(stop-word skew) a non-issue for the counting stages.

Token ids: the reference assigns ids by thread-nondeterministic
insertion order and its own tests never pin them (SURVEY §2i). We key
everything by the token string; when a dense integer id is needed
(EncodedCorpus export), a deterministic rank by (ndocs desc, token) is
used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import TextConfig
from ..functions.udfs import exploded_tokens


def bow_from_tokens(tokens: DataFrame, *, doc_col: str = "doc_id") -> DataFrame:
    """Bag-of-words long form ``(doc_id, token, tf)``
    (reference: src/bow.jl:14-23). One shuffle, partial-agg combined."""
    return tokens.groupBy(doc_col, "token").agg(F.count("*").alias("tf"))


def vocab_from_bow(bow: DataFrame) -> DataFrame:
    """Vocabulary ``(token, occs, ndocs)`` (reference: src/voc.jl:135-158,
    push_token! at :172-187). Derived from the BOW so the distinct-doc
    count is a plain count, never a skewed count_distinct."""
    return bow.groupBy("token").agg(
        F.sum("tf").alias("occs"),
        F.count("*").alias("ndocs"),
    )


def build_vocab(df: DataFrame, cfg: TextConfig, *, doc_col: str = "doc_id",
                text_col: str = "text", multi: bool = False) -> DataFrame:
    """docs -> tokenize UDF -> explode -> groupBy: the whole Vocabulary
    fit (reference lifecycle A, SURVEY §3A)."""
    tokens = exploded_tokens(df, cfg, doc_col=doc_col, text_col=text_col, multi=multi)
    return vocab_from_bow(bow_from_tokens(tokens, doc_col=doc_col))


def merge_vocab(*vocabs: DataFrame) -> DataFrame:
    """K-way vocabulary merge summing occs/ndocs
    (reference: merge_voc, src/updatevoc.jl:65-83). This is the
    hierarchical partial->final merge applied at the vocabulary level:
    union is free, the groupBy re-combines per shuffle partition."""
    out = vocabs[0]
    for v in vocabs[1:]:
        out = out.unionByName(v)
    return out.groupBy("token").agg(
        F.sum("occs").alias("occs"),
        F.sum("ndocs").alias("ndocs"),
    )


def filter_vocab(vocab: DataFrame, predicate_sql: str) -> DataFrame:
    """Keep tokens satisfying a SQL predicate over (token, occs, ndocs)
    (reference: filter_tokens, src/updatevoc.jl:90-101; doc-freq pruning
    as in test/search.jl:31-33 is ``"ndocs > 1 AND ndocs < 5"``)."""
    return vocab.filter(predicate_sql)


def filter_tokens_df(tokens: DataFrame, vocab: DataFrame) -> DataFrame:
    """Drop tokens not present in the vocabulary — the reference's
    filter_tokens!(voc, text) (src/updatevoc.jl:30-55) as a left-semi
    join (broadcast when the vocabulary is small)."""
    return tokens.join(vocab.select("token"), "token", "left_semi")


def vocab_from_thesaurus(spark, tokens) -> DataFrame:
    """Fixed token list with occs=ndocs=1
    (reference: src/voc.jl:39-47)."""
    return spark.createDataFrame(
        [(t, 1, 1) for t in tokens], schema="token string, occs long, ndocs long"
    )


def with_term_ids(vocab: DataFrame) -> DataFrame:
    """Deterministic dense term ids by (ndocs desc, token asc).

    Uses a global window — fine for export/tests; at 10^12-doc scale the
    engine never needs dense ids (everything is keyed by token string,
    see module docstring), so this is not on the build hot path.
    """
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("ndocs"), F.asc("token"))
    return vocab.withColumn("term_id", F.row_number().over(w))
