"""EncodedCorpus — the reference's dense-id token-sequence export
(src/tokcorpus.jl:21-69) as package operators.

The reference stores one flat ``seq::Vector{UInt32}`` of vocabulary ids
plus a cumulative ``offset`` per document; ``fetch(ecorpus, i)`` views
doc i's id slice and ``decode`` maps ids back to token strings
(src/tokcorpus.jl:62-69). Distributed, the same information is:

- the LONG form ``(doc_id, pos, term_id)`` — one row per kept token,
  ``pos`` 1-based in token order (src/tokcorpus.jl:33-46 pushes tokens
  in tokenize order, dropping OOV ids ``i == 0``);
- the CSR form ``(doc_id, term_ids array<long>, n_terms)`` — the
  ``fetch`` view, one row per document (empty docs keep an empty
  array, mirroring the reference pushing an offset for every doc);
- optional cumulative CSR ``offset`` (the exact reference layout) via
  :func:`with_csr_offsets` — a global running sum, export-only.

Term ids are the deterministic dense ranks of
:func:`~textsearch_spark.operators.vocab.with_term_ids` (the reference
assigns thread-nondeterministic insertion order and never pins it —
SURVEY §2i)."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import TextConfig
from ..functions.udfs import with_tokens
from .vocab import build_vocab, with_term_ids


def _vocab_ids(docs: DataFrame, cfg: TextConfig, vocab: Optional[DataFrame],
               doc_col: str, text_col: str) -> DataFrame:
    """(token, term_id) — from the given vocabulary, or fit on the
    corpus like the reference's convenience constructor
    (src/tokcorpus.jl:13-19)."""
    if vocab is None:
        vocab = build_vocab(docs, cfg, doc_col=doc_col, text_col=text_col)
    if "term_id" not in vocab.columns:
        vocab = with_term_ids(vocab)
    return vocab.select("token", F.col("term_id").cast("long").alias("term_id"))


def encode_corpus(docs: DataFrame, cfg: TextConfig, vocab: Optional[DataFrame] = None,
                  *, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Long-form EncodedCorpus: ``(doc_id, pos, term_id)``.

    ``pos`` is the token's 1-based position within the ENCODED sequence
    — i.e. counted over in-vocabulary tokens only, exactly the
    reference's ``seq`` order after its ``i == 0`` OOV drop
    (src/tokcorpus.jl:38-43). With a vocabulary fit on the same corpus
    no token is OOV, so ``pos`` equals the raw token position."""
    ids = _vocab_ids(docs, cfg, vocab, doc_col, text_col)
    toks = with_tokens(docs, cfg, text_col=text_col).select(
        doc_col, F.posexplode("tokens").alias("__rawpos", "token")
    )
    kept = toks.join(ids, "token")
    # re-rank positions over the KEPT tokens per doc (raw order
    # preserved); a window per doc is fine — per-doc cardinality is a
    # document length, never a corpus-scale partition
    from pyspark.sql.window import Window

    w = Window.partitionBy(doc_col).orderBy("__rawpos")
    return (
        kept.withColumn("pos", F.row_number().over(w))
        .select(doc_col, F.col("pos").cast("long").alias("pos"), "term_id")
    )


def encode_corpus_csr(docs: DataFrame, cfg: TextConfig,
                      vocab: Optional[DataFrame] = None, *,
                      doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """CSR row form: ``(doc_id, term_ids array<long>, n_terms)`` — one
    row per INPUT document (the reference pushes an offset for every
    doc, so an all-OOV/empty doc is present with an empty slice,
    src/tokcorpus.jl:44-46). ``term_ids`` is the ``fetch`` view."""
    long = encode_corpus(docs, cfg, vocab, doc_col=doc_col, text_col=text_col)
    rows = (
        long.groupBy(doc_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "term_id"))).alias("__e"))
        .select(doc_col, F.col("__e.term_id").alias("term_ids"))
    )
    all_ids = docs.select(doc_col).distinct()
    return (
        all_ids.join(rows, doc_col, "left")
        .select(
            doc_col,
            F.coalesce("term_ids", F.array().cast("array<long>")).alias("term_ids"),
        )
        .withColumn("n_terms", F.size("term_ids").cast("long"))
    )


def with_csr_offsets(csr: DataFrame, *, doc_col: str = "doc_id") -> DataFrame:
    """Add the reference's cumulative ``offset`` column (end offset of
    each doc's slice in the flattened seq, src/tokcorpus.jl:62-65's
    ``sp:ep`` bounds come from consecutive offsets). A single global
    running sum ordered by doc_id — export-only (the distributed
    operators never need a global offset)."""
    from pyspark.sql.window import Window

    w = Window.orderBy(doc_col).rowsBetween(Window.unboundedPreceding, 0)
    return csr.withColumn("offset", F.sum("n_terms").over(w))


def decode_corpus(encoded: DataFrame, vocab_ids: DataFrame, *,
                  doc_col: str = "doc_id") -> DataFrame:
    """Inverse of :func:`encode_corpus_csr`: ``(doc_id, tokens
    array<string>)`` — the reference's ``decode`` (src/tokcorpus.jl:
    67-69) mapping each id back through ``voc.token``. Accepts the CSR
    form (``term_ids`` column) or the long form."""
    ids = vocab_ids.select(F.col("term_id").cast("long").alias("term_id"), "token")
    if "term_ids" in encoded.columns:
        long = encoded.select(
            doc_col, F.posexplode("term_ids").alias("__p", "term_id")
        ).withColumn("pos", (F.col("__p") + 1).cast("long")).drop("__p")
        base_ids = encoded.select(doc_col).distinct()
    else:
        long = encoded.select(doc_col, "pos", "term_id")
        base_ids = long.select(doc_col).distinct()
    rows = (
        # vocabulary-sized mapping — no broadcast hint (a web corpus's
        # vocab can exceed the limit); AQE still broadcasts small ones
        long.join(ids, "term_id")
        .groupBy(doc_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "token"))).alias("__e"))
        .select(doc_col, F.col("__e.token").alias("tokens"))
    )
    return base_ids.join(rows, doc_col, "left").select(
        doc_col, F.coalesce("tokens", F.array().cast("array<string>")).alias("tokens")
    )
