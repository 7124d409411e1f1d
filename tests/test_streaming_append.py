"""Incremental index append (reference append_items! semantics):
frozen vocab/constants, OOV drop, in-vocab doclen, pure parquet append;
batch and Structured Streaming drivers."""

import math

import pytest
from pyspark.sql import functions as F

from textsearch_spark.config import TextConfig
from textsearch_spark.functions.bm25 import tokenscore_py
from textsearch_spark.operators.postings import build_posting_blocks
from textsearch_spark.operators.search import search_bm25_text
from textsearch_spark.operators.wand import search_bm25_wand
from textsearch_spark.plans.build import build_bm25_index
from textsearch_spark.sources.io import load_index, save_index
from textsearch_spark.streaming.append import (
    append_batch_to_index, high_water_mark, stream_append_to_index,
)

CFG = TextConfig(nlist=[1])


def _base_index(spark, golden_corpus_df, path):
    idx = build_bm25_index(golden_corpus_df, CFG)
    idx.blocks = build_posting_blocks(idx.postings, span=4)
    save_index(idx, path)
    return load_index(spark, path)


def test_append_frozen_semantics(spark, golden_corpus_df, tmp_path):
    path = str(tmp_path / "idx")
    base = _base_index(spark, golden_corpus_df, path)
    assert high_water_mark(spark, path) == 7

    # appended doc: 'la casa abcnew' — 'abcnew' is OOV and must drop;
    # doclen counts the in-vocab tokens only (la, casa) = 2
    new = spark.createDataFrame([(8, "la casa abcnew")], "doc_id long, text string")
    metrics = append_batch_to_index(spark, path, new, doc_col="doc_id")
    assert metrics["n_docs_appended"] == 1

    idx = load_index(spark, path)
    dl = {r.doc_id: r.doclen for r in idx.doclens.collect()}
    assert dl[8] == 2
    assert "abcnew" not in {r.token for r in idx.postings.filter("doc_id = 8").collect()}

    # scores use the FROZEN fit-time stats: doc 8's score for query
    # 'casa' must equal tokenscore with the fit-time ndocs('casa')=3,
    # N=7, avgdl(fit) — computed independently here
    res = {r.doc_id: r.score for r in search_bm25_text(idx, "casa", k=8).collect()}
    ndocs_casa = {r.token: r.ndocs for r in idx.vocab.collect()}["casa"]
    expect = tokenscore_py(idx.bm25, float(ndocs_casa), 2.0, 1.0)
    assert res[8] == pytest.approx(expect, rel=1e-12)
    assert idx.n_docs == 7  # N frozen at fit (src/bm25invfile.jl append)


def test_append_wand_naive_parity(spark, golden_corpus_df, tmp_path):
    path = str(tmp_path / "idx")
    _base_index(spark, golden_corpus_df, path)
    new = spark.createDataFrame(
        [(8, "la manzana verde"), (9, "la hoja roja rica")], "doc_id long, text string"
    )
    append_batch_to_index(spark, path, new, doc_col="doc_id")
    idx = load_index(spark, path)

    q = spark.createDataFrame(
        [(0, "la manzana verde rica"), (1, "hoja roja")], "query_id long, qtext string"
    )
    from textsearch_spark.operators.search import search_bm25

    naive = sorted((r.query_id, r.rank, r.doc_id, round(r.score, 10))
                   for r in search_bm25(idx, q, 5).collect())
    wand = sorted((r.query_id, r.rank, r.doc_id, round(r.score, 10))
                  for r in search_bm25_wand(idx, q, 5, n_buckets=2).collect())
    assert naive == wand
    # appended docs are retrievable
    assert any(d in (8, 9) for (_, _, d, _) in naive)


def test_append_rejects_stale_ids(spark, golden_corpus_df, tmp_path):
    path = str(tmp_path / "idx")
    _base_index(spark, golden_corpus_df, path)
    dup = spark.createDataFrame([(3, "la casa")], "doc_id long, text string")
    with pytest.raises(ValueError, match="high-water"):
        append_batch_to_index(spark, path, dup, doc_col="doc_id")


def test_append_idempotent_batch_id(spark, golden_corpus_df, tmp_path):
    path = str(tmp_path / "idx")
    _base_index(spark, golden_corpus_df, path)
    new = spark.createDataFrame([(8, "la casa")], "doc_id long, text string")
    append_batch_to_index(spark, path, new, doc_col="doc_id", batch_id=0)
    # replayed epoch: skipped, no duplicate postings
    append_batch_to_index(spark, path, new, doc_col="doc_id", batch_id=0)
    idx = load_index(spark, path)
    assert idx.doclens.filter("doc_id = 8").count() == 1


def test_compact_fragmented_blocks(spark, golden_corpus_df, tmp_path):
    """An append whose ids land inside the tail block fragments it
    (two rows per (token, block_id)); compaction merges them and WAND
    results are unchanged."""
    from textsearch_spark.operators.postings import compact_blocks

    path = str(tmp_path / "idx")
    idx = build_bm25_index(golden_corpus_df, CFG)
    idx.blocks = build_posting_blocks(idx.postings, span=5)  # block 1 = ids 5..9
    save_index(idx, path)
    new = spark.createDataFrame(
        [(8, "la manzana verde"), (9, "la hoja roja")], "doc_id long, text string"
    )
    append_batch_to_index(spark, path, new, doc_col="doc_id")
    idx = load_index(spark, path)

    frag = idx.blocks.groupBy("token", "block_id").count().filter("count > 1")
    assert frag.filter("token = 'la' AND block_id = 1").count() == 1  # fragmented

    q = spark.createDataFrame([(0, "la manzana verde")], "query_id long, qtext string")
    before = sorted((r.rank, r.doc_id, round(r.score, 10))
                    for r in search_bm25_wand(idx, q, 6, n_buckets=2).collect())

    compacted = compact_blocks(idx.blocks, idx.bm25)
    assert compacted.groupBy("token", "block_id").count().filter("count > 1").count() == 0
    assert compacted.agg(F.sum("n")).collect()[0][0] == idx.blocks.agg(F.sum("n")).collect()[0][0]
    idx.blocks = compacted
    after = sorted((r.rank, r.doc_id, round(r.score, 10))
                   for r in search_bm25_wand(idx, q, 6, n_buckets=2).collect())
    assert before == after


def test_stream_append_file_source(spark, golden_corpus_df, tmp_path):
    path = str(tmp_path / "idx")
    _base_index(spark, golden_corpus_df, path)
    src = str(tmp_path / "src")
    extra = spark.createDataFrame(
        [("la manzana verde",), ("la hoja roja",), ("la pera rica",)], "text string"
    )
    extra.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_append_to_index(stream, path, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    assert high_water_mark(spark, path) == 10
    idx = load_index(spark, path)
    res = search_bm25_text(idx, "manzana verde", k=10).collect()
    assert any(r.doc_id > 7 for r in res)
    # WAND over the appended (boundary-split) blocks agrees with naive
    qdf = spark.createDataFrame([(0, "la manzana verde")], "query_id long, qtext string")
    from textsearch_spark.operators.search import search_bm25

    naive = sorted((r.rank, r.doc_id, round(r.score, 10))
                   for r in search_bm25(idx, qdf, 6).collect())
    wand = sorted((r.rank, r.doc_id, round(r.score, 10))
                  for r in search_bm25_wand(idx, qdf, 6, n_buckets=3).collect())
    assert naive == wand
