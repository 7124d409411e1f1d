"""Checkpointed build: resume, manifests, save/load, content integrity."""

import json
import os

import pytest

from textsearch_spark.config import TextConfig
from textsearch_spark.operators.search import search_bm25_text
from textsearch_spark.plans.checkpoint import (
    build_bm25_index_checkpointed,
    read_manifest,
    verify_content_integrity,
)
from textsearch_spark.sources.io import content_sha_column, load_index, save_index


def test_save_load_roundtrip(golden_corpus_df, tmp_path, spark):
    from textsearch_spark.plans.build import build_bm25_index

    idx = build_bm25_index(golden_corpus_df, TextConfig(nlist=[1]),
                           vocab_filter="ndocs > 1 AND ndocs < 5")
    save_index(idx, str(tmp_path / "idx"))
    loaded = load_index(spark, str(tmp_path / "idx"))
    # reference: test/search.jl:58-68 — same golden after save/load
    res = search_bm25_text(loaded, "la casa de la manzana verde", k=3).orderBy("rank").collect()
    assert [r.doc_id for r in res] == [6, 2, 4]
    assert loaded.bm25 == idx.bm25 and loaded.cfg == idx.cfg


def test_checkpointed_build_and_resume(golden_corpus_df, tmp_path, spark):
    d = str(tmp_path / "ck")
    idx = build_bm25_index_checkpointed(
        golden_corpus_df, TextConfig(nlist=[1]), d,
        vocab_filter="ndocs > 1 AND ndocs < 5", block_span=4,
    )
    assert idx.blocks is not None
    m = read_manifest(d, "index")
    assert m and m["complete"] and m["shards"] and "build_sec" in m["metrics"]
    mb = read_manifest(d, "blocks")
    assert mb and mb["lineage"]["parents"] == ["index"]

    # resume: same fingerprint -> stages skipped (manifests untouched)
    t_index = os.path.getmtime(os.path.join(d, "_manifests", "index.json"))
    idx2 = build_bm25_index_checkpointed(
        golden_corpus_df, TextConfig(nlist=[1]), d,
        vocab_filter="ndocs > 1 AND ndocs < 5", block_span=4,
    )
    assert os.path.getmtime(os.path.join(d, "_manifests", "index.json")) == t_index
    res = search_bm25_text(idx2, "la casa de la manzana verde", k=3).orderBy("rank").collect()
    assert [r.doc_id for r in res] == [6, 2, 4]
    vocab2 = idx2.vocab.count()  # before the rebuild invalidates the handle

    # changed config -> rebuild (overwrites in place; old handles go stale)
    idx3 = build_bm25_index_checkpointed(
        golden_corpus_df, TextConfig(nlist=[1]), d, block_span=4,
    )
    assert os.path.getmtime(os.path.join(d, "_manifests", "index.json")) > t_index
    assert idx3.vocab.count() > vocab2


def test_partial_resume_after_blocks_failure(golden_corpus_df, tmp_path):
    """Simulate dying between the index and blocks stages: the index
    manifest survives, blocks is rebuilt, index stage is not."""
    d = str(tmp_path / "ck2")
    build_bm25_index_checkpointed(golden_corpus_df, TextConfig(nlist=[1]), d, block_span=4)
    os.remove(os.path.join(d, "_manifests", "blocks.json"))
    t_index = os.path.getmtime(os.path.join(d, "_manifests", "index.json"))
    idx = build_bm25_index_checkpointed(golden_corpus_df, TextConfig(nlist=[1]), d, block_span=4)
    assert os.path.getmtime(os.path.join(d, "_manifests", "index.json")) == t_index
    assert read_manifest(d, "blocks")["complete"]
    assert idx.blocks.count() > 0


def test_content_integrity(spark, golden_corpus_df):
    snap = golden_corpus_df.select("doc_id", content_sha_column("text").alias("content_sha"))
    assert verify_content_integrity(golden_corpus_df, snap) == 0
    # tamper with one row -> detected
    from pyspark.sql import functions as F

    tampered = golden_corpus_df.withColumn(
        "text", F.when(F.col("doc_id") == 3, F.lit("tampered")).otherwise(F.col("text"))
    )
    assert verify_content_integrity(tampered, snap) == 1
