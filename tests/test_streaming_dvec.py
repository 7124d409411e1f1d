"""Streaming incremental vocab + DVEC distance goldens."""

import math

import pytest
from pyspark.sql import functions as F

from textsearch_spark.config import TextConfig


def test_incremental_vocab_merge_matches_batch(spark, tmp_path, golden_corpus_df):
    from textsearch_spark.operators.vocab import build_vocab
    from textsearch_spark.streaming.incremental import (
        merge_vocab_increment, read_corpuslen,
    )

    state = str(tmp_path / "state")
    cfg = TextConfig(nlist=[1])
    a = golden_corpus_df.filter("doc_id <= 3")
    b = golden_corpus_df.filter("doc_id > 3")
    merge_vocab_increment(a, cfg, state)
    merged = merge_vocab_increment(b, cfg, state)
    full = build_vocab(golden_corpus_df, cfg)
    got = {(r.token, r.occs, r.ndocs) for r in merged.collect()}
    want = {(r.token, r.occs, r.ndocs) for r in full.collect()}
    assert got == want
    assert read_corpuslen(state) == 7


def test_stream_vocab_file_source(spark, tmp_path, golden_corpus_df):
    from textsearch_spark.operators.vocab import build_vocab
    from textsearch_spark.streaming.incremental import stream_vocab

    src = str(tmp_path / "src")
    golden_corpus_df.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cfg = TextConfig(nlist=[1])
    q = stream_vocab(stream, cfg, str(tmp_path / "state"),
                     checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    from textsearch_spark.streaming.incremental import read_vocab_state

    merged = read_vocab_state(spark, str(tmp_path / "state"))
    full = build_vocab(golden_corpus_df, cfg)
    got = {(r.token, r.occs, r.ndocs) for r in merged.collect()}
    want = {(r.token, r.occs, r.ndocs) for r in full.collect()}
    assert got == want


def test_vocab_merge_replay_idempotent(spark, tmp_path, golden_corpus_df):
    """A replayed streaming epoch (same batch_id) must not double-count
    occs/ndocs/corpuslen — same exactly-once bar as the index append."""
    from textsearch_spark.operators.vocab import build_vocab
    from textsearch_spark.streaming.incremental import (
        merge_vocab_increment, read_corpuslen, read_vocab_state,
    )

    state = str(tmp_path / "state")
    cfg = TextConfig(nlist=[1])
    a = golden_corpus_df.filter("doc_id <= 3")
    b = golden_corpus_df.filter("doc_id > 3")
    merge_vocab_increment(a, cfg, state, batch_id=0)
    merge_vocab_increment(b, cfg, state, batch_id=1)
    merge_vocab_increment(b, cfg, state, batch_id=1)  # replayed epoch
    merged = read_vocab_state(spark, state)
    full = build_vocab(golden_corpus_df, cfg)
    got = {(r.token, r.occs, r.ndocs) for r in merged.collect()}
    want = {(r.token, r.occs, r.ndocs) for r in full.collect()}
    assert got == want
    assert read_corpuslen(state) == 7  # not 11


def test_vocab_state_crash_keeps_previous_snapshot(spark, tmp_path, golden_corpus_df):
    """An uncommitted new version dir (crash before the state.json
    pointer rename) must be invisible; the previous snapshot and its
    corpuslen stay consistent."""
    import os

    from textsearch_spark.streaming.incremental import (
        merge_vocab_increment, read_corpuslen, read_vocab_state,
    )

    state = str(tmp_path / "state")
    cfg = TextConfig(nlist=[1])
    merge_vocab_increment(golden_corpus_df.filter("doc_id <= 3"), cfg, state,
                          batch_id=0)
    before = {(r.token, r.occs, r.ndocs)
              for r in read_vocab_state(spark, state).collect()}
    # simulate the crash: a staged-but-unreferenced next version
    os.makedirs(os.path.join(state, "vocab_v99"))
    assert {(r.token, r.occs, r.ndocs)
            for r in read_vocab_state(spark, state).collect()} == before
    assert read_corpuslen(state) == 3
    # the next successful merge supersedes and sweeps the leftover
    merge_vocab_increment(golden_corpus_df.filter("doc_id > 3"), cfg, state,
                          batch_id=1)
    assert read_corpuslen(state) == 7
    assert not os.path.isdir(os.path.join(state, "vocab_v99"))


def test_angle_distance_golden(spark):
    # reference: test/vec.jl:92-101
    from textsearch_spark.operators.dvec import angle_distance, l2_normalize

    u = [("el", 0.9), ("hola", 0.1), ("mundo", 0.2)]
    v = [("el", 0.4), ("hola", 0.2), ("mundo", 0.4)]
    w = [("xel", 0.4), ("xhola", 0.2), ("xmundo", 0.4)]
    mk = lambda vec, i: spark.createDataFrame(
        [(i, t, x) for t, x in vec], "vid long, token string, weight double"
    )
    a = l2_normalize(mk(u, 1).unionByName(mk(w, 3)), id_col="vid") \
        .withColumnRenamed("vid", "a_id")
    b = l2_normalize(mk(v, 2).unionByName(mk(u, 4)), id_col="vid") \
        .withColumnRenamed("vid", "b_id")
    res = {(r.a_id, r.b_id): r.dist for r in angle_distance(a, b).collect()}
    assert abs(res[(1, 2)] - 0.5975474808029686) < 1e-9
    assert res[(1, 4)] <= 1e-6  # angle(u, u) ~ 0
    # disjoint vectors never join -> no row; the mathematical angle is pi/2
    assert (3, 2) not in res


def test_dvec_add_and_dot(spark):
    from textsearch_spark.operators.dvec import add, pairwise_dot

    u = spark.createDataFrame([(1, "el", 0.1), (1, "hola", 0.2), (1, "mundo", 0.4)],
                              "a_id long, token string, weight double")
    v = u.withColumnRenamed("a_id", "b_id")
    s = add(u.withColumnRenamed("a_id", "vid"), v.withColumnRenamed("b_id", "vid"), id_col="vid")
    got = {r.token: r.weight for r in s.collect()}
    assert got == {"el": 0.2, "hola": 0.4, "mundo": 0.8}
    d = pairwise_dot(u, v).collect()[0]
    assert abs(d.dot - (0.01 + 0.04 + 0.16)) < 1e-12
