"""Scale-stress evidence for the TRANSACTION-LOG backend
(sources/txnlog.py) — the object-store commit model's counterpart of
tools/stress_append.py:

1. build + save a base index in the txn-log layout on ``n_docs``
   synthetic source-code docs; record a reference WAND top-k;
2. start a bulk append of ``n_docs/4`` docs in a child process and
   SIGKILL it once its data dirs appear but BEFORE its log entry
   commits; assert the log is unchanged, the high-water mark and the
   reference results are unchanged (uncommitted data dirs are
   unreachable garbage);
3. retry the same batch_id to completion; assert exactly-once (one log
   entry, doclens count == base + batch);
4. run more appends with auto_compact_after=3 until log-transaction
   compaction triggers; a reader HOLDING THE PRE-COMPACTION SNAPSHOT
   keeps serving identical results across the compaction AND the
   vacuum of dirs its snapshot does not use; assert the fragmentation
   fold returns to 0 and WAND == naive on the final index.

Usage: python tools/stress_txnlog.py [n_docs] [index_dir]
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_IS_CHILD = len(sys.argv) >= 2 and sys.argv[1] == "--child-append"
N_DOCS = int(sys.argv[1]) if (len(sys.argv) > 1 and not _IS_CHILD) else 500_000
INDEX_DIR = sys.argv[2] if (len(sys.argv) > 2 and not _IS_CHILD) else "/tmp/ts_stress_txnlog_idx"


def _child_append(corpus_path: str, index_dir: str, lo: str, hi: str, batch_id: str):
    from pyspark.sql import functions as F

    from textsearch_spark.session import get_spark
    from textsearch_spark.sources.txnlog import append_batch_txn

    spark = get_spark("local[32]", app_name="stress-txn-append", shuffle_partitions=32)
    docs = spark.read.parquet(corpus_path).filter(
        (F.col("doc_id") > int(lo)) & (F.col("doc_id") <= int(hi)))
    append_batch_txn(spark, index_dir, docs, doc_col="doc_id",
                     text_col="content", batch_id=batch_id,
                     auto_compact_after=None)
    spark.stop()


def _wand_rows(idx, qdf, k=10):
    from textsearch_spark.operators.wand import search_bm25_wand

    return sorted((r.query_id, r.rank, r.doc_id, round(r.score, 9))
                  for r in search_bm25_wand(idx, qdf, k).collect())


def _log_has_batch(index_dir: str, batch_id: str) -> bool:
    from textsearch_spark.sources import txnlog as tx

    return any(e.get("batch_id") == batch_id for e in tx.read_log(index_dir))


def main():
    from pyspark.sql import functions as F

    from bench import _gen_scaling_corpus, _mk_queries
    from textsearch_spark.config import TextConfig
    from textsearch_spark.operators.postings import build_posting_blocks
    from textsearch_spark.operators.search import search_bm25
    from textsearch_spark.plans.build import build_bm25_index
    from textsearch_spark.session import get_spark
    from textsearch_spark.sources import txnlog as tx

    t_all = time.time()
    total = N_DOCS + N_DOCS // 4 + 3 * (N_DOCS // 20)
    corpus_path = _gen_scaling_corpus(total, 32)
    subprocess.run(["rm", "-rf", INDEX_DIR], check=True)

    spark = get_spark("local[32]", app_name="stress-txn-main", shuffle_partitions=32)
    corpus = spark.read.parquet(corpus_path).cache()
    base = corpus.filter(F.col("doc_id") <= N_DOCS)

    t0 = time.time()
    idx = build_bm25_index(base, TextConfig(nlist=[1]), text_col="content")
    idx.blocks = build_posting_blocks(idx.postings, span=4096)
    tx.save_index_txn(idx, INDEX_DIR, postings_partitions=64)
    build_sec = round(time.time() - t0, 1)

    idx = tx.load_index_txn(spark, INDEX_DIR)
    texts = [r.content for r in base.select("content").limit(200).collect()]
    qdf = _mk_queries(spark, texts, 256).cache()
    qdf.count()
    ref = _wand_rows(idx, qdf)
    log_len_before = len(tx.read_log(INDEX_DIR))

    # phase 2: kill the bulk append after data dirs appear, pre-commit
    batch_hi = N_DOCS + N_DOCS // 4
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child-append",
         corpus_path, INDEX_DIR, str(N_DOCS), str(batch_hi), "bulk0"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env={**os.environ, "SPARK_DRIVER_MEMORY": "32g"},
    )
    blocks_data = os.path.join(INDEX_DIR, tx.DATA_DIR, "blocks")
    t0 = time.time()
    killed_at = None
    while child.poll() is None:
        if _log_has_batch(INDEX_DIR, "bulk0"):
            break  # too fast — committed before we could kill
        staging = [d for d in (os.listdir(blocks_data) if os.path.isdir(blocks_data) else [])
                   if d.startswith("append-bulk0")]
        if staging:
            time.sleep(1.0)  # mid-write: data dirs underway
            if not _log_has_batch(INDEX_DIR, "bulk0"):
                child.send_signal(signal.SIGKILL)
                killed_at = round(time.time() - t0, 1)
            break
        if time.time() - t0 > 1800:
            child.kill()
            raise TimeoutError("append never started writing data dirs")
        time.sleep(0.2)
    child.wait()
    if killed_at is None:
        raise RuntimeError("append committed before the kill window — raise n_docs")
    assert len(tx.read_log(INDEX_DIR)) == log_len_before, "log grew from a killed append"

    # uncommitted data dirs are unreachable: hwm and results unchanged
    assert tx.high_water_mark_txn(INDEX_DIR) == N_DOCS
    idx = tx.load_index_txn(spark, INDEX_DIR)
    assert _wand_rows(idx, qdf) == ref, "killed append leaked into results"
    ghost_dirs = tx.vacuum_txn(INDEX_DIR, min_age_sec=0)  # reclaim the orphaned staging
    assert all("bulk0" in d for d in ghost_dirs), ghost_dirs

    # phase 3: retry the SAME batch id — exactly once via log dedupe
    t0 = time.time()
    tx.append_batch_txn(
        spark, INDEX_DIR,
        corpus.filter((F.col("doc_id") > N_DOCS) & (F.col("doc_id") <= batch_hi)),
        doc_col="doc_id", text_col="content", batch_id="bulk0",
        auto_compact_after=None)
    retry_sec = round(time.time() - t0, 1)
    idx = tx.load_index_txn(spark, INDEX_DIR)
    agg = idx.doclens.agg(F.count("*").alias("n"),
                          F.countDistinct("doc_id").alias("nd")).collect()[0]
    assert agg.n == agg.nd == batch_hi, (agg.n, agg.nd, batch_hi)
    assert sum(1 for e in tx.read_log(INDEX_DIR)
               if e.get("batch_id") == "bulk0") == 1

    # phase 4: auto-compaction + snapshot isolation across vacuum
    old_snapshot_idx = tx.load_index_txn(spark, INDEX_DIR)  # pre-compaction
    snapshot_ref = _wand_rows(old_snapshot_idx, qdf)
    lo = batch_hi
    compact_metrics = None
    t0 = time.time()
    for i in range(3):
        hi = lo + N_DOCS // 20
        mm = tx.append_batch_txn(
            spark, INDEX_DIR,
            corpus.filter((F.col("doc_id") > lo) & (F.col("doc_id") <= hi)),
            doc_col="doc_id", text_col="content", batch_id=f"inc{i}",
            auto_compact_after=3)
        compact_metrics = mm.get("compaction") or compact_metrics
        lo = hi
    appends_sec = round(time.time() - t0, 1)
    assert compact_metrics is not None, "auto-compaction never triggered"
    final_compact = tx.compact_index_txn(spark, INDEX_DIR)
    est = tx.fragmentation_estimate_txn(INDEX_DIR)
    assert est["fragment_extra_rows_max"] == 0 and est["n_appends"] == 0, est

    # the pre-compaction snapshot still serves the same results: its
    # block dirs are untouched (vacuum must not run while it is live)
    assert _wand_rows(old_snapshot_idx, qdf) == snapshot_ref, (
        "snapshot-isolated reader changed across compaction")
    n_vacuumed = len(tx.vacuum_txn(INDEX_DIR, min_age_sec=0))

    idx = tx.load_index_txn(spark, INDEX_DIR)
    t0 = time.time()
    wand = _wand_rows(idx, qdf)
    final_query_sec = round(time.time() - t0, 1)
    naive = sorted((r.query_id, r.rank, r.doc_id, round(r.score, 9))
                   for r in search_bm25(idx, qdf, 10).collect())
    assert wand == naive, "WAND/naive diverge on the compacted txn index"

    # phase 5: log checkpoint + prefix vacuum — folds identical, results
    # identical, only the checkpoint entry remains, dedupe survives
    n_entries_before = len(tx.read_log(INDEX_DIR))
    hwm_before = tx.high_water_mark_txn(INDEX_DIR)
    t0 = time.time()
    tx.checkpoint_txn(INDEX_DIR)
    ckpt_sec = round(time.time() - t0, 2)
    n_log_pruned = len(tx.vacuum_log_txn(INDEX_DIR, min_age_sec=0))
    assert n_log_pruned == n_entries_before
    assert [e["op"] for e in tx.read_log(INDEX_DIR)] == ["checkpoint"]
    assert tx.high_water_mark_txn(INDEX_DIR) == hwm_before
    est = tx.fragmentation_estimate_txn(INDEX_DIR)
    assert est["fragment_extra_rows_max"] == 0 and est["n_appends"] == 0, est
    # replayed batch id resolves from the checkpoint's carried history
    replay = tx.append_batch_txn(
        spark, INDEX_DIR, corpus.filter(F.col("doc_id") <= 0),
        doc_col="doc_id", text_col="content", batch_id="inc2",
        auto_compact_after=None)
    assert replay["n_docs_appended"] == N_DOCS // 20, replay
    assert len(tx.read_log(INDEX_DIR)) == 1, "replay must not re-commit"
    idx_ck = tx.load_index_txn(spark, INDEX_DIR)
    assert _wand_rows(idx_ck, qdf) == wand, (
        "results changed across checkpoint + log vacuum")
    spark.stop()

    print(json.dumps({
        "backend": "txnlog",
        "n_docs_base": N_DOCS,
        "n_docs_final": lo,
        "build_sec": build_sec,
        "append_killed_after_sec": killed_at,
        "killed_append_invisible": True,
        "retry_exactly_once_sec": retry_sec,
        "auto_compaction": compact_metrics,
        "final_compaction": final_compact,
        "snapshot_isolated_reader_across_compaction": True,
        "data_dirs_vacuumed": n_vacuumed,
        "post_compact_fragment_rows_max": 0,
        "incremental_appends_sec": appends_sec,
        "final_wand_256q_sec": final_query_sec,
        "wand_equals_naive_on_final": True,
        "log_checkpoint_sec": ckpt_sec,
        "log_entries_pruned": n_log_pruned,
        "dedupe_survives_log_vacuum": True,
        "results_stable_across_checkpoint": True,
        "total_sec": round(time.time() - t_all, 1),
    }))


if __name__ == "__main__":
    if _IS_CHILD:
        _child_append(*sys.argv[2:7])
    else:
        main()
