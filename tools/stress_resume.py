"""Scale-stress evidence for the north rule's resumable checkpointed
build: a >=2M-doc synthetic corpus, the checkpointed build KILLED
mid-run (SIGKILL after the index stage completes, before blocks), then
restarted — the resume path must reuse the completed stage via its
manifest fingerprint and finish only the remaining stage. Ends with a
WAND query batch over the recovered index and the per-row sha256
content-integrity check.

Usage: python tools/stress_resume.py [n_docs] [index_dir]
Prints one JSON line with phase timings + manifest lineage evidence.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_IS_CHILD = len(sys.argv) >= 4 and sys.argv[1] == "--child"
N_DOCS = 2_000_000 if _IS_CHILD else (int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000)
INDEX_DIR = sys.argv[2] if (len(sys.argv) > 2 and not _IS_CHILD) else "/tmp/ts_stress_index"


def _build_once(corpus_path: str, index_dir: str):
    """Child body: run the checkpointed build to completion."""
    from textsearch_spark.config import TextConfig
    from textsearch_spark.plans.checkpoint import build_bm25_index_checkpointed
    from textsearch_spark.session import get_spark

    spark = get_spark("local[32]", app_name="stress-build", shuffle_partitions=32)
    corpus = spark.read.parquet(corpus_path).repartition(128).cache()
    corpus.count()
    idx = build_bm25_index_checkpointed(
        corpus, TextConfig(nlist=[1]), index_dir,
        text_col="content", postings_partitions=64,
    )
    idx.blocks.count()
    spark.stop()


def main():
    from bench import _gen_scaling_corpus

    t_all = time.time()
    corpus_path = _gen_scaling_corpus(N_DOCS, 32)
    gen_sec = round(time.time() - t_all, 1)

    subprocess.run(["rm", "-rf", INDEX_DIR], check=True)

    # phase 1: start the build, SIGKILL it once the index stage manifest
    # lands (mid-build: blocks not yet built)
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", corpus_path, INDEX_DIR],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env={**os.environ, "SPARK_DRIVER_MEMORY": "32g"},
    )
    index_manifest = os.path.join(INDEX_DIR, "_manifests", "index.json")
    t0 = time.time()
    killed_after = None
    while child.poll() is None:
        if os.path.exists(index_manifest):
            time.sleep(2)  # let the manifest write settle; blocks still running
            child.send_signal(signal.SIGKILL)
            killed_after = round(time.time() - t0, 1)
            break
        if time.time() - t0 > 3600:
            child.kill()
            raise TimeoutError("build did not reach the index stage in 1h")
        time.sleep(1)
    child.wait()
    if killed_after is None:
        raise RuntimeError("build finished before the kill — corpus too small for the stress")
    with open(index_manifest) as f:
        m1 = json.load(f)
    assert m1["complete"], "index manifest incomplete after kill"
    blocks_manifest = os.path.join(INDEX_DIR, "_manifests", "blocks.json")
    blocks_was_done = os.path.exists(blocks_manifest)

    # phase 2: restart — must resume (index stage reused, blocks built)
    t0 = time.time()
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", corpus_path, INDEX_DIR],
        check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env={**os.environ, "SPARK_DRIVER_MEMORY": "32g"},
    )
    resume_sec = round(time.time() - t0, 1)
    with open(index_manifest) as f:
        m2 = json.load(f)
    reused = m2["completed_at"] == m1["completed_at"]  # stage NOT recomputed
    with open(blocks_manifest) as f:
        mb = json.load(f)

    # phase 3: query + content integrity over the recovered index
    from textsearch_spark.operators.wand import search_bm25_wand
    from textsearch_spark.plans.checkpoint import verify_content_integrity
    from textsearch_spark.session import get_spark
    from textsearch_spark.sources.io import content_sha_column, load_index

    import pyspark.sql.functions as F

    spark = get_spark("local[32]", app_name="stress-query", shuffle_partitions=32)
    idx = load_index(spark, INDEX_DIR)
    corpus = spark.read.parquet(corpus_path)
    texts = [r.content for r in corpus.select("content").limit(200).collect()]
    from bench import _mk_queries

    qdf = _mk_queries(spark, texts, 1024).cache()
    qdf.count()
    t0 = time.time()
    n_res = search_bm25_wand(idx, qdf, 10, n_buckets=-(-N_DOCS // 4096), query_groups=1).count()
    query_sec = round(time.time() - t0, 1)
    snapshot = corpus.select("doc_id", content_sha_column("content").alias("content_sha"))
    mismatches = verify_content_integrity(
        corpus, snapshot, doc_col="doc_id", text_col="content")
    spark.stop()

    print(json.dumps({
        "n_docs": N_DOCS,
        "gen_sec": gen_sec,
        "killed_after_sec": killed_after,
        "blocks_done_before_kill": blocks_was_done,
        "resume_sec": resume_sec,
        "index_stage_reused_on_resume": reused,
        "index_manifest_metrics": m1["metrics"],
        "blocks_manifest_metrics": mb["metrics"],
        "n_shards": len(m1["shards"]),
        "query_1024_sec": query_sec,
        "query_result_rows": n_res,
        "content_sha_mismatches": mismatches,
        "total_sec": round(time.time() - t_all, 1),
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--child":
        _build_once(sys.argv[2], sys.argv[3])
    else:
        main()
