"""Per-round benchmark. Prints ONE JSON line:

  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {stage: sec, ...}, "sf": ...,
   "throughput": {...}, "scaling": {...}}

Stages:
- build / blocks / query(naive|wand) over $SPARK_GRAFT_SF_DIR documents;
- the north rule's two-cluster-size proxy: the same index-build and
  WAND query batch on the same pre-generated synthetic source-code
  corpus at N and 4N cores, reporting throughput at both and the
  scaling efficiency X_4N / (4 * X_N).

Each scaling leg runs in a fresh subprocess whose WHOLE process tree
(JVM, task threads, pandas-UDF python workers) is pinned to exactly
its core budget via sched_setaffinity: in local mode ``local[N]`` caps
only concurrent tasks — the N Arrow python workers run on top, so an
unpinned small leg overdraws its budget ~2x and the N-vs-4N ratio is
not a scaling measurement at all. An N-executor cluster gives the job
exactly N cores; the affinity mask is the faithful local proxy.

N defaults to 4 (legs at 4 and 16 of the host's 32 cores). Both
tiers then run at identical per-core memory bandwidth headroom —
measuring the ENGINE's scaling, not the host's DRAM saturation point
(at 32 busy cores this host's per-core throughput drops ~28% even for
embarrassingly parallel pure-python work, which a multi-node cluster
— more bandwidth per added executor — does not exhibit).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_SCALING=0 to skip the scaling runs,
     SPARK_GRAFT_SCALING_N (default 4; legs at N and 4N cores),
     SPARK_GRAFT_SCALING_RUNS (default 3 alternated pairs),
     SPARK_GRAFT_SYNTH_DOCS (default 480000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _mk_queries(spark, texts, n_queries, seed=7):
    import random

    rnd = random.Random(seed)
    qs = []
    for i in range(n_queries):
        words = rnd.choice(texts).split()
        start = rnd.randrange(max(1, len(words) - 6))
        qs.append((i, " ".join(words[start:start + rnd.randint(2, 5)])))
    return spark.createDataFrame(qs, "query_id long, qtext string")


def _bench_sf(sf_dir: str, cpus: int, timings: dict, meta: dict):
    from textsearch_spark.config import TextConfig
    from textsearch_spark.operators.postings import build_posting_blocks
    from textsearch_spark.operators.search import search_bm25
    from textsearch_spark.operators.wand import search_bm25_wand
    from textsearch_spark.plans.build import build_bm25_index
    from textsearch_spark.session import get_spark

    spark = get_spark(f"local[{cpus}]", app_name="bench", shuffle_partitions=cpus)
    # the sf parquet is a single file -> spread it over the cores, but
    # not so thin that python-worker startup dominates a small table
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(cpus).cache()
    n_docs = docs.count()

    t0 = time.time()
    idx = build_bm25_index(docs, TextConfig(nlist=[1]))
    idx.postings.count()
    timings["build"] = time.time() - t0
    meta["build_rows_per_sec"] = round(n_docs / timings["build"], 1)

    t0 = time.time()
    idx.blocks = build_posting_blocks(idx.postings, span=256).cache()
    idx.blocks.count()
    timings["blocks"] = time.time() - t0

    texts = [r.text for r in docs.select("text").limit(500).collect()]
    nq = 512
    qdf = _mk_queries(spark, texts, nq).cache()
    qdf.count()

    t0 = time.time()
    search_bm25(idx, qdf, 10).count()
    timings["query_naive_512"] = time.time() - t0
    meta["naive_qps"] = round(nq / timings["query_naive_512"], 1)

    t0 = time.time()
    # one bucket per block (20 at sf0.1), 8 query groups -> 160 small
    # uniform tasks; see the scaling-run comment on bucket granularity
    search_bm25_wand(idx, qdf, 10, n_buckets=-(-n_docs // 256), query_groups=8).count()
    timings["query_wand_512"] = time.time() - t0
    meta["wand_qps"] = round(nq / timings["query_wand_512"], 1)
    spark.stop()
    return n_docs


def _gen_scaling_corpus(n_docs: int, cpus: int) -> str:
    """Generate the deterministic synthetic source-code corpus ONCE (at
    full parallelism, untimed) into a parquet dir shared by every leg.
    Each leg then pays an identical scan — generation cost and variance
    stay out of the measurement."""
    import tempfile

    path = os.path.join(tempfile.gettempdir(), f"ts_scaling_corpus_{n_docs}")
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    from textsearch_spark.session import get_spark
    from textsearch_spark.sources.corpus import synthetic_code_corpus, with_doc_ids

    spark = get_spark(f"local[{cpus}]", app_name="bench-gen", shuffle_partitions=cpus)
    corpus = with_doc_ids(synthetic_code_corpus(spark, n_docs, partitions=max(cpus * 2, 64)))
    corpus.repartition(max(cpus * 2, 64)).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def _scaling_run(cpus: int, corpus_path: str, n_queries: int):
    """One parallelism level in a FRESH subprocess (own JVM: a leg that
    reuses the previous leg's JVM inherits its heap/GC state and
    measures slower — an order bias, not a scaling property). Returns
    (build_sec, query_sec)."""
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--scaling-leg",
         str(cpus), corpus_path, str(n_queries)],
        capture_output=True, text=True, check=True,
        env={**os.environ, "SPARK_DRIVER_MEMORY": os.environ.get("SPARK_DRIVER_MEMORY", "32g")},
    )
    r = json.loads(out.stdout.strip().splitlines()[-1])
    return r["build_sec"], r["query_sec"]


def _scaling_leg_main(cpus: int, corpus_path: str, n_queries: int):
    """Subprocess body for one leg; prints one JSON line.

    The whole leg (JVM, task threads, pandas-UDF python workers) is
    PINNED to ``cpus`` physical cores: in local mode ``local[N]`` caps
    only the concurrent Spark tasks — the N Arrow python workers run on
    top, so an unpinned small leg silently overdraws its core budget by
    ~2x and the N-vs-4N comparison understates scaling. An N-executor
    cluster gives the job exactly N cores; the affinity mask is the
    faithful local proxy for that."""
    os.sched_setaffinity(0, set(range(cpus)))  # inherited by JVM + workers

    from textsearch_spark.config import TextConfig
    from textsearch_spark.operators.wand import search_bm25_wand
    from textsearch_spark.plans.build import build_bm25_index_direct
    from textsearch_spark.session import get_spark

    spark = get_spark(f"local[{cpus}]", app_name=f"bench-scaling-{cpus}",
                      shuffle_partitions=max(cpus, 8),
                      # local mode: shuffle files hit the page cache, so
                      # compression is pure CPU overhead (keep it on for
                      # real clusters where shuffle crosses the network)
                      extra_conf={"spark.shuffle.compress": "false",
                                  "spark.shuffle.spill.compress": "false"})
    # the ~240MB corpus parquet packs into 2-4 scan splits under the
    # default maxPartitionBytes — repartition so the CACHED corpus has
    # enough partitions for every task slot (untimed, like the scan)
    corpus = spark.read.parquet(corpus_path).repartition(max(cpus * 2, 64)).cache()
    n_docs = corpus.count()  # materialize outside the timed build

    t0 = time.time()
    # the at-scale build: tokenize -> ONE (token, block) shuffle ->
    # compressed block-max postings (plans/build.build_bm25_index_direct)
    idx = build_bm25_index_direct(corpus, TextConfig(nlist=[1]),
                                  text_col="content", span=4096)
    idx.blocks.count()
    build_sec = time.time() - t0

    texts = [r.content for r in corpus.select("content").limit(300).collect()]
    qdf = _mk_queries(spark, texts, n_queries).cache()
    qdf.count()
    t0 = time.time()
    # fixed (n_buckets, query_groups) at every parallelism level:
    # identical logical work, so the comparison isolates the core count.
    # One bucket per block + 4 query groups = many small uniform tasks:
    # on this synthetic corpus every term is stop-word-dense, so
    # block-max bounds cannot prune and fine buckets maximize balance;
    # a Zipf-vocab corpus would use coarser buckets to engage BMW.
    n_blocks = -(-n_docs // 4096)
    search_bm25_wand(idx, qdf, 10, n_buckets=n_blocks, query_groups=4).count()
    query_sec = time.time() - t0
    spark.stop()
    print(json.dumps({"build_sec": build_sec, "query_sec": query_sec}))


def main():
    # one JVM serves every session in this process; size its heap for
    # the cached 25M-row postings BEFORE the first session starts (an
    # 8g heap evicts the cache and silently penalizes the local[N] run)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    do_scaling = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
    synth_docs = int(os.environ.get("SPARK_GRAFT_SYNTH_DOCS", "480000"))

    timings: dict = {}
    meta: dict = {}
    _bench_sf(sf_dir, cpus, timings, meta)

    scaling: dict = {}
    if do_scaling:
        n_small = int(os.environ.get("SPARK_GRAFT_SCALING_N", "4"))
        nq = 8192
        # alternating runs per level, best-of-N per stage: single-host
        # wall times swing +/-40% with background load and sustained
        # all-core turbo decay, so the minimum is the closest estimate
        # of true capability at each level. A cooldown before each leg
        # lets the host return to the same thermal baseline; raw leg
        # timings are reported so the spread is visible.
        n_big = 4 * n_small
        n_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
        cooldown = int(os.environ.get("SPARK_GRAFT_COOLDOWN_SEC", "10"))
        corpus_path = _gen_scaling_corpus(synth_docs, cpus)
        runs: dict = {n_small: [], n_big: []}
        for _ in range(n_runs):
            for lvl in (n_small, n_big):
                time.sleep(cooldown)
                runs[lvl].append(_scaling_run(lvl, corpus_path, nq))
        b_small = min(r[0] for r in runs[n_small])
        q_small = min(r[1] for r in runs[n_small])
        b_big = min(r[0] for r in runs[n_big])
        q_big = min(r[1] for r in runs[n_big])
        timings[f"synth_build_local{n_small}"] = b_small
        timings[f"synth_build_local{n_big}"] = b_big
        timings[f"synth_query_local{n_small}"] = q_small
        timings[f"synth_query_local{n_big}"] = q_big
        scaling = {
            "n_docs": synth_docs,
            "n_queries": nq,
            "cores": {"N": n_small, "4N": n_big, "pinned": True},
            "raw_legs_sec": {
                f"local{lvl}": [[round(b, 2), round(q, 2)] for b, q in rs]
                for lvl, rs in runs.items()
            },
            "build_rows_per_sec": {f"local{n_small}": round(synth_docs / b_small, 1),
                                   f"local{n_big}": round(synth_docs / b_big, 1)},
            "query_qps": {f"local{n_small}": round(nq / q_small, 1),
                          f"local{n_big}": round(nq / q_big, 1)},
            "build_efficiency": round((synth_docs / b_big) / (4 * synth_docs / b_small), 3),
            "query_efficiency": round((nq / q_big) / (4 * nq / q_small), 3),
        }

    out = {
        "metric": "bm25_index_build_and_topk_query",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "throughput": meta,
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) >= 5 and sys.argv[1] == "--scaling-leg":
        os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
        _scaling_leg_main(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
    else:
        main()
