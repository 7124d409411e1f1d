"""spark-submit packaging smoke test (r02 verdict item 8): the
--py-files zip must be self-contained — a fresh subprocess whose ONLY
import source for the package is the zip (cwd outside the repo,
PYTHONPATH = the zip) runs build -> append -> search through cli.py.
Executor-side shipping uses the same zip via ``get_spark``'s
``addPyFile``, which is the mechanism spark-submit --py-files uses."""

import json
import os
import subprocess
import sys


def test_cli_build_append_search_from_zip(spark, golden_corpus_df, tmp_path):
    from textsearch_spark.session import package_zip

    zip_path = package_zip(str(tmp_path / "textsearch_spark.zip"))
    corpus = str(tmp_path / "corpus")
    extra = str(tmp_path / "extra")
    queries = str(tmp_path / "queries")
    index = str(tmp_path / "idx")
    out = str(tmp_path / "results")
    golden_corpus_df.write.parquet(corpus)
    spark.createDataFrame(
        [(8, "la manzana verde rica")], "doc_id long, text string"
    ).write.parquet(extra)
    spark.createDataFrame(
        [(0, "la casa de la manzana verde"), (1, "hoja verde")],
        "query_id long, qtext string",
    ).write.parquet(queries)

    env = {**os.environ,
           # the zip is the ONLY way to import the package
           "PYTHONPATH": zip_path,
           "SPARK_GRAFT_CPUS": "2"}
    env.pop("PYTHONSTARTUP", None)

    def cli(*args):
        r = subprocess.run(
            [sys.executable, "-m", "textsearch_spark.cli", *args],
            cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=420,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        return r.stdout

    o = cli("build", "--input", corpus, "--index", index, "--block-span", "4")
    assert "n_docs=7" in o
    o = cli("append", "--input", extra, "--index", index, "--doc-col", "doc_id")
    assert "appended 1 docs from id 8" in o
    o = cli("compact", "--index", index)
    assert "folded 1 appends" in o
    assert not os.listdir(os.path.join(index, "appends"))  # drained
    cli("search", "--index", index, "--queries", queries,
        "--k", "3", "--engine", "wand", "--output", out)

    res = spark.read.parquet(out).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id))
    assert sorted(r[1] for r in by_q[0]) and len(by_q) == 2
    # golden ordering for the reference query (test/search.jl:36-38 is
    # on the pruned-vocab index; here unpruned — just require doc 8,
    # the appended doc, to be retrievable via 'manzana verde'
    assert any(d == 8 for _, d in by_q[0])
    # manifests recorded the lineage: build stages + the compaction that
    # consumed the append (append manifests are folded away by compact)
    stages = {json.load(open(os.path.join(index, "_manifests", f)))["stage"]
              for f in os.listdir(os.path.join(index, "_manifests"))}
    assert "index" in stages and "blocks" in stages
    assert "compaction" in stages
    assert not any(s.startswith("append_") for s in stages)


def test_cli_txnlog_history_and_time_travel(spark, golden_corpus_df, tmp_path):
    """CLI surface for the txnlog backend: build/append, `history`
    lists the snapshots, and `search --at-seq` serves the older one."""
    from textsearch_spark.session import package_zip

    zip_path = package_zip(str(tmp_path / "textsearch_spark.zip"))
    corpus = str(tmp_path / "corpus")
    extra = str(tmp_path / "extra")
    queries = str(tmp_path / "queries")
    index = str(tmp_path / "idx_txn")
    out_now = str(tmp_path / "res_now")
    out_old = str(tmp_path / "res_old")
    golden_corpus_df.write.parquet(corpus)
    spark.createDataFrame(
        [(8, "la hoja roja rica")], "doc_id long, text string"
    ).write.parquet(extra)
    spark.createDataFrame(
        [(0, "hoja roja rica")], "query_id long, qtext string"
    ).write.parquet(queries)

    env = {**os.environ, "PYTHONPATH": zip_path, "SPARK_GRAFT_CPUS": "2"}
    env.pop("PYTHONSTARTUP", None)

    def cli(*args):
        r = subprocess.run(
            [sys.executable, "-m", "textsearch_spark.cli", *args],
            cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=420,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        return r.stdout

    cli("build", "--input", corpus, "--index", index, "--block-span", "4",
        "--backend", "txnlog")
    cli("append", "--input", extra, "--index", index, "--doc-col", "doc_id",
        "--backend", "txnlog")
    hist = [json.loads(l) for l in
            cli("history", "--index", index, "--backend", "txnlog").splitlines()]
    assert [h["op"] for h in hist] == ["init", "append"]

    cli("search", "--index", index, "--queries", queries, "--k", "3",
        "--backend", "txnlog", "--output", out_now)
    cli("search", "--index", index, "--queries", queries, "--k", "3",
        "--backend", "txnlog", "--at-seq", str(hist[0]["seq"]),
        "--output", out_old)
    now_docs = {r.doc_id for r in spark.read.parquet(out_now).collect()}
    old_docs = {r.doc_id for r in spark.read.parquet(out_old).collect()}
    assert 8 in now_docs
    assert 8 not in old_docs and old_docs  # the pre-append snapshot


def test_cli_time_travel_flags_require_matching_backend():
    """--at-seq / --as-of on the wrong backend must be an argparse
    error (exit 2), not a silently-ignored flag serving latest."""
    import pytest

    from textsearch_spark.cli import main

    base = ["search", "--index", "x", "--queries", "q", "--output", "o"]
    for extra in (["--at-seq", "1"],                      # default rename
                  ["--at-seq", "1", "--backend", "catalog"],
                  ["--as-of", "1.5"],                     # default rename
                  ["--as-of", "1.5", "--backend", "txnlog"]):
        with pytest.raises(SystemExit) as ei:
            main(base + extra)
        assert ei.value.code == 2


def test_cli_catalog_backend_lifecycle_cross_process(spark, golden_corpus_df,
                                                     tmp_path):
    """The catalog backend driven ENTIRELY through the CLI, each step a
    separate process: --conf spark.sql.catalogImplementation=hive gives
    the session catalog a persistent (cwd-local Derby) metastore, so
    tables registered by `build` are visible to the later `append` /
    `history` / `search` processes — the local stand-in for the shared
    metastore every real cluster deployment has. Also pins the CLI
    --as-of time-travel path end-to-end."""
    from textsearch_spark.session import package_zip

    zip_path = package_zip(str(tmp_path / "textsearch_spark.zip"))
    corpus = str(tmp_path / "corpus")
    extra = str(tmp_path / "extra")
    queries = str(tmp_path / "queries")
    out_now = str(tmp_path / "res_now")
    out_old = str(tmp_path / "res_old")
    golden_corpus_df.write.parquet(corpus)
    spark.createDataFrame(
        [(8, "la hoja roja rica")], "doc_id long, text string"
    ).write.parquet(extra)
    spark.createDataFrame(
        [(0, "hoja roja rica")], "query_id long, qtext string"
    ).write.parquet(queries)

    env = {**os.environ, "PYTHONPATH": zip_path, "SPARK_GRAFT_CPUS": "2"}
    env.pop("PYTHONSTARTUP", None)
    hive = "--conf=spark.sql.catalogImplementation=hive"

    def cli(*args):
        r = subprocess.run(
            [sys.executable, "-m", "textsearch_spark.cli", hive, *args],
            cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=420,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        return r.stdout

    cli("build", "--input", corpus, "--index", "tsidx", "--block-span", "4",
        "--backend", "catalog")
    o = cli("append", "--input", extra, "--index", "tsidx",
            "--doc-col", "doc_id", "--backend", "catalog")
    assert "appended 1 docs" in o
    hist = [json.loads(l) for l in
            cli("history", "--index", "tsidx",
                "--backend", "catalog").splitlines()]
    assert [h["op"] for h in hist] == ["init", "append"]

    cli("search", "--index", "tsidx", "--queries", queries, "--k", "3",
        "--backend", "catalog", "--output", out_now)
    cli("search", "--index", "tsidx", "--queries", queries, "--k", "3",
        "--backend", "catalog", "--as-of", str(hist[0]["committed_at"]),
        "--output", out_old)
    now_docs = {r.doc_id for r in spark.read.parquet(out_now).collect()}
    old_docs = {r.doc_id for r in spark.read.parquet(out_old).collect()}
    assert 8 in now_docs
    assert 8 not in old_docs and old_docs  # the pre-append snapshot
