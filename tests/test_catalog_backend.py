"""Catalog-table backend conformance (r04 verdict item 2): the same
save / load / append / compact lifecycle as the rename and txnlog
backends, executed against tables resolved through ``spark.catalog``.

Every lifecycle test runs on BOTH `_TableIO` paths:

- **v1**: session-catalog managed parquet tables (saveAsTable /
  staged swap) — the no-extra-jars default.
- **v2**: a REAL DataFrameWriterV2 catalog — Spark's built-in JDBC
  TableCatalog over an in-memory Derby database (the only V2
  TableCatalog implementation on this container's classpath; no
  Iceberg/Delta jar ships here). This genuinely executes the
  production code path — ``writeTo(t).createOrReplace() / append() /
  replace()`` against a configured ``spark.sql.catalog.*`` plugin —
  including the non-staging-catalog REPLACE pinning. An Iceberg
  catalog differs only in being a StagingTableCatalog (atomic RTAS,
  no pinning) — the same seam, already branch-covered here.
- **iceberg**: the production target itself, whenever
  iceberg-spark-runtime is on the classpath (``spark-submit
  --packages org.apache.iceberg:iceberg-spark-runtime-...``); a
  Hadoop-warehouse SparkCatalog runs the identical matrix with the
  atomic StagingTableCatalog RTAS. Skipped on classpaths without the
  jar (this container).

The test matrix mirrors tests/test_txnlog_backend.py so all three
backends are held to identical lifecycle semantics."""

import uuid

import pytest
from pyspark.sql import functions as F

from textsearch_spark.config import TextConfig
from textsearch_spark.operators.postings import build_posting_blocks
from textsearch_spark.operators.search import search_bm25
from textsearch_spark.operators.wand import search_bm25_wand
from textsearch_spark.plans.build import build_bm25_index
from textsearch_spark.sources import catalog as cat

CFG = TextConfig(nlist=[1])

V2_CATALOG = "jdbccat"
ICE_CATALOG = "icecat"


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


@pytest.fixture(params=["v1", "v2", "iceberg"])
def prefix(spark, request, tmp_path_factory):
    if request.param == "iceberg":
        # the production target itself: a Hadoop-warehouse Iceberg
        # catalog, exercised whenever iceberg-spark-runtime is on the
        # classpath (spark-submit --packages org.apache.iceberg:...).
        # This container ships no such jar, so the param SKIPS here —
        # the v2 (JDBC TableCatalog) param keeps the writeTo path
        # executing regardless; Iceberg differs from it only in
        # implementing StagingTableCatalog (atomic RTAS, asserted
        # below when the jar is present).
        if not _iceberg_available(spark):
            pytest.skip("no iceberg-spark-runtime jar on the classpath")
        base = f"spark.sql.catalog.{ICE_CATALOG}"
        if spark.conf.get(base, None) is None:
            spark.conf.set(base, "org.apache.iceberg.spark.SparkCatalog")
            spark.conf.set(base + ".type", "hadoop")
            spark.conf.set(base + ".warehouse",
                           str(tmp_path_factory.mktemp("ice_warehouse")))
        ns = f"db_{uuid.uuid4().hex[:8]}"
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {ICE_CATALOG}.{ns}")
        p = f"{ICE_CATALOG}.{ns}.tsidx"
        io = cat._TableIO(spark, p)
        assert io.v2, "Iceberg catalog must take the writeTo path"
        assert io._staging()  # Iceberg: atomic RTAS branch
        yield p
        cat._TableIO(spark, p).drop_all()
        return
    if request.param == "v2":
        head = cat.configure_jdbc_v2_catalog(spark, V2_CATALOG)
        p = f"{head}.tsidx_{uuid.uuid4().hex[:8]}"
        io = cat._TableIO(spark, p)
        assert io.v2, "configured catalog must take the writeTo path"
        assert not io._staging()  # JDBC catalog: non-atomic REPLACE branch
    else:
        p = f"tsidx_{uuid.uuid4().hex[:8]}"
        assert not cat._TableIO(spark, p).v2
    yield p
    cat._TableIO(spark, p).drop_all()


def _base(spark, golden_corpus_df, prefix):
    idx = build_bm25_index(golden_corpus_df, CFG)
    idx.blocks = build_posting_blocks(idx.postings, span=4)
    cat.save_index_catalog(idx, prefix)
    return cat.load_index_catalog(spark, prefix)


def test_save_load_golden_parity(spark, golden_corpus_df, prefix):
    """Loaded-from-catalog index serves the reference golden [6,2,4]
    (test/search.jl:36-38) through BOTH scorers."""
    idx = _base(spark, golden_corpus_df, prefix)
    assert cat.high_water_mark_catalog(spark, prefix) == 7
    q = spark.createDataFrame(
        [(1, "la casa de la manzana verde")], "query_id long, qtext string")
    naive = search_bm25(idx, q, 3).orderBy("rank").collect()
    wand = search_bm25_wand(idx, q, 3, n_buckets=2).orderBy("rank").collect()
    assert [r.doc_id for r in naive] == [6, 2, 4]
    assert [r.doc_id for r in wand] == [6, 2, 4]
    for a, b in zip(naive, wand):
        assert abs(a.score - b.score) < 1e-9


def test_append_frozen_semantics_and_replay(spark, golden_corpus_df, prefix):
    _base(spark, golden_corpus_df, prefix)
    new = spark.createDataFrame(
        [(8, "la manzana verde abcnew"), (9, "la hoja roja rica")],
        "doc_id long, text string")
    m = cat.append_batch_catalog(spark, prefix, new, doc_col="doc_id",
                                 batch_id="epoch-1")
    assert m["n_docs_appended"] == 2 and m["last_doc"] == 9
    assert cat.high_water_mark_catalog(spark, prefix) == 9

    idx = cat.load_index_catalog(spark, prefix)
    dl = {r.doc_id: r.doclen for r in idx.doclens.collect()}
    assert dl[8] == 3       # abcnew is OOV under the frozen vocab
    assert idx.n_docs == 7  # N frozen at fit (reference append_items!)

    # replayed batch_id: recorded metrics, nothing re-appended
    m2 = cat.append_batch_catalog(spark, prefix, new, doc_col="doc_id",
                                  batch_id="epoch-1")
    assert m2.get("replay") is True
    assert cat.load_index_catalog(spark, prefix).doclens.count() == 9

    # appended docs are searchable with frozen scores: naive/WAND parity
    q = spark.createDataFrame([(1, "hoja roja")], "query_id long, qtext string")
    naive = search_bm25(idx, q, 3).orderBy("rank").collect()
    wand = search_bm25_wand(idx, q, 3, n_buckets=2).orderBy("rank").collect()
    assert [r.doc_id for r in naive] == [r.doc_id for r in wand]
    assert 9 in {r.doc_id for r in naive}


def test_compact_preserves_results(spark, golden_corpus_df, prefix):
    _base(spark, golden_corpus_df, prefix)
    # batches share tokens so the same (token, block) group fragments
    for i, text in enumerate(["la casa rica", "la manzana azul", "la verde verde hoja"]):
        cat.append_batch_catalog(
            spark, prefix,
            spark.createDataFrame([(8 + i, text)], "doc_id long, text string"),
            doc_col="doc_id", batch_id=f"e{i}")
    idx = cat.load_index_catalog(spark, prefix)
    q = spark.createDataFrame(
        [(1, "la casa de la manzana verde"), (2, "hoja verde rica")],
        "query_id long, qtext string")
    before = search_bm25_wand(idx, q, 5).orderBy("query_id", "rank").collect()
    frag_groups = idx.blocks.groupBy("token", "block_id").count().filter("count > 1").count()
    assert frag_groups > 0  # appends actually fragmented some groups

    m = cat.compact_index_catalog(spark, prefix)
    idx2 = cat.load_index_catalog(spark, prefix)
    assert idx2.blocks.groupBy("token", "block_id").count().filter("count > 1").count() == 0
    after = search_bm25_wand(idx2, q, 5).orderBy("query_id", "rank").collect()
    assert [(r.query_id, r.rank, r.doc_id) for r in before] == \
           [(r.query_id, r.rank, r.doc_id) for r in after]
    for a, b in zip(before, after):
        assert abs(a.score - b.score) < 1e-9
    assert m["n_block_rows"] > 0
    assert cat.high_water_mark_catalog(spark, prefix) == 10


def test_crashed_append_is_invisible_then_exactly_once(spark, golden_corpus_df, prefix):
    """Write-audit-publish crash window: a batch whose data rows landed
    but whose log row (the publish point) never did must be invisible
    to every reader, and the retry must expose exactly one copy."""
    from textsearch_spark.operators.postings import build_posting_blocks
    from textsearch_spark.streaming.append import compute_batch_postings

    idx = _base(spark, golden_corpus_df, prefix)
    q = spark.createDataFrame([(1, "hoja roja")], "query_id long, qtext string")
    before = search_bm25(idx, q, 3).orderBy("rank").collect()

    new = spark.createDataFrame(
        [(8, "la hoja roja rica")], "doc_id long, text string")
    postings, n_new, first_doc, last_doc, docs = compute_batch_postings(
        spark, idx, new, doc_col="doc_id", text_col="text",
        hwm=cat.high_water_mark_catalog(spark, prefix))
    postings = postings.cache()
    blocks = build_posting_blocks(postings, span=4)
    # the crash: data written, publish log row never happens
    cat._write_batch_data(cat._TableIO(spark, prefix), postings, blocks)
    postings.unpersist()
    docs.unpersist()

    idx2 = cat.load_index_catalog(spark, prefix)
    assert idx2.doclens.count() == 7          # orphan rows invisible
    assert cat.high_water_mark_catalog(spark, prefix) == 7
    after_crash = search_bm25(idx2, q, 3).orderBy("rank").collect()
    assert [(r.doc_id, r.score) for r in before] == \
           [(r.doc_id, r.score) for r in after_crash]

    # the retry publishes exactly one copy
    m = cat.append_batch_catalog(spark, prefix, new, doc_col="doc_id",
                                 batch_id="retry-1")
    assert m["n_docs_appended"] == 1 and m["last_doc"] == 8
    idx3 = cat.load_index_catalog(spark, prefix)
    assert idx3.doclens.count() == 8
    assert idx3.doclens.filter("doc_id = 8").count() == 1
    assert idx3.postings.groupBy("token", "doc_id").count() \
        .filter("count > 1").count() == 0     # no doubled postings
    res = search_bm25(idx3, q, 3).orderBy("rank").collect()
    assert 8 in {r.doc_id for r in res}

    # vacuum reclaims the orphan rows; nothing published is touched
    removed = cat.vacuum_catalog(spark, prefix)
    assert removed["doclens"] == 1 and removed["postings"] > 0
    idx4 = cat.load_index_catalog(spark, prefix)
    assert idx4.doclens.count() == 8
    res2 = search_bm25(idx4, q, 3).orderBy("rank").collect()
    assert [(r.doc_id, r.score) for r in res] == \
           [(r.doc_id, r.score) for r in res2]
    assert cat.vacuum_catalog(spark, prefix) == \
        {"blocks": 0, "postings": 0, "doclens": 0}


def test_v2_identifier_detection(spark):
    assert not cat._is_v2_identifier(spark, "plain_table")
    assert not cat._is_v2_identifier(spark, "default.plain_table")
    spark.conf.set("spark.sql.catalog.lakehouse", "org.example.FakeCatalog")
    try:
        assert cat._is_v2_identifier(spark, "lakehouse.db.tbl")
    finally:
        spark.conf.unset("spark.sql.catalog.lakehouse")


def test_catalog_time_travel(spark, golden_corpus_df, prefix):
    """as_of serves the index as of any published commit by filtering
    publication to the log prefix; snapshots older than a later
    compaction raise (the blocks REPLACE is physical on this backend's
    own log — an Iceberg catalog serves those via VERSION AS OF)."""
    _base(spark, golden_corpus_df, prefix)
    q = spark.createDataFrame([(1, "hoja roja rica")], "query_id long, qtext string")

    def top(idx):
        return [(r.rank, r.doc_id, round(r.score, 9))
                for r in search_bm25_wand(idx, q, 3).orderBy("rank").collect()]

    snap1 = top(cat.load_index_catalog(spark, prefix))  # docs 1..7
    cat.append_batch_catalog(
        spark, prefix,
        spark.createDataFrame([(8, "la hoja roja rica")], "doc_id long, text string"),
        doc_col="doc_id", batch_id="e0")
    snap2 = top(cat.load_index_catalog(spark, prefix))
    cat.append_batch_catalog(
        spark, prefix,
        spark.createDataFrame([(9, "roja roja hoja")], "doc_id long, text string"),
        doc_col="doc_id", batch_id="e1")

    hist = cat.log_history_catalog(spark, prefix)
    assert [h["op"] for h in hist] == ["init", "append", "append"]
    t_init, t_e0, t_e1 = (h["committed_at"] for h in hist)

    at1 = cat.load_index_catalog(spark, prefix, as_of=t_init)
    assert at1.doclens.count() == 7 and at1.last_doc == 7
    assert top(at1) == snap1
    at2 = cat.load_index_catalog(spark, prefix, as_of=t_e0)
    assert at2.doclens.count() == 8 and at2.last_doc == 8
    assert top(at2) == snap2
    assert cat.load_index_catalog(spark, prefix, as_of=t_e1).doclens.count() == 9

    # a later compaction replaces the blocks table: older snapshots
    # become unreachable through this backend's own log and raise
    cat.compact_index_catalog(spark, prefix)
    with pytest.raises(ValueError, match="compaction"):
        cat.load_index_catalog(spark, prefix, as_of=t_e0)
    # the post-compaction present (and any later as_of) still serves
    hist2 = cat.log_history_catalog(spark, prefix)
    assert hist2[-1]["op"] == "compact"
    at_now = cat.load_index_catalog(spark, prefix, as_of=hist2[-1]["committed_at"])
    assert at_now.doclens.count() == 9
    assert top(at_now) == top(cat.load_index_catalog(spark, prefix))


def test_duplicate_publish_resolves_to_one_winner(spark, golden_corpus_df, prefix):
    """r05 review: log appends never conflict (not even on Iceberg), so
    a slow original racing its own retry can publish the same batch
    TWICE. Readers must honor only the earliest append log row per
    batch_id; the loser's rows are orphans vacuum reclaims."""
    import time as _time

    from textsearch_spark.operators.postings import build_posting_blocks
    from textsearch_spark.streaming.append import compute_batch_postings

    _base(spark, golden_corpus_df, prefix)
    new = spark.createDataFrame(
        [(8, "la hoja roja rica")], "doc_id long, text string")
    m = cat.append_batch_catalog(spark, prefix, new, doc_col="doc_id",
                                 batch_id="race-1")
    assert m["n_docs_appended"] == 1

    # the racing duplicate: same batch content, fresh commit_id, its
    # own (later) log row — exactly what a slow first attempt landing
    # after the retry's publish looks like
    io = cat._TableIO(spark, prefix)
    idx = cat.load_index_catalog(spark, prefix)
    postings, _, _, _, docs = compute_batch_postings(
        spark, idx, new, doc_col="doc_id", text_col="text", hwm=7)
    postings = postings.cache()
    blocks = build_posting_blocks(postings, span=4)
    commit_id, n_rows = cat._write_batch_data(io, postings, blocks)
    io.append(spark.createDataFrame(
        [("append", "race-1", commit_id, 8, n_rows, _time.time(), None)],
        cat._LOG_SCHEMA), "log")
    postings.unpersist()
    docs.unpersist()

    # exactly ONE copy visible despite two published-looking log rows
    idx2 = cat.load_index_catalog(spark, prefix)
    assert idx2.doclens.filter("doc_id = 8").count() == 1
    assert idx2.postings.groupBy("token", "doc_id").count() \
        .filter("count > 1").count() == 0
    q = spark.createDataFrame([(1, "hoja roja")], "query_id long, qtext string")
    res = search_bm25(idx2, q, 3).orderBy("rank").collect()

    # vacuum reclaims the loser's rows; results unchanged
    removed = cat.vacuum_catalog(spark, prefix)
    assert removed["doclens"] == 1 and removed["postings"] > 0
    res2 = search_bm25(cat.load_index_catalog(spark, prefix), q, 3) \
        .orderBy("rank").collect()
    assert [(r.doc_id, r.score) for r in res] == \
           [(r.doc_id, r.score) for r in res2]


def test_phantom_compact_does_not_bar_time_travel(spark, golden_corpus_df, prefix):
    """r05 review: compaction publishes its log row BEFORE the REPLACE;
    a crash between the two leaves a compact entry that replaced
    nothing. Older snapshots are still fully materialized and must not
    be rejected for it."""
    import time as _time
    import uuid as _uuid

    _base(spark, golden_corpus_df, prefix)
    cat.append_batch_catalog(
        spark, prefix,
        spark.createDataFrame([(8, "la hoja roja rica")], "doc_id long, text string"),
        doc_col="doc_id", batch_id="e0")
    hist = cat.log_history_catalog(spark, prefix)
    t_e0 = hist[-1]["committed_at"]

    # the crash: compact log row lands, the REPLACE never runs
    io = cat._TableIO(spark, prefix)
    io.append(spark.createDataFrame(
        [("compact", None, f"cmp-{_uuid.uuid4().hex[:12]}", 8, 0, _time.time(),
          None)],
        cat._LOG_SCHEMA), "log")

    # time travel to the pre-"compaction" snapshot still serves
    at = cat.load_index_catalog(spark, prefix, as_of=t_e0)
    assert at.doclens.count() == 8
    assert cat.load_index_catalog(spark, prefix).doclens.count() == 8

    # a REAL compaction afterwards does bar older snapshots
    cat.compact_index_catalog(spark, prefix)
    with pytest.raises(ValueError, match="compaction"):
        cat.load_index_catalog(spark, prefix, as_of=t_e0)
