"""Self-protecting driver correctness coverage (r03 verdict item 1).

The per-round driver records correctness for only the first
``DRIVER_WINDOW`` entries of ``__spark_entry__.queries()``; in r03 two
entries silently fell off the end with no recorded error. These tests
make that cap structurally harmless:

- ``test_queries_layout`` asserts the ordering contract: every entry
  inside the window has a DuckDB oracle, and past the window every
  oracle entry precedes every rows-only entry (so nothing with a hard
  check can hide behind a soft one).
- ``test_overflow_entries_against_oracle`` runs every entry PAST the
  window through the same rows+schema+values comparison the driver
  uses, at the driver's scale factor (sf0.01) — oracle entries compare
  against DuckDB; rows-only entries must at least produce rows.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df):
    """pandas frame -> (sorted cols, sorted canonical value tuples) —
    mirrors the driver's order-insensitive compare (tools/check_oracle)."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(f"{v:.10g}")
            elif isinstance(v, (bytes, bytearray, memoryview)):
                vals.append(bytes(v).hex())
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return cols, out


def test_queries_layout():
    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    # every oracle key must name a real query
    missing = [k for k in oracles if k not in qs]
    assert not missing, f"oracle_sql keys without queries() entries: {missing}"
    window = qs[: entrymod.DRIVER_WINDOW]
    no_oracle_in_window = [n for n in window if n not in oracles]
    assert not no_oracle_in_window, (
        "rows-only entries may not occupy driver-window positions "
        f"(they'd waste a hard-check slot): {no_oracle_in_window}"
    )
    # past the window: oracle entries first, rows-only strictly last
    tail = qs[entrymod.DRIVER_WINDOW:]
    seen_rows_only = None
    for n in tail:
        if n not in oracles:
            seen_rows_only = n
        elif seen_rows_only is not None:
            raise AssertionError(
                f"oracle entry {n!r} ordered after rows-only entry "
                f"{seen_rows_only!r}; oracle entries must come first in the tail"
            )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def test_overflow_entries_against_oracle(spark, duck):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    tail = list(qs)[entrymod.DRIVER_WINDOW:]
    assert tail, "no overflow entries — window covers everything (fine, but update this test)"
    failures = []
    for name in tail:
        sdf = qs[name](spark, SF_DIR)
        if name not in oracles:
            n = sdf.count()
            if n <= 0:
                failures.append(f"{name}: rows-only entry produced {n} rows")
            continue
        sc, sv = _canon(sdf.toPandas())
        dc, dv = _canon(duck.sql(oracles[name]).df())
        if sc != dc:
            failures.append(f"{name}: schema spark={sc} duck={dc}")
        elif len(sv) != len(dv):
            failures.append(f"{name}: rows spark={len(sv)} duck={len(dv)}")
        elif sv != dv:
            diffs = [(a, b) for a, b in zip(sv, dv) if a != b]
            failures.append(f"{name}: {len(diffs)} differing rows; first {diffs[0]}")
    assert not failures, "\n".join(failures)
