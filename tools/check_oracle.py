"""Local emulation of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
over the same sf dir, compare row count, schema (column names), and
order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def canon(df):
    """pandas frame -> sorted list of value tuples with canonical floats."""
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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from textsearch_spark.session import get_spark

    spark = get_spark("local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except duckdb.Error:
            pass

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"{name:28s} rows-only: {n} rows")
            continue
        sdf = fn(spark, sf_dir).toPandas()
        ddf = con.sql(oracles[name]).df()
        sc, sv = canon(sdf)
        dc, dv = canon(ddf)
        status = []
        if sc != dc:
            status.append(f"SCHEMA spark={sc} duck={dc}")
        if len(sv) != len(dv):
            status.append(f"ROWS spark={len(sv)} duck={len(dv)}")
        if not status and sv != dv:
            diffs = [(a, b) for a, b in zip(sv, dv) if a != b]
            status.append(f"VALUES {len(diffs)} differing rows; first: {diffs[0]}")
        if status:
            failures.append(name)
            print(f"{name:28s} FAIL  {' | '.join(status)}")
        else:
            print(f"{name:28s} OK    {len(sv)} rows")
    print("\n==>", "ALL OK" if not failures else f"FAILURES: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
