"""Local correctness harness mimicking the driver's oracle compare.

Runs every __spark_entry__.queries() entry at the given SF, runs the matching
oracle_sql() in DuckDB over the same parquet views, and compares:
row count, column names, and an order-insensitive value hash (doubles rounded
to 9 significant-ish decimals to absorb float summation-order noise).

Usage:  python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canonical(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            df[c] = s.round(6)
        elif s.dtype.kind == "M":
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(sorted(v)) if isinstance(v, (list, tuple)) else str(v))
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    return hashlib.md5(str(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from kstream_spark import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single parquet FILES; Spark-written fixtures
        # (tools/gen_sf.py output) are DIRECTORIES of part files
        import os
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(sdf)} ({dt:.1f}s) [no oracle — rows-only]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems and canonical(sdf) != canonical(odf):
            problems.append("value-hash mismatch")
            merged = sdf[sorted(sdf.columns)].round(6) if len(sdf) else sdf
            print(merged.head(3))
            print(odf[sorted(odf.columns)].head(3))
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name}: rows={len(sdf)} ({dt:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
