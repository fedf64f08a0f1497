"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin at sf0.01, compare row count, column
names, and order-insensitive values (exact; floats must match to the
bit after the 6dp rounding both sides apply).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from combblas_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(round(v, 9))
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check", cores=8, shuffle_partitions=16,
                      driver_memory="8g")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    n_or = len(entrymod.oracle_sql())
    print(f"registry: {len(qs)} queries, {n_or} oracled, "
          f"{len(qs) - n_or} rows-only "
          f"({', '.join(k for k in qs if k not in entrymod.oracle_sql())})")
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"columns {sorted(scols)} vs {sorted(ocols)}"))
            print(f"FAIL {name}: column mismatch {sorted(scols)} vs {sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rowcount {len(srows)} vs {len(orows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            continue
        cs, co = canon(srows, scols), canon(orows, ocols)
        if cs != co:
            bad = [(a, b) for a, b in zip(cs, co) if a != b][:5]
            failures.append((name, f"value mismatch, first diffs: {bad}"))
            print(f"FAIL {name}: value mismatch; first diffs: {bad}")
            continue
        print(f"ok   {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, m in failures:
            print(f"  {n}: {m[:300]}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
