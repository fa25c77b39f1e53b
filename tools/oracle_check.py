"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet dir; compare
row count, column names, and order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from debezium_connector_yugabytedb_1_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    if v is None:
        return "\x00NULL"  # total order vs strings (None is not sortable)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, bool):
        return bool(v)
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"{name:32s} SPARK-ERROR {e}")
            continue
        if name not in oracles:
            print(f"{name:32s} rows-only: {len(srows)} rows, cols={scols}")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"{name:32s} DUCKDB-ERROR {e}")
            continue
        ok = True
        msgs = []
        if sorted(scols) != sorted(ocols):
            ok = False
            msgs.append(f"cols {scols} vs {ocols}")
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"rowcount {len(srows)} vs {len(orows)}")
        if ok:
            order = sorted(scols)
            sset = sorted(
                tuple(norm(r[c]) for c in order) for r in (row.asDict() for row in srows)
            )
            omap = [dict(zip(ocols, r)) for r in orows]
            oset = sorted(tuple(norm(r[c]) for c in order) for r in omap)
            if sset != oset:
                ok = False
                diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                msgs.append(f"values differ, first diffs: {diff}")
        status = "OK" if ok else "MISMATCH"
        print(f"{name:32s} {status} ({len(srows)} rows)" + ("  " + "; ".join(msgs) if msgs else ""))
        if not ok:
            failures.append((name, "; ".join(msgs)))
    print()
    if failures:
        print("FAILURES:", [f[0] for f in failures])
        sys.exit(1)
    print("ALL ORACLE CHECKS PASS")


if __name__ == "__main__":
    main()
