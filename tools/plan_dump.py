"""Dump ``.explain("formatted")`` for declared queries to plans/<tag>/.

Usage:
  python tools/plan_dump.py <tag> [query,query,...]   # default: bench set

Writes plans/<tag>/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX, default
"before").  Queries that execute eagerly at build time (the incremental
index queries return a localCheckpoint) still dump the returned plan; their
internal structure is evidenced by the job profiler (bench_extra.py)
instead.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entrymod
    from bench import BENCH_QUERIES
    from debezium_connector_yugabytedb_1_spark.session import get_spark

    tag = sys.argv[1] if len(sys.argv) > 1 else "r07"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else BENCH_QUERIES
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    out_dir = os.path.join("plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-dump")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
