"""Round-7 measurement sidecar (bench.py is frozen for the driver).

Per declared bench query: wall seconds for the same ``.count()`` the
official bench times, the number of Spark jobs launched, and total task
time — the fixed-cost attribution the optimization round needs (at sf0.1
the documents table is 5k rows; expensive queries are driver-job/plan
bound, not data bound).

Usage:
  python bench_extra.py [--reps N] [--queries a,b,c] [--noop]

Prints one JSON line: per-query [wall_sec...], jobs, tasktime_sec (from the
last rep), plus loadavg tags.  ``--noop`` times a noop-sink write instead
of count() (guide §1.4) — isolates full-row computation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entrymod
    from bench import BENCH_QUERIES
    from debezium_connector_yugabytedb_1_spark.session import get_spark

    reps = 3
    names = list(BENCH_QUERIES)
    noop = "--noop" in sys.argv
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")

    spark = get_spark(app_name="bench-extra")
    sc = spark.sparkContext
    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        walls = []
        jobs = None
        for i in range(reps):
            group = f"bx-{name}-{i}"
            sc.setJobGroup(group, f"bench_extra:{name}:rep{i}")
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            walls.append(round(time.monotonic() - t0, 3))
            jobs = len(sc.statusTracker().getJobIdsForGroup(group) or [])
            sc._jsc.clearJobGroup()
        out[name] = {"wall": walls, "min": min(walls), "jobs": jobs}
        print(f"{name}: {walls} jobs={jobs}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "mode": "noop" if noop else "count",
                "sf_dir": SF_DIR,
                "reps": reps,
                "loadavg": os.getloadavg()[0],
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
