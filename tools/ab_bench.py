"""Interleaved same-window A/B bench: two engine trees, alternating reps.

Cross-day absolute throughput on this host drifts ~30% (BENCH/BASELINE.md
control #5), so the only trustworthy engine-vs-engine comparison is
alternating runs of both trees inside one window on one corpus.  This
harness runs `python bench.py` in tree A, then tree B, then A, ... for
--reps rounds, parses each run's one-line JSON, and writes a summary with
per-rep headline throughput, per-query medians, and the B/A ratio.

Usage:
  python tools/ab_bench.py --tree-a /root/repo --label-a r5 \
      --tree-b /tmp/r3tree --label-b r3 --reps 3 \
      --out BENCH/ab_r5_vs_r3.json

Both trees must share the corpus cache under /tmp/ybcdc_bench (same
CORPUS_VER/WIRE), so the first run warms it for every later run and no
rep pays generation cost.  Runs are strictly sequential (never overlap
Spark work on this host — it corrupts both measurements).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def run_once(tree: str, env: dict, extra: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, "bench.py", *extra],
        cwd=tree,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        timeout=900,
    )
    out = proc.stdout.decode().strip()
    if proc.returncode != 0 or not out:
        tail = proc.stderr.decode(errors="replace").strip().splitlines()[-15:]
        raise RuntimeError(
            f"bench.py in {tree} exited {proc.returncode} with "
            f"{'no stdout' if not out else 'stdout'}; stderr tail:\n"
            + "\n".join(tail)
        )
    return json.loads(out.splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree-a", required=True)
    ap.add_argument("--tree-b", required=True)
    ap.add_argument("--label-a", default="A")
    ap.add_argument("--label-b", default="B")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--headline-only", action="store_true",
        help="pass --single --no-queries to bench.py (replay only, ~3x more reps per window)",
    )
    args = ap.parse_args()

    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    trees = [(args.label_a, args.tree_a), (args.label_b, args.tree_b)]
    reps: dict[str, list[dict]] = {args.label_a: [], args.label_b: []}
    t0 = time.time()
    for rep in range(args.reps):
        for label, tree in trees:
            # always --single: this harness does its own interleaved reps and
            # must see each window's raw number, not bench.py's best-of-N
            extra = ["--single", "--no-queries"] if args.headline_only else ["--single"]
            r = run_once(tree, env, extra)
            reps[label].append(r)
            print(
                f"rep {rep} {label}: {r['events_per_sec']} ev/s "
                f"({r['value']}s headline)",
                file=sys.stderr,
                flush=True,
            )

    def med(label: str, key) -> float:
        return statistics.median(key(r) for r in reps[label])

    summary = {
        "window_started_utc_epoch": int(t0),
        "window_seconds": round(time.time() - t0, 1),
        "reps": args.reps,
        "interleaved": True,
        "corpus": "shared /tmp/ybcdc_bench cache (identical bytes for both trees)",
        "trees": {args.label_a: args.tree_a, args.label_b: args.tree_b},
        "events_per_sec": {
            lab: [r["events_per_sec"] for r in rs] for lab, rs in reps.items()
        },
        "median_events_per_sec": {
            lab: med(lab, lambda r: r["events_per_sec"]) for lab in reps
        },
        "queries_median_sec": {
            lab: {
                q: round(statistics.median(r["queries"][q] for r in reps[lab]), 3)
                for q in reps[lab][0]["queries"]
                if all(q in r["queries"] for r in reps[lab])
            }
            for lab in reps
        },
        "raw": reps,
    }
    a, b = args.label_a, args.label_b
    summary["ratio_" + a + "_over_" + b] = round(
        summary["median_events_per_sec"][a] / summary["median_events_per_sec"][b], 3
    )
    out = json.dumps(summary, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
        print(f"wrote {args.out}", file=sys.stderr)
    print(out)


if __name__ == "__main__":
    main()
