"""Streaming-front-end soak: the Structured-Streaming twin of tools/soak.py.

tools/soak.py proves the foreachBatch body (``apply_batch``) is O(1) per
trigger by driving it directly; this harness proves the SAME profile holds
through the real ``stream.run_streaming`` path — file source with
``maxFilesPerTrigger`` backpressure, foreachBatch dispatch, ConsistentGate
release, TaskMetrics ticking, gate drain at end-of-log — so the
Structured-Streaming wrapper itself adds no O(#triggers) driver or disk
state.

Protocol: one segmented WAL (one file per segment; ``maxFilesPerTrigger``
slices it into many triggers), ``run_streaming`` with gate + metrics and a
``batch_hook`` recording per-trigger wall + every state dimension that
could grow with trigger count, then a one-shot ``apply_batch`` replay of
the same log on a fresh table; final states must be sha256-identical (the
gate guarantees convergence-to-batch despite the file source's
non-offset-ordered delivery).

Usage (round artifact): python tools/soak_stream.py --out BENCH/soak_stream_r6.json
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_connector_yugabytedb_1_spark.generator import (  # noqa: E402
    generate_events,
    write_events,
)
from debezium_connector_yugabytedb_1_spark.lake import LakeTable  # noqa: E402
from debezium_connector_yugabytedb_1_spark.operators.checkpoint import (  # noqa: E402
    CheckpointStore,
)
from debezium_connector_yugabytedb_1_spark.operators.metrics import (  # noqa: E402
    TaskMetrics,
)
from debezium_connector_yugabytedb_1_spark.session import get_spark  # noqa: E402
from debezium_connector_yugabytedb_1_spark.streaming.gate import (  # noqa: E402
    ConsistentGate,
)
from debezium_connector_yugabytedb_1_spark.streaming.stream import (  # noqa: E402
    apply_batch,
    run_streaming,
)

COLS = [("commit", "string"), ("lang", "string"), ("content", "string")]


def _sha_state(table: LakeTable) -> tuple[str, int]:
    rows = sorted(map(str, table.read().collect()))
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
    return h.hexdigest(), len(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=12_000_000)
    ap.add_argument("--segments", type=int, default=96)
    ap.add_argument("--max-files-per-trigger", type=int, default=2)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--n-tablets", type=int, default=8)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--root", default="/tmp/spark_graft_soak_stream")
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-oneshot", action="store_true")
    args = ap.parse_args()

    import shutil

    shutil.rmtree(args.root, ignore_errors=True)
    os.makedirs(args.root)
    spark = get_spark(cores=args.cores)
    seg_size = args.events // args.segments
    total_events = seg_size * args.segments

    wal = os.path.join(args.root, "wal")
    t_gen0 = time.monotonic()
    write_events(
        generate_events(
            spark, total_events, n_tablets=args.n_tablets,
            payload_format="shredded",
        ),
        wal,
        segment_size=seg_size,
    )
    gen_wall = time.monotonic() - t_gen0

    table = LakeTable(spark, os.path.join(args.root, "lake"),
                      n_buckets=args.n_buckets)
    table.init(COLS)
    ckpt = CheckpointStore(spark, os.path.join(args.root, "ckpt"),
                           keep_history=10)
    gate = ConsistentGate(
        spark, os.path.join(args.root, "gate"),
        tablets=[f"tablet-{i}" for i in range(args.n_tablets)],
    )
    metrics = TaskMetrics()

    triggers: list[dict] = []

    def hook(bid, wall):
        st = gate.state()
        triggers.append({
            "trigger": int(bid),
            "wall_s": round(wall, 3),
            "gate_segments": len(st["segments"]),
            "gate_state_bytes": os.path.getsize(gate._state_path()),
            "versions": len(os.listdir(os.path.join(args.root, "lake", "_versions"))),
            "data_dirs": len(os.listdir(os.path.join(args.root, "lake", "data"))),
            "ckpt_entries": len(os.listdir(os.path.join(args.root, "ckpt"))),
            "metrics_events": metrics.snapshot()["TotalNumberOfEventsSeen"],
        })
        print(json.dumps(triggers[-1]), flush=True)

    # the event-log glob skips partition discovery on the segment dirs (the
    # streaming schema is explicit and apply_batch never needs the segment
    # column)
    t_run0 = time.monotonic()
    run_streaming(
        spark, os.path.join(wal, "segment=*"), table, ckpt,
        os.path.join(args.root, "sckpt"),
        gate=gate, expire_keep=8, task_metrics=metrics, batch_hook=hook,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    run_wall = time.monotonic() - t_run0
    sha, n_rows = _sha_state(table)

    result = {
        "events": total_events,
        "segments": args.segments,
        "max_files_per_trigger": args.max_files_per_trigger,
        "triggers": len(triggers),
        "cores": args.cores,
        "gen_wall_s": round(gen_wall, 1),
        "run_wall_s": round(run_wall, 1),
        "events_per_sec": round(total_events / run_wall),
        "final_rows": n_rows,
        "final_sha256": sha,
        "metrics_total_events": metrics.snapshot()["TotalNumberOfEventsSeen"],
        "per_trigger": triggers,
    }
    n = len(triggers)
    early = [t["wall_s"] for t in triggers[2: max(3, n // 3)]]
    tail = [t["wall_s"] for t in triggers[-max(3, n // 3):]]
    if early and tail:
        result["wall_early_mean_s"] = round(sum(early) / len(early), 3)
        result["wall_tail_mean_s"] = round(sum(tail) / len(tail), 3)
        result["wall_tail_over_early"] = round(
            result["wall_tail_mean_s"] / result["wall_early_mean_s"], 3
        )
    result["max_gate_segments"] = max(t["gate_segments"] for t in triggers)
    result["max_versions"] = max(t["versions"] for t in triggers)
    result["max_ckpt_entries"] = max(t["ckpt_entries"] for t in triggers)
    result["max_gate_state_bytes"] = max(t["gate_state_bytes"] for t in triggers)

    if not args.skip_oneshot:
        t1 = LakeTable(spark, os.path.join(args.root, "oneshot"),
                       n_buckets=args.n_buckets)
        t1.init(COLS)
        ck1 = CheckpointStore(spark, os.path.join(args.root, "ck1"))
        t0 = time.monotonic()
        apply_batch(
            generate_events(spark, total_events, n_tablets=args.n_tablets,
                            payload_format="shredded"),
            "oneshot", t1, ck1,
        )
        result["oneshot_wall_s"] = round(time.monotonic() - t0, 1)
        sha1, n1 = _sha_state(t1)
        result["oneshot_sha256"] = sha1
        result["oneshot_rows"] = n1
        result["state_matches_oneshot"] = sha1 == sha and n1 == n_rows

    print(json.dumps({k: v for k, v in result.items() if k != "per_trigger"},
                     indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    ok = (
        result.get("state_matches_oneshot", True)
        and result.get("wall_tail_over_early", 1.0) < 1.5
        and result["max_gate_segments"] <= ConsistentGate.MAX_LIVE_SEGMENTS + 1
        and result["max_versions"] <= 8 + 1
        and result["max_ckpt_entries"] <= 2 * 10 + 2
        and result["metrics_total_events"] > 0
    )
    print("SOAK-STREAM", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
