"""Per-stage profiler for Spark event logs — the feedback loop used to find
the reduce-stage idling and per-thread CPU inflation documented in
BENCH/BASELINE.md.

Usage:
  1. run any workload with
       extra_conf={"spark.eventLog.enabled": "true",
                   "spark.eventLog.dir": "file:///tmp/evlog"}
  2. python tools/stage_profile.py /tmp/evlog

Prints, per application and stage: wall time, summed task time, executor CPU
(GC excluded), GC time, shuffle write/fetch-wait time, and bytes. Stage
tasktime/wall ≈ cores ⇒ saturated; tasktime ≪ wall×cores ⇒ idle (skew or
wave quantization); CPU growing at higher core counts for identical work ⇒
memory-subsystem contention (this host's 2→8-thread ceiling).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys


def _lines(path: str):
    if path.endswith(".zstd"):
        out = subprocess.run(["zstd", "-dc", path], capture_output=True)
        return out.stdout.decode().splitlines()
    return open(path)


def profile(evlog_dir: str) -> None:
    for d in sorted(glob.glob(os.path.join(evlog_dir, "*"))):
        files = glob.glob(os.path.join(d, "events*"))
        if not files:
            continue
        master = None
        stages: dict[int, tuple] = {}
        agg: dict[int, dict] = {}
        for line in _lines(files[0]):
            try:
                e = json.loads(line)
            except (json.JSONDecodeError, UnicodeDecodeError):
                continue
            kind = e.get("Event")
            if kind == "SparkListenerEnvironmentUpdate":
                master = e["Spark Properties"].get("spark.master")
            elif kind == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                dur = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000
                stages[si["Stage ID"]] = (dur, si["Number of Tasks"])
            elif kind == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                a = agg.setdefault(
                    sid, {"tt": 0.0, "cpu": 0.0, "gc": 0.0, "shw": 0.0, "fw": 0.0,
                          "in": 0, "sr": 0, "sw": 0}
                )
                ti, tm = e.get("Task Info", {}), e.get("Task Metrics") or {}
                a["tt"] += (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000
                a["cpu"] += tm.get("Executor CPU Time", 0) / 1e9
                a["gc"] += tm.get("JVM GC Time", 0) / 1000
                sw = tm.get("Shuffle Write Metrics") or {}
                a["shw"] += sw.get("Shuffle Write Time", 0) / 1e9
                a["sw"] += sw.get("Shuffle Bytes Written", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                a["fw"] += sr.get("Fetch Wait Time", 0) / 1000
                a["sr"] += sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                a["in"] += (tm.get("Input Metrics") or {}).get("Bytes Read", 0)
        print(f"== {master} ({os.path.basename(d)})")
        for sid in sorted(stages):
            dur, nt = stages[sid]
            a = agg.get(sid, {})
            if dur < 0.3:
                continue
            print(
                f"  stage {sid:3d} wall={dur:7.2f}s tasks={nt:4d} "
                f"tasktime={a.get('tt', 0):8.1f}s cpu={a.get('cpu', 0):8.1f}s "
                f"gc={a.get('gc', 0):5.1f}s shwrite={a.get('shw', 0):5.1f}s "
                f"fetchwait={a.get('fw', 0):5.1f}s "
                f"in={a.get('in', 0) / 1e6:6.0f}MB sr={a.get('sr', 0) / 1e6:6.0f}MB "
                f"sw={a.get('sw', 0) / 1e6:6.0f}MB"
            )


if __name__ == "__main__":
    profile(sys.argv[1] if len(sys.argv) > 1 else "/tmp/evlog")
