"""M1 integration — the consistent-mode release gate as a stateful
multi-trigger operator for the streaming front-end.

Reference semantics: the consistent streaming source keeps a per-tablet
safetime map fed by SAFEPOINT records and lets the Merger release a record
only once ``commit_time <= min(safetime over ALL consumed tablets)``;
records beyond the gate wait in a pending queue and re-enter on a later
poll (``Merger.java:116-133``, ``YugabyteDBConsistentStreamingSource
.java:174-254``).

Spark-first re-expression: the pending queue is a small parquet carry-over
store written once per trigger; the safetime map is driver-side JSON state
(one entry per tablet — the same cardinality the reference holds on-heap).
Each trigger unions the carried rows with the new batch, splits at the
stream safetime (a broadcast scalar comparison — no shuffle), persists the
held remainder, and hands the released prefix to the normal apply chain.

Why this closes the two documented out-of-order caveats (stream.py): the
released sets form commit-time-complete prefixes per trigger — the
transport's per-tablet order + the min-over-all-tablets gate guarantee no
later trigger can deliver a record older than anything already applied, so
per-column LWW never sees a stale partial update after a newer one, and a
DDL marker is always applied in its commit-order position.

Crash consistency: pending versions are keyed by trigger batch id — a
replayed trigger rewrites the same version (idempotent), and the safetime
state merge is a per-tablet max (idempotent). The sink's batch-id skip and
monotonic fold absorb the replayed merge itself.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.filters import NON_DISPATCHED_OPS


class ConsistentGate:
    """Stateful release gate: hold records beyond the stream safetime in a
    parquet carry-over store; re-inject them on the next trigger."""

    def __init__(
        self, spark: SparkSession, path: str, tablets: list[str] | None = None
    ):
        """``tablets``: the full tablet assignment being consumed (from
        tablet discovery, S1). The reference's source knows this up front —
        a tablet whose stream has not arrived AT ALL must still constrain
        the gate (unknown safetime ⇒ nothing is safe). Without it the gate
        falls back to the weaker tablets-seen-so-far set."""
        self.spark = spark
        self.path = path
        self.tablets = list(tablets) if tablets is not None else None
        os.makedirs(path, exist_ok=True)

    # ---------------------------------------------------------- state
    def _state_path(self) -> str:
        return os.path.join(self.path, "state.json")

    def state(self) -> dict:
        p = self._state_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"safetimes": {}, "seen": [], "pending": None, "old": []}

    def _save_state(self, st: dict) -> None:
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(st, f)
        os.replace(tmp, self._state_path())

    # ---------------------------------------------------------- gate
    def stream_safetime(self, st: dict | None = None) -> int | None:
        """min over the safetimes of every consumed tablet; None while any
        consumed tablet's safetime is unknown (gate fully closed)."""
        st = st or self.state()
        consumed = set(self.tablets) if self.tablets is not None else set(st["seen"])
        times = st["safetimes"]
        if not consumed or not consumed <= set(times):
            return None
        return min(times[t] for t in consumed)

    def process(self, batch: DataFrame, batch_id: int | str) -> DataFrame:
        """One trigger: advance safetimes from this batch's SAFEPOINTs,
        union the carried rows, release the ``commit_time <= safetime``
        prefix, persist the rest. Returns the released rows."""
        st = self.state()
        # one tiny aggregation collects both the safepoint watermarks and
        # the consumed-tablet set (driver state is O(#tablets))
        obs = (
            batch.groupBy("tablet_id")
            .agg(
                F.max(
                    F.when(F.col("op") == "SAFEPOINT", F.col("commit_time"))
                ).alias("safe_time")
            )
            .collect()
        )
        for r in obs:
            t = r["tablet_id"]
            if t not in st["seen"]:
                st["seen"].append(t)
            if r["safe_time"] is not None:
                st["safetimes"][t] = max(
                    st["safetimes"].get(t, r["safe_time"]), r["safe_time"]
                )
        union = batch.where(~F.col("op").isin(*NON_DISPATCHED_OPS))
        if st["pending"]:
            carried = self.spark.read.parquet(os.path.join(self.path, st["pending"]))
            union = union.unionByName(carried, allowMissingColumns=True)
        gate = self.stream_safetime(st)
        if gate is None:
            released = union.where(F.lit(False))
            held = union
        else:
            released = union.where(F.col("commit_time") <= F.lit(gate))
            held = union.where(F.col("commit_time") > F.lit(gate))
        rel = f"pending_b{batch_id}"
        held.write.mode("overwrite").parquet(os.path.join(self.path, rel))
        # retire older pending versions lazily — the previous one must stay
        # on disk until `released` (which reads it) has been consumed, so
        # only versions at least two triggers old are deleted
        for old in st["old"]:
            shutil.rmtree(os.path.join(self.path, old), ignore_errors=True)
        st["old"] = [st["pending"]] if st["pending"] else []
        st["pending"] = rel
        self._save_state(st)
        return released

    def flush(self) -> DataFrame | None:
        """End-of-log drain: release everything still pending (no further
        records can arrive, so commit-order release is trivially satisfied).
        Returns the drained rows, or None if nothing is pending."""
        st = self.state()
        if not st["pending"]:
            return None
        carried = self.spark.read.parquet(os.path.join(self.path, st["pending"]))
        return carried

    def clear_pending(self) -> None:
        """Drop the pending store after a flush drain has been applied —
        the sink's batch-id skip and monotonic fold would absorb a
        re-drain, but clearing keeps restarts from re-reading stale rows."""
        st = self.state()
        for rel in [st["pending"], *st["old"]]:
            if rel:
                shutil.rmtree(os.path.join(self.path, rel), ignore_errors=True)
        st["pending"], st["old"] = None, []
        self._save_state(st)
