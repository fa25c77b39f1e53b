"""O1/O2/O3 — per-tablet checkpoint offsets: monotonic max-merge, explicit
commit, resume filter.

Reference semantics:
  O1 ``getHigherOffsets`` — merge cached vs read-back offset maps keeping the
     per-tablet max OpId, never regressing
     (``YugabyteDBConnectorTask.java:488-518``, rationale ``:420-435``).
  O2 explicit checkpoint commit: acked offsets persisted; never backwards;
     idle tablets advance too (``YugabyteDBStreamingChangeEventSource.java:
     954-995``, guard ``:976-986``, idle-advance ``:788-797``).
  O3 resume: on start, load stored offsets, poll strictly after them
     (``YugabyteDBOffsetContext.Loader:355-392``, ``OpId.valueOf:71-81``).

Spark-first: the offset map is a tiny DataFrame/parquet table (one row per
tablet), versioned with an atomic pointer like the lake manifest. The merge
is ``union → groupBy(tablet).agg(max(offset_struct))`` — the reference's
per-entry max loop as one aggregate. The resume filter is a broadcast join:
events ⋉ checkpoint with ``offset > ckpt`` — broadcast because the
checkpoint is O(#tablets), so the scan-side filter costs no shuffle at any
data scale.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..offsets import offset_struct

CKPT_SCHEMA = "tablet_id string, term long, index long, write_id long, phase string"


def max_merge(old: DataFrame | None, new: DataFrame) -> DataFrame:
    """O1 — monotonic per-tablet max of two offset sets."""
    df = new if old is None else old.unionByName(new, allowMissingColumns=True)
    return (
        df.groupBy("tablet_id")
        .agg(
            F.max(offset_struct()).alias("o"),
            F.max_by("phase", offset_struct()).alias("phase"),
        )
        .select(
            "tablet_id",
            F.col("o.term").alias("term"),
            F.col("o.index").alias("index"),
            F.col("o.write_id").alias("write_id"),
            "phase",
        )
    )


def batch_offsets(events: DataFrame, phase: str = "streaming") -> DataFrame:
    """Per-tablet max offset observed in a batch (O2 — what gets acked).
    Includes tablets whose only rows were filtered (safepoints/NOOPs), so
    idle tablets advance (``:788-797``)."""
    return (
        events.groupBy("tablet_id")
        .agg(F.max(offset_struct()).alias("o"))
        .select(
            "tablet_id",
            F.col("o.term").alias("term"),
            F.col("o.index").alias("index"),
            F.col("o.write_id").alias("write_id"),
            F.lit(phase).alias("phase"),
        )
    )


def resume_filter(events: DataFrame, ckpt: DataFrame | None) -> DataFrame:
    """O3 — keep only events strictly newer than the committed per-tablet
    offset. Broadcast join: the checkpoint is tiny by construction."""
    if ckpt is None:
        return events
    c = F.broadcast(
        ckpt.select(
            "tablet_id",
            F.struct("term", "index", "write_id").alias("_ckpt_off"),
        )
    )
    return (
        events.join(c, "tablet_id", "left")
        .where(F.col("_ckpt_off").isNull() | (offset_struct() > F.col("_ckpt_off")))
        .drop("_ckpt_off")
    )


class CheckpointStore:
    """Versioned checkpoint table + tiny key/value progress metadata.

    Mirrors the two offset maps the reference keeps (committed offsets vs
    next-poll position, ``YugabyteDBOffsetContext.java:42-52``): the offset
    DataFrame is the committed map; ``meta['next_lo']`` is the poll cursor.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        os.makedirs(self.path, exist_ok=True)

    def _cur(self) -> int:
        p = os.path.join(self.path, "_CURRENT")
        if not os.path.exists(p):
            return -1
        with open(p) as f:
            return int(f.read().strip())

    def _commit(self, version: int, meta: dict) -> None:
        with open(os.path.join(self.path, f"meta-v{version:08d}.json"), "w") as f:
            json.dump(meta, f)
        tmp = os.path.join(self.path, "_CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.path, "_CURRENT"))

    def load(self) -> DataFrame | None:
        v = self._cur()
        if v < 0:
            return None
        return self.spark.read.parquet(os.path.join(self.path, f"v{v:08d}"))

    def meta(self) -> dict:
        v = self._cur()
        if v < 0:
            return {}
        with open(os.path.join(self.path, f"meta-v{v:08d}.json")) as f:
            return json.load(f)

    def commit(self, new_offsets: DataFrame, meta: dict | None = None) -> None:
        """O2 — max-merge the new offsets into the store and atomically
        publish (checkpoint never moves backwards even if the caller hands
        us stale offsets)."""
        merged = max_merge(self.load(), new_offsets)
        v = self._cur() + 1
        merged.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.path, f"v{v:08d}")
        )
        self._commit(v, {**self.meta(), **(meta or {})})
