"""S3/S5 — snapshot phase: initial consistent scan before streaming.

Reference: per-tablet snapshot via GetChanges in snapshot mode, resumable
mid-snapshot, end detected by a snapshot-complete marker, then transition to
streaming (``YugabyteDBSnapshotChangeEventSource.doExecute:384-771``,
complete marker ``:902-905``; SNAPSHOT_DONE sentinel
``YugabyteDBOffsetContext.java:37,155-158``; bootstrap-to-(0,0)
``bootstrapTabletWithRetry:181-269`` /
``YugabyteDBOffsetContext.java:147-149``).

Spark-first: the snapshot is one bounded batch job — read the base table,
emit ``op='r'`` envelopes at a snapshot offset strictly below every
streaming offset (term = -1, the snapshot-format analogue of the reference's
distinct snapshot OpId format, which ``getHigherOffsets`` keeps separate
from streaming offsets), fold, MERGE. Resumability comes from the same
idempotent MERGE + checkpoint protocol as streaming — a re-run snapshot is
absorbed, the stance the reference takes for snapshot re-delivery
(``YugabyteDBSnapshotResumeTest.java:120-133``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lake import LakeTable
from .checkpoint import CheckpointStore, batch_offsets
from .order import fold_changes

SNAPSHOT_TERM = -1  # sorts below every streaming offset (term >= 0)


def snapshot_envelopes(base: DataFrame, n_tablets: int = 8) -> DataFrame:
    """Turn a base-table state ``(repo, path, commit, lang, content, ...)``
    into READ envelopes (decoded shape) at the snapshot offset."""
    payload_cols = [c for c in base.columns if c not in ("repo", "path")]
    return base.select(
        F.concat(F.lit("tablet-"), F.pmod(F.xxhash64("repo"), F.lit(n_tablets))).alias(
            "tablet_id"
        ),
        F.lit(SNAPSHOT_TERM).cast("long").alias("term"),
        F.lit(0).cast("long").alias("index"),
        F.lit(0).cast("long").alias("write_id"),
        F.lit("r").alias("op"),
        F.col("repo"),
        F.col("path"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("after"),
        F.array(*[F.lit(c) for c in payload_cols]).alias("changed"),
    )


def run_snapshot(
    base: DataFrame,
    table: LakeTable,
    ckpt: CheckpointStore,
    n_tablets: int = 8,
) -> None:
    """Execute the snapshot phase: bulk-load the base state and mark
    snapshot-done so a restart goes straight to streaming."""
    if ckpt.meta().get("snapshot_done"):
        return
    # align base to the table's current schema (missing columns → NULL)
    for name, typ in table.columns:
        if name not in base.columns:
            base = base.withColumn(name, F.lit(None).cast(typ))
    env = snapshot_envelopes(base, n_tablets=n_tablets)
    cols = [n for n, _ in table.columns]
    folded = fold_changes(env, columns=cols)
    table.merge(folded, batch_id="snapshot")
    ckpt.commit(batch_offsets(env, phase="snapshot"), meta={"snapshot_done": True})
