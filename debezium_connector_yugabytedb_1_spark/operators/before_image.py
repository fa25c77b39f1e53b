"""X1 — before-image modes.

Reference: ``HelperBeforeImageModes.java:6-49`` defines CHANGE (default:
changed columns only, no before image), FULL (full before+after),
FULL_ROW_NEW_IMAGE, MODIFIED_COLUMNS_OLD_AND_NEW_IMAGES, CHANGE_OLD_NEW,
ALL, NOTHING; gated in ``YugabyteDBChangeRecordEmitter.java:118-123``.

Replay state only needs (after, op, offset); before images are *lineage* —
consumed by diff/audit pipelines. Spark-first: the before image of an event
is the previous image of its key, i.e. a ``lag`` over the per-key offset
window. That reconstructs FULL before images from a CHANGE stream without
the source having to ship them (the reference needs server cooperation for
this; a batch engine gets it for free from history).
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .decode import TABLE_COLUMNS, cell_set
from .emit import DELETE_OPS, UPSERT_OPS


class BeforeImageMode(str, Enum):
    CHANGE = "CHANGE"                  # default: no before image
    FULL = "FULL"                      # full before + full after
    FULL_ROW_NEW_IMAGE = "FULL_ROW_NEW_IMAGE"          # full after only
    MODIFIED_COLUMNS_OLD_AND_NEW = "MODIFIED_COLUMNS_OLD_AND_NEW_IMAGES"
    NOTHING = "NOTHING"


def reconstruct_before_images(
    decoded: DataFrame,
    mode: BeforeImageMode = BeforeImageMode.FULL,
    columns=TABLE_COLUMNS,
    key_cols=("repo", "path"),
) -> DataFrame:
    """Attach a ``before`` struct per event by folding the key's history up
    to (exclusive) the event's offset.

    Implementation: per key, running last-set value of every column via a
    window ``last(value_if_set, ignorenulls) OVER (... ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)``, nulled out across delete
    barriers. One shuffle + per-key sort (lineage path, not the hot replay
    path)."""
    if mode == BeforeImageMode.NOTHING:
        return decoded.withColumn("before", F.lit(None).cast("string")).drop("before")
    if mode in (BeforeImageMode.CHANGE, BeforeImageMode.FULL_ROW_NEW_IMAGE):
        return decoded

    w = (
        W.partitionBy(*key_cols)
        .orderBy("term", "index", "write_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    off = F.struct("term", "index", "write_id")
    last_del = F.max(F.when(F.col("op").isin(*DELETE_OPS), off)).over(w)
    fields = []
    for c in columns:
        last_set = F.last(
            F.when(
                F.col("op").isin(*UPSERT_OPS) & cell_set(c),
                F.struct(off.alias("off"), F.col(f"after.{c}").alias("v")),
            ),
            ignorenulls=True,
        ).over(w)
        live = last_set.isNotNull() & (
            last_del.isNull() | (last_set["off"] > last_del)
        )
        val = F.when(live, last_set["v"])
        if mode == BeforeImageMode.MODIFIED_COLUMNS_OLD_AND_NEW:
            val = F.when(cell_set(c), val)  # old images only for changed cols
        fields.append(val.alias(c))
    return decoded.withColumn("before", F.struct(*fields))
