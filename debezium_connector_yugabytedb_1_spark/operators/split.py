"""D2 — tablet split: a polled shard splits into two children that inherit
the parent's checkpoint.

Reference: on TABLET_SPLIT the connector fetches the two children, verifies
they tile the parent's hash range, removes the parent from the poll list and
seeds the children's offsets from the parent checkpoint
(``handleTabletSplit:1104-1162``, ``addTabletIfNotPresent:1070-1102``).

Spark analogue: physical skew re-splitting is AQE's job; the *logical*
protocol — checkpoint rows splitting while never losing or regressing
offsets — is what we re-create: parent checkpoint row → two child rows with
the parent's offset; parent removed; range-tiling validated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_tablet(
    tablets: DataFrame,
    ckpt: DataFrame,
    parent_id: str,
    child_a: tuple[str, int, int],
    child_b: tuple[str, int, int],
) -> tuple[DataFrame, DataFrame]:
    """Apply one split: returns (new tablets, new checkpoint).

    ``child_*``: (tablet_id, key_start, key_end). Children must tile the
    parent's range exactly (validated; mirrors the containment checks in
    ``handleTabletSplit``)."""
    parent = tablets.where(F.col("tablet_id") == parent_id).collect()
    if not parent:
        raise ValueError(f"unknown parent tablet {parent_id}")
    p = parent[0]
    (aid, a_start, a_end), (bid, b_start, b_end) = sorted(
        [child_a, child_b], key=lambda c: c[1]
    )
    if not (a_start == p["key_start"] and a_end == b_start and b_end == p["key_end"]):
        raise ValueError(
            f"children do not tile parent range [{p['key_start']}, {p['key_end']})"
        )
    spark = tablets.sparkSession
    children = spark.createDataFrame(
        [(aid, a_start, a_end), (bid, b_start, b_end)],
        "tablet_id string, key_start int, key_end int",
    )
    new_tablets = tablets.where(F.col("tablet_id") != parent_id).unionByName(children)

    parent_off = ckpt.where(F.col("tablet_id") == parent_id)
    child_offs = parent_off.crossJoin(
        spark.createDataFrame([(aid,), (bid,)], "child_id string")
    ).select(
        F.col("child_id").alias("tablet_id"),
        "term",
        "index",
        "write_id",
        "phase",
    )
    new_ckpt = ckpt.where(F.col("tablet_id") != parent_id).unionByName(child_offs)
    return new_tablets, new_ckpt
