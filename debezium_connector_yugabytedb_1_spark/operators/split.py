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


# ------------------------------------------------------------ ack wait-list
def request_split(
    waitlist: dict,
    parent_id: str,
    child_a: tuple[str, int, int],
    child_b: tuple[str, int, int],
    split_offset: tuple[int, int, int],
) -> dict:
    """Enqueue a split instead of applying it immediately: under explicit
    checkpointing the reference defers ``handleTabletSplit`` until the
    committed checkpoint catches up to the tablet's last record before the
    split (``splitTabletsWaitingForCallback``, wait-list check at
    ``YugabyteDBStreamingChangeEventSource.java:468-498``) — applying
    earlier could orphan unacked parent records if the consumer crashes.

    ``split_offset``: the parent's last record offset at the SPLIT message
    (the barrier the ack must reach). Returns the updated wait-list (a
    plain dict — driver-side state, O(#pending splits))."""
    out = dict(waitlist)
    out[parent_id] = {
        "child_a": tuple(child_a),
        "child_b": tuple(child_b),
        "split_offset": tuple(split_offset),
    }
    return out


def waiting_parents(waitlist: dict) -> set[str]:
    """Tablets whose polling must pause while their split awaits the ack
    (the reference ``continue``s past wait-listed tablets, ``:489-497``)."""
    return set(waitlist)


def apply_ready_splits(
    tablets: DataFrame,
    ckpt: DataFrame,
    waitlist: dict,
    committed: DataFrame,
) -> tuple[DataFrame, DataFrame, dict, list[str]]:
    """Apply every wait-listed split whose parent's committed (explicit)
    checkpoint has reached the split barrier
    (``lastRecordCheckpoint.isLesserThanOrEqualTo(explicitCheckpoint)``,
    ``:477-495``). Returns (tablets, ckpt, remaining wait-list, applied
    parent ids). ``committed``: (tablet_id, term, index, write_id) acks."""
    if not waitlist:
        return tablets, ckpt, waitlist, []
    acks = {
        r["tablet_id"]: (r["term"], r["index"], r["write_id"])
        for r in committed.where(
            F.col("tablet_id").isin(*waitlist.keys())
        ).collect()
    }
    remaining, applied = dict(waitlist), []
    for parent_id, req in waitlist.items():
        ack = acks.get(parent_id)
        if ack is None or tuple(ack) < req["split_offset"]:
            continue  # ack has not caught up — keep waiting
        tablets, ckpt = split_tablet(
            tablets, ckpt, parent_id, req["child_a"], req["child_b"]
        )
        del remaining[parent_id]
        applied.append(parent_id)
    return tablets, ckpt, remaining, applied
