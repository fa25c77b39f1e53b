"""S2 — skew-aware partitioning: salting hot keys, two-phase aggregation,
skew-aware task grouping.

Reference: tablets are grouped into tasks round-robin with colocated tablets
kept whole (``YugabyteDBConnectorUtils.groupPartitions:16-42``,
``groupPartitionsSmartly:51-103``) — the connector's only skew lever. At
Spark scale the north rule demands explicit salting of hot repos on top of
AQE's runtime skew-join splitting.

Pattern: a hot key's rows are spread over SALT sub-keys
(``pmod(xxhash64(path), SALT)`` — anything uniform works), aggregated per
(key, salt) [map-side + small shuffle], then re-aggregated per key [tiny
shuffle]. The per-(repo,path) fold never needs salting — (repo,path)
cardinality is high; salting applies to per-repo aggregates where one repo
can dominate (hot_repo_pct knob in the generator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(salt: int, *cols: str) -> Column:
    """Uniform salt in [0, salt) derived from secondary columns (or random
    spray via a monotonic hash when no column given)."""
    if cols:
        return F.pmod(F.xxhash64(*cols), F.lit(salt))
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))


def detect_hot_keys(df: DataFrame, key: str, hot_fraction: float = 0.05) -> DataFrame:
    """Keys carrying more than ``hot_fraction`` of all rows — the salting
    candidates (driver-side decision input; tiny result)."""
    total = df.count()
    return (
        df.groupBy(key)
        .count()
        .where(F.col("count") >= hot_fraction * total)
        .select(key, "count")
    )


def salted_count(
    df: DataFrame, key: str, salt: int = 16, salt_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Two-phase salted count per key. Phase 1 shuffles on (key, salt) —
    a hot key fans out over ``salt`` reducers; phase 2 merges ``salt`` rows
    per key."""
    phase1 = (
        df.withColumn("_salt", salt_column(salt, *salt_cols))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return phase1.groupBy(key).agg(F.sum("_c").alias("n_events"))


def group_tablets_smartly(tablets: list[tuple[str, int]], max_tasks: int) -> list[list[str]]:
    """The reference's skew-aware grouping (``groupPartitionsSmartly``):
    sort tablets by load descending, assign each to the currently-lightest
    task (greedy LPT). Driver-side planning over O(#tablets) items.

    ``tablets``: (tablet_id, weight). Returns task → tablet_id list."""
    n = min(max_tasks, max(1, len(tablets)))
    tasks: list[list[str]] = [[] for _ in range(n)]
    loads = [0] * n
    for tid, w in sorted(tablets, key=lambda t: (-t[1], t[0])):
        i = loads.index(min(loads))
        tasks[i].append(tid)
        loads[i] += w
    return tasks
