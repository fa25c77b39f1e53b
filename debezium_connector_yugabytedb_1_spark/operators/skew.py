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


def group_partitions(elements: list, num_groups: int) -> list[list]:
    """Reference parity — ``YugabyteDBConnectorUtils.groupPartitions:16-42``:
    contiguous split into ``num_groups`` chunks of size n+1 / n (leftover
    chunks first), empty groups dropped."""
    if num_groups <= 0:
        raise ValueError("Number of groups must be positive")
    per, leftover = divmod(len(elements), num_groups)
    out, assigned = [], 0
    for g in range(num_groups):
        if assigned == len(elements):
            break
        n = per + 1 if g < leftover else per
        out.append(list(elements[assigned : assigned + n]))
        assigned += n
    return out


def group_partitions_smartly(
    pairs: list[tuple[str, str]], num_groups: int
) -> list[list[tuple[str, str]]]:
    """Reference parity — ``groupPartitionsSmartly:51-103``: keep ALL tables
    of one colocated tablet in a single task. ``pairs`` = (table_id,
    tablet_id). When no tablet is shared (no colocation), falls back to the
    plain contiguous grouping over the pairs, exactly like the reference."""
    if not pairs:
        raise ValueError("Elements to be grouped must be positive")
    if num_groups <= 0:
        raise ValueError("Number of groups must be positive")
    by_tablet: dict[str, list[tuple[str, str]]] = {}
    for table, tablet in pairs:
        by_tablet.setdefault(tablet, []).append((table, tablet))
    if len(by_tablet) == len(pairs):  # no colocation → regular grouping
        return group_partitions(pairs, num_groups)
    tablet_groups = group_partitions(list(by_tablet.keys()), num_groups)
    return [
        [p for tablet in tablets for p in by_tablet[tablet]]
        for tablets in tablet_groups
    ]


def group_tablets_colocated(
    pairs: list[tuple[str, str, int]], max_tasks: int
) -> list[list[tuple[str, str]]]:
    """Skew-aware + colocation-aware grouping: (table, tablet, weight)
    triples; a colocated tablet's tables always land in one task (the
    reference's invariant), tasks balanced by summed tablet weight (LPT —
    the skew-aware improvement over the reference's count-based split)."""
    by_tablet: dict[str, list[tuple[str, str]]] = {}
    weight: dict[str, int] = {}
    for table, tablet, w in pairs:
        by_tablet.setdefault(tablet, []).append((table, tablet))
        weight[tablet] = weight.get(tablet, 0) + w
    n = min(max_tasks, max(1, len(by_tablet)))
    tasks: list[list[tuple[str, str]]] = [[] for _ in range(n)]
    loads = [0] * n
    for tablet in sorted(weight, key=lambda t: (-weight[t], t)):
        i = loads.index(min(loads))
        tasks[i].extend(by_tablet[tablet])
        loads[i] += weight[tablet]
    return tasks


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
