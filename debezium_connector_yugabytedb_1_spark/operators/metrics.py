"""A1/H1 — per-partition lineage + applied-op metrics, WAL-backlog warning.

Reference: per-partition counters (total/create/update/delete/filtered/
erroneous events, ``AbstractYugabyteDBPartitionMetrics.java:26-121``),
``MilliSecondsBehindSource`` / committed-txn count
(``YugabyteDBStreamingPartitionMetrics.java:22-70``), and the
growing-WAL-backlog warning when >10k consecutive records are filtered with
none dispatched (``maybeWarnAboutGrowingWalBacklog:921-939``, const ``:66``).

Spark-first: metrics are a ``groupBy(tablet_id, op).count()`` per batch,
appended to a parquet metrics table — queryable lineage instead of JMX.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .order import _SIGN_BIT, ht_key, ht_to_epoch_ms_py

log = logging.getLogger("ybcdc.metrics")

WAL_BACKLOG_WARN_THRESHOLD = 10_000  # reference: GROWING_WAL_WARNING_LOG_THRESHOLD


def batch_metrics(
    events: DataFrame, batch_id: str, wallclock_ms: int | None = None
) -> DataFrame:
    """A1 — per (tablet, op) counts + offset span for one batch; the lineage
    record of what was applied from where.

    ``ms_behind_source`` is the reference's lag gauge
    (``YugabyteDBStreamingPartitionMetrics.java:46-48``): wall clock minus
    the newest commit HybridTime's physical millis (``commit_time >> 12`` is
    physical micros, ``SourceInfo.java:96``). Pass ``wallclock_ms`` for
    deterministic tests; defaults to the batch's processing time."""
    wall = F.lit(wallclock_ms) if wallclock_ms is not None else F.unix_millis(
        F.current_timestamp()
    )
    return events.groupBy("tablet_id", "op").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("index").alias("min_index"),
        F.max("index").alias("max_index"),
        F.max("commit_time").alias("max_commit_time"),
    ).withColumn(
        "ms_behind_source",
        (wall - (F.shiftright(F.col("max_commit_time"), 12) / 1000).cast("long")).cast(
            "long"
        ),
    ).withColumn("batch_id", F.lit(batch_id))


class MetricsSink:
    """Append-only parquet metrics/lineage table."""

    def __init__(self, path: str):
        self.path = path

    def append(self, m: DataFrame) -> None:
        m.write.mode("append").parquet(self.path)

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.path)


def warn_wal_backlog(n_filtered: int, n_dispatched: int) -> bool:
    """H1 — true (and logs) when a batch filtered a large record volume but
    dispatched nothing, meaning checkpoints cannot advance on real data."""
    if n_dispatched == 0 and n_filtered >= WAL_BACKLOG_WARN_THRESHOLD:
        log.warning(
            "Filtered %d consecutive records with none dispatched; "
            "WAL/backlog may be growing (checkpoint cannot advance).",
            n_filtered,
        )
        return True
    return False


def decode_messages(
    events: DataFrame,
    include: str | None = None,
    exclude: str | None = None,
    binary_mode: str = "bytes",
) -> DataFrame:
    """Logical-decoding message dispatch
    (``LogicalDecodingMessageMonitor.java:40-133``): ``op == 'm'`` rows
    become a side-output stream shaped like the reference's MessageValue —
    key ``{prefix}``, value ``{op, ts_ms, source, message{prefix,
    content}}`` — with the content converted per ``binary.handling.mode``
    (``convertContent :123-133``). The prefix include/exclude filter (F5)
    applies first."""
    from .emit import source_block
    from .filters import message_prefix_filter

    msgs = message_prefix_filter(events.where(F.col("op") == "m"), include, exclude)
    raw = F.encode(F.coalesce(F.col("payload"), F.lit("")), "utf-8")
    if binary_mode == "hex":
        content = F.lower(F.hex(raw))
    elif binary_mode == "base64":
        content = F.base64(raw)
    else:
        content = raw
    return msgs.select(
        F.struct(F.col("msg_prefix").alias("prefix")).alias("key"),
        F.lit("m").alias("op"),
        (F.shiftright(F.col("commit_time"), 12) / 1000).cast("long").alias("ts_ms"),
        source_block().alias("source"),
        F.struct(
            F.col("msg_prefix").alias("prefix"), content.alias("content")
        ).alias("message"),
        F.col("term"),
        F.col("index"),
        F.col("write_id"),
    )


class SnapshotMetrics:
    """MXBean-parity snapshot gauges — the Spark analogue of
    ``YugabyteDBSnapshotPartitionMetrics.java:29-124`` /
    ``YugabyteDBSnapshotPartitionMetricsMXBean``: table progress,
    running/completed/aborted state, duration, per-table rows scanned,
    and the current-chunk window the reference exposes for incremental
    snapshots. Fed by ``run_snapshot``'s driver loop at zero extra Spark
    cost (chunk row counts come from the MERGE's own observed stats)."""

    def __init__(self):
        self._tables: list[str] = []
        self._completed_tables: set[str] = set()
        self._running = False
        self._completed = False
        self._aborted = False
        self._t0_ms: int | None = None
        self._t1_ms: int | None = None
        self._rows: dict[str, int] = {}
        self._chunk: tuple[str | None, str | None, str | None] = (None, None, None)

    def _now(self, wallclock_ms: int | None) -> int:
        import time

        return int(time.time() * 1000) if wallclock_ms is None else wallclock_ms

    def snapshot_started(self, tables, wallclock_ms: int | None = None) -> None:
        """``snapshotStarted`` + ``monitoredDataCollectionsDetermined``."""
        self._tables = list(tables)
        self._running, self._completed, self._aborted = True, False, False
        if self._t0_ms is None:  # resume keeps the original start
            self._t0_ms = self._now(wallclock_ms)

    def current_chunk(self, chunk_id: str, chunk_from, chunk_to) -> None:
        self._chunk = (chunk_id, str(chunk_from), str(chunk_to))

    def rows_scanned(self, table: str, n: int) -> None:
        self._rows[table] = self._rows.get(table, 0) + int(n)

    def table_completed(self, table: str) -> None:
        self._completed_tables.add(table)

    def snapshot_completed(self, wallclock_ms: int | None = None) -> None:
        self._running, self._completed = False, True
        self._t1_ms = self._now(wallclock_ms)

    def snapshot_aborted(self, wallclock_ms: int | None = None) -> None:
        self._running, self._aborted = False, True
        self._t1_ms = self._now(wallclock_ms)

    def snapshot(self, wallclock_ms: int | None = None) -> dict:
        end = self._t1_ms if self._t1_ms is not None else self._now(wallclock_ms)
        return {
            "TotalTableCount": len(self._tables),
            "RemainingTableCount": len(
                [t for t in self._tables if t not in self._completed_tables]
            ),
            "SnapshotRunning": self._running,
            "SnapshotCompleted": self._completed,
            "SnapshotAborted": self._aborted,
            "SnapshotDurationInSeconds": (
                0 if self._t0_ms is None else max(0, (end - self._t0_ms) // 1000)
            ),
            "CapturedTables": tuple(sorted(self._tables)),
            "RowsScanned": dict(self._rows),
            "ChunkId": self._chunk[0],
            "ChunkFrom": self._chunk[1],
            "ChunkTo": self._chunk[2],
        }


class TaskMetrics:
    """MXBean-parity task metrics — the Spark analogue of the reference's
    JMX surface: the per-partition event meter
    (``AbstractYugabyteDBPartitionMetrics.java:37-77`` /
    ``YugabyteDBPartitionMetricsMXBean``) and the streaming meter
    (``YugabyteDBStreamingPartitionMetrics.java:41-63`` /
    ``YugabyteDBStreamingTaskMetricsMXBean``).

    Spark-first shape: instead of on-heap meters ticked per record, each
    batch contributes ONE aggregate (map-side combinable, all built-in
    functions) whose single result row updates driver-side counters;
    ``snapshot()`` returns a dict keyed by the MXBean attribute names so a
    dashboard reads the same gauges a JMX console would. Driver state is
    O(#tables) + O(#tablets) — the same bound the reference holds on-heap.

    Op mapping per ``CommonEventMeter``: ``c``→create, ``u``→update,
    ``d``→delete; snapshot reads (``r``) count toward the total only;
    every row counts toward TotalNumberOfEventsSeen. Filtered/erroneous
    counts are driver-supplied (the pipeline knows how many rows its
    filters dropped — ``onFilteredEvent:86-94`` / ``onErroneousEvent``).
    ``SourceEventPosition`` is supplied from the checkpoint commit the
    pipeline already computes (no extra shuffle).
    """

    def __init__(self):
        self._c = {
            "TotalNumberOfEventsSeen": 0,
            "TotalNumberOfCreateEventsSeen": 0,
            "TotalNumberOfUpdateEventsSeen": 0,
            "TotalNumberOfDeleteEventsSeen": 0,
            "NumberOfEventsFiltered": 0,
            "NumberOfErroneousEvents": 0,
            "NumberOfCommittedTransactions": 0,
        }
        self._captured_tables: set[str] = set()
        self._last_event: str | None = None
        self._last_txn_id: str | None = None
        self._last_event_wall_ms: int | None = None
        self._max_commit_time_ms: int | None = None
        self._position: dict[str, str] = {}

    def update(
        self,
        batch: DataFrame,
        n_filtered: int = 0,
        n_erroneous: int = 0,
        position: dict[str, str] | None = None,
        wallclock_ms: int | None = None,
    ) -> None:
        """Fold one batch into the meters: a single ``agg`` over the batch
        (one job, one result row collected)."""
        import time

        op = F.col("op")
        is_commit = op == "COMMIT"
        row = batch.agg(
            F.count(F.lit(1)).alias("total"),
            F.sum((op == "c").cast("long")).alias("creates"),
            F.sum((op == "u").cast("long")).alias("updates"),
            F.sum((op == "d").cast("long")).alias("deletes"),
            F.sum(is_commit.cast("long")).alias("txns"),
            # hybrid times compare in the UNSIGNED domain everywhere in the
            # engine (order.ht_key) — a signed max would pick the wrong last
            # event for HTs with the sign bit set and decode to a negative
            # epoch below
            F.max(ht_key("commit_time")).alias("max_ct_key"),
            F.max_by(
                F.concat_ws(
                    "/", F.col("table"), op, F.col("tablet_id"),
                    F.col("index").cast("string"),
                ),
                F.struct(ht_key("commit_time").alias("ct"), "index", "write_id"),
            ).alias("last_event"),
            F.max_by(
                F.when(is_commit, F.col("txn_id")),
                F.when(is_commit, ht_key("commit_time")),
            ).alias("last_txn"),
            F.collect_set(F.when(op.isin("c", "u", "d", "r"), F.col("table"))).alias(
                "tables"
            ),
        ).first()
        wall = int(time.time() * 1000) if wallclock_ms is None else wallclock_ms
        self._c["TotalNumberOfEventsSeen"] += row["total"]
        self._c["TotalNumberOfCreateEventsSeen"] += row["creates"] or 0
        self._c["TotalNumberOfUpdateEventsSeen"] += row["updates"] or 0
        self._c["TotalNumberOfDeleteEventsSeen"] += row["deletes"] or 0
        self._c["NumberOfCommittedTransactions"] += row["txns"] or 0
        self._c["NumberOfEventsFiltered"] += n_filtered
        self._c["NumberOfErroneousEvents"] += n_erroneous
        self._captured_tables.update(t for t in row["tables"] if t is not None)
        if row["total"]:
            self._last_event = row["last_event"]
            self._last_event_wall_ms = wall
        if row["last_txn"] is not None:
            self._last_txn_id = row["last_txn"]
        if row["max_ct_key"] is not None:
            # undo the ht_key sign-bit flip, then the shared driver-side
            # HT→epoch decode (ht_to_epoch_ms_py masks to the unsigned
            # magnitude and applies the SourceInfo.java:96 >>12 shift)
            ms = ht_to_epoch_ms_py(row["max_ct_key"] ^ _SIGN_BIT)
            self._max_commit_time_ms = max(self._max_commit_time_ms or 0, ms)
        if position:
            self._position.update(position)

    def snapshot(self, wallclock_ms: int | None = None) -> dict:
        """The MXBean attribute view (names match the reference's JMX
        surface attribute-for-attribute)."""
        import time

        wall = int(time.time() * 1000) if wallclock_ms is None else wallclock_ms
        return {
            **self._c,
            "LastEvent": self._last_event,
            "LastTransactionId": self._last_txn_id,
            "MilliSecondsSinceLastEvent": (
                -1
                if self._last_event_wall_ms is None
                else wall - self._last_event_wall_ms
            ),
            "MilliSecondsBehindSource": (
                -1
                if self._max_commit_time_ms is None
                else wall - self._max_commit_time_ms
            ),
            "CapturedTables": tuple(sorted(self._captured_tables)),
            "SourceEventPosition": dict(self._position),
        }


def txn_metadata(events: DataFrame) -> DataFrame:
    """T1 — transaction-boundary metadata stream: per txn, event count +
    commit-time span (analogue of BEGIN/END metadata records,
    ``YugabyteDBTransactionMonitor.java``).

    When the stream carries real BEGIN/COMMIT marker records
    (``generate_events(txn_markers=True)``, the reference's bookkeeping at
    ``YugabyteDBStreamingChangeEventSource.java:626-686``), the span comes
    from the markers themselves — begin = min BEGIN commit time, end = max
    COMMIT commit time across the txn's tablet fragments; otherwise both
    fall back to the applied-DML span (markers span ALL of the txn's
    records, so they can widen the span beyond the c/u/d subset)."""
    is_dml = F.col("op").isin("c", "u", "d")
    return (
        events.where(is_dml | F.col("op").isin("BEGIN", "COMMIT"))
        .groupBy("txn_id")
        .agg(
            F.sum(is_dml.cast("long")).alias("event_count"),
            F.coalesce(
                F.min(F.when(F.col("op") == "BEGIN", F.col("commit_time"))),
                F.min(F.when(is_dml, F.col("commit_time"))),
            ).alias("begin_time"),
            F.coalesce(
                F.max(F.when(F.col("op") == "COMMIT", F.col("commit_time"))),
                F.max(F.when(is_dml, F.col("commit_time"))),
            ).alias("end_time"),
        )
    )
