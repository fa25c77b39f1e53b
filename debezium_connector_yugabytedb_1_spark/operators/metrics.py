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
