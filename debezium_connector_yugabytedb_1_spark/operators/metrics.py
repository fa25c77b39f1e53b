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


def batch_metrics(events: DataFrame, batch_id: str) -> DataFrame:
    """A1 — per (tablet, op) counts + offset span for one batch; the lineage
    record of what was applied from where."""
    return events.groupBy("tablet_id", "op").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("index").alias("min_index"),
        F.max("index").alias("max_index"),
        F.max("commit_time").alias("max_commit_time"),
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


def txn_metadata(events: DataFrame) -> DataFrame:
    """T1 — optional transaction-boundary metadata stream: per txn, event
    count + commit-time span (analogue of BEGIN/END metadata records,
    ``YugabyteDBTransactionMonitor.java``)."""
    return events.where(F.col("op").isin("c", "u", "d")).groupBy("txn_id").agg(
        F.count(F.lit(1)).alias("event_count"),
        F.min("commit_time").alias("begin_time"),
        F.max("commit_time").alias("end_time"),
    )
