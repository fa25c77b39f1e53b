"""S4 + Q1 + the apply loop — the engine's equivalent of the reference's
per-tablet GetChanges poll loop feeding the dispatcher and sink.

Reference shape being re-created (``YugabyteDBStreamingChangeEventSource
.getChanges2:333-827``): poll a bounded batch from the WAL position after
the checkpoint → filter (safepoint/table/NOOP) → decode → handle DDL by
refreshing schema → emit envelopes → sink → ack checkpoint. Backpressure is
the events-per-batch bound (Q1, the ``ChangeEventQueue``/``cdc.poll.limit``
analogue, ``YugabyteDBConnectorTask.java:169-175``).

Spark-first execution per micro-batch (one pass, all JVM):

    parquet scan (index-range + checkpoint pushdown)
      → filters (pushed to scan)
      → from_json decode (codegen)
      → PK-update split (union)
      → hash-agg fold per (repo, path)  [map-side partial agg]
      → bucket-pruned copy-on-write MERGE
      → metrics append + checkpoint commit

The DDL cut: a batch containing DDL markers is split at each DDL offset so
schema evolution applies between sub-batches, exactly the reference's
per-tablet lazy refresh collapsed to batch boundaries
(``YugabyteDBStreamingChangeEventSource.java:688-720``;
``YugabyteDBSchemaEvolutionTest.java:54-92``).

Exactly-once: MERGE is idempotent (batch-id skip + per-row monotonic offset
guard) and the checkpoint commits only after the MERGE version pointer
swap — a crash between the two replays a batch that the guards absorb. Same
stance as the reference's explicit-checkpoint protocol
(``YugabyteDBStreamingChangeEventSource.java:941-995``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake import LakeTable, MergeStats
from ..operators import filters
from ..operators.checkpoint import CheckpointStore, batch_offsets, resume_filter
from ..operators.decode import decode_envelope
from ..operators.emit import DML_OPS, split_pk_updates
from ..operators.metrics import MetricsSink, batch_metrics, warn_wal_backlog
from ..operators.order import fold_changes


@dataclass
class BatchResult:
    batch_id: str
    n_input: int
    n_dispatched: int
    merge: MergeStats
    ddl_applied: list[str] = field(default_factory=list)
    offsets: "list | None" = None  # collected per-tablet max-offset rows


class CdcPipeline:
    """Micro-batch CDC replay: events parquet → lake table, resumable."""

    def __init__(
        self,
        spark: SparkSession,
        events_path: str,
        table: LakeTable,
        ckpt: CheckpointStore,
        metrics: MetricsSink | None = None,
        events_per_batch: int = 500_000,
        table_include: str | None = None,
        table_exclude: str | None = None,
        skipped_ops: tuple[str, ...] = (),
        use_pandas_decode: bool = False,
    ):
        self.spark = spark
        self.events_path = events_path
        self.table = table
        self.ckpt = ckpt
        self.metrics = metrics
        self.events_per_batch = events_per_batch
        self.table_include = table_include
        self.table_exclude = table_exclude
        self.skipped_ops = skipped_ops
        self.use_pandas_decode = use_pandas_decode

    # ------------------------------------------------------------------
    def _events(self) -> DataFrame:
        return self.spark.read.parquet(self.events_path)

    def _segment_size(self) -> int | None:
        import json
        import os

        meta = os.path.join(self.events_path, "_ybcdc_meta.json")
        if os.path.exists(meta):
            with open(meta) as f:
                return json.load(f).get("segment_size")
        return None

    def _window(self, events: DataFrame, lo: int, hi: int) -> DataFrame:
        """Poll window [lo, hi): pushes an index-range predicate and — when
        the log is WAL-segment partitioned — a partition-pruning segment
        predicate, so a poll reads O(batch), not O(log)."""
        w = events.where((F.col("index") >= lo) & (F.col("index") < hi))
        seg = self._segment_size()
        if seg and "segment" in events.columns:
            w = w.where(F.col("segment").between(lo // seg, (hi - 1) // seg))
        return w

    def run(self, max_batches: int | None = None) -> list[BatchResult]:
        """Process micro-batch windows from the stored cursor to the end of
        the available log (or ``max_batches`` windows — the kill/resume
        test's kill switch)."""
        events = self._events()
        hi_row = events.agg(F.max("index").alias("m")).collect()[0]
        if hi_row["m"] is None:
            return []
        max_index = int(hi_row["m"])
        lo = int(self.ckpt.meta().get("next_lo", 0))
        results: list[BatchResult] = []
        n = 0
        while lo <= max_index and (max_batches is None or n < max_batches):
            hi = lo + self.events_per_batch
            window = self._window(events, lo, hi)
            window_results = self._process_window(window, lo, hi)
            results.extend(window_results)
            # commit per-tablet offsets observed in this window (already
            # collected inside _apply — zero extra jobs) + advance cursor
            rows = [
                o for r in window_results if r.offsets is not None for o in r.offsets
            ]
            self.ckpt.commit(rows, meta={"next_lo": hi})
            lo = hi
            n += 1
        return results

    # ------------------------------------------------------------------
    def _process_window(self, window: DataFrame, lo: int, hi: int) -> list[BatchResult]:
        """Split the window at DDL offsets; apply sub-batches in order with
        schema evolution between them (the DDL cut)."""
        ddl_rows = (
            window.where(F.col("op") == "ddl")
            .select("index", "payload")
            .orderBy("index")
            .collect()
        )  # DDL markers are rare; this collect is O(#DDLs in window)
        cuts = [lo] + [int(r["index"]) for r in ddl_rows] + [hi]
        results = []
        for i in range(len(cuts) - 1):
            sub_lo, sub_hi = cuts[i], cuts[i + 1]
            sub = window.where((F.col("index") >= sub_lo) & (F.col("index") < sub_hi))
            if i > 0:
                # apply the DDL that opens this sub-batch (D1)
                import json

                d = json.loads(ddl_rows[i - 1]["payload"])
                applied = self._apply_ddl(d)
                sub = sub.where(F.col("op") != "ddl")
                res = self._apply(sub, f"b{sub_lo}-{sub_hi}")
                res.ddl_applied = applied
            else:
                res = self._apply(sub, f"b{sub_lo}-{sub_hi}")
            results.append(res)
        return results

    def _apply_ddl(self, d: dict) -> list[str]:
        """D1 — schema evolution between batches; refresh-only-if-changed
        (``YugabyteDBSchema.shouldRefreshSchema:213-243``)."""
        applied = []
        if d.get("action") == "add_column":
            if self.table.add_column(d["name"], d.get("type", "string")):
                applied.append(f"add_column {d['name']}")
        elif d.get("action") == "rename_column":
            if self.table.rename_column(d["old"], d["new"]):
                applied.append(f"rename_column {d['old']}->{d['new']}")
        return applied

    def _touched_buckets(self, batch: DataFrame) -> list[int]:
        """Bucket set the batch touches, from RAW keys — no JSON decode for
        the ~98% non-pku rows (the merge then computes the fold exactly once;
        a PK update also touches its old key, so those payloads — and only
        those — are decoded for ``before_key``)."""
        from ..lake import bucket_expr
        from ..operators.decode import PAYLOAD_SCHEMA

        nb = self.table.n_buckets
        main = batch.where(F.col("op").isin(*DML_OPS, "pku")).select(
            bucket_expr(nb, ("repo", "path")).alias("bucket")
        )
        old_keys = (
            batch.where(F.col("op") == "pku")
            .select(F.from_json("payload", PAYLOAD_SCHEMA)["before_key"].alias("bk"))
            .select(bucket_expr(nb, ("bk.repo", "bk.path")).alias("bucket"))
        )
        rows = main.unionByName(old_keys).distinct().collect()
        return [int(r["bucket"]) for r in rows]

    # ------------------------------------------------------------------
    def _apply(self, batch: DataFrame, batch_id: str) -> BatchResult:
        """One sub-batch through the full operator chain. Two passes over
        the (pruned) batch per sub-batch: one offsets+count aggregation, one
        decode→fold→MERGE; plus one metrics pass when lineage is enabled."""
        batch = resume_filter(batch, self.ckpt.load())
        cached = self.metrics is not None
        if cached:
            batch = batch.cache()
        try:
            # one aggregation pass gives both the ack offsets and the batch
            # cardinality (collected: O(#tablets) rows, no extra jobs)
            offsets = batch_offsets(batch).collect()
            n_input = sum(r["n"] for r in offsets)
            if self.metrics is not None:
                self.metrics.append(batch_metrics(batch, batch_id))

            disp = filters.dispatchable(
                filters.table_filter(batch, self.table_include, self.table_exclude)
            )
            disp = filters.skipped_operations_filter(disp, self.skipped_ops)
            decoded = decode_envelope(
                disp.where(F.col("op").isin(*DML_OPS, "pku")),
                use_pandas=self.use_pandas_decode,
            )
            dml = split_pk_updates(decoded)
            cols = [n for n, _ in self.table.columns]
            folded = fold_changes(dml, columns=cols)
            stats = self.table.merge(
                folded, batch_id, touched_buckets=self._touched_buckets(batch)
            )
            n_dispatched = stats.upserted + stats.deleted
            warn_wal_backlog(n_input - n_dispatched, n_dispatched)
            return BatchResult(batch_id, n_input, n_dispatched, stats, offsets=offsets)
        finally:
            if cached:
                batch.unpersist()
