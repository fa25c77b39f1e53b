"""Structured Streaming front-end: readStream → foreachBatch(apply).

The micro-batch loop in ``pipeline.py`` is the deterministic/resumable
driver used for tests and benchmarks; this wrapper runs the *same* apply
path under Spark's own streaming engine (file source + availableNow
trigger), demonstrating the production topology:

    spark.readStream → withWatermark → foreachBatch(decode→fold→MERGE→ckpt)

Watermarking note: the safepoint stream carries the source's safe time (the
reference Merger's gate, ``Merger.java:116-133``); in Structured Streaming
the same role is played by ``withWatermark`` on the commit-time column when
windowed aggregations are involved. The replay MERGE itself needs no
watermark — it is monotonic via offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake import LakeTable
from ..operators import filters
from ..operators.checkpoint import CheckpointStore, batch_offsets, resume_filter
from ..operators.decode import decode_envelope
from ..operators.emit import DML_OPS, split_pk_updates
from ..operators.order import fold_changes
from ..sources import read_event_stream


def apply_batch(
    batch: DataFrame,
    batch_id: int | str,
    table: LakeTable,
    ckpt: CheckpointStore,
) -> None:
    """The foreachBatch body — identical operator chain to CdcPipeline
    (minus index windowing, which Spark's source handles)."""
    batch = resume_filter(batch, ckpt.load())
    disp = filters.dispatchable(filters.table_filter(batch))
    decoded = decode_envelope(disp.where(F.col("op").isin(*DML_OPS, "pku")))
    # DDLs inside a streaming batch: apply before the data (offset order is
    # preserved because resume_filter guarantees all events are new)
    for r in (
        batch.where(F.col("op") == "ddl").select("payload").orderBy("index").collect()
    ):
        import json

        d = json.loads(r["payload"])
        if d.get("action") == "add_column":
            table.add_column(d["name"], d.get("type", "string"))
    cols = [n for n, _ in table.columns]
    folded = fold_changes(split_pk_updates(decoded), columns=cols)
    table.merge(folded, f"stream-{batch_id}")
    ckpt.commit(batch_offsets(batch))


def run_streaming(
    spark: SparkSession,
    events_path: str,
    table: LakeTable,
    ckpt: CheckpointStore,
    checkpoint_location: str,
    available_now: bool = True,
) -> None:
    """Run the streaming pipeline until the available data is exhausted
    (availableNow) — the bounded-test mode; drop the trigger for continuous
    tailing in production."""
    stream = read_event_stream(spark, events_path)
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: apply_batch(df, bid, table, ckpt)
    ).option("checkpointLocation", checkpoint_location)
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.start()
    q.awaitTermination()
