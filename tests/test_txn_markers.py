"""T1/M1 — transaction BEGIN/COMMIT marker records and the Merger
comparator's equal-commit-time law (BEGIN < DML < COMMIT), mirroring
``MergerTest.addAndPollTest`` and ``Message.compareTo:64-79``."""

import os

import pyspark.sql.functions as F

from debezium_connector_yugabytedb_1_spark.generator import generate_events, write_events
from debezium_connector_yugabytedb_1_spark.lake import LakeTable
from debezium_connector_yugabytedb_1_spark.operators.checkpoint import CheckpointStore
from debezium_connector_yugabytedb_1_spark.operators.metrics import txn_metadata
from debezium_connector_yugabytedb_1_spark.operators.order import commit_time_order
from debezium_connector_yugabytedb_1_spark.streaming.pipeline import CdcPipeline


def test_merger_poll_order_begin_dml_commit(spark):
    """MergerTest.addAndPollTest: BEGIN, INSERT, COMMIT share one commit
    time (markers with null record time); poll order must be
    BEGIN < INSERT < COMMIT regardless of arrival order."""
    ct = 6822178296495259648
    rows = [
        ("COMMIT", ct, None, 1, 36, 0),
        ("BEGIN", ct, None, 1, 34, 0),
        ("c", ct, 6822178296477519872, 1, 35, 0),
    ]
    df = spark.createDataFrame(
        rows, "op string, commit_time long, record_time long, term long, index long, write_id long"
    )
    got = [r["op"] for r in commit_time_order(df).collect()]
    assert got == ["BEGIN", "c", "COMMIT"]


def test_marker_rows_bracket_their_fragment(spark):
    ev = generate_events(spark, 2000, n_tablets=4, txn_markers=True).localCheckpoint()
    markers = ev.where(F.col("op").isin("BEGIN", "COMMIT"))
    assert markers.count() > 0
    # per (txn, tablet): BEGIN commit_time == fragment min, COMMIT == max
    dml = ev.where(F.col("op").isin("c", "r", "u", "d", "t", "pku", "m"))
    frag = dml.groupBy("txn_id", "tablet_id").agg(
        F.min("commit_time").alias("lo"), F.max("commit_time").alias("hi")
    )
    j = markers.groupBy("txn_id", "tablet_id").agg(
        F.min(F.when(F.col("op") == "BEGIN", F.col("commit_time"))).alias("b"),
        F.max(F.when(F.col("op") == "COMMIT", F.col("commit_time"))).alias("e"),
    ).join(frag, ["txn_id", "tablet_id"])
    bad = j.where((F.col("b") != F.col("lo")) | (F.col("e") != F.col("hi")))
    assert bad.count() == 0
    # markers carry no record_time and no payload
    assert markers.where(F.col("record_time").isNotNull()).count() == 0
    # in full commit order, each fragment's BEGIN precedes all its DML and
    # COMMIT follows (spot-check one busy fragment)
    busy = j.orderBy(F.desc("e")).first()
    frag_rows = commit_time_order(
        ev.where(
            (F.col("txn_id") == busy["txn_id"])
            & (F.col("tablet_id") == busy["tablet_id"])
        )
    ).collect()
    ops = [r["op"] for r in frag_rows if r["op"] in ("BEGIN", "COMMIT", "c", "r", "u", "d", "t", "pku", "m")]
    assert ops[0] == "BEGIN" and ops[-1] == "COMMIT"


def test_txn_metadata_consumes_markers(spark):
    ev = generate_events(spark, 2000, n_tablets=4, txn_markers=True).localCheckpoint()
    meta = txn_metadata(ev)
    # spans must equal the marker-derived spans
    m = ev.where(F.col("op").isin("BEGIN", "COMMIT")).groupBy("txn_id").agg(
        F.min(F.when(F.col("op") == "BEGIN", F.col("commit_time"))).alias("b"),
        F.max(F.when(F.col("op") == "COMMIT", F.col("commit_time"))).alias("e"),
    )
    j = meta.join(m, "txn_id").where(
        (F.col("begin_time") != F.col("b")) | (F.col("end_time") != F.col("e"))
    )
    assert j.count() == 0
    # event_count counts only applied DML, not markers
    one = meta.first()
    n_dml = ev.where(
        (F.col("txn_id") == one["txn_id"]) & F.col("op").isin("c", "u", "d")
    ).count()
    assert one["event_count"] == n_dml


def test_replay_with_markers_equals_replay_without(spark, tmp_path):
    """Markers are never dispatched — the lake state must be identical with
    and without them in the stream."""
    states = {}
    for flag in (False, True):
        root = os.path.join(str(tmp_path), f"m{flag}")
        evp = os.path.join(root, "events")
        write_events(
            generate_events(spark, 3000, ddl_at=(1500,), txn_markers=flag), evp,
            segment_size=1000,
        )
        t = LakeTable(spark, os.path.join(root, "lake"), n_buckets=4)
        t.init([("commit", "string"), ("lang", "string"), ("content", "string")])
        CdcPipeline(
            spark, evp, t, CheckpointStore(spark, os.path.join(root, "ck")),
            events_per_batch=1000,
        ).run()
        states[flag] = {tuple(r) for r in t.read().collect()}
    assert states[True] == states[False]
