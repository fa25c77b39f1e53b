"""Pre-shredded wire format: a typed ``change`` struct column replaces the
JSON payload string for DML events. Decode is then a pure projection (zero
parse); semantics must be bit-identical to the ``from_json`` path — same
decoded envelopes, same final lake state after a full replay with
mid-stream DDL."""

import os

import pyspark.sql.functions as F

from debezium_connector_yugabytedb_1_spark.generator import generate_events, write_events
from debezium_connector_yugabytedb_1_spark.lake import LakeTable
from debezium_connector_yugabytedb_1_spark.operators.checkpoint import CheckpointStore
from debezium_connector_yugabytedb_1_spark.operators.decode import decode_envelope
from debezium_connector_yugabytedb_1_spark.operators.emit import DML_OPS
from debezium_connector_yugabytedb_1_spark.streaming.pipeline import CdcPipeline

N = 4000
DDL = (N // 2,)


def _decoded_rows(spark, fmt):
    ev = generate_events(spark, N, ddl_at=DDL, payload_format=fmt)
    dml = ev.where(F.col("op").isin(*DML_OPS, "pku"))
    dec = decode_envelope(dml).select(
        "eid", "op", "after", "changed", "before_key"
    )
    return {r["eid"]: (r["op"], r["after"], sorted(r["changed"] or []), r["before_key"])
            for r in dec.collect()}


def test_shredded_decode_equals_from_json(spark):
    assert _decoded_rows(spark, "shredded") == _decoded_rows(spark, "json")


def test_shredded_ddl_and_message_rows_keep_json_payload(spark):
    ev = generate_events(spark, N, ddl_at=DDL, msg_per_mille=10, payload_format="shredded")
    non_dml = ev.where(F.col("op").isin("m", "ddl"))
    assert non_dml.where(F.col("payload").isNull()).count() == 0
    assert ev.where(F.col("op").isin(*DML_OPS, "pku") & F.col("payload").isNotNull()).count() == 0
    # ddl decode fields still come through on the struct path
    dec = decode_envelope(ev).where(F.col("op") == "ddl").select("ddl_action", "ddl_name")
    rows = dec.collect()
    assert rows and all(r["ddl_action"] == "add_column" and r["ddl_name"] == "stars" for r in rows)


def _replay(spark, tmpdir, fmt):
    root = os.path.join(tmpdir, fmt)
    evp = os.path.join(root, "events")
    write_events(generate_events(spark, N, ddl_at=DDL, payload_format=fmt), evp,
                 segment_size=1000)
    t = LakeTable(spark, os.path.join(root, "lake"), n_buckets=4)
    t.init([("commit", "string"), ("lang", "string"), ("content", "string")])
    ck = CheckpointStore(spark, os.path.join(root, "ckpt"))
    CdcPipeline(spark, evp, t, ck, events_per_batch=1500).run()
    return {tuple(r) for r in t.read().collect()}


def test_shredded_replay_state_equals_json_replay(spark, tmp_path):
    assert _replay(spark, str(tmp_path), "shredded") == _replay(spark, str(tmp_path), "json")


def test_streaming_front_end_reads_shredded_wire(spark, tmp_path):
    """The file-source schema must come from the log's own footers: a
    hard-coded JSON wire schema silently nulls every shredded ``change``
    cell (columns absent from an explicit streaming schema don't error).
    Regression for the all-NULL state the first streaming soak surfaced."""
    from debezium_connector_yugabytedb_1_spark.streaming.stream import run_streaming

    ev = str(tmp_path / "wal")
    write_events(
        generate_events(spark, 1500, n_repos=6, paths_per_repo=5, n_tablets=4,
                        payload_format="shredded"),
        ev,
    )
    t = LakeTable(spark, str(tmp_path / "lake"), n_buckets=4)
    t.init([("commit", "string"), ("lang", "string"), ("content", "string")])
    ck = CheckpointStore(spark, str(tmp_path / "ckpt"))
    run_streaming(spark, ev, t, ck, str(tmp_path / "sckpt"))

    t2 = LakeTable(spark, str(tmp_path / "lake2"), n_buckets=4)
    t2.init([("commit", "string"), ("lang", "string"), ("content", "string")])
    CdcPipeline(spark, ev, t2, CheckpointStore(spark, str(tmp_path / "ck2")),
                events_per_batch=1500).run()
    a = sorted(map(str, t.read().collect()))
    b = sorted(map(str, t2.read().collect()))
    assert a == b
    assert all("commit=None" not in r for r in a[:5])


def test_stream_starts_on_empty_wal_dir(spark, tmp_path):
    """Continuous-tailing regression: schema sniffing must not break
    starting a stream over a WAL directory with no segments yet — the
    JSON wire literal is the fallback."""
    from debezium_connector_yugabytedb_1_spark.sources import (
        EVENT_SCHEMA,
        read_event_stream,
    )

    empty = str(tmp_path / "wal_empty")
    os.makedirs(empty)
    df = read_event_stream(spark, empty)
    assert df.isStreaming
    assert df.schema == EVENT_SCHEMA
