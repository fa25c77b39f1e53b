"""``snapshot.mode`` policy surface — config validation + one e2e per mode.

Mirrors the reference's Snapshotter SPI dispatch
(``YugabyteDBConnectorConfig.java:985-1046``, ``spi/Snapshotter.java``,
``snapshot/NeverSnapshotter.java:21``, ``snapshot/InitialOnlySnapshotter.java``,
``snapshot/AlwaysSnapshotter.java``): *initial* snapshots once then streams,
*never* refuses a half-taken snapshot and streams from scratch, *initial_only*
never streams, *always* re-snapshots on every start (picking up base rows
added between runs — the re-run must NOT be swallowed by batch-id
idempotency)."""

import pyspark.sql.functions as F
import pytest

from debezium_connector_yugabytedb_1_spark.config import ConfigError, validate_config
from debezium_connector_yugabytedb_1_spark.generator import generate_events, write_events
from debezium_connector_yugabytedb_1_spark.lake import LakeTable
from debezium_connector_yugabytedb_1_spark.operators.checkpoint import CheckpointStore
from debezium_connector_yugabytedb_1_spark.operators.snapshot import (
    execute_snapshot_policy,
    run_snapshot,
    snapshot_in_effect,
)
from debezium_connector_yugabytedb_1_spark.streaming.pipeline import CdcPipeline

COLS = [("commit", "string"), ("lang", "string"), ("content", "string")]


def _base(spark, n=96, tag="c"):
    return spark.range(n).select(
        F.concat(F.lit("repo-"), F.pmod(F.col("id"), F.lit(8)).cast("string")).alias("repo"),
        F.concat(F.lit("f"), F.col("id").cast("string"), F.lit(".py")).alias("path"),
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("commit"),
        F.lit("python").alias("lang"),
        F.concat(F.lit("body-"), F.col("id").cast("string")).alias("content"),
    )


def _mk(spark, tmp_path, name):
    t = LakeTable(spark, str(tmp_path / f"lake_{name}"), n_buckets=4)
    t.init(COLS)
    ck = CheckpointStore(spark, str(tmp_path / f"ck_{name}"))
    return t, ck


def test_config_rejects_bad_mode():
    with pytest.raises(ConfigError, match="snapshot_mode"):
        validate_config({"snapshot_mode": "on_demand"})
    validate_config({"snapshot_mode": "initial_only"})  # all four accepted
    validate_config({"snapshot_mode": "never"})


def test_unknown_mode_raises_at_dispatch(spark, tmp_path):
    t, ck = _mk(spark, tmp_path, "bad")
    with pytest.raises(ConfigError, match="snapshot_mode"):
        execute_snapshot_policy("when_needed", _base(spark), t, ck, n_tablets=2)


def test_initial_snapshots_once_then_streams(spark, tmp_path):
    t, ck = _mk(spark, tmp_path, "initial")
    base = _base(spark)
    n, stream = execute_snapshot_policy("initial", base, t, ck, n_tablets=2)
    assert n > 0 and stream
    assert ck.meta().get("snapshot_done")
    # restart: complete snapshot is skipped, still streams
    n2, stream2 = execute_snapshot_policy("initial", base, t, ck, n_tablets=2)
    assert n2 == 0 and stream2
    assert t.read().count() == 96


def test_never_streams_without_touching_base(spark, tmp_path):
    t, ck = _mk(spark, tmp_path, "never")
    n, stream = execute_snapshot_policy("never", None, t, ck)
    assert n == 0 and stream
    assert t.read().count() == 0  # no base state loaded
    assert not ck.meta().get("snapshot_done")


def test_never_refuses_half_taken_snapshot(spark, tmp_path):
    """NeverSnapshotter.init raises when offsets show a snapshot in effect
    (``NeverSnapshotter.java:21`` ConnectException) — silently streaming over
    a half-loaded table would serve wrong state forever."""
    t, ck = _mk(spark, tmp_path, "half")
    run_snapshot(_base(spark), t, ck, n_tablets=2, chunks_per_tablet=2, max_chunks=1)
    assert snapshot_in_effect(ck)
    with pytest.raises(RuntimeError, match="never allow"):
        execute_snapshot_policy("never", None, t, ck)
    # ...but a COMPLETED snapshot is fine to attach to stream-only
    run_snapshot(_base(spark), t, ck, n_tablets=2, chunks_per_tablet=2)
    assert not snapshot_in_effect(ck)
    n, stream = execute_snapshot_policy("never", None, t, ck)
    assert n == 0 and stream


def test_initial_only_never_streams(spark, tmp_path):
    t, ck = _mk(spark, tmp_path, "ionly")
    n, stream = execute_snapshot_policy("initial_only", _base(spark), t, ck, n_tablets=2)
    assert n > 0 and not stream
    assert t.read().count() == 96


def test_always_resnapshots_and_sees_new_base_rows(spark, tmp_path):
    t, ck = _mk(spark, tmp_path, "always")
    n1, s1 = execute_snapshot_policy("always", _base(spark, 96), t, ck, n_tablets=2)
    assert n1 > 0 and s1
    # base grew between connector restarts; 'always' must re-read it even
    # though the first run's batch ids are already applied
    n2, s2 = execute_snapshot_policy("always", _base(spark, 128), t, ck, n_tablets=2)
    assert n2 > 0 and s2
    assert t.read().count() == 128
    # generation bumped → batch ids distinct across runs (no idempotency skip)
    gens = {b.split("-")[1] for b in t.manifest()["applied_batches"] if b.startswith("snapshot-g")}
    assert gens == {"g0", "g1"}


def _wal(spark, path, n=2000):
    df = generate_events(spark, n, n_repos=8, paths_per_repo=6, n_tablets=4)
    write_events(df, path)


def test_pipeline_start_policy_e2e(spark, tmp_path):
    """CdcPipeline.start(): never-mode resume does not re-read base state;
    initial_only returns without a single stream window."""
    wal = str(tmp_path / "wal")
    _wal(spark, wal)

    # initial: snapshot + stream in one call
    t, ck = _mk(spark, tmp_path, "p_init")
    p = CdcPipeline(
        spark, wal, t, ck, events_per_batch=1000,
        snapshot_mode="initial", snapshot_source=_base(spark),
    )
    res = p.start()
    assert p.snapshot_chunks > 0 and len(res) > 0
    rows_after = t.read().count()

    # restart in never mode: no snapshot re-read (chunks 0), stream cursor
    # already at end → no windows, state unchanged
    p2 = CdcPipeline(
        spark, wal, t, ck, events_per_batch=1000, snapshot_mode="never",
    )
    res2 = p2.start()
    assert p2.snapshot_chunks == 0 and res2 == []
    assert t.read().count() == rows_after

    # initial_only: snapshot runs, stream loop is never entered
    t3, ck3 = _mk(spark, tmp_path, "p_ionly")
    p3 = CdcPipeline(
        spark, wal, t3, ck3, events_per_batch=1000,
        snapshot_mode="initial_only", snapshot_source=_base(spark),
    )
    assert p3.start() == []
    assert p3.snapshot_chunks > 0
    assert ck3.load_rows() and all(r[1] == -1 for r in ck3.load_rows())  # only snapshot offsets


def test_always_with_staging_restages_fresh_base(spark, tmp_path):
    """Regression: a prior run's staging dir is a frozen copy of the OLD
    base — 'always' must drop it when bumping the generation, else the
    re-snapshot silently reloads stale data (the exact case the mode
    exists for)."""
    t, ck = _mk(spark, tmp_path, "astage")
    staging = str(tmp_path / "staging")
    execute_snapshot_policy(
        "always", _base(spark, 64), t, ck, n_tablets=2, staging_path=staging
    )
    assert t.read().count() == 64
    n2, _ = execute_snapshot_policy(
        "always", _base(spark, 96), t, ck, n_tablets=2, staging_path=staging
    )
    assert n2 > 0
    assert t.read().count() == 96  # new rows loaded through a FRESH staging


def test_initial_completed_streams_without_base(spark, tmp_path):
    # r6 ADVICE: once the snapshot is done, a restart with
    # snapshot_source=None must stream (InitialSnapshotter needs no source
    # when offsets exist) instead of demanding a base it would never read
    t, ck = _mk(spark, tmp_path, "initial_nobase")
    base = _base(spark)
    n, stream = execute_snapshot_policy("initial", base, t, ck, n_tablets=2)
    assert n > 0 and stream
    n2, stream2 = execute_snapshot_policy("initial", None, t, ck, n_tablets=2)
    assert (n2, stream2) == (0, True)


def test_initial_incomplete_still_requires_base(spark, tmp_path):
    # an unfinished snapshot must NOT be skipped over: no base → error
    t, ck = _mk(spark, tmp_path, "initial_incomplete")
    with pytest.raises(ConfigError):
        execute_snapshot_policy("initial", None, t, ck)
