"""End-to-end replay correctness: engine final state == pure-Python oracle,
including per-row sha256(content), kill/resume, DDL mid-stream, and
re-delivery idempotency. Mirrors the reference's restart/resume test intent
(``YugabyteDBSnapshotResumeTest.java``, ``YugabyteDBRestartTest.java``,
``YugabyteDBSchemaEvolutionTest.java``)."""

import pytest

from debezium_connector_yugabytedb_1_spark.lake import LakeTable
from debezium_connector_yugabytedb_1_spark.operators.checkpoint import CheckpointStore
from debezium_connector_yugabytedb_1_spark.operators.metrics import MetricsSink
from debezium_connector_yugabytedb_1_spark.streaming.pipeline import CdcPipeline

from .oracle import engine_state, replay

INIT_COLS = [("commit", "string"), ("lang", "string"), ("content", "string")]


def build(spark, corpus_path, root, events_per_batch=800):
    table = LakeTable(spark, str(root / "lake"), n_buckets=8)
    table.init(INIT_COLS)
    ckpt = CheckpointStore(spark, str(root / "ckpt"))
    metrics = MetricsSink(str(root / "metrics"))
    pipe = CdcPipeline(
        spark, corpus_path, table, ckpt, metrics=metrics, events_per_batch=events_per_batch
    )
    return table, ckpt, metrics, pipe


def assert_state_equal(expected: dict, actual: dict):
    assert set(actual) == set(expected), (
        f"key sets differ: extra={set(actual) - set(expected)}, "
        f"missing={set(expected) - set(actual)}"
    )
    for k in expected:
        assert actual[k] == expected[k], f"row mismatch for {k}: {actual[k]} != {expected[k]}"


def test_full_replay_matches_oracle(spark, corpus_path, corpus_rows, tmp_path):
    table, ckpt, metrics, pipe = build(spark, corpus_path, tmp_path)
    results = pipe.run()
    assert any(r.ddl_applied for r in results), "DDL should have been applied mid-stream"
    expected, cols = replay(corpus_rows)
    assert [n for n, _ in table.columns] == cols  # schema evolved identically
    assert_state_equal(expected, engine_state(table))
    # lineage metrics exist for every batch
    m = metrics.read(spark)
    assert m.where("op = 'c'").count() > 0
    assert set(r["batch_id"] for r in m.select("batch_id").distinct().collect()) == set(
        r.batch_id for r in results
    )


def test_kill_and_resume_matches_oracle(spark, corpus_path, corpus_rows, tmp_path):
    """Kill after 2 micro-batches; a fresh pipeline instance must resume from
    the checkpoint (not from zero) and converge to the identical state."""
    table, ckpt, _, pipe = build(spark, corpus_path, tmp_path)
    first = pipe.run(max_batches=2)
    assert len(first) >= 2
    mid_lo = ckpt.meta()["next_lo"]
    assert 0 < mid_lo < 4000

    # simulate process death: brand-new objects over the same storage
    table2 = LakeTable(spark, str(tmp_path / "lake"), n_buckets=8)
    ckpt2 = CheckpointStore(spark, str(tmp_path / "ckpt"))
    pipe2 = CdcPipeline(spark, corpus_path, table2, ckpt2, events_per_batch=800)
    second = pipe2.run()
    assert all(int(r.batch_id.split("-")[0][1:]) >= mid_lo for r in second)

    expected, _ = replay(corpus_rows)
    assert_state_equal(expected, engine_state(table2))


def test_redelivery_is_absorbed(spark, corpus_path, corpus_rows, tmp_path):
    """Replaying the whole log again over the final table (fresh checkpoint,
    same batch windows) must not change the state: batch-id dedup + per-row
    monotonic offset guard absorb at-least-once re-delivery."""
    table, ckpt, _, pipe = build(spark, corpus_path, tmp_path)
    pipe.run()
    before = engine_state(table)

    ckpt2 = CheckpointStore(spark, str(tmp_path / "ckpt_replay"))
    pipe2 = CdcPipeline(spark, corpus_path, table, ckpt2, events_per_batch=800)
    res = pipe2.run()
    assert all(r.merge.skipped for r in res), "identical batch ids must be skipped"
    assert engine_state(table) == before

    # different windowing → different batch ids → rows re-joined, but the
    # offset guard keeps every row at its newest image
    ckpt3 = CheckpointStore(spark, str(tmp_path / "ckpt_replay2"))
    pipe3 = CdcPipeline(spark, corpus_path, table, ckpt3, events_per_batch=1300)
    res3 = pipe3.run()
    assert not any(r.merge.skipped for r in res3)
    assert engine_state(table) == before


def test_checkpoint_monotonic_and_complete(spark, corpus_path, tmp_path):
    table, ckpt, _, pipe = build(spark, corpus_path, tmp_path)
    pipe.run(max_batches=2)
    first = {r["tablet_id"]: (r["term"], r["index"], r["write_id"]) for r in ckpt.load().collect()}
    pipe.run()
    final = {r["tablet_id"]: (r["term"], r["index"], r["write_id"]) for r in ckpt.load().collect()}
    for t, off in first.items():
        assert final[t] >= off, "checkpoint moved backwards"
    ev = spark.read.parquet(corpus_path)
    true_max = {
        r["tablet_id"]: r["mi"]
        for r in ev.groupBy("tablet_id").agg({"index": "max"}).withColumnRenamed("max(index)", "mi").collect()
    }
    for t, mi in true_max.items():
        assert final[t][1] == mi, f"tablet {t} checkpoint not at log end"


@pytest.mark.parametrize("use_pandas", [False, True])
def test_decode_paths_equivalent_e2e(spark, corpus_path, corpus_rows, tmp_path, use_pandas):
    """The Arrow pandas-UDF decode path and the from_json path produce the
    same final state."""
    root = tmp_path / ("pandas" if use_pandas else "jvm")
    root.mkdir()
    table = LakeTable(spark, str(root / "lake"), n_buckets=4)
    table.init(INIT_COLS)
    ckpt = CheckpointStore(spark, str(root / "ckpt"))
    pipe = CdcPipeline(
        spark, corpus_path, table, ckpt, events_per_batch=2500, use_pandas_decode=use_pandas
    )
    pipe.run()
    expected, _ = replay(corpus_rows)
    assert_state_equal(expected, engine_state(table))
