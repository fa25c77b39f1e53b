"""WAL-retention ack (`prune_wal_segments` + `CdcPipeline(prune_wal_every=)`).

The reference's offset-commit handshake lets the server trim WAL below
acked offsets (``YugabyteDBConnectorTask.java:437-477``); here that is
whole-segment deletion of the parquet log below the committed resume
point. Asserts: only wholly-consumed segments go, the final lake state
matches an unpruned run, and a kill/resume over the pruned log works.
"""

import os

from debezium_connector_yugabytedb_1_spark.generator import (
    generate_events,
    prune_wal_segments,
    write_events,
)
from debezium_connector_yugabytedb_1_spark.lake import LakeTable
from debezium_connector_yugabytedb_1_spark.operators.checkpoint import CheckpointStore
from debezium_connector_yugabytedb_1_spark.streaming.pipeline import CdcPipeline


def _segments(path):
    return sorted(
        int(n.split("=")[1]) for n in os.listdir(path) if n.startswith("segment=")
    )


def _state(table):
    return sorted(
        tuple(r) for r in table.read().select("repo", "path", "content").collect()
    )


def _mk_wal(spark, path, n=4000):
    write_events(generate_events(spark, n, n_tablets=4), path, segment_size=500)


def test_prune_is_whole_segment_and_conservative(spark, tmp_path):
    wal = str(tmp_path / "wal")
    _mk_wal(spark, wal)
    assert _segments(wal) == list(range(8))
    # upto 1250: segments 0,1 ([0,1000)) are wholly below; 2 is partial → kept
    assert prune_wal_segments(wal, 1250) == 2
    assert _segments(wal) == [2, 3, 4, 5, 6, 7]
    # idempotent; never prunes the partial segment
    assert prune_wal_segments(wal, 1250) == 0
    # unsegmented log: no-op
    flat = str(tmp_path / "flat")
    write_events(generate_events(spark, 100), flat)
    assert prune_wal_segments(flat, 10_000) == 0


def test_pipeline_prune_matches_unpruned_and_survives_resume(spark, tmp_path):
    cols = [("commit", "string"), ("lang", "string"), ("content", "string")]

    def run(prune, kill_first):
        wal = str(tmp_path / f"wal_{prune}_{kill_first}")
        _mk_wal(spark, wal)
        t = LakeTable(spark, str(tmp_path / f"lake_{prune}_{kill_first}"), n_buckets=4)
        t.init(cols)
        ck = CheckpointStore(spark, str(tmp_path / f"ck_{prune}_{kill_first}"))
        kw = {"prune_wal_every": 1} if prune else {}
        p = CdcPipeline(spark, wal, t, ck, events_per_batch=1000, **kw)
        if kill_first:
            p.run(max_batches=2)  # kill mid-log (some segments already pruned)
            p = CdcPipeline(spark, wal, t, ck, events_per_batch=1000, **kw)
        p.run()
        return t, p, wal

    t_ref, _, wal_ref = run(prune=False, kill_first=False)
    t_pru, p_pru, wal_pru = run(prune=True, kill_first=True)
    assert _state(t_pru) == _state(t_ref)
    # the consumed log actually shrank; the reference run kept everything
    assert p_pru.pruned_segments > 0
    assert len(_segments(wal_pru)) < len(_segments(wal_ref))
    # a completed log is fully consumable → fully prunable
    assert _segments(wal_pru) == []
    # rerun over the empty-but-committed log is a no-op, not an error
    assert (
        CdcPipeline(
            spark, wal_pru, t_pru,
            CheckpointStore(spark, str(tmp_path / "ck_True_True")),
            events_per_batch=1000, prune_wal_every=1,
        ).run()
        == []
    )
