"""The replay's log-extent probe must prune to the max WAL segment (an
O(segment) scan) and still report the exact global max index — on both
segmented and unsegmented logs, and when the max segment holds the
boundary row exactly."""

import os

import pytest
from pyspark.sql import functions as F

from debezium_connector_yugabytedb_1_spark.generator import generate_events, write_events
from debezium_connector_yugabytedb_1_spark.lake import LakeTable
from debezium_connector_yugabytedb_1_spark.operators.checkpoint import CheckpointStore
from debezium_connector_yugabytedb_1_spark.streaming.pipeline import CdcPipeline


def _pipe(spark, path, tmp_path):
    t = LakeTable(spark, str(tmp_path / "lake"), n_buckets=4)
    t.init([("commit", "string"), ("lang", "string"), ("content", "string")])
    ck = CheckpointStore(spark, str(tmp_path / "ckpt"))
    return CdcPipeline(spark, path, t, ck, events_per_batch=500)


@pytest.mark.parametrize("segment_size", [None, 300])
def test_max_index_equals_full_scan(spark, tmp_path, segment_size):
    path = str(tmp_path / f"ev_{segment_size}")
    write_events(
        generate_events(spark, 1000), path, segment_size=segment_size
    )
    pipe = _pipe(spark, path, tmp_path)
    events = spark.read.parquet(path)
    truth = events.agg(F.max("index")).collect()[0][0]
    assert pipe._max_index(events) == int(truth) == 999
    if segment_size:
        assert any(
            n.startswith("segment=") for n in os.listdir(path)
        ), "corpus should be segment-partitioned"


def test_max_index_segment_boundary(spark, tmp_path):
    # n_events an exact multiple of segment_size: the max segment holds a
    # full segment, max index = n-1 on its upper edge
    path = str(tmp_path / "ev_edge")
    write_events(generate_events(spark, 600), path, segment_size=200)
    pipe = _pipe(spark, path, tmp_path)
    events = spark.read.parquet(path)
    assert pipe._max_index(events) == 599


def test_replay_result_unchanged_by_pruned_extent(spark, tmp_path):
    # e2e: the pruned extent drives the same number of windows and the same
    # final state as before (processes through the end of the log)
    path = str(tmp_path / "ev_e2e")
    write_events(generate_events(spark, 1200), path, segment_size=500)
    pipe = _pipe(spark, path, tmp_path)
    results = pipe.run()
    assert sum(r.n_input for r in results) == 1200
    assert int(pipe.ckpt.meta()["next_lo"]) >= 1200
