"""merge_events (fused fold+MERGE) must be observationally equal to the
two-step fold_changes → merge path: same final table state, same stats, same
sha256 invariant, same redelivery/stale absorption."""

import hashlib

import pyspark.sql.functions as F
import pytest

from debezium_connector_yugabytedb_1_spark.generator import generate_events
from debezium_connector_yugabytedb_1_spark.lake import LakeTable
from debezium_connector_yugabytedb_1_spark.operators.decode import decode_envelope
from debezium_connector_yugabytedb_1_spark.operators.emit import DML_OPS, split_pk_updates
from debezium_connector_yugabytedb_1_spark.operators.order import fold_changes

COLS = [("commit", "string"), ("lang", "string"), ("content", "string")]


def _dml(ev):
    return split_pk_updates(
        decode_envelope(ev.where(F.col("op").isin(*DML_OPS, "pku")))
    )


def _snap(table):
    rows = table.read(with_meta=True).collect()
    return sorted(
        (
            r["repo"], r["path"], r["commit"], r["lang"], r["content"],
            r["_last_term"], r["_last_index"], r["_last_write_id"],
            r["content_sha256"],
        )
        for r in rows
    )


def test_merge_events_equals_fold_then_merge(spark, tmp_path):
    ev = generate_events(spark, 6000)
    t_classic = LakeTable(spark, str(tmp_path / "classic"), n_buckets=8)
    t_fused = LakeTable(spark, str(tmp_path / "fused"), n_buckets=8)
    for t in (t_classic, t_fused):
        t.init(COLS)
    cols = [n for n, _ in COLS]
    # three batches, then a full redelivery of batch 2 under a new batch id
    # (stale offsets — the guard must absorb every row)
    windows = [(0, 2000), (2000, 4000), (4000, 6000), (2000, 4000)]
    for i, (lo, hi) in enumerate(windows):
        w = ev.where((F.col("index") >= lo) & (F.col("index") < hi))
        s_classic = t_classic.merge(
            fold_changes(_dml(w), columns=cols), f"b{i}"
        )
        s_fused = t_fused.merge_events(_dml(w), f"b{i}")
        assert (s_classic.upserted, s_classic.deleted) == (
            s_fused.upserted, s_fused.deleted,
        ), f"stats diverge in batch {i}"
        assert s_classic.carried == s_fused.carried, f"carried diverges in batch {i}"
    assert _snap(t_classic) == _snap(t_fused)


def test_merge_events_sha_reuse_and_invariant(spark, tmp_path):
    """The sha256 column must equal sha256(content) even when the fused path
    reuses the stored digest for carried/unchanged rows."""
    ev = generate_events(spark, 3000)
    t = LakeTable(spark, str(tmp_path / "lake"), n_buckets=8)
    t.init(COLS)
    t.merge_events(_dml(ev.where(F.col("index") < 1500)), "b0")
    t.merge_events(
        _dml(ev.where((F.col("index") >= 1500) & (F.col("index") < 3000))), "b1"
    )
    for r in t.read(with_meta=True).select("content", "content_sha256").collect():
        if r["content"] is None:
            assert r["content_sha256"] is None
        else:
            assert (
                hashlib.sha256(r["content"].encode()).hexdigest()
                == r["content_sha256"]
            )


def test_merge_events_batch_id_idempotent(spark, tmp_path):
    ev = generate_events(spark, 1000)
    t = LakeTable(spark, str(tmp_path / "lake"), n_buckets=4)
    t.init(COLS)
    t.merge_events(_dml(ev), "b0")
    before = _snap(t)
    s = t.merge_events(_dml(ev), "b0")
    assert s.skipped
    assert _snap(t) == before


def test_merge_events_single_aggregation_plan(spark, tmp_path):
    """The fused path must plan exactly ONE aggregation (the fold IS the
    merge) and no sort-merge join."""
    ev = generate_events(spark, 500)
    t = LakeTable(spark, str(tmp_path / "lake"), n_buckets=4)
    t.init(COLS)
    t.merge_events(_dml(ev), "b0")
    # rebuild the merged plan the way merge_events does, via a probe batch
    from debezium_connector_yugabytedb_1_spark.lake import bucket_expr

    dml = _dml(ev)
    cols = [n for n, _ in COLS]
    from debezium_connector_yugabytedb_1_spark.operators.decode import cell_set

    evf = dml.select(
        "repo", "path", "op", "term", "index", "write_id",
        *[F.col(f"after.{c}").alias(f"_v_{c}") for c in cols],
        *[cell_set(c).alias(f"_set_{c}") for c in cols],
    )
    tev = t.read(with_meta=True).select(
        "repo", "path", F.lit("r").alias("op"),
        F.col("_last_term").alias("term"),
        F.col("_last_index").alias("index"),
        F.col("_last_write_id").alias("write_id"),
        *[F.col(c).alias(f"_v_{c}") for c in cols],
        *[F.lit(True).alias(f"_set_{c}") for c in cols],
        F.col("content_sha256").alias("_sha"),
        F.lit(True).alias("_is_target"),
    )
    u = evf.unionByName(tev, allowMissingColumns=True)
    g = u.repartition("repo", "path").groupBy("repo", "path").agg(
        F.max(F.struct("term", "index", "write_id")).alias("_last_off")
    )
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Aggregate") <= 2  # one agg node (name appears per line)
    assert "SortMergeJoin" not in plan
