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


def test_merge_events_key_prefix_modes_equivalent(spark, tmp_path, monkeypatch):
    """The _kh sort-prefix is a pure perf knob (regime-adaptive by shuffle
    codec): forced on and forced off must produce identical table state."""
    ev = generate_events(spark, 4000)
    snaps = []
    for mode in ("on", "off"):
        monkeypatch.setenv("SPARK_GRAFT_KEY_PREFIX", mode)
        t = LakeTable(spark, str(tmp_path / f"kp_{mode}"), n_buckets=4)
        t.init(COLS)
        t.merge_events(_dml(ev.where(F.col("index") < 2000)), "b0")
        t.merge_events(_dml(ev.where(F.col("index") >= 2000)), "b1")
        snaps.append(_snap(t))
    assert snaps[0] == snaps[1]


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


def test_out_of_order_delete_no_resurrection(spark, tmp_path):
    """A delete arriving BEFORE the (lower-offset) create it kills — e.g.
    the streaming file source across triggers — must not let the create
    resurrect the row: tombstones persist the delete's offset."""
    t = LakeTable(spark, str(tmp_path / "lake"), n_buckets=4)
    t.init(COLS)
    dele = spark.createDataFrame(
        [(0, 20, 0, "d", "r", "p", None)],
        "term long, index long, write_id long, op string, repo string, path string, payload string",
    )
    crea = spark.createDataFrame(
        [(0, 10, 0, "c", "r", "p", '{"after":{"commit":"c1","content":"x"},"changed":["commit","content"]}')],
        "term long, index long, write_id long, op string, repo string, path string, payload string",
    )
    t.merge_events(_dml(dele), "b-del")   # delete arrives first
    t.merge_events(_dml(crea), "b-crea")  # stale create arrives later
    assert t.read().isEmpty(), "stale create must not resurrect a deleted row"
    # with-deleted view holds the tombstone at the delete's offset
    tomb = t.read(with_meta=True, with_deleted=True).collect()
    assert len(tomb) == 1 and tomb[0]["_deleted"] and tomb[0]["_last_index"] == 20
    # a genuinely newer create DOES resurrect
    crea2 = spark.createDataFrame(
        [(0, 30, 0, "c", "r", "p", '{"after":{"commit":"c2","content":"y"},"changed":["commit","content"]}')],
        "term long, index long, write_id long, op string, repo string, path string, payload string",
    )
    st = t.merge_events(_dml(crea2), "b-crea2")
    assert st.upserted == 1
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["commit"] == "c2"
    # vacuum: tombstone gone after its offset is safe (none left here since
    # the key is live again) — seed another deleted key and reclaim it
    dele2 = spark.createDataFrame(
        [(0, 40, 0, "d", "r2", "p2", None)],
        "term long, index long, write_id long, op string, repo string, path string, payload string",
    )
    t.merge_events(_dml(dele2), "b-del2")
    assert t.vacuum_tombstones(before_index=50) == 1
    assert t.read(with_meta=True, with_deleted=True).where("_deleted").isEmpty()
    assert t.read().count() == 1  # live row survived the rewrite


def test_streaming_multi_trigger_converges_with_batch(spark, tmp_path):
    """The Structured Streaming front-end (file source, multiple triggers,
    NO offset order across triggers) must converge to the batch pipeline's
    visible state: same keys, same row images (DDL corpus: base columns —
    see stream.py's ordering contract for the per-column caveat)."""
    import os

    from debezium_connector_yugabytedb_1_spark.generator import write_events
    from debezium_connector_yugabytedb_1_spark.operators.checkpoint import CheckpointStore
    from debezium_connector_yugabytedb_1_spark.streaming.pipeline import CdcPipeline
    from debezium_connector_yugabytedb_1_spark.streaming.stream import run_streaming

    ev = os.path.join(str(tmp_path), "events")
    write_events(generate_events(spark, 4000, ddl_at=(2000,)), ev)
    ta = LakeTable(spark, str(tmp_path / "la"), n_buckets=8)
    ta.init(COLS)
    CdcPipeline(
        spark, ev, ta, CheckpointStore(spark, str(tmp_path / "ca")), events_per_batch=900
    ).run()
    tb = LakeTable(spark, str(tmp_path / "lb"), n_buckets=8)
    tb.init(COLS)
    run_streaming(
        spark, ev, tb, CheckpointStore(spark, str(tmp_path / "cb")), str(tmp_path / "sb")
    )
    a = sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in ta.read().collect()
    )
    b = sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in tb.read().collect()
    )
    assert a == b and len(a) > 0
    assert tb.read().columns == ta.read().columns  # DDL applied in both


def test_merge_events_packed_offset_boundary_values(spark, tmp_path):
    """The fused path packs (term, index, write_id) into one long
    (14/38/11-bit fields, +2 bias). Push every field to its extremes —
    snapshot term -1, term near 2^14, index near the 38-bit ceiling,
    write_id (incl. the pku-split doubling) near the 11-bit ceiling — and
    demand observational equality with the
    unpacked fold_changes → merge path (any bit-budget error silently
    reorders offsets and diverges the final state)."""
    ev = generate_events(spark, 4000)
    hi_index = (1 << 38) - 5000  # index + 2 must stay < 2^38
    remapped = (
        ev.withColumn("term", F.when(F.col("term") >= 0, F.col("term") + 16370)
                      .otherwise(F.col("term")))
        .withColumn("index", F.col("index") + F.lit(hi_index))
        .withColumn("write_id", F.col("write_id") + 960)  # split doubles: up to ~2040
    )
    t_classic = LakeTable(spark, str(tmp_path / "classic"), n_buckets=4)
    t_fused = LakeTable(spark, str(tmp_path / "fused"), n_buckets=4)
    for t in (t_classic, t_fused):
        t.init(COLS)
    cols = [n for n, _ in COLS]
    windows = [(0, 2000), (2000, 4000), (0, 2000)]  # incl. stale redelivery
    for i, (lo, hi) in enumerate(windows):
        w = remapped.where(
            (F.col("index") >= lo + hi_index) & (F.col("index") < hi + hi_index)
        )
        t_classic.merge(fold_changes(_dml(w), columns=cols), f"b{i}")
        t_fused.merge_events(_dml(w), f"b{i}")
    snap_c, snap_f = _snap(t_classic), _snap(t_fused)
    assert snap_c == snap_f
    # the boundary offsets round-trip exactly through pack/unpack
    terms = {r[5] for r in snap_f}
    assert terms <= {16370 + k for k in range(3)} | {-1}
    assert all(r[6] >= hi_index for r in snap_f)
    assert all(960 <= r[7] <= 2044 for r in snap_f)


def test_merge_events_rejects_out_of_budget_offsets(spark, tmp_path):
    """An offset outside the packed 14/38/11-bit field budget must fail
    loudly — silent carry into the neighboring field would reorder offsets."""
    ev = generate_events(spark, 200).withColumn(
        "write_id", F.col("write_id") + 4000  # > 2^11-2
    )
    t = LakeTable(spark, str(tmp_path / "lake"), n_buckets=2)
    t.init(COLS)
    with pytest.raises(Exception, match="packed 14/38/11-bit budget"):
        t.merge_events(_dml(ev), "b0")
