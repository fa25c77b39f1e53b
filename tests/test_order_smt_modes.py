"""global_sequence (two-pass scale-safe rank) equivalence + flatten-SMT
delete/tombstone modes."""

import pyspark.sql.functions as F
from pyspark.sql import Window as W

from debezium_connector_yugabytedb_1_spark.operators.decode import (
    decode_envelope,
    extract_new_record_state,
)
from debezium_connector_yugabytedb_1_spark.operators.order import global_sequence


def test_global_sequence_matches_window_rank(spark):
    df = spark.range(5000).select(
        (F.pmod(F.xxhash64("id"), F.lit(97))).alias("ts"),
        F.col("id").alias("event_id"),
    )
    got = {
        r["event_id"]: r["seq"]
        for r in global_sequence(df, ("ts", "event_id"), n_ranges=8).collect()
    }
    w = W.orderBy("ts", "event_id")
    want = {
        r["event_id"]: r["rn"]
        for r in df.select("event_id", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want


def test_global_sequence_no_single_partition_exchange(spark):
    df = spark.range(1000).select(
        F.col("id").alias("ts"), F.col("id").alias("event_id")
    )
    plan = (
        global_sequence(df, ("ts", "event_id"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_global_sequence_empty(spark):
    df = spark.range(0).select(F.col("id").alias("ts"), F.col("id").alias("event_id"))
    assert global_sequence(df, ("ts",)).count() == 0


def _decoded(spark):
    rows = [
        (0, 1, 0, "c", "r", "a", '{"after":{"commit":"c1","content":"x"},"changed":["commit","content"]}'),
        (0, 2, 0, "d", "r", "a", None),
        (0, 3, 0, "t", "r", "a", None),
    ]
    df = spark.createDataFrame(
        rows,
        "term long, index long, write_id long, op string, repo string, path string, payload string",
    )
    return decode_envelope(df)


def test_smt_default_drops_tombstones(spark):
    out = extract_new_record_state(_decoded(spark), columns=("commit", "content"))
    rows = {(r["repo"], r["path"], r["__deleted"]) for r in out.collect()}
    assert rows == {("r", "a", False), ("r", "a", True)}  # 't' dropped


def test_smt_keep_tombstones(spark):
    out = extract_new_record_state(
        _decoded(spark), columns=("commit", "content"), drop_tombstones=False
    )
    assert out.count() == 3


def test_smt_delete_to_tombstone(spark):
    out = extract_new_record_state(
        _decoded(spark), columns=("commit", "content"), delete_to_tombstone=True
    ).collect()
    assert len(out) == 2  # source tombstone dropped
    tomb = [r for r in out if r["__tombstone"]]
    assert len(tomb) == 1
    assert tomb[0]["commit"] is None and tomb[0]["content"] is None  # null image
    assert tomb[0]["repo"] == "r" and tomb[0]["path"] == "a"  # key kept
    live = [r for r in out if not r["__tombstone"]][0]
    assert live["commit"] == "c1"


def test_release_gate_min_across_tablets(spark):
    from debezium_connector_yugabytedb_1_spark.operators.filters import (
        extract_safepoint_watermark,
    )
    from debezium_connector_yugabytedb_1_spark.operators.order import release_gate

    rows = [
        ("t0", "SAFEPOINT", 100), ("t1", "SAFEPOINT", 50),
        ("t0", "c", 40), ("t0", "c", 60), ("t1", "c", 50), ("t1", "c", 90),
    ]
    df = spark.createDataFrame(rows, "tablet_id string, op string, commit_time long")
    safetimes = extract_safepoint_watermark(df)
    released, held = release_gate(df.where(F.col("op") == "c"), safetimes)
    # stream safetime = min(100, 50) = 50: only records at/below 50 release
    assert sorted(r["commit_time"] for r in released.collect()) == [40, 50]
    assert sorted(r["commit_time"] for r in held.collect()) == [60, 90]
    # no safepoints at all -> everything held
    empty_safe = extract_safepoint_watermark(df.where(F.col("op") == "x"))
    rel2, held2 = release_gate(df.where(F.col("op") == "c"), empty_safe)
    assert rel2.count() == 0 and held2.count() == 4
