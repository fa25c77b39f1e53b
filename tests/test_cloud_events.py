"""P12 — CloudEvents envelope maker goldens
(``converters/YugabyteDBCloudEventsMaker.java:18-31``: ceId =
``name:<server>;lsn:<lsn>;txId:<txId>``; the remaining attributes follow the
Debezium-core CloudEventsMaker contract reproduced in
``transforms.cloud_events``)."""

import json

import pyspark.sql.functions as F

from debezium_connector_yugabytedb_1_spark.operators import transforms
from debezium_connector_yugabytedb_1_spark.operators.decode import decode_envelope
from debezium_connector_yugabytedb_1_spark.operators.order import (
    ht_to_epoch_ms,
    ht_to_epoch_ms_py,
)


def _decoded(spark, corpus_path):
    return decode_envelope(
        spark.read.parquet(corpus_path).where(F.col("op").isin("c", "u", "d"))
    )


def test_attribute_contract(spark, corpus_path):
    dec = _decoded(spark, corpus_path)
    ce = transforms.cloud_events(dec, server_name="dbserver1")
    assert ce.columns == [
        "ce_id", "ce_source", "ce_specversion", "ce_type",
        "ce_time_ms", "ce_datacontenttype", "data",
    ]
    rows = ce.limit(50).collect()
    assert rows
    for r in rows:
        assert r["ce_source"] == "/debezium/yugabytedb/dbserver1"
        assert r["ce_specversion"] == "1.0"
        assert r["ce_type"] == "io.debezium.yugabytedb.datachangeevent"
        assert r["ce_datacontenttype"] == "application/json"
        # ceId = name:<server>;lsn:<term:index:write_id>;txId:<txId>
        name, lsn, tx = r["ce_id"].split(";")
        assert name == "name:dbserver1"
        assert lsn.startswith("lsn:") and lsn.count(":") == 3
        assert tx.startswith("txId:")


def test_golden_row_field_for_field(spark, corpus_path):
    dec = _decoded(spark, corpus_path)
    src = dec.orderBy("term", "index", "write_id").limit(1).collect()[0]
    ce = transforms.cloud_events(
        dec.where(
            (F.col("term") == src["term"])
            & (F.col("index") == src["index"])
            & (F.col("write_id") == src["write_id"])
            & (F.col("tablet_id") == src["tablet_id"])
        )
    ).collect()[0]
    lsn = f"{src['term']}:{src['index']}:{src['write_id']}"
    tx = "null" if src["txn_id"] is None else str(src["txn_id"])
    assert ce["ce_id"] == f"name:dbserver1;lsn:{lsn};txId:{tx}"
    assert ce["ce_time_ms"] == ht_to_epoch_ms_py(src["commit_time"])
    data = json.loads(ce["data"])
    assert data["op"] == src["op"]
    assert data["key"] == {"repo": src["repo"], "path": src["path"]}
    assert data["source"]["table"] == src["table"]
    assert data["source"]["lsn"] == lsn
    assert data["source"]["name"] == "dbserver1"


def test_unset_cells_are_null_in_data(spark, corpus_path):
    """Partial updates serialize unset cells as JSON null (the PGCompatible
    cell rule) — a consumer must distinguish 'not in this change' from a
    value."""
    dec = _decoded(spark, corpus_path).where(F.col("op") == "u")
    row = transforms.cloud_events(dec).limit(20).collect()
    assert any(
        v is None
        for r in row
        for v in json.loads(r["data"])["after"].values()
    )


def test_plan_is_single_projection(spark, corpus_path):
    """Envelope reshapes must stay shuffle-free at 100 TB."""
    ce = transforms.cloud_events(_decoded(spark, corpus_path))
    plan = ce._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_ht_to_epoch_ms_unsigned(spark):
    """HT with the sign bit set must decode to the (huge) unsigned epoch,
    never a negative one — matches ht_key's unsigned comparator domain."""
    vals = [1 << 63, (1 << 64) - 1, 7_000_000_000_000_000_000, 4096_000]
    df = spark.createDataFrame([(v - (1 << 64) if v >= 1 << 63 else v,) for v in vals], "ht long")
    got = [r["ms"] for r in df.select(ht_to_epoch_ms("ht").alias("ms")).collect()]
    exp = [ht_to_epoch_ms_py(v) for v in vals]
    assert got == exp
    assert all(m >= 0 for m in got)
