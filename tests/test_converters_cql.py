"""Golden-value tests for the CQL (YCQL) converter family.

Goldens mirror the behaviors of the reference's CQL provider
(``YugabyteDBCQLValueConverter.java``): binary-wire INET/UUID, varint
text parsing with the empty-string→0 rule, the three binary handling
modes, fixed-width binary right-padding, and the Debezium temporal
precision ladders.
"""

import pytest
from pyspark.sql import functions as F

from debezium_connector_yugabytedb_1_spark.functions import converters_cql as CQ


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_inet_from_bytes(spark):
    assert _one(spark, CQ.cql_inet_from_bytes(F.unhex(F.lit("C0A80001")))) == "192.168.0.1"
    assert _one(spark, CQ.cql_inet_from_bytes(F.unhex(F.lit("00000000")))) == "0.0.0.0"
    assert _one(spark, CQ.cql_inet_from_bytes(F.unhex(F.lit("FFFFFFFF")))) == "255.255.255.255"
    # convertInetToIPAddress:630-642 — non-4-byte payload is invalid → ""
    assert _one(spark, CQ.cql_inet_from_bytes(F.unhex(F.lit("C0A800")))) == ""
    assert _one(spark, CQ.cql_inet_from_bytes(F.unhex(F.lit("C0A8000102")))) == ""


def test_uuid_from_bytes(spark):
    raw = "0123456789ABCDEF0123456789ABCDEF"
    got = _one(spark, CQ.cql_uuid_from_bytes(F.unhex(F.lit(raw))))
    assert got == "01234567-89ab-cdef-0123-456789abcdef"
    # convertByteStringToUUID:664-667 — zero bytes → null → delivered ""
    assert _one(spark, CQ.cql_uuid_from_bytes(F.unhex(F.lit("")))) == ""


def test_varint(spark):
    assert _one(spark, CQ.cql_varint(F.lit("123456789012345"))) == 123456789012345
    assert _one(spark, CQ.cql_varint(F.lit("-42"))) == -42
    # convertVarInt — empty wire text delivers 0L
    assert _one(spark, CQ.cql_varint(F.lit(""))) == 0


def test_blob_modes(spark):
    hexin = "48656C6C6F"  # "Hello"
    assert _one(spark, CQ.cql_blob(F.unhex(F.lit(hexin)), "bytes")) == b"Hello"
    assert _one(spark, CQ.cql_blob(F.unhex(F.lit(hexin)), "base64")) == "SGVsbG8="
    # Debezium HexConverter emits lowercase
    assert _one(spark, CQ.cql_blob(F.unhex(F.lit(hexin)), "hex")) == "48656c6c6f"
    with pytest.raises(ValueError):
        CQ.cql_blob(F.lit("x"), "nope")


def test_normalize_binary_right_pads(spark):
    got = _one(spark, CQ.normalize_binary(F.unhex(F.lit("AB")), 4))
    assert got == b"\xab\x00\x00\x00"
    # already at/over width → untouched
    got = _one(spark, CQ.normalize_binary(F.unhex(F.lit("AABBCCDD")), 4))
    assert got == b"\xaa\xbb\xcc\xdd"


def test_temporal_ladders(spark):
    days = F.lit(19000)
    assert _one(spark, CQ.cql_date(days)) == 19000
    assert _one(spark, CQ.cql_date(days, "connect")) == 19000 * 86_400_000

    nanos = F.lit(3_723_123_456_789)  # 01:02:03.123456789
    assert _one(spark, CQ.cql_time(nanos, precision=3)) == 3_723_123
    assert _one(spark, CQ.cql_time(nanos, precision=6)) == 3_723_123_456
    assert _one(spark, CQ.cql_time(nanos, precision=9)) == 3_723_123_456_789
    assert _one(spark, CQ.cql_time(nanos, mode="adaptive_micros")) == 3_723_123_456
    assert _one(spark, CQ.cql_time(nanos, mode="connect")) == 3_723_123

    micros = F.lit(1_600_000_000_123_456)
    assert _one(spark, CQ.cql_timestamp(micros, precision=3)) == 1_600_000_000_123
    assert _one(spark, CQ.cql_timestamp(micros, precision=6)) == 1_600_000_000_123_456
    assert _one(spark, CQ.cql_timestamp(micros, precision=9)) == 1_600_000_000_123_456_000
    assert _one(spark, CQ.cql_timestamp(micros, mode="connect")) == 1_600_000_000_123

    with pytest.raises(ValueError):
        CQ.cql_date(days, "bogus")
    with pytest.raises(ValueError):
        CQ.cql_time(nanos, mode="bogus")
    with pytest.raises(ValueError):
        CQ.cql_timestamp(micros, mode="bogus")


def test_cql_typed_decode_end_to_end(spark):
    df = spark.range(3).select(
        F.col("id"),
        F.unhex(F.concat(F.lit("0A00000"), F.col("id").cast("string"))).alias("w_ip"),
        F.unhex(F.md5(F.col("id").cast("string"))).alias("w_u"),
        (F.col("id") * 1000).cast("string").alias("w_big"),
    )
    out = CQ.cql_typed_decode(
        df, [("ip", "inet"), ("u", "uuid"), ("big", "varint")], prefix="w_"
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["ip"] == "10.0.0.1"
    assert rows[2]["big"] == 2000
    assert len(rows[0]["u"]) == 36 and rows[0]["u"].count("-") == 4
    with pytest.raises(ValueError):
        CQ.cql_typed_decode(df, [("ip", "frozen<map>")])
