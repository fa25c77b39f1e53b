"""P2 golden rows — converter semantics mirroring the reference's datatype
handling (``YugabyteDBValueConverter.java``): decimal NaN/±Infinity specials
and variable-scale stripping, ±infinity temporal sentinels, interval modes,
money scale-2, hstore map/json, enum validation, bytea modes, bit/varbit
little-endian padding, array parsing, point structs."""

import pyspark.sql.functions as F
import pytest

from debezium_connector_yugabytedb_1_spark.functions import converters as C


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_decimal_modes(spark):
    # variable-scale precise: canonical string, trailing zeros stripped
    # (convertDecimal :560-567)
    assert _one(spark, C.convert_decimal(F.lit("12.3400"), scale=None)) == "12.34"
    assert _one(spark, C.convert_decimal(F.lit("120.000"), scale=None)) == "120"
    assert _one(spark, C.convert_decimal(F.lit("NaN"), scale=None)) is None
    # fixed scale precise
    from decimal import Decimal

    assert _one(spark, C.convert_decimal(F.lit("1.005"), scale=3)) == Decimal("1.005")
    assert _one(spark, C.convert_decimal(F.lit("Infinity"), scale=3)) is None
    # double mode parses the three specials natively (toSpecialValue :977-988)
    import math

    assert _one(spark, C.convert_decimal(F.lit("Infinity"), mode="double")) == math.inf
    assert _one(spark, C.convert_decimal(F.lit("-Infinity"), mode="double")) == -math.inf
    assert math.isnan(_one(spark, C.convert_decimal(F.lit("NaN"), mode="double")))
    # special side-channel
    assert _one(spark, C.decimal_special_flag(F.lit("NaN"))) == "NaN"
    assert _one(spark, C.decimal_special_flag(F.lit("1.5"))) is None


def test_temporal_sentinels(spark):
    assert (
        _one(spark, C.convert_timestamp_micros(F.lit("infinity")))
        == C.POSITIVE_INFINITY_MICROS
    )
    assert (
        _one(spark, C.convert_timestamp_micros(F.lit("-infinity")))
        == C.NEGATIVE_INFINITY_MICROS
    )
    assert (
        _one(spark, C.convert_timestamp_micros(F.lit("2020-01-02 03:04:05")))
        == 1577934245000000
    )
    assert _one(spark, C.convert_timestamptz_string(F.lit("infinity"))) == "infinity"
    assert (
        _one(spark, C.convert_timestamptz_string(F.lit("2020-01-02T03:04:05+00:00")))
        == "2020-01-02T03:04:05.000000Z"
    )
    assert _one(spark, C.convert_date_days(F.lit("1970-01-11"))) == 10
    assert _one(spark, C.convert_date_days(F.lit("infinity"))) == C.POSITIVE_INFINITY_DAYS
    assert (
        _one(spark, C.convert_time_micros(F.lit("01:02:03.25")))
        == 3_600_000_000 + 120_000_000 + 3_000_000 + 250_000
    )
    assert _one(spark, C.convert_time_micros(F.lit("00:00:00"))) == 0


def test_interval_modes(spark):
    # numeric mode: micros passthrough; string mode: the reference's
    # Interval.toIsoString(0,0,0,0,0, micros/1e6) shape (:746-782)
    assert _one(spark, C.convert_interval(F.lit(1500000))) == 1500000
    assert _one(spark, C.convert_interval(F.lit(1500000), mode="string")) == "P0Y0M0DT0H0M1.5S"
    assert _one(spark, C.convert_interval(F.lit(2000006), mode="string")) == "P0Y0M0DT0H0M2.000006S"
    assert _one(spark, C.convert_interval(F.lit(3000000), mode="string")) == "P0Y0M0DT0H0M3S"


def test_money_and_bits(spark):
    from decimal import Decimal

    # money: 64-bit int, last two digits are decimals (:734-744)
    assert _one(spark, C.convert_money(F.lit(12345))) == Decimal("123.45")
    assert _one(spark, C.convert_money(F.lit(7))) == Decimal("0.07")
    # bit: Integer.valueOf(str, 2) (:705-710)
    assert _one(spark, C.convert_bit(F.lit("101"))) == 5
    # varbit: little-endian padded, sized by set bits not declared length
    # (:712-732 — b'101' in BIT VARYING(33) ships ONE byte)
    assert _one(spark, F.hex(C.convert_varbit_bytes(F.lit("101")))) == "05"
    assert _one(spark, F.hex(C.convert_varbit_bytes(F.lit("10100000")))) == "A0"
    assert _one(spark, F.hex(C.convert_varbit_bytes(F.lit("1111000011110000")))) == "F0F0"
    assert _one(spark, F.hex(C.convert_varbit_bytes(F.lit("0")))) == ""


def test_hstore_enum_uuid_bytea(spark):
    m = _one(spark, C.convert_hstore(F.lit('"a"=>"1", "b"=>"x"')))
    assert m == {"a": "1", "b": "x"}
    assert (
        _one(spark, C.convert_hstore(F.lit('"k"=>"v"'), mode="json")) == '{"k":"v"}'
    )
    assert _one(spark, C.convert_hstore(F.lit(""))) is None
    # full quoting parity: escaped quotes/backslashes, the literal
    # separator sequences ", " and "=>" INSIDE values, and NULL values
    hairy = '"k\\"x"=>"a\\\\b", "s"=>"p, \\"q\\"=>r", "n"=>NULL'
    assert _one(spark, C.convert_hstore(F.lit(hairy))) == {
        'k"x': "a\\b",
        "s": 'p, "q"=>r',
        "n": None,
    }
    assert (
        _one(spark, C.convert_hstore(F.lit(hairy), mode="json"))
        == '{"k\\"x":"a\\\\b","s":"p, \\"q\\"=>r","n":null}'
    )
    assert _one(spark, C.convert_enum(F.lit("red"), allowed=("red", "green"))) == "red"
    assert _one(spark, C.convert_enum(F.lit("bogus"), allowed=("red", "green"))) is None
    assert (
        _one(spark, C.convert_uuid(F.lit("A0EEBC99-9C0B-4EF8-BB6D-6BB9BD380A11")))
        == "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11"
    )
    assert _one(spark, C.convert_bytea(F.lit("\\x4142"))) == bytearray(b"AB")
    assert _one(spark, C.convert_bytea(F.lit("\\x4142"), mode="hex")) == "4142"
    assert _one(spark, C.convert_bytea(F.lit("\\x4142"), mode="base64")) == "QUI="


def test_arrays_point_inet(spark):
    assert _one(spark, C.convert_array(F.lit("{1,2,NULL,4}"), "bigint")) == [1, 2, None, 4]
    assert _one(spark, C.convert_array(F.lit("{}"), "int")) == []
    assert _one(spark, C.convert_array(F.lit('{"a","b b",NULL}'))) == ["a", "b b", None]
    assert _one(spark, C.convert_array(F.lit("{1.5,2.25}"), "double")) == [1.5, 2.25]
    p = _one(spark, C.convert_point(F.lit("(1.5,-2.25)")))
    assert (p["x"], p["y"]) == (1.5, -2.25)
    assert _one(spark, C.convert_inet(F.lit(" FE80::1 "))) == "fe80::1"
    assert _one(spark, C.convert_range(F.lit(" [1,10) "))) == "[1,10)"


def test_typed_decode_dispatch(spark):
    df = spark.createDataFrame(
        [("1.500", "12345", "{1,2}")], "w_num string, w_money string, w_arr string"
    )
    out = C.typed_decode(
        df.withColumnRenamed("w_num", "w_n")
        .withColumnRenamed("w_money", "w_m")
        .withColumnRenamed("w_arr", "w_a")
        .select(
            F.col("w_n").alias("w_n"),
            F.col("w_m").cast("long").alias("w_m"),
            F.col("w_a").alias("w_a"),
        ).selectExpr("w_n as w_num", "w_m as w_money", "w_a as w_arr"),
        [("num", "numeric"), ("money", "money"), ("arr", "int4_array")],
        prefix="w_",
    )
    r = out.collect()[0]
    assert r["num"] == "1.5" and str(r["money"]) == "123.45" and r["arr"] == [1, 2]


def test_variable_scale_decimal_beyond_38_18(spark):
    """Values outside decimal(38,18) keep textual exactness (ANSI cast
    would throw on >20 integer digits and silently round >18 fractional)."""
    from debezium_connector_yugabytedb_1_spark.functions.converters import convert_decimal

    rows = [
        ("123456789012345678901234567.500",),   # 27 int digits
        ("0.0000000000000000001234500",),        # 25 frac digits
        ("-000042.4200",),                       # leading zeros, negative
        ("7.5000",),                             # inside range: decimal path
        ("NaN",),
    ]
    df = spark.createDataFrame(rows, "w string")
    got = [r["v"] for r in df.select(
        convert_decimal("w", mode="precise", scale=None).alias("v")).collect()]
    assert got == [
        "123456789012345678901234567.5",
        "0.00000000000000000012345",
        "-42.42",
        "7.5",
        None,
    ]


def test_quoted_text_array_elements(spark):
    """PgArray-style quoting: embedded commas, escaped quotes/backslashes,
    quoted 'NULL' literal vs unquoted NULL (YbProtoColumnValue.java:312-343)."""
    from debezium_connector_yugabytedb_1_spark.functions.converters import convert_array

    df = spark.createDataFrame(
        [('{"a,b","q\\"z","back\\\\slash",NULL,"NULL",plain}',), ("{}",)],
        "w string",
    )
    got = [r["v"] for r in df.select(convert_array("w").alias("v")).collect()]
    assert got[0] == ["a,b", 'q"z', "back\\slash", None, "NULL", "plain"]
    assert got[1] == []


def test_geometry_ewkb(spark):
    """EWKB hex → (wkb bytes, srid): the canonical POINT(1 2) SRID=4326
    example, plus the no-SRID variant (convertGeometry :815-872)."""
    from debezium_connector_yugabytedb_1_spark.functions.converters import convert_geometry

    with_srid = "0101000020E6100000000000000000F03F0000000000000040"
    without = "0101000000000000000000F03F0000000000000040"
    df = spark.createDataFrame([(with_srid,), (without,)], "w string")
    rows = df.select(convert_geometry("w").alias("g")).collect()
    assert rows[0]["g"]["srid"] == 4326
    assert bytes(rows[0]["g"]["wkb"]).hex() == with_srid.lower()
    assert rows[1]["g"]["srid"] is None
    assert bytes(rows[1]["g"]["wkb"]).hex() == without.lower()
    # big-endian variant: XDR byte order marker 00, type 0x20000001, srid 4326
    be = "00" + "20000001" + "000010E6" + "3FF0000000000000" + "4000000000000000"
    r = spark.createDataFrame([(be,)], "w string").select(
        convert_geometry("w").alias("g")).first()
    assert r["g"]["srid"] == 4326


def test_timetz_utc_shift(spark):
    """TIMETZ shifts to UTC like the reference's OffsetTime →
    withOffsetSameInstant(UTC) (convertTimeWithZone :805-813)."""
    from debezium_connector_yugabytedb_1_spark.functions.converters import convert_timetz

    rows = [
        ("13:04:05.123+05:30",),   # → 07:34:05.123Z
        ("23:30:00-02",),          # wraps forward → 01:30:00Z
        ("00:15:30+00",),
        ("10:00:00.000001-04:15",),
    ]
    df = spark.createDataFrame(rows, "w string")
    got = [r["v"] for r in df.select(convert_timetz("w").alias("v")).collect()]
    assert got == [
        "07:34:05.123000Z",
        "01:30:00.000000Z",
        "00:15:30.000000Z",
        "14:15:00.000001Z",
    ]


def test_typed_array_families(spark):
    from debezium_connector_yugabytedb_1_spark.functions.converters import CONVERTERS

    df = spark.createDataFrame(
        [("{2020-01-02,infinity,NULL}", '{"2020-01-02 03:04:05+00",NULL}')],
        "d string, t string",
    )
    r = df.select(
        CONVERTERS["date_array"]("d").alias("d"),
        CONVERTERS["timestamptz_array"]("t").alias("t"),
    ).first()
    assert r["d"] == [18263, 106751991, None]
    assert r["t"] == ["2020-01-02T03:04:05.000000Z", None]


def test_ltree_and_ltree_array(spark):
    """Ltree passthrough + the reference's NAIVE brace-strip/comma-split
    for ltree[] (``convertLtreeArray :594-604`` — no quoting possible in
    ltree labels, so no tokenizer)."""
    df = spark.createDataFrame(
        [("Top.Science", "{Top.A,Top.B.c1}"), (None, "{}"), ("a_b.c0", None)],
        "lt string, lta string",
    )
    rows = df.select(
        C.convert_ltree("lt").alias("p"),
        C.convert_ltree_array("lta").alias("a"),
    ).collect()
    assert rows[0]["p"] == "Top.Science"
    assert rows[0]["a"] == ["Top.A", "Top.B.c1"]
    # "{}" body splits to [''] — exactly the reference's substring+split
    assert rows[1]["p"] is None and rows[1]["a"] == [""]
    assert rows[2]["a"] is None
