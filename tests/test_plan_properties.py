"""Plan-shape and property tests for the round-3 surfaces: the shredded
wire must decode with zero JSON machinery in the DML path, and the PgArray
quoting parse must round-trip arbitrary element strings exactly."""

import random

import pyspark.sql.functions as F

from debezium_connector_yugabytedb_1_spark.functions.converters import convert_array
from debezium_connector_yugabytedb_1_spark.generator import generate_events
from debezium_connector_yugabytedb_1_spark.operators.decode import decode_envelope
from debezium_connector_yugabytedb_1_spark.operators.emit import DML_OPS


def test_shredded_dml_decode_plan_has_no_json_parse(spark):
    """With the pre-shredded wire the DML decode is pure struct projection:
    after column pruning, no JsonToStructs node may remain in the physical
    plan (the ddl-field from_json is pruned away when ddl columns are not
    selected)."""
    ev = generate_events(spark, 100, payload_format="shredded")
    dec = decode_envelope(ev.where(F.col("op").isin(*DML_OPS, "pku"))).select(
        "repo", "path", "op", "after", "changed", "before_key"
    )
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "from_json" not in plan and "JsonToStructs" not in plan
    assert "Python" not in plan  # and no UDF fallback either


def test_json_wire_decode_still_uses_from_json(spark):
    ev = generate_events(spark, 100, payload_format="json")
    dec = decode_envelope(ev.where(F.col("op").isin(*DML_OPS, "pku"))).select(
        "after"
    )
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "from_json" in plan


def _pg_array_literal(elems):
    """Reference encoder: the exact quoting rules PG's array output uses —
    quote when the element contains specials, escape backslash + quote."""
    out = []
    for e in elems:
        if e is None:
            out.append("NULL")
            continue
        needs_quote = (
            e == ""
            or e == "NULL"
            or any(ch in e for ch in ',{}"\\ ')
        )
        if needs_quote:
            out.append('"' + e.replace("\\", "\\\\").replace('"', '\\"') + '"')
        else:
            out.append(e)
    return "{" + ",".join(out) + "}"


def test_pg_array_quoting_round_trips_random_strings(spark):
    """500 seeded-random arrays with commas, quotes, backslashes, braces,
    NULLs and empty strings: encode with the reference PG rules, parse with
    convert_array, require exact round-trip equality in one Spark pass."""
    rng = random.Random(42)
    alphabet = 'ab,"\\{} xyNULL'
    cases = []
    for i in range(500):
        n = rng.randint(0, 6)
        elems = []
        for _ in range(n):
            if rng.random() < 0.15:
                elems.append(None)
            else:
                elems.append(
                    "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 8)))
                )
        cases.append((i, _pg_array_literal(elems), elems))
    df = spark.createDataFrame(
        [(i, lit) for i, lit, _ in cases], "i long, w string"
    )
    got = {
        r["i"]: r["v"]
        for r in df.select("i", convert_array("w").alias("v")).collect()
    }
    for i, _lit, elems in cases:
        assert got[i] == elems, f"case {i}: {_lit!r} -> {got[i]!r} != {elems!r}"


def test_cql_typed_decode_plan_is_pure_catalyst(spark):
    """The CQL converter family (r5) must stay inside whole-stage codegen:
    the whole 15-column decode is one projection — no Python eval nodes,
    no UDFs, no shuffle."""
    import __spark_entry__ as entrymod

    df = entrymod.q_cdc_cql_typed_decode(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
    # codegen'd single stage ("*(1)" prefix) + the id filter reached the scan
    assert "*(1) Project" in plan
    assert "PushedFilters: [IsNotNull(event_id), LessThan(event_id,2000)]" in plan
