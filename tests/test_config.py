"""Config validation front door — mirrors the reference's fail-fast stance
(``YugabyteDBConfigTest.java``; field validators ``YugabyteDBConnectorConfig
:1550-1599``; connection-time checks ``YugabyteDBgRPCConnector:325-410``)."""

import pytest

from debezium_connector_yugabytedb_1_spark.config import (
    ConfigError,
    ConfigWarning,
    validate_config,
)


@pytest.mark.parametrize(
    "cfg, field, fragment",
    [
        ({"slot_name": "Bad-Slot"}, "slot_name", "lowercase"),
        ({"slot_name": "x" * 64}, "slot_name", "63"),
        ({"auto_create_stream": False}, "stream_id", "not provided"),
        ({"table_include": ""}, "table_include", "empty"),
        ({"table_include": "public\\.(t1"}, "table_include", "invalid regular"),
        ({"table_exclude": "*bad"}, "table_exclude", "invalid regular"),
        ({"column_exclude": ["t1\\.(c"]}, "column_exclude", "invalid regular"),
        (
            {"message_prefix_include": "a.*", "message_prefix_exclude": "b.*"},
            "message_prefix_exclude",
            "already specified",
        ),
        (
            {"truncate_handling_mode": "bogus"},
            "truncate_handling_mode",
            "valid values",
        ),
        ({"before_image_mode": "FULL_BOGUS"}, "before_image_mode", "valid values"),
        ({"skipped_operations": ("c", "z")}, "skipped_operations", "'z'"),
        ({"hstore_mode": "xml"}, "hstore_mode", "valid values"),
        ({"interval_mode": "iso"}, "interval_mode", "valid values"),
        ({"n_hashes": 0}, "n_hashes", "positive"),
        ({"n_hashes": 32, "bands": 7}, "bands", "divisible"),
        ({"salt": 0}, "salt", ">= 1"),
        ({"n_buckets": -4}, "n_buckets", ">= 1"),
        ({"events_per_batch": 0}, "events_per_batch", ">= 1"),
        ({"no_such_key": 1}, "no_such_key", "unknown configuration key"),
    ],
)
def test_invalid_configs_raise_targeted_errors(cfg, field, fragment):
    with pytest.raises(ConfigError) as ei:
        validate_config(cfg)
    assert ei.value.field == field
    assert fragment in str(ei.value)


def test_valid_config_roundtrips():
    cfg = {
        "slot_name": "my_slot_01",
        "stream_id": "abc123",
        "table_include": r"public\.(t1|t2)",
        "before_image_mode": "FULL",
        "truncate_handling_mode": "include",
        "skipped_operations": ("t",),
        "n_hashes": 32,
        "bands": 8,
        "salt": 8,
        "n_buckets": 64,
        "events_per_batch": 100_000,
    }
    assert validate_config(cfg) is cfg


def test_include_exclude_overlap_warns():
    with pytest.warns(ConfigWarning, match="AFTER inclusion"):
        validate_config(
            {"table_include": r"public\..*", "table_exclude": r"public\.t9"}
        )


def test_enum_member_name_accepted_for_before_image():
    # MODIFIED_COLUMNS_OLD_AND_NEW's VALUE has an _IMAGES suffix; both the
    # member name and the wire value must validate
    validate_config({"before_image_mode": "MODIFIED_COLUMNS_OLD_AND_NEW_IMAGES"})
    validate_config({"before_image_mode": "MODIFIED_COLUMNS_OLD_AND_NEW"})
