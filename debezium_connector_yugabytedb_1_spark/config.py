"""Configuration validation front door.

The reference validates configuration aggressively before any work starts
(``YugabyteDBConnectorConfig.validate:1428``, field validators ``:1550-1599``,
connection-time checks ``YugabyteDBgRPCConnector.validateTServerConnection
:325-410``; tested by ``YugabyteDBConfigTest.java``). The engine mirrors the
same front-door contract: ``validate_config`` raises a targeted
``ConfigError`` for each class of bad input instead of letting it surface
later as an enum coercion error, a mid-stream regex crash, or a silently
floor-divided LSH band count. Engine entry points call it on the settings
they receive — ``CdcPipeline.__init__`` (filters, prefixes, skipped ops,
batch size), ``LakeTable.__init__`` (bucket count), ``MinHashIndex``
(LSH geometry); pass a full config dict directly for everything else.

Checks and their reference counterparts:

- slot name charset/length        — ``validateReplicationSlotName:1550-1561``
- truncate handling mode          — ``validateTruncateHandlingMode:1563-1587``
- message-prefix include XOR exclude — ``validateLogicalDecodingMessage
  ExcludeList:1589-1599``
- stream id present               — ``validateTServerConnection:339-343``
- table include list non-empty    — ``validateTServerConnection:347-349``
- include/exclude regexes compile — ``Field.isListOfRegex`` on the
  include/exclude list fields (``:1124``)
- engine-specific numeric/enum domains (before-image mode, LSH geometry,
  merge salt, bucket count, batch size) — same fail-fast stance.
"""

from __future__ import annotations

import re
import warnings

from .operators.before_image import BeforeImageMode

#: envelope op codes a user may configure in skipped_operations
KNOWN_OPS = ("c", "r", "u", "d", "t", "m")

TRUNCATE_MODES = ("skip", "include")
#: ``snapshot.mode`` policy surface (``YugabyteDBConnectorConfig.java:985-1046``,
#: ``spi/Snapshotter.java``; one class per mode under ``snapshot/``)
SNAPSHOT_MODES = ("initial", "never", "initial_only", "always")
HSTORE_MODES = ("map", "json")
INTERVAL_MODES = ("numeric", "string")

# \Z (not $) so a trailing newline is rejected, matching the reference's
# full-string String.matches("[a-z0-9_]{1,63}")
_SLOT_RE = re.compile(r"\A[a-z0-9_]{1,63}\Z")


class ConfigError(ValueError):
    """A configuration value failed front-door validation."""

    def __init__(self, field: str, message: str):
        self.field = field
        super().__init__(f"{field}: {message}")


class ConfigWarning(UserWarning):
    pass


def _regex(field: str, value: str) -> re.Pattern:
    try:
        return re.compile(value)
    except re.error as e:
        raise ConfigError(field, f"invalid regular expression {value!r}: {e}")


def validate_config(cfg: dict) -> dict:
    """Validate an engine configuration dict; returns it unchanged on
    success, raises ``ConfigError`` naming the offending field otherwise.

    Recognized keys (all optional — absent keys skip their check):
    ``slot_name``, ``stream_id``, ``auto_create_stream``,
    ``table_include``, ``table_exclude``, ``column_exclude``,
    ``message_prefix_include``, ``message_prefix_exclude``,
    ``truncate_handling_mode``, ``before_image_mode``,
    ``skipped_operations``, ``hstore_mode``, ``interval_mode``,
    ``snapshot_mode``,
    ``n_hashes``, ``bands``, ``salt``, ``n_buckets``, ``events_per_batch``.
    """
    unknown = set(cfg) - {
        "slot_name", "stream_id", "auto_create_stream",
        "table_include", "table_exclude", "column_exclude",
        "message_prefix_include", "message_prefix_exclude",
        "truncate_handling_mode", "before_image_mode", "skipped_operations",
        "hstore_mode", "interval_mode", "snapshot_mode",
        "n_hashes", "bands", "salt", "n_buckets", "events_per_batch",
    }
    if unknown:
        raise ConfigError(sorted(unknown)[0], "unknown configuration key")

    slot = cfg.get("slot_name")
    if slot is not None and not _SLOT_RE.match(slot):
        raise ConfigError(
            "slot_name",
            "valid replication slot name must contain only digits, "
            "lowercase characters and underscores with length <= 63",
        )

    if not cfg.get("auto_create_stream", True) and not cfg.get("stream_id"):
        raise ConfigError(
            "stream_id",
            "DB stream ID not provided, please provide a DB stream ID to proceed",
        )

    if "table_include" in cfg:
        inc = cfg["table_include"]
        if not inc:
            raise ConfigError(
                "table_include",
                "the table include list is empty, please provide a list of "
                "tables to get the changes from",
            )
        inc_re = _regex("table_include", inc)
    else:
        inc_re = None
    exc_re = (
        _regex("table_exclude", cfg["table_exclude"])
        if cfg.get("table_exclude")
        else None
    )
    col_exc = cfg.get("column_exclude", ())
    if isinstance(col_exc, str):  # a single pattern, not a char sequence
        col_exc = (col_exc,)
    if not isinstance(col_exc, (list, tuple, set)):
        raise ConfigError(
            "column_exclude",
            f"must be a regex string or a list of regex strings, got {col_exc!r}",
        )
    for c in col_exc:
        _regex("column_exclude", c)

    if cfg.get("message_prefix_include") and cfg.get("message_prefix_exclude"):
        raise ConfigError(
            "message_prefix_exclude",
            "message prefix include list is already specified",
        )

    mode = cfg.get("truncate_handling_mode")
    if mode is not None and mode not in TRUNCATE_MODES:
        raise ConfigError(
            "truncate_handling_mode",
            f"valid values are {list(TRUNCATE_MODES)}, but got {mode!r}",
        )

    bim = cfg.get("before_image_mode")
    if bim is not None:
        valid = [m.value for m in BeforeImageMode]
        # accept the wire value, the enum member name, or an enum instance
        raw = getattr(bim, "value", bim)
        if raw not in valid and raw not in BeforeImageMode.__members__:
            raise ConfigError(
                "before_image_mode",
                f"valid values are {valid}, but got {bim!r}",
            )

    for op in cfg.get("skipped_operations", ()):
        if op not in KNOWN_OPS:
            raise ConfigError(
                "skipped_operations",
                f"unknown operation code {op!r}; valid codes are {list(KNOWN_OPS)}",
            )

    hs = cfg.get("hstore_mode")
    if hs is not None and hs not in HSTORE_MODES:
        raise ConfigError(
            "hstore_mode", f"valid values are {list(HSTORE_MODES)}, but got {hs!r}"
        )
    sm = cfg.get("snapshot_mode")
    if sm is not None and sm not in SNAPSHOT_MODES:
        raise ConfigError(
            "snapshot_mode",
            f"valid values are {list(SNAPSHOT_MODES)}, but got {sm!r}",
        )
    iv = cfg.get("interval_mode")
    if iv is not None and iv not in INTERVAL_MODES:
        raise ConfigError(
            "interval_mode",
            f"valid values are {list(INTERVAL_MODES)}, but got {iv!r}",
        )

    def _int(field):
        v = cfg.get(field)
        if v is not None and (not isinstance(v, int) or isinstance(v, bool)):
            raise ConfigError(field, f"must be a positive integer, got {v!r}")
        return v

    n_hashes, bands = _int("n_hashes"), _int("bands")
    if n_hashes is not None and n_hashes < 1:
        raise ConfigError("n_hashes", "must be a positive integer")
    if bands is not None and bands < 1:
        raise ConfigError("bands", "must be a positive integer")
    if n_hashes is not None and bands is not None and n_hashes % bands != 0:
        raise ConfigError(
            "bands",
            f"n_hashes ({n_hashes}) must be divisible by bands ({bands}); "
            "a non-integer rows-per-band would silently floor-divide",
        )

    for field, lo in (("salt", 1), ("n_buckets", 1), ("events_per_batch", 1)):
        v = cfg.get(field)
        if v is not None and (
            not isinstance(v, int) or isinstance(v, bool) or v < lo
        ):
            raise ConfigError(field, f"must be an integer >= {lo}")

    if inc_re is not None and exc_re is not None:
        warnings.warn(
            "table_include and table_exclude are both set; exclusion is "
            "applied AFTER inclusion, so tables matching both are dropped",
            ConfigWarning,
            stacklevel=2,
        )
    return cfg
