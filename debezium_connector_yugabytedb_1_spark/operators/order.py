"""M1/M2 — ordering, last-writer-wins dedup, and the per-key change fold.

Reference semantics being re-created:

- The consistent-streaming ``Merger`` releases records in
  ``(commit_time, record_time)`` order across tablets, gated by the stream
  safetime watermark, asserting per-tablet monotonicity
  (``Merger.java:15-240``, peek gate ``:116-133``; comparator
  ``Message.compareTo:64-79``; unsigned HT compare
  ``Message.toUnsignedBigInteger:173-184``).
- Offsets are totally ordered by ``(term, index, write_id)``
  (``OpId.compareTo:126-135``).
- Replay applies events per key in offset order; the last writer wins, with
  changed-columns-only updates folding into the prior image
  (``YBTableSchemaBuilder.java:280-292``).

Two Spark-first implementations:

1. ``last_writer_wins`` — window ``row_number() OVER (PARTITION BY key ORDER
   BY offset DESC) = 1``. Exactly the north-rule formulation; one shuffle +
   per-partition sort.

2. ``fold_changes`` — **aggregation fold**: the full replay semantics
   (per-column LWW with delete barriers) expressed as conditional
   ``max(struct(offset, value))`` aggregates. This is the scale path: it
   uses hash aggregation with map-side partial aggregation (each input
   partition pre-folds its events before the shuffle), so shuffle volume is
   ~one row per key per input partition instead of every event — at 10^10
   events over 10^7 keys that is a ~1000x shuffle reduction vs the window
   sort, and there is no per-key sort at all. Equivalence to the window form
   is property-tested.

Why a fold and not just "last row wins": an UPDATE may carry only changed
columns. The final image of a key is, per column, the value from the latest
event that *set* that column **after** the key's latest delete/tombstone
barrier; the row exists iff any upsert is newer than the latest delete.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..offsets import offset_struct
from .decode import TABLE_COLUMNS, cell_set
from .emit import DELETE_OPS, UPSERT_OPS

KEY_COLS = ("repo", "path")

def _neg_off() -> Column:
    """Sentinel smaller than every real offset (snapshot term is -1 with
    index >= 0, so (-2,..) sorts below it)."""
    return F.struct(
        F.lit(-2).cast("long").alias("term"),
        F.lit(-2).cast("long").alias("index"),
        F.lit(-2).cast("long").alias("write_id"),
    )


# ---------------------------------------------------------------------------
# Unsigned hybrid-time comparison fidelity: the reference compares commit /
# record / safe times as UNSIGNED 64-bit values (``Message
# .toUnsignedBigInteger:173-184`` routes every comparator through
# ``BigInteger`` built from the unsigned magnitude). A signed-long compare
# agrees everywhere except when the sign bit is set (HT values >= 2^63).
# Flipping the sign bit is an order isomorphism unsigned->signed, so every
# comparison below runs on the flipped key while raw values flow through
# unchanged.

_U64_MASK = (1 << 64) - 1
_SIGN_BIT = 1 << 63
_MIN_LONG = -_SIGN_BIT


def ht_key(col: Column | str) -> Column:
    """Spark-side order key: signed long whose signed order equals the
    UNSIGNED order of the wire value (sign-bit flip via XOR with MIN_LONG)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.bitwiseXOR(F.lit(_MIN_LONG))


def ht_key_py(v: int) -> int:
    """Driver-side twin of ``ht_key`` for scalar thresholds."""
    k = (v & _U64_MASK) ^ _SIGN_BIT
    return k - (1 << 64) if k >= _SIGN_BIT else k


def ht_to_epoch_ms(col: Column | str) -> Column:
    """Commit hybrid-time → epoch millis: HT >> 12 = physical micros
    (``SourceInfo.java:96``), in the UNSIGNED domain (shiftrightunsigned, so
    an HT with the sign bit set cannot yield a negative epoch)."""
    c = F.col(col) if isinstance(col, str) else col
    # micros < 2^52 after the shift, exactly representable in the double
    # division below; cast truncates like integer division
    return (F.shiftrightunsigned(c, 12) / F.lit(1000)).cast("long")


def ht_to_epoch_ms_py(v: int) -> int:
    """Driver-side twin of ``ht_to_epoch_ms`` (unsigned magnitude)."""
    return ((v & _U64_MASK) >> 12) // 1000


def last_writer_wins(
    df: DataFrame,
    key_cols=KEY_COLS,
    order_desc: tuple[str, ...] = ("term", "index", "write_id"),
) -> DataFrame:
    """M2 — keep only each key's newest event (window-over-offset LWW)."""
    w = W.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_desc])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def release_gate(
    df: DataFrame,
    safetimes: DataFrame,
    consumed_tablets: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """M1 — the consistent-streaming release gate: a record is released only
    once EVERY tablet's safe time has passed its commit time (the Merger's
    peek gate, ``Merger.java:116-133`` — ``peek`` returns a message only if
    ``commit_time <= streamSafetime``, where the stream safetime is the min
    across tablet safetimes).

    ``safetimes``: (tablet_id, safe_time) — the output of
    ``filters.extract_safepoint_watermark``, or the carried-forward map the
    reference keeps per tablet (``tabletSafeTime``). ``consumed_tablets``:
    the FULL set of tablets the stream consumes — when given, the gate
    holds everything unless every consumed tablet has a known safetime
    (a tablet with events but no safepoint yet has an unknown safetime and
    must constrain the gate, ``YugabyteDBConsistentStreamingSource
    .java:174-254``). Returns ``(released, held)``; held records re-enter
    the next poll's merge, exactly the reference's pending queue. The gate
    is a scalar broadcast comparison — no shuffle.

    For the stateful multi-trigger form (safetimes carried across polls,
    pending store on disk) see ``streaming.gate.ConsistentGate``."""
    rows = safetimes.collect()
    have = {r["tablet_id"]: r["safe_time"] for r in rows if r["safe_time"] is not None}
    if consumed_tablets is not None and not set(consumed_tablets) <= set(have):
        return df.where(F.lit(False)), df  # some tablet's safetime unknown
    if not have:  # no safepoint seen yet: nothing is safe
        return df.where(F.lit(False)), df
    # min / threshold comparisons run UNSIGNED (ht_key), like the reference
    gate_key = min(ht_key_py(v) for v in have.values())
    released = df.where(ht_key("commit_time") <= F.lit(gate_key))
    held = df.where(ht_key("commit_time") > F.lit(gate_key))
    return released, held


def msg_rank() -> Column:
    """The Merger comparator's equal-commit-time law
    (``Message.compareTo:64-79``): BEGIN sorts before everything, COMMIT
    after everything, and only non-marker records fall through to the
    record-time comparison."""
    return (
        F.when(F.col("op") == "BEGIN", F.lit(0))
        .when(F.col("op") == "COMMIT", F.lit(2))
        .otherwise(F.lit(1))
    )


def commit_time_order(df: DataFrame) -> DataFrame:
    """M1 — consistent release order within a micro-batch: sort by
    ``(commit_time, BEGIN<DML<COMMIT, record_time, offset)`` (the Merger's
    comparator, ``Message.compareTo:64-79`` — commit time first, then the
    txn-marker law, then record time for non-markers; both time compares are
    UNSIGNED, ``Message.toUnsignedBigInteger:173-184``). Range-partitioned
    sort; used when a consumer needs cross-tablet commit order, not for
    state replay."""
    return df.orderBy(
        ht_key("commit_time"),
        msg_rank(),
        ht_key("record_time"),
        "term",
        "index",
        "write_id",
    )


def global_sequence(
    df: DataFrame,
    order_cols: tuple[str, ...],
    out_col: str = "seq",
    n_ranges: int | None = None,
) -> DataFrame:
    """Scale-safe global rank over ``order_cols`` (1-based), replacing the
    single-partition ``row_number() OVER (ORDER BY ...)`` plan that funnels
    the whole dataset through one task.

    Two-pass rank: (1) deterministic equal-width range buckets on the first
    (numeric) order column — NOT ``repartitionByRange``, whose sampled
    boundaries are not guaranteed stable across the two jobs — and a tiny
    per-bucket count collect; (2) ``row_number`` windowed **per bucket**
    (parallel) plus the bucket's cumulative offset. Total cost: one narrow
    agg pass + one bucket-parallel sort; no stage ever holds more than one
    bucket. Reference semantics: the Merger's total release order
    (``Merger.java:15-240``, comparator ``Message.compareTo:64-79``)."""
    first = order_cols[0]
    sess = df.sparkSession
    n = n_ranges or sess.sparkContext.defaultParallelism * 2
    dt = df.schema[first].dataType.simpleString()
    if "timestamp" in dt:
        fnum = F.unix_micros(F.col(first).cast("timestamp")).cast("double")
    elif dt == "date":
        fnum = F.datediff(F.col(first), F.lit("1970-01-01").cast("date")).cast("double")
    else:
        fnum = F.col(first).cast("double")
    row = df.agg(F.min(fnum).alias("mn"), F.max(fnum).alias("mx")).collect()[0]
    if row["mn"] is None:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    mn, mx = float(row["mn"]), float(row["mx"])
    width = max((mx - mn) / n, 1e-9)
    # NULL first-column values go to bucket 0 explicitly — ascending sorts
    # are NULLS FIRST, and F.least would otherwise skip the null and park
    # them in the LAST bucket, diverging from the single-partition
    # row_number() this replaces
    pid = F.when(fnum.isNull(), F.lit(0)).otherwise(
        F.least(
            F.floor((fnum - F.lit(mn)) / F.lit(width)).cast("int"),
            F.lit(n - 1),
        )
    )
    counts = {
        r["_pid"]: r["n"]
        for r in df.groupBy(pid.alias("_pid")).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    omap = F.create_map(
        *[F.lit(x) for p_o in sorted(offsets.items()) for x in p_o]
    )
    w = W.partitionBy("_pid").orderBy(*order_cols)
    return (
        df.withColumn("_pid", pid)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(out_col, (omap[F.col("_pid")] + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn")
    )


def assert_tablet_monotonic(df: DataFrame) -> DataFrame:
    """M1 invariant — per-tablet offsets must be strictly increasing in
    commit order (the Merger's IllegalStateException guard,
    ``Merger.java`` add/peek asserts). Returns violating rows (empty = ok)."""
    w = W.partitionBy("tablet_id").orderBy("term", "index", "write_id")
    prev_ct = F.lag("commit_time").over(w)
    return (
        df.select("tablet_id", "term", "index", "write_id", "commit_time")
        .withColumn("_prev", prev_ct)
        .where(F.col("_prev").isNotNull() & (F.col("_prev") > F.col("commit_time")))
    )


def _fold_agg_exprs(columns) -> list[Column]:
    off = offset_struct()
    is_del = F.col("op").isin(*DELETE_OPS)
    is_up = F.col("op").isin(*UPSERT_OPS)
    aggs = [
        F.max(F.when(is_del, off)).alias("_last_del"),
        F.max(F.when(is_up, off)).alias("_last_up"),
        F.max(off).alias("_last_off"),
        F.count(F.lit(1)).alias("_n_events"),
    ]
    for c in columns:
        aggs.append(
            F.max(
                F.when(is_up & cell_set(c), F.struct(off.alias("off"), F.col(f"after.{c}").alias("v")))
            ).alias(f"_m_{c}")
        )
    return aggs


def fold_changes(decoded: DataFrame, columns=TABLE_COLUMNS, key_cols=KEY_COLS) -> DataFrame:
    """M2 (scale path) — collapse a batch of DML events to one row per key.

    Output schema: key cols + ``<c>_val``/``<c>_set`` per column +
    ``exists`` (false ⇒ the key's final event is a delete) +
    ``had_delete`` + ``last_offset``.

    ``<c>_set`` means "this batch determines column c" (set after the last
    delete barrier); unset columns defer to the sink's current value. After a
    delete barrier, unset columns are explicit NULLs — a reinserted row must
    not resurrect pre-delete column values (the tombstone/stale-update trap,
    ``YBExtractNewRecordState.java:64-67``).
    """
    folded = decoded.groupBy(*key_cols).agg(*_fold_agg_exprs(columns))
    del_floor = F.coalesce(F.col("_last_del"), _neg_off())
    out = folded.withColumn(
        "exists", F.col("_last_up").isNotNull() & (F.coalesce(F.col("_last_up"), _neg_off()) > del_floor)
    ).withColumn("had_delete", F.col("_last_del").isNotNull())
    for c in columns:
        m = F.col(f"_m_{c}")
        is_live = m.isNotNull() & (m["off"] > del_floor)
        out = out.withColumn(f"{c}_set", is_live).withColumn(
            f"{c}_val", F.when(is_live, m["v"])
        )
    return out.select(
        *key_cols,
        "exists",
        "had_delete",
        F.col("_last_off").alias("last_offset"),
        F.col("_n_events").alias("n_events"),
        *[F.col(f"{c}_val") for c in columns],
        *[F.col(f"{c}_set") for c in columns],
    )
