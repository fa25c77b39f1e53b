"""P3-P6 — envelope emit: CREATE/READ/UPDATE/DELETE, PK-update split,
tombstones, TRUNCATE.

Reference: ``YugabyteDBChangeRecordEmitter.emitCreateRecord:317-329``,
``emitReadRecord:332-339``, ``emitUpdateRecord:342-379`` (PK-change split at
``:365-378``), ``emitDeleteRecord:382-394``; tombstone emission
``YugabyteDBEventDispatcher.java:216-228``; truncate receiver
``YugabyteDBEventDispatcher.java:200-203``.

Spark-first: emission is projection; the PK-update split is a two-branch
union (Catalyst turns it into one scan with two filters when the source is
shared). Downstream replay only distinguishes upsert ops (c/r/u) from delete
ops (d/t) — the split rewrites 'pku' into exactly that vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UPSERT_OPS = ("c", "r", "u")
DELETE_OPS = ("d", "t")
DML_OPS = UPSERT_OPS + DELETE_OPS


def split_pk_updates(decoded: DataFrame) -> DataFrame:
    """P4 — a primary-key update (here: a path rename) becomes a
    DELETE(old key) + CREATE(new key) pair, both carrying the original
    offset; the delete sorts immediately before the create via ``write_id``
    (reference sends them as two records with headers,
    ``YugabyteDBChangeRecordEmitter.java:365-378``).

    The synthetic delete gets ``write_id`` and the create ``write_id + 1``
    within the same (term, index) slot, preserving OpId total order.
    """
    non_pku = decoded.where(F.col("op") != "pku")
    pku = decoded.where(F.col("op") == "pku")

    deletes = pku.select(
        *[
            c
            for c in decoded.columns
            if c not in ("op", "repo", "path", "after", "changed", "write_id")
        ],
        F.lit("d").alias("op"),
        F.col("before_key.repo").alias("repo"),
        F.col("before_key.path").alias("path"),
        F.lit(None).cast(pku.schema["after"].dataType).alias("after"),
        F.lit(None).cast("array<string>").alias("changed"),
        (F.col("write_id") * 2).alias("write_id"),
    ).select(*decoded.columns)

    creates = pku.withColumn("op", F.lit("c")).withColumn(
        "write_id", F.col("write_id") * 2 + 1
    )
    scaled = non_pku.withColumn("write_id", F.col("write_id") * 2)
    return scaled.unionByName(deletes).unionByName(creates)


def add_tombstones(decoded: DataFrame, *, tombstones_on_delete: bool = True) -> DataFrame:
    """P5 — for every delete, optionally emit a trailing tombstone record
    (null after-image) at ``write_id + 1``
    (``YugabyteDBEventDispatcher.java:216-228``)."""
    if not tombstones_on_delete:
        return decoded
    base = decoded.withColumn("write_id", F.col("write_id") * 2)
    tomb = (
        decoded.where(F.col("op") == "d")
        .withColumn("op", F.lit("t"))
        .withColumn("write_id", F.col("write_id") * 2 + 1)
        .withColumn("after", F.lit(None).cast(decoded.schema["after"].dataType))
        .withColumn("changed", F.lit(None).cast("array<string>"))
    )
    return base.unionByName(tomb)


def source_block(server: str = "ybcdc") -> "F.Column":
    """Source-metadata struct column (``SourceInfo.java:29-105``): lineage
    block attached to every emitted record. ``ht_micros`` mirrors the
    HybridTime>>12 physical-micros extraction (``SourceInfo.java:96``)."""
    return F.struct(
        F.lit(server).alias("server"),
        F.col("table").alias("table"),
        F.col("tablet_id").alias("tablet_id"),
        F.col("txn_id").alias("txn_id"),
        F.col("commit_time").alias("commit_time"),
        F.col("record_time").alias("record_time"),
        F.shiftright(F.col("commit_time"), 12).alias("ht_micros"),
    )


def emit_envelopes(decoded: DataFrame) -> DataFrame:
    """P3/P5 — final Debezium-shaped envelope projection: key struct, op,
    after, source. (``before`` carried only in before-image modes, X1.)"""
    return decoded.select(
        F.struct("repo", "path").alias("key"),
        F.col("op"),
        F.col("after"),
        F.col("changed"),
        source_block().alias("source"),
        F.col("term"),
        F.col("index"),
        F.col("write_id"),
    )


def apply_truncate(decoded: DataFrame) -> DataFrame:
    """P6 — TRUNCATE: all rows of the table die before any later op. In
    batch replay this is a synthetic per-table delete barrier: drop every
    event whose offset precedes the last truncate of its table, and signal
    the sink to clear state at that offset (handled by the pipeline)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("table")
    trunc_off = F.max(
        F.when(F.col("op") == "TRUNCATE", F.struct("term", "index", "write_id"))
    ).over(w)
    return (
        decoded.withColumn("_trunc", trunc_off)
        .where(
            F.col("_trunc").isNull()
            | (F.struct("term", "index", "write_id") > F.col("_trunc"))
        )
        .drop("_trunc")
    )
