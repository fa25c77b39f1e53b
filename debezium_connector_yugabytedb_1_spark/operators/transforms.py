"""P9/P10/P11 — single-message transforms (SMT analogues) as DataFrame
projections.

Reference:
  P9  ``PGCompatible.java:18-127`` — strip {value,set} wrappers so records
      look like stock-Postgres connector output.
  P10 ``StriimCompatible.java:23-216`` — WAEvent reshape: metadata struct +
      ordered string arrays data[]/before[], PK-change detection.
  P11 ``ExtractTopic`` (Aiven, ``ExtractTopic.java:36-150``) — route each
      record to an output partition named by a field value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decode import TABLE_COLUMNS, cell_set


def pg_compatible(decoded: DataFrame, columns=TABLE_COLUMNS) -> DataFrame:
    """P9 — plain-Postgres-shaped envelope: after struct without cell
    wrappers (unset columns become NULL), keeping op + key."""
    return decoded.select(
        "repo",
        "path",
        "op",
        F.struct(
            *[F.when(cell_set(c), F.col(f"after.{c}")).alias(c) for c in columns]
        ).alias("after"),
        F.col("commit_time").alias("ts_ms"),
    )


def striim_compatible(decoded: DataFrame, columns=TABLE_COLUMNS) -> DataFrame:
    """P10 — WAEvent shape: metadata{LSN, OperationName, Sequence, TableName,
    TxnID, PK_UPDATE} + data[] as ordered string array."""
    opname = (
        F.when(F.col("op").isin("c", "r"), "INSERT")
        .when(F.col("op") == "u", "UPDATE")
        .when(F.col("op").isin("d", "t"), "DELETE")
        .otherwise(F.upper(F.col("op")))
    )
    return decoded.select(
        F.struct(
            F.concat_ws(":", F.col("term"), F.col("index"), F.col("write_id")).alias("LSN"),
            opname.alias("OperationName"),
            F.col("index").alias("Sequence"),
            F.col("table").alias("TableName"),
            F.col("txn_id").alias("TxnID"),
            (F.col("op") == "pku").alias("PK_UPDATE"),
        ).alias("metadata"),
        F.array(*[F.col(f"after.{c}").cast("string") for c in columns]).alias("data"),
        F.struct(F.col("repo"), F.col("path")).alias("key"),
    )


def extract_topic(df: DataFrame, field: str) -> DataFrame:
    """P11 — output routing column: topic = value of ``field`` (used as the
    write ``partitionBy`` / topic selector)."""
    return df.withColumn("topic", F.col(field).cast("string"))
