"""D3 — dynamic table addition: detect new tables in the stream and
reconfigure.

Reference: a poller thread diffs the stream's table set every
``new.table.poll.interval.ms`` and triggers a full task reconfiguration when
it changes (``YugabyteDBTablePoller.java:31-120``, started from
``YugabyteDBgRPCConnector.java:94-97``).

Spark analogue: between micro-batches the driver diffs the distinct table
set of the incoming window against the configured include set; a new table
is a *plan change* (new include regex) — cheap to apply because the
checkpoint protocol makes restart-at-offset free. No long-running thread is
needed: the poll naturally happens once per batch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class TableSetDiff:
    added: tuple[str, ...]
    removed: tuple[str, ...]

    @property
    def needs_reconfiguration(self) -> bool:
        # reference semantics: any change triggers requestTaskReconfiguration
        return bool(self.added or self.removed)


def diff_table_sets(known: set[str], observed: set[str]) -> TableSetDiff:
    """Pure planning function (driver-side, O(#tables))."""
    return TableSetDiff(
        added=tuple(sorted(observed - known)),
        removed=tuple(sorted(known - observed)),
    )


def observe_tables(window: DataFrame) -> set[str]:
    """Distinct table set of a poll window (tiny aggregate)."""
    return {r["table"] for r in window.select("table").distinct().collect()}


def reconfigure_include(include: str | None, added: tuple[str, ...]) -> str:
    """Extend an include regex with newly discovered tables (the analogue of
    rebuilding task configs with the new table list)."""
    parts = [include] if include else []
    parts += [f"^{t.replace('.', chr(92) + '.')}$" for t in added]
    return "|".join(p for p in parts if p)
