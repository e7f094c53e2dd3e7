"""WalRouter: by-table, by-operation dispatch of change events — the
DataFrame re-expression of the reference's typed router
(/root/reference/src/router.rs:40-169: (table, {Insert,Update,Delete}) →
handler map, default fallback, deserialize-before-dispatch, any handler
error terminates, ack only after success).

Here a handler receives a *typed DataFrame* of its slice of the batch
(old/new map columns projected through the registered column spec via the
typed-deserialization surface), inside foreachBatch. A raised handler error
aborts the batch → Spark replays it → the LSN fence keeps delivery
exactly-once, reproducing the reference's no-ack-on-error contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

DML = ("insert", "update", "delete")


class WalRouter:
    def __init__(self, default: Callable[[str, str, DataFrame], None] | None = None):
        self._handlers: dict[tuple[str, str], Callable[[DataFrame], None]] = {}
        self._specs: dict[str, dict[str, str]] = {}
        self._default = default

    def table_spec(self, table: str, spec: dict[str, str]) -> "WalRouter":
        """Register the typed column spec (name → spark type) for a table —
        the #[derive(WalTable)] analog."""
        self._specs[table] = spec
        return self

    def on(self, table: str, op: str,
           handler: Callable[[DataFrame], None]) -> "WalRouter":
        if op not in DML:
            raise ValueError(f"op must be one of {DML}")
        self._handlers[(table, op)] = handler
        return self

    def on_insert(self, table, handler):
        return self.on(table, "insert", handler)

    def on_update(self, table, handler):
        return self.on(table, "update", handler)

    def on_delete(self, table, handler):
        return self.on(table, "delete", handler)

    def _typed(self, table: str, op: str, df: DataFrame) -> DataFrame:
        """Deserialize-before-dispatch: event metadata + typed payload
        columns cast from the wire-text map (delete routes type the old
        image, since that's all a delete carries)."""
        spec = self._specs.get(table)
        if spec is None:
            return df
        src = "old_data" if op == "delete" else "new_data"
        return df.select(
            "seq", "lsn", "xid", "commit_lsn", "end_lsn", "commit_ts_us",
            "key_columns", "key_type",
            *[F.element_at(src, n).cast(ty).alias(n) for n, ty in spec.items()],
        )

    def dispatch(self, events: DataFrame) -> dict[tuple[str, str], int]:
        """Route one batch of committed DML events. Returns per-route row
        counts. Handlers run sequentially in (table, op) order; the first
        exception propagates (terminates the batch, reference semantics)."""
        counts: dict[tuple[str, str], int] = {}
        routes = (
            events.filter(
                F.col("event_type").isin(list(DML))
                & (F.col("txn_status") == "committed")
                & F.col("error").isNull()
            )
            .select("table_name", "event_type")
            .distinct()
            .collect()
        )
        for r in sorted((r["table_name"], r["event_type"]) for r in routes):
            table, op = r
            handler = self._handlers.get((table, op))
            slice_df = events.filter(
                (F.col("table_name") == table)
                & (F.col("event_type") == op)
                & (F.col("txn_status") == "committed")
                & F.col("error").isNull()
            )
            if handler is not None:
                typed = self._typed(table, op, slice_df)
                handler(typed)
                counts[(table, op)] = typed.count()
            elif self._default is not None:
                self._default(table, op, slice_df)
                counts[(table, op)] = slice_df.count()
            # unrouted slices are skipped (reference returns Ok and acks)
        return counts
