"""SCD2 history materialization: a change stream → validity-interval rows.

The classic downstream shape for a CDC feed (and for training-data
point-in-time joins): per key, one row per ATTRIBUTE CHANGE carrying
``valid_from`` / ``valid_to`` / ``is_current``, consecutive rows with
identical tracked attributes collapsed into one interval. This is the
warehouse-side complement of the engine's last-image MERGE — the merge
keeps only the latest image, SCD2 keeps the full timeline queryable
("what was this user's state AS OF t").

Reference parity: the reference delivers the raw typed event stream and
leaves historization to consumers (src/stream.rs delivery loop); this
operator is that consumer, expressed as two window passes over ONE hash
partitioning of the key — Catalyst plans a single exchange, the
change-detection filter preserves the sort, and no self-join or
per-key collect ever happens.

Scale: the only shuffle is by key; per-key state is a single lag/lead
buffer row (no per-key materialization), so a key with millions of
events streams through the sort. Skewed keys cost a big sort partition —
the same bound as any per-key ordered computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_from_feed(
    feed: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    lsn_col: str = "_commit_lsn",
) -> DataFrame:
    """SCD2 intervals straight from a change-data-feed
    (``LakeTable.read_changes`` rows: key + data cols, ``_op``,
    ``_commit_lsn``), with delete semantics: a delete CLOSES the key's open
    interval (its lsn becomes that interval's ``valid_to``) and opens
    nothing; a re-insert after a delete opens a new interval even when the
    attributes are identical. Consecutive upserts with equal tracked
    attributes collapse, exactly like ``scd2_history``.

    Caveat: rows carrying ``_toast`` names among ``attr_cols`` hold null
    where the consumer is meant to carry the previous image forward — run
    ``operators.feed.resolve_toast`` first (or exclude those columns), or
    equal-through-toast values will read as changes."""
    w = Window.partitionBy(*key_cols).orderBy(lsn_col)
    cmp_ = F.struct(F.col("_op"), *[F.col(c) for c in attr_cols])
    prev_cmp = F.lag(cmp_).over(w)
    prev_op = F.lag("_op").over(w)
    changes = feed.withColumn("_chg", (
        prev_cmp.isNull() | (prev_cmp != cmp_) | (prev_op == "delete")
    )).filter("_chg").drop("_chg")
    w2 = Window.partitionBy(*key_cols).orderBy(lsn_col)
    vt = F.lead(lsn_col).over(w2)
    return changes.select(
        *key_cols, *attr_cols, "_op",
        F.col(lsn_col).alias("valid_from"),
        vt.alias("valid_to"),
        vt.isNull().alias("is_current"),
    ).filter(F.col("_op") != "delete").drop("_op")


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    attr_cols: list[str],
    valid_col: str,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Collapse an ordered change stream into SCD2 intervals.

    ``order_cols`` must be a deterministic total order per key (e.g.
    ``[ts, event_id]``). ``valid_col`` is the (already numeric/orderable)
    column stamped into ``valid_from`` and, via lead, ``valid_to``
    (null = open interval, flagged ``is_current``). A row opens a new
    interval iff any of ``attr_cols`` differs from the key's previous row
    (struct compare; first row per key always opens). ``carry_cols``:
    extra columns passed through from each interval's OPENING row (e.g.
    the event id that caused the change)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changes = df.withColumn("_prev_attrs", F.lag(attrs).over(w)).filter(
        F.col("_prev_attrs").isNull()
        | (F.col("_prev_attrs") != attrs)
    ).drop("_prev_attrs")
    # second pass over the CHANGE rows only: same partitioning keys, so
    # Catalyst reuses the exchange (filter preserves distribution/sort)
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    vt = F.lead(valid_col).over(w2)
    return changes.select(
        *key_cols, *carry_cols, *attr_cols,
        F.col(valid_col).alias("valid_from"),
        vt.alias("valid_to"),
        vt.isNull().alias("is_current"),
    )
