"""Change-data-feed consumption utilities.

``LakeTable.read_changes`` rows follow the pgoutput unchanged-TOAST
contract (/root/reference/src/protocol.rs:310-328): a column named in a
row's ``_toast`` array is null in that row and the consumer carries the
key's previous value forward. ``resolve_toast`` performs that carry
declaratively — one hash partitioning of the key, a running
last-authoritative-image window per column (no self-join, no per-key
collect) — producing a feed whose rows are complete images, ready for
historization (``scd2_from_feed``) or direct export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resolve_toast(
    feed: DataFrame,
    key_cols: list[str],
    data_cols: list[str],
    base: DataFrame | None = None,
    lsn_col: str = "_commit_lsn",
) -> DataFrame:
    """Fill TOAST carry-forward nulls in a change-data-feed.

    For every column of ``data_cols`` marked in a row's ``_toast``, the
    value becomes the key's most recent AUTHORITATIVE image — an earlier
    feed upsert that carried the column, or a row of ``base`` (the table
    AS OF the feed's start version: ``table.read(spark, version=since)``)
    for keys whose first feed appearance is already toast-marked. A null
    written by an authoritative upsert stays null (the carry tracks
    struct-wrapped images, so "explicit null" and "no image yet" are
    distinct). Delete rows pass through and never contribute images.

    Returns the feed rows with values resolved and ``_toast`` emptied;
    row count, order columns and commit stamps are unchanged. One shuffle
    (the key); all per-column carries ride the same window."""
    cols = feed.columns
    f = feed.withColumn("_base_row", F.lit(False))
    if base is not None:
        b = base.select(*key_cols, *data_cols)
        for c in cols:
            if c not in b.columns:
                b = b.withColumn(
                    c, F.lit("upsert") if c == "_op" else F.lit(None))
        f = f.unionByName(
            b.select(*cols).withColumn("_base_row", F.lit(True)),
            allowMissingColumns=False)
    # base rows order FIRST (null lsn, asc_nulls_first) — they are the
    # image before every feed commit
    w = (Window.partitionBy(*key_cols)
         .orderBy(F.col(lsn_col).asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    toast = F.coalesce(F.col("_toast"), F.array())
    out_cols = []
    for c in cols:
        if c not in data_cols:
            out_cols.append(F.col(c))
            continue
        authoritative = (
            (F.col("_base_row") | (F.col("_op") == "upsert"))
            & ~F.array_contains(toast, F.lit(c))
        )
        carried = F.last(
            F.when(authoritative, F.struct(F.col(c).alias("v"))),
            ignorenulls=True,
        ).over(w)["v"]
        out_cols.append(
            F.when(F.array_contains(toast, F.lit(c)), carried)
            .otherwise(F.col(c)).alias(c)
        )
    resolved = f.select(*out_cols, F.col("_base_row")).filter(
        ~F.col("_base_row")).drop("_base_row")
    return resolved.withColumn(
        "_toast", F.array().cast("array<string>"))
