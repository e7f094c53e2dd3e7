"""Pre-MERGE last-image compaction (classic CDC reduce, SURVEY.md §2f).

Reduces a batch of committed change events to at most one row per key before
the sink MERGE. Deliberately built on **hash aggregation with max-by**, not a
ranking window: max/max_by are algebraic, so Spark performs map-side partial
aggregation before the shuffle — a Zipf-hot key collapses to one row per
input partition *before* any data moves, which neutralizes key skew where a
``row_number() over (partition by key)`` window would funnel the entire hot
key through one reducer. (This is the explicit skew-handling strategy of the
north rule; the MERGE join's residual skew is handled by AQE skew-join.)

Unchanged-TOAST semantics: a column sent as ``'u'`` carries the *previous*
value forward. Within a batch that resolves to "the latest non-toast image's
value"; if no in-batch image ever materialized the column, it stays in
``_toast`` and the lake MERGE carries it forward from the target row
(/root/reference/src/protocol.rs:310-328 skips 'u' columns the same way).

Key-changing updates (old key ≠ new key) emit an extra delete of the old key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ORD = ("commit_lsn", "seq")  # total order: commit order, then WAL order


def dml_images(events: DataFrame, key_columns: list[str],
               data_columns: list[tuple[str, str]],
               aliases: dict[str, list[str]] | None = None,
               key_types: dict[str, str] | None = None) -> DataFrame:
    """Project committed DML events of ONE table to flat key/value images.

    ``data_columns``: (name, spark-type) for all non-key columns.
    ``aliases``: current column name → pre-rename names (the lake table's
    rename history): events decoded before a mid-stream RENAME carry the
    old name in their tuple maps, so extraction coalesces across the
    alias chain.
    ``key_types``: target lake type per key column. Keys MUST be cast to
    the target's types: wire values are text, and a string-typed key would
    hash to a different bucket than the target's typed column
    (xxhash64('42') != xxhash64(42)) — a pruned MERGE would then read the
    wrong bucket's files and strand stale rows.
    Output: ord cols, _op, key cols, value cols, per-column _t_<c> toast flag.
    """
    aliases = aliases or {}
    key_types = key_types or {}

    def _ma(map_col: str, name: str):
        alts = [name] + list(aliases.get(name, []))
        if len(alts) == 1:
            out = F.element_at(map_col, name)
        else:
            out = F.coalesce(*[F.element_at(map_col, a) for a in alts])
        ty = key_types.get(name)
        return out.cast(ty) if ty else out

    is_del = F.col("event_type") == "delete"
    key_exprs = [
        F.when(is_del, _ma("old_data", k)).otherwise(_ma("new_data", k))
        .alias(k)
        for k in key_columns
    ]
    val_exprs = []
    for c, ty in data_columns:
        val_exprs.append(_ma("new_data", c).cast(ty).alias(c))
        toast_any = None
        for a in [c] + list(aliases.get(c, [])):
            t_ = F.coalesce(
                F.array_contains(F.coalesce("new_toast", F.array()), a),
                F.lit(False),
            )
            toast_any = t_ if toast_any is None else (toast_any | t_)
        val_exprs.append(toast_any.alias(f"_t_{c}"))
    base = events.select(
        F.col("commit_lsn"),
        F.col("seq"),
        F.when(is_del, F.lit("delete")).otherwise(F.lit("upsert")).alias("_op"),
        *key_exprs,
        *val_exprs,
    )

    # key-changing updates → synthetic delete of the old key (ordered just
    # before the new image within the same (commit_lsn, seq) slot)
    upd = events.filter(
        (F.col("event_type") == "update") & F.col("old_data").isNotNull()
    )
    changed = upd
    cond = None
    for k in key_columns:
        neq = _ma("old_data", k) != _ma("new_data", k)
        cond = neq if cond is None else (cond | neq)
    if cond is not None:
        changed = upd.filter(cond & _ma("old_data", key_columns[0]).isNotNull())
        extra = changed.select(
            F.col("commit_lsn"),
            F.col("seq"),
            F.lit("delete").alias("_op"),
            *[_ma("old_data", k).alias(k) for k in key_columns],
            *[e for c, ty in data_columns for e in (
                F.lit(None).cast(ty).alias(c), F.lit(False).alias(f"_t_{c}")
            )],
        )
        base = base.unionByName(extra)
    return base


def compact_last_image(images: DataFrame, key_columns: list[str],
                       data_columns: list[tuple[str, str]]) -> DataFrame:
    """One row per key: last op wins; each column takes the latest non-toast
    value; columns never materialized in-batch surface in ``_toast``."""
    ord_struct = F.struct(*[F.col(c) for c in ORD])
    aggs = [F.max_by("_op", ord_struct).alias("_op")]
    for c, _ in data_columns:
        aggs.append(
            F.max(
                F.when(
                    (F.col("_op") == "upsert") & ~F.col(f"_t_{c}"),
                    F.struct(*[F.col(o) for o in ORD], F.col(c).alias("v")),
                )
            ).alias(f"_last_{c}")
        )
    out = images.groupBy(*key_columns).agg(*aggs)
    sel = [*key_columns, "_op"]
    for c, _ in data_columns:
        sel.append(F.col(f"_last_{c}.v").alias(c))
    toast = F.array_compact(
        F.array(*[
            F.when(
                (F.col("_op") == "upsert") & F.col(f"_last_{c}").isNull(),
                F.lit(c),
            )
            for c, _ in data_columns
        ])
    ).alias("_toast")
    return out.select(*sel, toast)


def compact_salted(images: DataFrame, key_columns: list[str],
                   data_columns: list[tuple[str, str]],
                   n_salt: int = 16) -> DataFrame:
    """Explicit two-level salted compaction for pathologically hot keys.

    Level 1 groups by (key, salt) where salt = hash(seq) % n_salt, so a key
    with millions of in-batch updates fans out over n_salt reducers; level 2
    combines the n_salt partial winners. All aggregates here are algebraic
    (max / max_by), so the two-level split is exact.

    Note: Spark's map-side partial aggregation already gives hot keys this
    treatment implicitly (see compact_last_image), so the salted path is
    only worth its extra shuffle when single keys overflow executor memory
    during the final merge — wire it in via ``compact_changes(n_salt=...)``
    at that scale."""
    salted = images.withColumn(
        "_salt", F.pmod(F.xxhash64("seq"), F.lit(n_salt)).cast("int")
    )
    ord_struct = F.struct(*[F.col(c) for c in ORD])
    aggs = [
        F.max_by("_op", ord_struct).alias("_op"),
        F.max(ord_struct).alias("_ord"),
    ]
    for c, _ in data_columns:
        aggs.append(
            F.max(
                F.when(
                    (F.col("_op") == "upsert") & ~F.col(f"_t_{c}"),
                    F.struct(*[F.col(o) for o in ORD], F.col(c).alias("v")),
                )
            ).alias(f"_last_{c}")
        )
    lvl1 = salted.groupBy(*key_columns, "_salt").agg(*aggs)
    # level 2: combine partial winners (same max semantics over structs)
    aggs2 = [F.max_by("_op", F.col("_ord")).alias("_op")]
    for c, _ in data_columns:
        aggs2.append(F.max(f"_last_{c}").alias(f"_last_{c}"))
    out = lvl1.groupBy(*key_columns).agg(*aggs2)
    sel = [*key_columns, "_op"]
    for c, _ in data_columns:
        sel.append(F.col(f"_last_{c}.v").alias(c))
    toast = F.array_compact(
        F.array(*[
            F.when(
                (F.col("_op") == "upsert") & F.col(f"_last_{c}").isNull(),
                F.lit(c),
            )
            for c, _ in data_columns
        ])
    ).alias("_toast")
    return out.select(*sel, toast)


def compact_changes(events: DataFrame, key_columns: list[str],
                    data_columns: list[tuple[str, str]],
                    n_salt: int = 0,
                    aliases: dict[str, list[str]] | None = None,
                    key_types: dict[str, str] | None = None) -> DataFrame:
    """events (one table, committed DML only) → MERGE-ready change set.
    ``n_salt > 0`` selects the explicit two-level salted reduce;
    ``aliases`` maps renamed columns to their pre-rename names;
    ``key_types`` casts wire-text keys to the lake's key column types."""
    images = dml_images(events, key_columns, data_columns, aliases=aliases,
                        key_types=key_types)
    if n_salt > 0:
        return compact_salted(images, key_columns, data_columns, n_salt)
    return compact_last_image(images, key_columns, data_columns)
