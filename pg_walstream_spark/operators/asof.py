"""As-of join: for each left row, the LATEST right row with
``right_ord <= left_ord`` within the same key (backward as-of, inclusive —
DuckDB/kdb ASOF JOIN semantics).

Spark has no native as-of join; the naive formulations are a range
self-join (quadratic blowup on hot keys) or a per-key collect (driver
bound). This operator uses the union+running-window formulation instead:

    right rows (tagged 0) ∪ left rows (tagged 1)
      → ONE hash partitioning of the key
      → sort by (ord, tag)            — right-before-left on ties ⇒ inclusive
      → last(struct(right payload), ignorenulls) running window
      → keep left rows, emit the carried payload

Cost is one shuffle + one sort of |left| + |right| rows, independent of
match distances; a key with millions of rows streams through the sort
(same bound as any per-key ordered computation). Used for point-in-time
feature joins (events ⟕ latest dimension image as of the event time) —
the consumption pattern SCD2/read_changes exist for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ord: str,
    right_ord: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join. Every ``left`` row gains the payload columns of
    the latest ``right`` row with ``right_ord <= left_ord`` in its key
    group (null when none precede it — LEFT join semantics).

    ``right`` payload columns (everything except ``on`` + ``right_ord``)
    that collide with a left column name get ``suffix``. The right ord
    value itself is emitted as ``asof_ord`` + suffix when names collide.
    Ties on the ord value match (inclusive); among right rows tied on
    (key, ord) the LAST in the right DataFrame's sort order wins —
    dedupe the right side first if that matters."""
    right_ord = right_ord or left_ord
    payload = [c for c in right.columns if c not in on and c != right_ord]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload
    }
    ord_name = ("asof_ord" + suffix
                if "asof_ord" in left.columns else "asof_ord")

    r = right.select(
        *on,
        F.col(right_ord).alias("_ord"),
        F.struct(
            F.col(right_ord).alias(ord_name),
            *[F.col(c).alias(out_names[c]) for c in payload],
        ).alias("_payload"),
        F.lit(0).alias("_src"),
    )
    l_cols = left.columns
    lt = left.select(
        "*",
        F.col(left_ord).alias("_ord"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.lit(1).alias("_src"),
    )
    u = lt.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(*on)
         .orderBy(F.col("_ord").asc(), F.col("_src").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = F.last(
        F.when(F.col("_src") == 0, F.col("_payload")), ignorenulls=True
    ).over(w)
    matched = u.withColumn("_m", carried).filter(F.col("_src") == 1)
    return matched.select(
        *l_cols,
        F.col("_m")[ord_name].alias(ord_name),
        *[F.col("_m")[out_names[c]].alias(out_names[c]) for c in payload],
    )
