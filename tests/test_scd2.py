"""SCD2 historization operator (operators/scd2.py).

Semantics: consecutive identical attribute tuples collapse into one
interval; intervals chain (valid_to == next valid_from); exactly one open
interval per key. Plan: ONE exchange + ONE sort — the second window pass
reuses the first's partitioning/order through the change filter.
"""

from __future__ import annotations

from pg_walstream_spark.operators.scd2 import scd2_history


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k string, ord bigint, attr string, extra string")


def test_scd2_collapses_and_chains(spark):
    rows = [
        ("a", 1, "x", "e1"), ("a", 2, "x", "e2"),  # collapses into first
        ("a", 3, "y", "e3"), ("a", 4, "x", "e4"),  # re-entry opens anew
        ("b", 5, "z", "e5"),
    ]
    out = scd2_history(_df(spark, rows), ["k"], ["ord"], ["attr"],
                       valid_col="ord", carry_cols=("extra",)).collect()
    got = sorted((r["k"], r["attr"], r["extra"], r["valid_from"],
                  r["valid_to"], r["is_current"]) for r in out)
    assert got == [
        ("a", "x", "e1", 1, 3, False),   # rows 1-2 collapsed, closed by y
        ("a", "x", "e4", 4, None, True),
        ("a", "y", "e3", 3, 4, False),
        ("b", "z", "e5", 5, None, True),
    ]
    # invariants: intervals chain per key, exactly one open per key
    by_k = {}
    for r in out:
        by_k.setdefault(r["k"], []).append(r)
    for k, ivs in by_k.items():
        ivs.sort(key=lambda r: r["valid_from"])
        assert sum(1 for r in ivs if r["is_current"]) == 1
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]


def test_scd2_multi_attr_change_detection(spark):
    rows = [
        ("a", 1, "x", "p"), ("a", 2, "x", "q"),  # extra not tracked
        ("a", 3, "x", "p"),
    ]
    out = scd2_history(_df(spark, rows), ["k"], ["ord"], ["attr"],
                       valid_col="ord").collect()
    assert len(out) == 1  # only attr tracked -> one interval
    out2 = scd2_history(_df(spark, rows), ["k"], ["ord"],
                        ["attr", "extra"], valid_col="ord").collect()
    assert len(out2) == 3  # extra tracked -> every row changes


def test_scd2_plan_single_exchange(spark):
    """The whole historization is ONE shuffle of the key: the change
    filter preserves the first window's distribution and order, so the
    second window adds no exchange and no sort."""
    df = _df(spark, [("a", 1, "x", "e")])
    out = scd2_history(df, ["k"], ["ord"], ["attr"], valid_col="ord")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort") == 1, plan
