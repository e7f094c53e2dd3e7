"""As-of join operator (operators/asof.py): inclusive-tie backward as-of
via union + running window — semantics pinned here and against DuckDB's
native ASOF LEFT JOIN in the driver oracle (cdc_asof_join)."""

from __future__ import annotations

from pg_walstream_spark.operators.asof import asof_join


def test_asof_basic_ties_and_left_nulls(spark):
    left = spark.createDataFrame(
        [("a", 1), ("a", 4), ("a", 5), ("b", 3)],
        "k string, t bigint")
    right = spark.createDataFrame(
        [("a", 2, "r2"), ("a", 4, "r4"), ("b", 9, "r9")],
        "k string, t bigint, v string")
    got = sorted(tuple(r) for r in asof_join(
        left, right, on=["k"], left_ord="t").collect())
    assert got == [
        ("a", 1, None, None),     # nothing at or before 1 -> left null
        ("a", 4, 4, "r4"),        # tie is INCLUSIVE
        ("a", 5, 4, "r4"),        # latest preceding
        ("b", 3, None, None),
    ]


def test_asof_name_collision_gets_suffix(spark):
    left = spark.createDataFrame([("a", 5, "L")], "k string, t bigint, v string")
    right = spark.createDataFrame([("a", 3, "R")], "k string, t bigint, v string")
    out = asof_join(left, right, on=["k"], left_ord="t")
    assert "v_right" in out.columns and "v" in out.columns
    r = out.collect()[0]
    assert (r["v"], r["v_right"], r["asof_ord"]) == ("L", "R", 3)


def test_asof_distinct_ord_names_and_plan(spark):
    left = spark.createDataFrame([("a", 10)], "k string, lt bigint")
    right = spark.createDataFrame([("a", 7, 1.5)], "k string, rt bigint, f double")
    out = asof_join(left, right, on=["k"], left_ord="lt", right_ord="rt")
    # one shuffle, no join node — the formulation must never range-join
    # (plan inspected pre-execution: AQE's post-run toString repeats the
    # plan in Final+Initial sections, double-counting nodes)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    r = out.collect()[0]
    assert (r["asof_ord"], r["f"]) == (7, 1.5)


def test_asof_randomized_matches_bruteforce(spark):
    """Property: for random workloads, asof_join == the brute-force
    per-row 'latest right with ord <= left ord' reference."""
    import random

    rng = random.Random(31)
    for trial in range(3):
        lrows = [(str(rng.randrange(6)), rng.randrange(50), i)
                 for i in range(80)]
        rrows_raw = [(str(rng.randrange(6)), rng.randrange(50),
                      f"v{i}") for i in range(40)]
        # dedupe right per (k, t): operator ties among right rows are
        # caller's responsibility (documented) — keep the max v
        best = {}
        for k, t, v in rrows_raw:
            if (k, t) not in best or v > best[(k, t)]:
                best[(k, t)] = v
        rrows = [(k, t, v) for (k, t), v in best.items()]
        left = spark.createDataFrame(lrows, "k string, t bigint, lid bigint")
        right = spark.createDataFrame(rrows, "k string, t bigint, v string")
        got = {r["lid"]: (r["asof_ord"], r["v_right"] if "v_right" in r
                          else r["v"])
               for r in asof_join(left, right, on=["k"],
                                  left_ord="t").collect()}

        def ref(k, t):
            cands = [(rt, v) for rk, rt, v in rrows if rk == k and rt <= t]
            return max(cands) if cands else (None, None)

        for k, t, lid in lrows:
            assert got[lid] == ref(k, t), (trial, k, t, got[lid], ref(k, t))
