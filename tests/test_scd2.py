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


def test_scd2_from_feed_with_deletes(spark):
    """Feed → SCD2: deletes close intervals, re-inserts (even identical)
    reopen, equal consecutive upserts collapse."""
    from pg_walstream_spark.operators.scd2 import scd2_from_feed

    feed = spark.createDataFrame(
        [
            ("a", "x", "upsert", 1), ("a", "x", "upsert", 2),  # collapse
            ("a", "x", "delete", 3),                           # close at 3
            ("a", "x", "upsert", 4),                           # reopen
            ("b", "y", "upsert", 1), ("b", "z", "upsert", 5),
        ],
        "k string, attr string, _op string, _commit_lsn bigint",
    )
    out = sorted(
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_from_feed(feed, ["k"], ["attr"]).collect())
    assert out == [
        ("a", "x", 1, 3, False),   # closed BY the delete's lsn
        ("a", "x", 4, None, True),
        ("b", "y", 1, 5, False),
        ("b", "z", 5, None, True),
    ]


def test_scd2_from_engine_changelog(spark, tmp_path, monkeypatch):
    """End to end: engine replay with the feed on → scd2_from_feed over
    read_changes; every key's current interval matches the table's final
    image, and keys absent from the table have NO open interval."""
    import os

    import pg_walstream_spark.engine as E
    from pg_walstream_spark.fixtures import wal_gen as wg
    from pg_walstream_spark.operators.scd2 import scd2_from_feed

    monkeypatch.setenv("WALSTREAM_CHANGELOG", "1")
    base, b = wg.gen_basic(n_base=40, n_txns=8, ops_per_txn=6, seed=13)
    fd = os.path.join(str(tmp_path), "frames")
    wg.write_frames(b.to_table(), fd)
    bp = os.path.join(str(tmp_path), "base.parquet")
    wg.write_base(base, bp)
    eng = E.ReplayEngine(spark, os.path.join(str(tmp_path), "wh"))
    eng.bootstrap_table("repos", spark.read.parquet(bp), ["repo", "path"], 4)
    eng.replay_frames(fd)

    t = eng.table("repos")
    hist = scd2_from_feed(t.read_changes(spark), ["repo", "path"],
                          ["commit", "content"]).collect()
    current = {(r["repo"], r["path"]): (r["commit"], r["content"])
               for r in hist if r["is_current"]}
    final = {(r["repo"], r["path"]): (r["commit"], r["content"])
             for r in t.read(spark).collect()}
    # every feed-touched key's open interval equals the final image;
    # keys deleted by the feed's last op have no open interval
    touched = {(r["repo"], r["path"])
               for r in t.read_changes(spark).collect()}
    for k in touched:
        if k in final:
            assert current.get(k) == final[k], k
        else:
            assert k not in current, k


def test_scd2_randomized_asof_reconstruction(spark):
    """Property: for random change streams, the interval containing any
    probe time t yields exactly the naive 'state as of t' — SCD2 and
    point-in-time reconstruction agree everywhere."""
    import random

    rng = random.Random(47)
    rows = []
    for i in range(200):
        rows.append((str(rng.randrange(8)), i + 1,
                     rng.choice(["x", "y", "z"]), f"e{i}"))
    out = scd2_history(_df(spark, rows), ["k"], ["ord"], ["attr"],
                       valid_col="ord").collect()
    ivs = {}
    for r in out:
        ivs.setdefault(r["k"], []).append(
            (r["valid_from"], r["valid_to"], r["attr"]))
    for probe in [1, 7, 50, 125, 200, 201]:
        for k in {r[0] for r in rows}:
            naive = None
            for kk, o, a, _ in rows:
                if kk == k and o <= probe:
                    naive = a  # rows are ord-ascending
            hits = [a for lo, hi, a in ivs.get(k, [])
                    if lo <= probe and (hi is None or probe < hi)]
            assert len(hits) <= 1
            assert (hits[0] if hits else None) == naive, (k, probe)
