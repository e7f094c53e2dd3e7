"""Differential tests: the bucket-co-located Arrow merge kernel
(lake/merge_kernel.py) must produce byte-identical lake state to the
general declarative path (compact_last_image + LakeTable.merge) on the
same inputs."""

from __future__ import annotations

import os
import random

import pytest

from pg_walstream_spark.lake.table import LakeTable
from pg_walstream_spark.operators.compact import (
    compact_changes, dml_images,
)

KEY_COLS = ["k1", "k2"]
DATA_COLS = [("v_str", "string"), ("v_num", "bigint")]


def _events_df(spark, rows):
    """Build a committed-DML events DataFrame (the post-decode fast-path
    shape) from (op, commit_lsn, seq, old, new, toast) tuples where
    old/new are dicts of wire-text values."""
    data = []
    for op, clsn, seq, old, new, toast in rows:
        data.append((seq, op, old, new, toast, "committed", clsn))
    return spark.createDataFrame(
        data,
        "seq bigint, event_type string, old_data map<string,string>, "
        "new_data map<string,string>, new_toast array<string>, "
        "txn_status string, commit_lsn bigint",
    )


def _rand_workload(seed, n_ops=400, n_keys=60):
    rng = random.Random(seed)
    rows = []
    seq = 0
    for i in range(n_ops):
        seq += 1
        k1 = str(rng.randrange(n_keys))
        k2 = rng.choice(["a", "b"])
        op = rng.choice(["insert", "update", "update", "delete"])
        new = {"k1": k1, "k2": k2, "v_str": f"s{rng.randrange(1000)}",
               "v_num": str(rng.randrange(10**6))}
        old = None
        toast = None
        if op == "update":
            old = {"k1": k1, "k2": k2}
            if rng.random() < 0.25:  # unchanged-TOAST column
                toast = ["v_str"]
                new = {k: v for k, v in new.items() if k != "v_str"}
            if rng.random() < 0.15:  # key-changing update
                new["k1"] = str(rng.randrange(n_keys))
        elif op == "delete":
            old = new
            new = None
        rows.append((op, 100 + i, seq, old, new, toast))
    return rows


def _base_df(spark, n=80):
    return spark.createDataFrame(
        [(str(i), "a" if i % 2 else "b", f"base{i}", i * 10)
         for i in range(n)],
        "k1 string, k2 string, v_str string, v_num bigint",
    )


def _state(spark, table: LakeTable):
    df = table.read(spark)
    return sorted(tuple(r) for r in df.collect())


def _run_both(spark, tmp_path, rows, n_buckets=8, base_rows=80):
    base = _base_df(spark, base_rows)
    tg = LakeTable.create(spark, str(tmp_path / "general"), base,
                          KEY_COLS, n_buckets=n_buckets)
    tk = LakeTable.create(spark, str(tmp_path / "kernel"), base,
                          KEY_COLS, n_buckets=n_buckets)
    ev = _events_df(spark, rows)
    kt = {"k1": "string", "k2": "string"}
    changes = compact_changes(ev, KEY_COLS, DATA_COLS, key_types=kt)
    rg = tg.merge(spark, changes, applied_lsn=10_000, batch_id="b0")
    images = dml_images(ev, KEY_COLS, DATA_COLS, key_types=kt)
    rk = tk.merge_bucketed(spark, images, applied_lsn=10_000,
                           batch_id="b0")
    assert _state(spark, tg) == _state(spark, tk)
    return rg, rk


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_kernel_matches_general_random_workload(spark, tmp_path, seed):
    rg, rk = _run_both(spark, tmp_path, _rand_workload(seed))
    assert rk["merge_kernel"] is True
    assert rk["upserts"] + rk["deletes"] > 0
    # the two paths count the same compacted change rows
    assert rk["upserts"] == rg["upserts"]
    assert rk["deletes"] == rg["deletes"]


def test_kernel_toast_carry_and_new_keys(spark, tmp_path):
    rows = [
        # toast carry on an existing key: v_str must keep base value
        ("update", 100, 1, {"k1": "1", "k2": "a"},
         {"k1": "1", "k2": "a", "v_num": "777"}, ["v_str"]),
        # brand-new key, toast column never materialized -> null
        ("insert", 101, 2, None,
         {"k1": "900", "k2": "a", "v_num": "5"}, ["v_str"]),
        # delete an existing key
        ("delete", 102, 3, {"k1": "2", "k2": "a"}, None, None),
        # delete an absent key (no-op)
        ("delete", 103, 4, {"k1": "901", "k2": "b"}, None, None),
    ]
    rg, rk = _run_both(spark, tmp_path, rows)
    assert rk["deletes"] == rg["deletes"] == 2


def test_kernel_null_key_quarantine_count(spark, tmp_path):
    rows = [
        ("insert", 100, 1, None, {"k1": "5", "k2": "a", "v_str": "x",
                                  "v_num": "1"}, None),
        # k2 missing -> null key column -> quarantined, not applied
        ("insert", 101, 2, None, {"k1": "6", "v_str": "y", "v_num": "2"},
         None),
    ]
    rg, rk = _run_both(spark, tmp_path, rows)
    assert rg["null_key_quarantined"] == 1
    assert rk["null_key_quarantined"] == 1


def test_kernel_key_change_delete_moves_row(spark, tmp_path):
    rows = [
        ("update", 100, 1, {"k1": "3", "k2": "a"},
         {"k1": "500", "k2": "a", "v_str": "moved", "v_num": "42"}, None),
    ]
    _run_both(spark, tmp_path, rows)


def test_kernel_late_added_column_reads_null(spark, tmp_path):
    base = _base_df(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), base, KEY_COLS,
                         n_buckets=4)
    t.add_columns([("v_new", "string")])
    rows = [("update", 100, 1, {"k1": "1", "k2": "a"},
             {"k1": "1", "k2": "a", "v_str": "u", "v_num": "1",
              "v_new": "fresh"}, None)]
    ev = _events_df(spark, rows)
    images = dml_images(
        ev, KEY_COLS, DATA_COLS + [("v_new", "string")],
        key_types={"k1": "string", "k2": "string"})
    t.merge_bucketed(spark, images, applied_lsn=10_000, batch_id="b0")
    got = {(r["k1"], r["k2"]): (r["v_new"], r["v_str"])
           for r in t.read(spark).collect()}
    assert got[("1", "a")] == ("fresh", "u")
    # untouched rows from pre-ADD files serve null for the new column
    assert got[("3", "a")][0] is None


def test_kernel_rejects_schema_history(spark, tmp_path):
    base = _base_df(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), base, KEY_COLS,
                         n_buckets=4)
    t.rename_column("v_str", "v_renamed")
    ev = _events_df(spark, [])
    images = dml_images(ev, KEY_COLS, [("v_renamed", "string"),
                                       ("v_num", "bigint")],
                        key_types={"k1": "string", "k2": "string"})
    with pytest.raises(ValueError, match="general merge"):
        t.merge_bucketed(spark, images, applied_lsn=10_000)


def test_kernel_fence_skip(spark, tmp_path):
    base = _base_df(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), base, KEY_COLS,
                         n_buckets=4)
    ev = _events_df(spark, [("insert", 100, 1, None,
                             {"k1": "1", "k2": "a", "v_str": "x",
                              "v_num": "1"}, None)])
    images = dml_images(ev, KEY_COLS, DATA_COLS,
                        key_types={"k1": "string", "k2": "string"})
    rec = t.merge_bucketed(spark, images, applied_lsn=0)
    assert rec["skipped"] is True


def test_kernel_untouched_buckets_keep_files(spark, tmp_path):
    base = _base_df(spark, 200)
    t = LakeTable.create(spark, str(tmp_path / "t"), base, KEY_COLS,
                         n_buckets=16)
    before = t.snapshot()["files"]
    rows = [("update", 100, 1, {"k1": "1", "k2": "a"},
             {"k1": "1", "k2": "a", "v_str": "u", "v_num": "9"}, None)]
    ev = _events_df(spark, rows)
    images = dml_images(ev, KEY_COLS, DATA_COLS,
                        key_types={"k1": "string", "k2": "string"})
    rec = t.merge_bucketed(spark, images, applied_lsn=10_000)
    after = t.snapshot()["files"]
    assert len(rec["buckets_rewritten"]) == 1
    touched = str(rec["buckets_rewritten"][0])
    for b, fl in before.items():
        if b != touched:
            assert after[b] == fl
    assert after[touched] != before.get(touched)


def test_murmur3_salts_predict_spark_partitions(spark):
    """The salted bucket routing rests on _murmur3_int32 being bit-exact
    with the hash behind df.repartition(n, int_col): pin the whole chain
    by predicting spark_partition_id for the chosen salts at several
    partition counts."""
    from pyspark.sql import functions as F

    from pg_walstream_spark.lake.merge_kernel import (
        _murmur3_int32, partition_salts,
    )

    for P in (2, 3, 8, 16, 32):
        salts = partition_salts(P)
        assert salts is not None and len(salts) == P
        # each salt must land in its own partition, i.e. the map is the
        # identity on residue classes
        df = spark.createDataFrame([(s,) for s in salts], "v int")
        got = {
            r["v"]: r["p"]
            for r in df.repartition(P, "v")
            .withColumn("p", F.spark_partition_id()).collect()
        }
        for p, s in enumerate(salts):
            assert got[s] == p, (P, p, s, got[s])
            assert _murmur3_int32(s) % P == p

    # negative and large values hash identically too (general pin)
    vals = [-5, -1, 0, 1, 7, 123456, 2**31 - 1, -(2**31)]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    got = {r["v"]: r["h"]
           for r in df.withColumn("h", F.hash("v")).collect()}
    for v in vals:
        assert _murmur3_int32(v & 0xFFFFFFFF if v < 0 else v) == got[v] or \
            _murmur3_int32(v % (1 << 32)) == got[v]


def test_kernel_salted_routing_balances_partitions(spark, tmp_path):
    """With 16 buckets into 8 partitions the salted routing must place
    exactly 2 buckets per reduce partition (plain hash collides them);
    verified through the real merge path by checking every bucket was
    rewritten and the merge output matches the general path."""
    base = _base_df(spark, 400)
    tA = LakeTable.create(spark, str(tmp_path / "a"), base, KEY_COLS,
                          n_buckets=16)
    tB = LakeTable.create(spark, str(tmp_path / "b"), base, KEY_COLS,
                          n_buckets=16)
    rows = [("update", 100 + i, i, {"k1": str(i % 97), "k2": "a"},
             {"k1": str(i % 97), "k2": "a", "v_str": f"u{i}",
              "v_num": str(i)}, None) for i in range(300)]
    ev = _events_df(spark, rows)
    images = dml_images(ev, KEY_COLS, DATA_COLS,
                        key_types={"k1": "string", "k2": "string"})
    recA = tA.merge_bucketed(spark, images, applied_lsn=10_000)
    os.environ["WALSTREAM_FASTPATH_MERGE"] = "join"
    try:
        from pg_walstream_spark.operators.compact import compact_changes

        changes = compact_changes(ev, KEY_COLS, DATA_COLS,
                                  key_types={"k1": "string",
                                             "k2": "string"})
        tB.merge(spark, changes, applied_lsn=10_000)
    finally:
        os.environ.pop("WALSTREAM_FASTPATH_MERGE", None)
    a = sorted(map(tuple, tA.read(spark).collect()))
    b = sorted(map(tuple, tB.read(spark).collect()))
    assert a == b


def test_kernel_fileless_bucket_sparse_bootstrap(spark, tmp_path):
    """A bucket with NO existing target file (sparse bootstrap: more
    buckets than base keys) receiving inserts must merge cleanly — the
    kernel's __t marker must be typed bool even at n_target==0
    (pa.array([True]*0) infers null and Acero rejects null non-key
    fields). Differential vs the general path."""
    rows = [("insert", 100 + i, i + 1, None,
             {"k1": str(1000 + i), "k2": "a" if i % 2 else "b",
              "v_str": f"n{i}", "v_num": str(i)}, None)
            for i in range(40)]
    rg, rk = _run_both(spark, tmp_path, rows, n_buckets=16, base_rows=2)
    assert rk["merge_kernel"] is True
    assert rk["upserts"] == rg["upserts"] == 40


def test_kernel_bucket_emptied_then_reinserted(spark, tmp_path):
    """Delete every row of a table (all buckets drop their files), then
    insert fresh keys: the second merge joins against fileless buckets.
    Differential vs the general path across both merges."""
    kt = {"k1": "string", "k2": "string"}
    base = _base_df(spark, 8)
    tg = LakeTable.create(spark, str(tmp_path / "g"), base, KEY_COLS,
                          n_buckets=4)
    tk = LakeTable.create(spark, str(tmp_path / "k"), base, KEY_COLS,
                          n_buckets=4)
    dels = [("delete", 100 + i, i + 1,
             {"k1": str(i), "k2": "a" if i % 2 else "b"}, None, None)
            for i in range(8)]
    ins = [("insert", 300 + i, i + 1, None,
            {"k1": str(i), "k2": "b" if i % 2 else "a",
             "v_str": f"re{i}", "v_num": str(7 * i)}, None)
           for i in range(6)]
    for lsn, rows in ((10_000, dels), (20_000, ins)):
        ev = _events_df(spark, rows)
        changes = compact_changes(ev, KEY_COLS, DATA_COLS, key_types=kt)
        images = dml_images(ev, KEY_COLS, DATA_COLS, key_types=kt)
        tg.merge(spark, changes, applied_lsn=lsn)
        rk = tk.merge_bucketed(spark, images, applied_lsn=lsn)
        assert rk["merge_kernel"] is True
        assert _state(spark, tg) == _state(spark, tk)
    assert len(_state(spark, tk)) == 6


def test_kernel_timestamp_key_conform(spark, tmp_path):
    """A timestamp key column: Spark's Arrow transfer carries its own tz
    annotation, which must be conformed to the snapshot-declared Arrow
    type before the kernel join (a mismatch fails or mis-joins in Acero).
    Differential vs the general path."""
    import datetime as dt

    from pg_walstream_spark.operators.compact import compact_changes

    key_cols = ["k_ts", "k2"]
    data_cols = [("v_str", "string"), ("v_num", "bigint")]
    kt = {"k_ts": "timestamp", "k2": "string"}
    base = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0, i), "a", f"base{i}", i)
         for i in range(20)],
        "k_ts timestamp, k2 string, v_str string, v_num bigint")
    tg = LakeTable.create(spark, str(tmp_path / "g"), base, key_cols,
                          n_buckets=4)
    tk = LakeTable.create(spark, str(tmp_path / "k"), base, key_cols,
                          n_buckets=4)
    rows = []
    for i in range(12):
        k = {"k_ts": f"2024-01-01 00:00:{i:02d}", "k2": "a"}
        rows.append(("update", 100 + i, i + 1, k,
                     {**k, "v_str": f"u{i}", "v_num": str(100 + i)}, None))
    # plus inserts into fileless buckets with a timestamp key
    for i in range(6):
        k = {"k_ts": f"2030-06-0{i + 1} 12:00:00", "k2": "b"}
        rows.append(("insert", 200 + i, 50 + i, None,
                     {**k, "v_str": f"n{i}", "v_num": str(i)}, None))
    ev = _events_df(spark, rows)
    changes = compact_changes(ev, key_cols, data_cols, key_types=kt)
    images = dml_images(ev, key_cols, data_cols, key_types=kt)
    tg.merge(spark, changes, applied_lsn=10_000)
    rk = tk.merge_bucketed(spark, images, applied_lsn=10_000)
    assert rk["merge_kernel"] is True
    assert _state(spark, tg) == _state(spark, tk)


def test_oversized_bucket_guard_reroutes_to_declarative(
        spark, tmp_path, monkeypatch):
    """A kernel task materializes its bucket's FULL target in memory; past
    WALSTREAM_KERNEL_MAX_BUCKET_BYTES the batch must reroute to the
    declarative merge (which streams the target through the join), stamp a
    kernel_reroute lineage event, and land the exact same state. The spy
    pins that the kernel truly never runs under the guard."""
    import pg_walstream_spark.lake.merge_kernel as mk

    rows = _rand_workload(7)
    kt = {"k1": "string", "k2": "string"}

    base = _base_df(spark, 80)
    ref = LakeTable.create(spark, str(tmp_path / "ref"), base, KEY_COLS,
                           n_buckets=8)
    ref_rec = ref.merge_bucketed(
        spark, dml_images(_events_df(spark, rows), KEY_COLS, DATA_COLS,
                          key_types=kt),
        applied_lsn=10_000, batch_id="b0")
    assert ref_rec["merge_kernel"] is True  # default cap: kernel path

    t = LakeTable.create(spark, str(tmp_path / "t"), base, KEY_COLS,
                         n_buckets=8)

    def _boom(*a, **k):
        raise AssertionError("kernel must not run under the guard")

    monkeypatch.setattr(mk, "make_merge_kernel", _boom)
    monkeypatch.setenv("WALSTREAM_KERNEL_MAX_BUCKET_BYTES", "1")
    rec = t.merge_bucketed(
        spark, dml_images(_events_df(spark, rows), KEY_COLS, DATA_COLS,
                          key_types=kt),
        applied_lsn=10_000, batch_id="b0")

    assert "merge_kernel" not in rec  # declarative record shape
    rr = rec["kernel_reroute"]
    assert rr["reason"] == "bucket_bytes_over_cap"
    assert rr["n_oversized"] >= 1 and rr["oversized_buckets"]
    assert rr["max_bucket_bytes"] == 1
    assert _state(spark, t) == _state(spark, ref)
    assert rec["upserts"] == ref_rec["upserts"]
    assert rec["deletes"] == ref_rec["deletes"]
    # the reroute is visible in the committed lineage, fence advanced once
    lin = t.snapshot()["lineage"]
    assert any(r.get("kernel_reroute") for r in lin)
    assert int(t.snapshot()["properties"]["applied_lsn"]) == 10_000
    # fence idempotency preserved through the reroute path
    rec2 = t.merge_bucketed(
        spark, dml_images(_events_df(spark, rows), KEY_COLS, DATA_COLS,
                          key_types=kt),
        applied_lsn=10_000, batch_id="b0")
    assert rec2["skipped"] is True


def test_salt_search_vectorized_matches_scalar():
    """partition_salts now coupon-collects with the numpy murmur3; the
    vectorized hash must stay bit-exact with the scalar pinned against
    Spark above, and the salts found past the CASE bound (>512) must
    still be the identity on residue classes."""
    import numpy as np

    from pg_walstream_spark.lake.merge_kernel import (
        _murmur3_int32, _murmur3_int32_np, partition_salts,
    )

    vs = np.arange(4096, dtype=np.int64)
    vec = _murmur3_int32_np(vs)
    for v in range(0, 4096, 37):
        assert int(vec[v]) == _murmur3_int32(v)

    for P in (1024, 4096):
        salts = partition_salts(P)
        assert salts is not None and len(salts) == P
        for p in range(0, P, 101):
            assert _murmur3_int32(salts[p]) % P == p


def test_salted_routing_array_literal_past_512(spark):
    """Past 512 partitions the salt bijection ships as a constant-folded
    array literal instead of a CASE; pin the whole chain (salt search →
    element_at expression → real shuffle) by routing every residue class
    at P=1024 and asserting each lands in its own partition."""
    from pyspark.sql import functions as F

    from pg_walstream_spark.lake.merge_kernel import partition_salts

    P = 1024
    salts = partition_salts(P)
    assert salts is not None
    arr = ",".join(str(s) for s in salts)
    expr = (f"element_at(array({arr}), "
            f"CAST(pmod(_bucket, {P}) AS INT) + 1)")
    got = (
        spark.range(P).withColumnRenamed("id", "_bucket")
        .repartition(P, F.expr(expr))
        .select("_bucket", F.spark_partition_id().alias("p"))
        .collect()
    )
    assert len(got) == P
    for r in got:
        assert r["p"] == r["_bucket"] % P, (r["_bucket"], r["p"])


def test_kernel_array_routing_merge_matches_general(spark, tmp_path):
    """e2e: a merge forced onto >512 partitions (the array-literal salt
    path) stays byte-identical to the general declarative merge. Salted
    routing is forced — the wave-aware auto mode would pick plain hash
    at 129 waves on the 4-core test session."""
    rows = _rand_workload(99, n_ops=300, n_keys=50)
    os.environ["WALSTREAM_MERGE_TASKS"] = "513"
    os.environ["WALSTREAM_MERGE_ROUTING"] = "salted"
    try:
        _run_both(spark, tmp_path, rows, n_buckets=513)
    finally:
        os.environ.pop("WALSTREAM_MERGE_TASKS", None)
        os.environ.pop("WALSTREAM_MERGE_ROUTING", None)


def test_merge_routing_hash_knob_forces_plain_hash(spark, tmp_path):
    """WALSTREAM_MERGE_ROUTING=hash (the A/B lever for routing
    measurements) must keep results identical while skipping the salted
    expression."""
    rows = _rand_workload(7, n_ops=200, n_keys=40)
    os.environ["WALSTREAM_MERGE_ROUTING"] = "hash"
    try:
        _run_both(spark, tmp_path, rows, n_buckets=16)
    finally:
        os.environ.pop("WALSTREAM_MERGE_ROUTING", None)


def test_wave_aware_routing_auto_selects(spark, tmp_path, monkeypatch):
    """Auto routing picks salted in the few-wave regime and plain hash
    past WALSTREAM_SALT_MAX_WAVES (round-7 A/B: hash ~13% faster at 32
    waves, salted ~20% faster at 2 — EVIDENCE_r7.md §8). Pinned through
    the real merge by spying the repartition expression."""
    try:  # Spark 4: instances are the classic class, not the sql shim
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover
        from pyspark.sql import DataFrame

    exprs = []
    orig = DataFrame.repartition

    def spy(self, n, *cols):
        exprs.append((n, [str(c) for c in cols]))
        return orig(self, n, *cols)

    monkeypatch.setattr(DataFrame, "repartition", spy)
    rows = _rand_workload(11, n_ops=120, n_keys=30)
    base = _base_df(spark, 80)
    kt = {"k1": "string", "k2": "string"}

    # few waves (16 parts / 4 cores = 4 waves ≤ default 4) → salted CASE
    t1 = LakeTable.create(spark, str(tmp_path / "few"), base, KEY_COLS,
                          n_buckets=16)
    ev = _events_df(spark, rows)
    t1.merge_bucketed(
        spark, dml_images(ev, KEY_COLS, DATA_COLS, key_types=kt),
        applied_lsn=10_000)
    assert any("CASE" in c for _, cols in exprs for c in cols)

    # many waves (64 parts / 4 cores = 16 waves) → plain hash on _bucket
    exprs.clear()
    os.environ["WALSTREAM_MERGE_TASKS"] = "64"
    try:
        t2 = LakeTable.create(spark, str(tmp_path / "many"), base,
                              KEY_COLS, n_buckets=64)
        t2.merge_bucketed(
            spark, dml_images(ev, KEY_COLS, DATA_COLS, key_types=kt),
            applied_lsn=10_000)
    finally:
        os.environ.pop("WALSTREAM_MERGE_TASKS", None)
    assert exprs and all(
        "CASE" not in c and "element_at" not in c
        for _, cols in exprs for c in cols)
