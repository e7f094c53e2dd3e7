"""Replicates the driver's correctness gate locally: every queries() entry
with an oracle_sql() runs on Spark AND DuckDB at sf0.001/sf0.01 and must
match on row count, column set, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

import os

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if isinstance(r, dict) else r[cols.index(c)]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
            elif hasattr(v, "__float__") and not isinstance(v, (int, bool)):
                v = round(float(v), 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


ORACLED = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = fn(spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    spark_rows = [r.asDict() for r in sdf.collect()]

    con = duck_con()
    res = con.execute(sql)
    duck_cols = sorted(d[0] for d in res.description)
    duck_rows = [dict(zip([d[0] for d in res.description], row))
                 for row in res.fetchall()]

    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: {len(spark_rows)} spark vs {len(duck_rows)} duckdb rows"
    )
    ns = normalize(spark_rows, spark_cols)
    nd = normalize(duck_rows, spark_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 3


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.schema is not None


def test_wal_replay_fingerprint(spark):
    """The flagship engine replay query carries a whole-state digest
    (sha256 over sorted per-row digests). The fixture is seeded, so the
    value is a constant — any engine semantics drift (lost rows, wrong
    last image, broken TOAST carry) changes it."""
    import hashlib

    from pg_walstream_spark.fixtures import wal_gen as wg
    from pg_walstream_spark.golden import golden_final_state
    from pg_walstream_spark.queries import WAL_REPLAY_FP

    row = entry_mod.queries()["wal_replay_final_state"](spark, SF_DIR) \
        .collect()
    assert len(row) == 1
    assert row[0]["table_fingerprint"] == WAL_REPLAY_FP
    assert row[0]["n_rows"] == 160
    # independently re-derive the pinned constant from the SEQUENTIAL
    # golden applier, so the oracle-SQL constant isn't self-fulfilling
    base, b = wg.gen_basic(n_base=100, n_txns=10, ops_per_txn=6, seed=11)
    rows, _ = golden_final_state(base, b.to_table())
    digests = sorted(
        hashlib.sha256("|".join([
            r["repo"], r["path"], r["commit"], r["lang"],
            hashlib.sha256(r["content"].encode()).hexdigest(),
        ]).encode()).hexdigest()
        for r in rows
    )
    want = hashlib.sha256("|".join(digests).encode()).hexdigest()
    assert want == WAL_REPLAY_FP
    assert len(rows) == 160


def test_wal_streaming_2pc_fingerprint(spark):
    """The streamed + two-phase replay query (S/E/c, sub-xid abort,
    stream_prepare, begin_prepare/prepare, commit_prepared,
    rollback_prepared) pins a whole-state digest constant. Re-derive it
    from the SEQUENTIAL golden applier so the oracle-SQL constant isn't
    self-fulfilling, and assert the poisoned rows really vanished."""
    import hashlib

    from pg_walstream_spark.fixtures import wal_gen as wg
    from pg_walstream_spark.golden import golden_final_state
    from pg_walstream_spark.queries import WAL_S2PC_FP

    row = entry_mod.queries()["wal_streaming_2pc_replay"](spark, SF_DIR) \
        .collect()
    assert len(row) == 1
    assert row[0]["table_fingerprint"] == WAL_S2PC_FP
    assert row[0]["n_rows"] == 107

    base, b = wg.gen_streaming_2pc(n_base=90, seed=42, protocol_version=4)
    rows, _ = golden_final_state({"repos": base}, b.to_table(), "repos",
                                 protocol_version=4)
    assert not [r for r in rows if r["repo"] in
                ("orgS/subdoomed", "orgB/doomed", "orgR/rolled")]
    digests = sorted(
        hashlib.sha256("|".join([
            r["repo"], r["path"], r["commit"], r["lang"],
            hashlib.sha256(r["content"].encode()).hexdigest(),
        ]).encode()).hexdigest()
        for r in rows
    )
    want = hashlib.sha256("|".join(digests).encode()).hexdigest()
    assert want == WAL_S2PC_FP
    assert len(rows) == 107


def test_wal_decode_counts_pinned(spark):
    """The decode-stage driver query runs over a seeded in-memory fixture;
    its counts are constants — pinned so the rows-only driver check is
    backed by a real value assertion here."""
    rows = sorted(
        tuple(r)
        for r in entry_mod.queries()["wal_decode_counts"](spark, SF_DIR)
        .collect()
    )
    assert rows == [
        ("begin", None, 12), ("commit", "committed", 12),
        ("delete", "committed", 30), ("insert", "committed", 24),
        ("relation", None, 2), ("update", "committed", 42),
    ]
