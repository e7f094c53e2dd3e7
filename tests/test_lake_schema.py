"""LakeTable schema-evolution edge cases: dropped/renamed names re-entering
the schema must not resurrect stale physical values from old files, and
change rows whose keys fail the lake-type cast are quarantined, not merged.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pg_walstream_spark.lake.table import LakeTable


def _mk(spark, tmp_path, name="t"):
    base = spark.createDataFrame(
        [(i, f"v{i}", i * 10) for i in range(8)],
        "id int, name string, score int",
    )
    return LakeTable.create(
        spark, os.path.join(str(tmp_path), name), base, ["id"], 4
    )


def _changes(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_drop_then_readd_serves_null_from_old_files(spark, tmp_path):
    """DROP score, later ADD score: rows still sitting in pre-drop files
    must read score=null under the re-added column — name-based mapping
    would silently serve the dropped column's old values."""
    t = _mk(spark, tmp_path)
    t.drop_columns(["score"])
    t.add_columns([("score", "int")])
    got = {r["id"]: r["score"] for r in t.read(spark).collect()}
    assert all(v is None for v in got.values()), got
    # a merge after the re-add writes REAL values; untouched old-file rows
    # stay null
    t.merge(
        spark,
        _changes(spark, [(3, "v3b", 99, "upsert", [])],
                 "id int, name string, score int, _op string, "
                 "_toast array<string>"),
        applied_lsn=10,
    )
    got = {r["id"]: (r["name"], r["score"]) for r in t.read(spark).collect()}
    assert got[3] == ("v3b", 99)
    others = [v for k, v in got.items() if k != 3]
    assert all(s is None for _, s in others), got
    # the fence persists across merges (snapshot carry)
    t.merge(
        spark,
        _changes(spark, [(5, "v5b", 55, "upsert", [])],
                 "id int, name string, score int, _op string, "
                 "_toast array<string>"),
        applied_lsn=11,
    )
    got = {r["id"]: r["score"] for r in t.read(spark).collect()}
    assert got[3] == 99 and got[5] == 55
    assert got[0] is None and got[7] is None


def test_rename_then_readd_old_name(spark, tmp_path):
    """RENAME name→label, then ADD a fresh column 'name': old files keep
    serving their values under 'label' (the alias chain survives), while
    the new 'name' column reads null from them."""
    t = _mk(spark, tmp_path)
    t.rename_column("name", "label")
    t.add_columns([("name", "string")])
    rows = {r["id"]: (r["label"], r["name"]) for r in t.read(spark).collect()}
    for i in range(8):
        assert rows[i] == (f"v{i}", None), rows[i]
    # post-re-add merge: both columns carry real, distinct values
    t.merge(
        spark,
        _changes(spark, [(2, "L2", "N2", 20, "upsert", [])],
                 "id int, label string, name string, score int, _op string, "
                 "_toast array<string>"),
        applied_lsn=10,
    )
    rows = {r["id"]: (r["label"], r["name"]) for r in t.read(spark).collect()}
    assert rows[2] == ("L2", "N2")
    assert rows[5] == ("v5", None)


def test_null_key_changes_quarantined(spark, tmp_path):
    """A change row with a null key (e.g. a wire-text key that failed the
    lake-type cast) must not reach the merge join: the upsert would insert
    an unmatchable row and the delete would silently no-op."""
    t = _mk(spark, tmp_path)
    rec = t.merge(
        spark,
        _changes(
            spark,
            [(None, "ghost", 1, "upsert", []),
             (None, None, None, "delete", []),
             (4, "v4b", 44, "upsert", [])],
            "id int, name string, score int, _op string, _toast array<string>",
        ),
        applied_lsn=10,
    )
    assert rec["null_key_quarantined"] == 2
    assert rec["upserts"] == 1 and rec["deletes"] == 0
    rows = t.read(spark).collect()
    assert all(r["id"] is not None for r in rows)
    assert {r["name"] for r in rows if r["id"] == 4} == {"v4b"}
    assert len(rows) == 8


def test_plain_read_unchanged_without_fences(spark, tmp_path):
    """No drops/renames → single-group read, values intact (regression
    guard for the read() refactor)."""
    t = _mk(spark, tmp_path)
    got = sorted((r["id"], r["name"], r["score"])
                 for r in t.read(spark).collect())
    assert got == [(i, f"v{i}", i * 10) for i in range(8)]
    assert t.read(spark, buckets=[0, 1, 2, 3]).count() == 8
