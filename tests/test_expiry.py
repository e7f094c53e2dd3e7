"""Snapshot expiry: bounded retention is what lets the engine run
indefinitely — without it every MERGE leaves the superseded bucket files
on disk forever (Iceberg expire_snapshots / Delta VACUUM analog)."""

from __future__ import annotations

import glob
import os

from pg_walstream_spark.engine import ReplayEngine
from pg_walstream_spark.fixtures import wal_gen as wg
from pg_walstream_spark.golden import golden_final_state
from pg_walstream_spark.lake.table import LakeTable

from test_merge_kernel import (
    DATA_COLS, KEY_COLS, _base_df, _events_df, _state,
)
from pg_walstream_spark.operators.compact import dml_images

KT = {"k1": "string", "k2": "string"}


def _merge_round(spark, t, i):
    rows = [("update", 1000 * (i + 1) + j, j,
             {"k1": str(j % 40), "k2": "a"},
             {"k1": str(j % 40), "k2": "a", "v_str": f"r{i}-{j}",
              "v_num": str(i * 100 + j)}, None)
            for j in range(60)]
    ev = _events_df(spark, rows)
    images = dml_images(ev, KEY_COLS, DATA_COLS, key_types=KT)
    t.merge_bucketed(spark, images, applied_lsn=1000 * (i + 1) + 999,
                     batch_id=f"b{i}")


def _disk_files(t):
    return {p for p in glob.glob(os.path.join(t.data_dir, "**", "*"),
                                 recursive=True) if os.path.isfile(p)}


def test_expire_snapshots_bounds_disk_preserves_reads(spark, tmp_path):
    base = _base_df(spark, 120)
    t = LakeTable.create(spark, str(tmp_path / "t"), base, KEY_COLS,
                         n_buckets=8)
    for i in range(7):
        _merge_round(spark, t, i)
    before_state = _state(spark, t)
    before_files = _disk_files(t)
    cur = t._current_version()

    stats = t.expire_snapshots(keep_last=3)

    assert stats["files_deleted"] > 0 and stats["bytes_deleted"] > 0
    assert stats["snapshots_deleted"] > 0
    assert stats["expired_before_version"] == cur - 2
    # every file referenced by a KEPT snapshot survives; the read is
    # byte-identical
    live = set()
    for snap in t.history():
        for fl in snap["files"].values():
            live.update(t._abs(f) for f in fl)
    after_files = _disk_files(t)
    assert live <= after_files
    assert after_files < before_files
    assert _state(spark, t) == before_state
    # kept metadata = exactly the last 3 versions, CURRENT unchanged
    vs = sorted(int(os.path.basename(p)[1:-5])
                for p in glob.glob(os.path.join(t.meta_dir, "v*.json")))
    assert vs == [cur - 2, cur - 1, cur]
    assert t._current_version() == cur
    # idempotent: a second expiry deletes nothing more
    stats2 = t.expire_snapshots(keep_last=3)
    assert stats2["files_deleted"] == 0
    assert stats2["snapshots_deleted"] == 0


def test_expire_keeps_shared_and_inflight_files(spark, tmp_path):
    """A bucket untouched since v1 is still referenced by the newest
    snapshot — its v1 data file must survive even though v1's metadata is
    expired. Data dirs NEWER than CURRENT (an in-flight merge's
    pre-commit write) are never touched."""
    base = _base_df(spark, 120)
    t = LakeTable.create(spark, str(tmp_path / "t"), base, KEY_COLS,
                         n_buckets=8)
    # touch only key "5" repeatedly: most buckets keep their v1 files
    for i in range(5):
        rows = [("update", 1000 * (i + 1), 0, {"k1": "5", "k2": "a"},
                 {"k1": "5", "k2": "a", "v_str": f"v{i}",
                  "v_num": str(i)}, None)]
        ev = _events_df(spark, rows)
        images = dml_images(ev, KEY_COLS, DATA_COLS, key_types=KT)
        t.merge_bucketed(spark, images, applied_lsn=1000 * (i + 1),
                         batch_id=f"b{i}")
    cur = t._current_version()
    inflight = os.path.join(t.data_dir, f"s{cur + 1}-deadbeef")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "pending.parquet"), "w") as f:
        f.write("x")
    before_state = _state(spark, t)

    t.expire_snapshots(keep_last=2)

    assert os.path.exists(os.path.join(inflight, "pending.parquet"))
    # shared v1 files referenced by the current snapshot survive
    snap = t.snapshot()
    for fl in snap["files"].values():
        for f in fl:
            assert os.path.exists(t._abs(f)), f
    assert _state(spark, t) == before_state


def test_engine_auto_expiry_bounds_warehouse(spark, tmp_path,
                                             monkeypatch):
    """Replay in several micro-batches with aggressive expiry settings:
    final state still equals golden and the warehouse holds only the
    retained snapshot window."""
    monkeypatch.setattr(ReplayEngine, "EXPIRE_EVERY", 2)
    monkeypatch.setattr(ReplayEngine, "EXPIRE_KEEP", 2)
    base, b = wg.gen_mixed_dml(n_base=60, n_txns=10, ops_per_txn=6)
    frames = b.to_table()
    frames_dir = os.path.join(str(tmp_path), "frames")
    wg.write_frames(frames, frames_dir, rows_per_file=20)
    wh = os.path.join(str(tmp_path), "wh")
    eng = ReplayEngine(spark, wh)
    bases = {"repos": base.slice(0, 30), "repos_full": base.slice(30)}
    for n, tb in bases.items():
        p = os.path.join(str(tmp_path), f"{n}.parquet")
        wg.write_base(tb, p)
        eng.bootstrap_table(n, spark.read.parquet(p), ["repo", "path"], 8)

    out = eng.replay_frames(frames_dir, batch_frames=20)
    assert out["batches"] >= 4

    for tname in ("repos", "repos_full"):
        golden_rows, glsn = golden_final_state(bases, frames, tname)
        t = eng.table(tname)
        got = sorted((r["repo"], r["path"], r["content"])
                     for r in t.read(spark).collect())
        assert got == sorted(
            (r["repo"], r["path"], r["content"]) for r in golden_rows)
        # retention bounded: metadata window ≤ KEEP + the few commits
        # made since the last expiry tick (incl. expiry's own log_event)
        n_meta = len(glob.glob(os.path.join(t.meta_dir, "v*.json")))
        assert n_meta <= ReplayEngine.EXPIRE_KEEP + 2 * ReplayEngine.EXPIRE_EVERY + 2
        # no unreferenced data files from expired versions linger beyond
        # the retained window
        live = set()
        for snap in t.history():
            for fl in snap["files"].values():
                live.update(t._abs(f) for f in fl)
        extra = {p for p in _disk_files(t)
                 if p.endswith(".parquet") and p not in live}
        assert len(extra) <= len(live)


def test_relocated_warehouse_reads_and_expires_safely(spark, tmp_path):
    """Move the warehouse directory after several merges: reads must keep
    working (snapshot paths are root-relative) and expiry at the NEW
    location must never delete files referenced by kept snapshots."""
    import shutil

    base = _base_df(spark, 100)
    t = LakeTable.create(spark, str(tmp_path / "orig"), base, KEY_COLS,
                         n_buckets=8)
    for i in range(5):
        _merge_round(spark, t, i)
    before_state = _state(spark, t)

    moved = str(tmp_path / "moved")
    shutil.move(str(tmp_path / "orig"), moved)
    t2 = LakeTable(moved)
    assert _state(spark, t2) == before_state

    stats = t2.expire_snapshots(keep_last=2)
    assert stats["files_deleted"] > 0
    # every file referenced by kept snapshots still exists and reads match
    for snap in t2.history():
        for fl in snap["files"].values():
            for f in fl:
                assert os.path.exists(t2._abs(f)), f
    assert _state(spark, t2) == before_state


def test_expire_with_sdir_shaped_warehouse_root(spark, tmp_path):
    """A warehouse ROOT containing an s-dir-shaped path component
    (``.../s3-ab/wh``) must not confuse live-set matching: walked absolute
    paths must key on the real (rightmost, whole-component) ``s{N}-{hex}``
    data dir, not on the root component — the leftmost-match bug deleted
    every file referenced by KEPT snapshots under such a root."""
    base = _base_df(spark, 80)
    root = str(tmp_path / "s3-ab" / "wh" / "t")
    t = LakeTable.create(spark, root, base, KEY_COLS, n_buckets=8)
    for i in range(4):
        _merge_round(spark, t, i)
    before_state = _state(spark, t)

    stats = t.expire_snapshots(keep_last=2)
    assert stats["files_deleted"] > 0  # old versions do get reclaimed
    # every file referenced by kept snapshots still exists; reads intact
    for snap in t.history():
        for fl in snap["files"].values():
            for f in fl:
                assert os.path.exists(t._abs(f)), f
    assert _state(spark, t) == before_state


def test_expire_via_different_root_spelling(spark, tmp_path):
    """Expire through a symlinked / non-canonical spelling of the root:
    live-set matching is path-suffix based, so a spelling difference
    between writer and expirer must not classify live files as dead."""
    base = _base_df(spark, 80)
    real = str(tmp_path / "real")
    t = LakeTable.create(spark, real, base, KEY_COLS, n_buckets=8)
    for i in range(4):
        _merge_round(spark, t, i)
    before_state = _state(spark, t)

    link = str(tmp_path / "link")
    os.symlink(real, link)
    t2 = LakeTable(link + os.sep + "." + os.sep)  # ugly but legal spelling
    stats = t2.expire_snapshots(keep_last=2)
    assert stats["files_deleted"] > 0
    assert _state(spark, LakeTable(real)) == before_state
    assert _state(spark, t2) == before_state
