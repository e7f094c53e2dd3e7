"""Online bucket-count change (LakeTable.rebucket).

n_buckets is the unit of merge parallelism AND the kernel merge's
copy-on-write memory bound; merge_bucketed's oversized-bucket guard stamps
`kernel_reroute` lineage as the re-bucket signal, and rebucket is the
operation that answers it. The rewrite reads through the CURRENT schema,
so it also compacts away rename/column_since history — re-enabling the
Arrow kernel merge path for tables that had accumulated renames.
"""

from __future__ import annotations

import glob
import os

import pytest

from pg_walstream_spark.lake.merge_kernel import bucketed_merge_eligible
from pg_walstream_spark.lake.table import LakeTable
from pg_walstream_spark.operators.compact import compact_changes, dml_images

from test_merge_kernel import DATA_COLS, KEY_COLS, _base_df, _events_df, _state

KT = {"k1": "string", "k2": "string"}


def _mk_table(spark, path, n_buckets=8, n_rows=120):
    t = LakeTable.create(spark, str(path), _base_df(spark, n_rows),
                         KEY_COLS, n_buckets=n_buckets)
    rows = [("update", 2000 + j, j, {"k1": str(j), "k2": "a" if j % 2 else "b"},
             {"k1": str(j), "k2": "a" if j % 2 else "b",
              "v_str": f"upd{j}", "v_num": str(j)}, None)
            for j in range(40)]
    images = dml_images(_events_df(spark, rows), KEY_COLS, DATA_COLS,
                        key_types=KT)
    t.merge_bucketed(spark, images, applied_lsn=2999, batch_id="seed")
    return t


def test_rebucket_up_and_down_preserves_state(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "t", n_buckets=8)
    before = _state(spark, t)
    v0 = t._current_version()

    rec = t.rebucket(spark, 32, reason="growth")
    assert rec["from"] == 8 and rec["to"] == 32
    assert rec["rows"] == len(before)
    snap = t.snapshot()
    assert snap["n_buckets"] == 32
    assert t._current_version() == v0 + 1
    # every file group keys a bucket id < 32, and per-bucket reads
    # partition the table (pruned reads stay correct at the new count)
    bids = sorted(int(b) for b in snap["files"])
    assert bids and all(0 <= b < 32 for b in bids)
    assert _state(spark, t) == before
    n_pruned = sum(t.read(spark, buckets=[b]).count() for b in bids)
    assert n_pruned == len(before)

    rec2 = t.rebucket(spark, 4)
    assert rec2["to"] == 4 and rec2["rows"] == len(before)
    assert t.snapshot()["n_buckets"] == 4
    assert _state(spark, t) == before
    # lineage carries both events
    events = [r.get("event") for r in t.snapshot()["lineage"]]
    assert events.count("rebucket") == 2


def test_rebucket_same_count_is_skipped_without_history(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "t", n_buckets=8)
    v0 = t._current_version()
    rec = t.rebucket(spark, 8)
    assert rec["skipped"] is True
    assert t._current_version() == v0


def test_rebucket_preserves_fence_and_merges_continue(spark, tmp_path):
    """applied_lsn carries over: a replayed (duplicate) batch is still
    fenced off after the rebucket, and the next batch merges normally on
    the new bucket layout — via BOTH merge paths."""
    t = _mk_table(spark, tmp_path / "t", n_buckets=8)
    assert t.applied_lsn() == 2999
    t.rebucket(spark, 16)
    assert t.applied_lsn() == 2999

    dup = dml_images(_events_df(spark, [
        ("update", 2500, 1, {"k1": "1", "k2": "a"},
         {"k1": "1", "k2": "a", "v_str": "stale", "v_num": "0"}, None)]),
        KEY_COLS, DATA_COLS, key_types=KT)
    rec = t.merge_bucketed(spark, dup, applied_lsn=2500, batch_id="dup")
    assert rec.get("skipped") is True

    rows = [("insert", 4000 + j, j, None,
             {"k1": f"n{j}", "k2": "z", "v_str": "new", "v_num": str(j)},
             None) for j in range(12)]
    ev = _events_df(spark, rows)
    t.merge_bucketed(spark, dml_images(ev, KEY_COLS, DATA_COLS,
                                       key_types=KT),
                     applied_lsn=4999, batch_id="post-k")
    t2 = _mk_table(spark, tmp_path / "t2", n_buckets=8)
    t2.rebucket(spark, 16)
    t2.merge(spark, compact_changes(ev, KEY_COLS, DATA_COLS, key_types=KT),
             applied_lsn=4999, batch_id="post-g")
    got = _state(spark, t)
    assert got == _state(spark, t2)
    assert sum(1 for r in got if r[1] == "z") == 12


def test_rebucket_clears_history_and_reenables_kernel(spark, tmp_path):
    """A renamed column forces the general read path (alias coalesce) and
    disqualifies the kernel merge. Rebucketing at the SAME count is a
    history-compaction rewrite: files re-carry the live schema, aliases
    clear, the kernel path is eligible again, values identical."""
    t = _mk_table(spark, tmp_path / "t", n_buckets=8)
    before = _state(spark, t)
    t.rename_column("v_str", "v_text")
    assert not bucketed_merge_eligible(t.snapshot())

    rec = t.rebucket(spark, 8)
    assert rec.get("skipped") is None and rec["history_cleared"] is True
    snap = t.snapshot()
    assert not snap.get("aliases") and not snap.get("column_since")
    assert bucketed_merge_eligible(snap)
    assert [n for n, _ in snap["schema"]] == ["k1", "k2", "v_text", "v_num"]
    assert _state(spark, t) == before  # values identical under the new name


def test_rebucket_row_conservation_guard(spark, tmp_path, monkeypatch):
    """A read path that loses rows must abort the rewrite: footer-stats
    row count is the independent anchor. CURRENT and the table state stay
    untouched and the abandoned files are discarded."""
    t = _mk_table(spark, tmp_path / "t", n_buckets=8)
    before = _state(spark, t)
    v0 = t._current_version()
    real_read = LakeTable.read

    def lossy_read(self, spark_, buckets=None):
        return real_read(self, spark_, buckets=buckets).limit(
            len(before) - 1)

    monkeypatch.setattr(LakeTable, "read", lossy_read)
    with pytest.raises(RuntimeError, match="row-conservation"):
        t.rebucket(spark, 16)
    monkeypatch.setattr(LakeTable, "read", real_read)
    assert t._current_version() == v0
    assert t.snapshot()["n_buckets"] == 8
    assert _state(spark, t) == before
    assert not glob.glob(os.path.join(t.data_dir, f"s{v0 + 1}-*"))


def test_rebucket_empty_table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"),
                         _base_df(spark, 0), KEY_COLS, n_buckets=8)
    rec = t.rebucket(spark, 32)
    assert rec["rows"] == 0 and t.snapshot()["n_buckets"] == 32
    assert t.read(spark).count() == 0


def test_rebucket_then_expire_drops_old_layout(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "t", n_buckets=8)
    before = _state(spark, t)
    t.rebucket(spark, 16)
    stats = t.expire_snapshots(keep_last=1)
    assert stats["files_deleted"] > 0
    assert _state(spark, t) == before


def test_rebucket_cli_verb(spark, tmp_path):
    from pg_walstream_spark.cli import main as cli_main

    root = tmp_path / "wh" / "tables" / "repos"
    os.makedirs(root.parent, exist_ok=True)
    t = _mk_table(spark, root, n_buckets=8)
    before = _state(spark, t)
    rc = cli_main(["rebucket", "--warehouse", str(tmp_path / "wh"),
                   "--table", "repos", "--buckets", "32"])
    assert rc == 0
    assert t.snapshot()["n_buckets"] == 32
    assert _state(spark, t) == before
    assert cli_main(["rebucket", "--warehouse", str(tmp_path / "wh"),
                     "--table", "nope", "--buckets", "4"]) == 1


def _engine_fixture(tmp_path, n_txns=6):
    from pg_walstream_spark.fixtures import wal_gen as wg

    base, b = wg.gen_basic(n_base=60, n_txns=n_txns, ops_per_txn=8, seed=5)
    frames = b.to_table()
    fd = os.path.join(str(tmp_path), "frames")
    wg.write_frames(frames, fd, rows_per_file=500_000)
    bp = os.path.join(str(tmp_path), "base.parquet")
    wg.write_base(base, bp)
    return base, frames, fd, bp


def test_engine_auto_rebucket_answers_kernel_reroute(spark, tmp_path,
                                                     monkeypatch):
    """A fast-path merge that reroutes past the oversized-bucket cap must
    be ANSWERED: the engine rebuckets the table inline (doubling until the
    worst bucket fits half the cap, bounded by AUTO_REBUCKET_MAX), records
    it in lineage + engine state, and the replayed state stays golden. A
    second reroute inside the cooldown window must NOT rewrite again."""
    import pg_walstream_spark.engine as E
    from pg_walstream_spark.golden import golden_final_state

    monkeypatch.setattr(E, "FASTPATH_MIN_DML", 10)
    monkeypatch.setenv("WALSTREAM_FASTPATH", "1")
    monkeypatch.setenv("WALSTREAM_KERNEL_MAX_BUCKET_BYTES", "1")
    monkeypatch.setenv("WALSTREAM_AUTO_REBUCKET_MAX", "32")
    base, frames, fd, bp = _engine_fixture(tmp_path)

    eng = E.ReplayEngine(spark, os.path.join(str(tmp_path), "wh"))
    eng.bootstrap_table("repos", spark.read.parquet(bp), ["repo", "path"], 8)
    res = eng.replay_frames(fd)

    t = eng.table("repos")
    snap = t.snapshot()
    assert snap["n_buckets"] == 32  # 8 doubled until capped by MAX=32
    lin = snap["lineage"]
    rb = [r for r in lin if r.get("event") == "rebucket"]
    assert len(rb) == 1 and rb[0]["reason"].startswith("auto:kernel_reroute")
    assert any(r.get("kernel_reroute") for r in lin)
    recs = [tr for r in res["records"] for tr in r.get("tables", ())]
    assert sum(1 for tr in recs if tr.get("auto_rebucket")) == 1
    st = eng._load_state()
    rb_batch = (st.get("rebucket_at") or {}).get("repos")
    assert rb_batch is not None

    # cooldown: a reroute within the window is NOT answered again
    trec = {"table": "repos", "kernel_reroute": {"max_bucket_bytes": 1}}
    eng._maybe_rebucket(st, rb_batch + 1, trec)
    assert "auto_rebucket" not in trec
    assert t.snapshot()["n_buckets"] == 32
    # past the window (and with MAX raised) it answers again
    monkeypatch.setenv("WALSTREAM_AUTO_REBUCKET_MAX", "64")
    eng._maybe_rebucket(st, rb_batch + 8, trec)
    assert trec["auto_rebucket"]["from"] == 32
    assert trec["auto_rebucket"]["to"] == 64
    assert t.snapshot()["n_buckets"] == 64

    got = sorted((r["repo"], r["path"], r["content"])
                 for r in t.read(spark).collect())
    grows, glsn = golden_final_state({"repos": base}, frames, "repos")
    assert got == sorted((r["repo"], r["path"], r["content"])
                         for r in grows)
    assert t.applied_lsn() == glsn


def test_engine_auto_rebucket_disabled_by_env(spark, tmp_path, monkeypatch):
    import pg_walstream_spark.engine as E

    monkeypatch.setattr(E, "FASTPATH_MIN_DML", 10)
    monkeypatch.setenv("WALSTREAM_FASTPATH", "1")
    monkeypatch.setenv("WALSTREAM_KERNEL_MAX_BUCKET_BYTES", "1")
    monkeypatch.setenv("WALSTREAM_AUTO_REBUCKET", "0")
    base, frames, fd, bp = _engine_fixture(tmp_path, n_txns=3)

    eng = E.ReplayEngine(spark, os.path.join(str(tmp_path), "wh"))
    eng.bootstrap_table("repos", spark.read.parquet(bp), ["repo", "path"], 8)
    eng.replay_frames(fd)
    snap = eng.table("repos").snapshot()
    assert snap["n_buckets"] == 8
    assert not [r for r in snap["lineage"] if r.get("event") == "rebucket"]
    assert any(r.get("kernel_reroute") for r in snap["lineage"])


def test_engine_auto_rebucket_failure_never_fails_batch(spark, tmp_path,
                                                        monkeypatch):
    """rebucket raising (e.g. a transient executor loss mid-rewrite) must
    not fail the batch — the merge already committed; the event lands in
    the table event log and the stream continues."""
    import pg_walstream_spark.engine as E
    from pg_walstream_spark.golden import golden_final_state
    from pg_walstream_spark.lake.table import LakeTable

    monkeypatch.setattr(E, "FASTPATH_MIN_DML", 10)
    monkeypatch.setenv("WALSTREAM_FASTPATH", "1")
    monkeypatch.setenv("WALSTREAM_KERNEL_MAX_BUCKET_BYTES", "1")
    base, frames, fd, bp = _engine_fixture(tmp_path, n_txns=3)

    def boom(self, spark_, n, reason=None):
        raise RuntimeError("synthetic rebucket failure")

    monkeypatch.setattr(LakeTable, "rebucket", boom)
    eng = E.ReplayEngine(spark, os.path.join(str(tmp_path), "wh"))
    eng.bootstrap_table("repos", spark.read.parquet(bp), ["repo", "path"], 8)
    eng.replay_frames(fd)

    t = eng.table("repos")
    assert t.snapshot()["n_buckets"] == 8
    got = sorted((r["repo"], r["path"], r["content"])
                 for r in t.read(spark).collect())
    grows, _ = golden_final_state({"repos": base}, frames, "repos")
    assert got == sorted((r["repo"], r["path"], r["content"]) for r in grows)
    events = [e.get("event") for e in t.snapshot()["lineage"]]
    assert "auto_rebucket_failed" in events
