"""Round-4 state hygiene: append-delta pending store + bounded state growth.

engine_state.json and lake snapshots are re-read/rewritten EVERY batch, so
both must stay O(1) in batch count (at 10^6 batches an unbounded metrics or
lineage log becomes a per-batch driver-serial cost — exactly the tail the
north rule's scaling-efficiency target measures). The pending store likewise
must append per-batch deltas instead of rewriting the full pending set
(reference analog: the consumer's per-xid buffer grows incrementally,
examples/safe-transaction-consumer/src/main.rs:50-60).
"""

from __future__ import annotations

import json
import os

from pg_walstream_spark.engine import (
    METRICS_CAP,
    ReplayEngine,
    _append_metrics,
)
from pg_walstream_spark.fixtures import wal_gen as wg
from pg_walstream_spark.golden import golden_final_state
from pg_walstream_spark.lake.table import LINEAGE_CAP, _append_lineage


def _replay_with_meta_trace(spark, tmp_path, base, frames, batch_frames):
    """Replay while snapshotting the pending-store meta after each batch."""
    fd = os.path.join(str(tmp_path), "frames")
    wg.write_frames(frames, fd, rows_per_file=500_000)
    metas = []

    class Spy(ReplayEngine):
        def _save_state(self, st):
            metas.append(self._pending_meta())
            super()._save_state(st)

    eng = Spy(spark, os.path.join(str(tmp_path), "wh"))
    bp = os.path.join(str(tmp_path), "base.parquet")
    wg.write_base(base, bp)
    eng.bootstrap_table("repos", spark.read.parquet(bp), ["repo", "path"], 8)
    eng.replay_frames(fd, batch_frames=batch_frames)
    return eng, metas


def _assert_golden(spark, eng, base, frames):
    golden_rows, glsn = golden_final_state({"repos": base}, frames, "repos")
    lake = eng.table("repos")
    got = sorted(
        (r["repo"], r["path"], r["content"])
        for r in lake.read(spark).collect()
    )
    want = sorted((r["repo"], r["path"], r["content"]) for r in golden_rows)
    assert got == want
    assert lake.applied_lsn() == glsn


def test_pending_store_append_delta_lifecycle(spark, tmp_path):
    """Txns split by micro-batch boundaries spill ONE delta per batch;
    deltas whose xids resolve are dropped promptly; the store clears
    entirely once nothing is pending — and the final state still matches
    the sequential golden applier."""
    base, b = wg.gen_basic(n_base=40, n_txns=6, ops_per_txn=12)
    frames = b.to_table()
    eng, metas = _replay_with_meta_trace(spark, tmp_path, base, frames,
                                         batch_frames=10)
    live = [m for m in metas if m and m["order"]]
    assert live, "no batch carried pending deltas — fixture too coarse"
    # txns resolve within a batch or two of opening, so resolved deltas
    # must be dropped instead of accumulating
    assert max(len(m["order"]) for m in live) <= 3, live
    assert eng._pending_meta() is None  # store cleared at drain
    assert not os.path.exists(eng.pending_dir)
    _assert_golden(spark, eng, base, frames)


def test_pending_store_compacts_past_delta_cap(spark, tmp_path):
    """A transaction held open across many micro-batches appends one delta
    per batch; past PENDING_COMPACT_DELTAS the store compacts into a single
    filtered delta instead of growing without bound."""
    base, b = wg.gen_basic(n_base=30, n_txns=2, ops_per_txn=120)
    frames = b.to_table()
    eng, metas = _replay_with_meta_trace(spark, tmp_path, base, frames,
                                         batch_frames=12)
    live = [m for m in metas if m and m["order"]]
    assert any(
        d.startswith("compact_") for m in live for d in m["order"]
    ), "delta cap never triggered compaction"
    cap = ReplayEngine.PENDING_COMPACT_DELTAS
    assert max(len(m["order"]) for m in live) <= cap + 1
    assert eng._pending_meta() is None
    _assert_golden(spark, eng, base, frames)


def test_metrics_and_lineage_bounded_at_1000_batches():
    """1,000 batches: the engine metrics list and a lake lineage log stay
    capped, with rolled-up aggregate counters preserving the totals."""
    st: dict = {}
    for i in range(1000):
        _append_metrics(st, {"batch_idx": i, "applied_lsn": i * 10,
                             "pending": 0, "quarantined": i % 3})
    assert len(st["metrics"]) == METRICS_CAP
    assert st["metrics_rollup"]["batches"] == 1000 - METRICS_CAP
    kept_q = sum(m["quarantined"] for m in st["metrics"])
    assert st["metrics_rollup"]["quarantined"] + kept_q == sum(
        i % 3 for i in range(1000)
    )
    assert len(json.dumps(st)) < 64_000  # bounded regardless of batch count

    lin: list = []
    for i in range(1000):
        lin = _append_lineage(lin, {"batch_id": f"b{i}", "applied_lsn": i,
                                    "upserts": 5, "deletes": 1,
                                    "wall_ms": 7, "skipped": False})
    assert len(lin) == LINEAGE_CAP + 1  # rollup head + last N records
    roll = lin[0]
    assert roll["event"] == "lineage_rollup"
    assert roll["merges"] == 1000 - LINEAGE_CAP
    assert roll["upserts"] == 5 * (1000 - LINEAGE_CAP)
    assert lin[-1]["batch_id"] == "b999"
    assert len(json.dumps(lin)) < 128_000


def test_fast_path_merge_matches_general_path_and_golden(spark, tmp_path,
                                                         monkeypatch):
    """The speculative one-job fast path (complete-txn single-table batch)
    must land byte-identical lake state and fence as the general cached
    path and the sequential golden applier."""
    import pg_walstream_spark.engine as E

    monkeypatch.setattr(E, "FASTPATH_MIN_DML", 10)
    base, b = wg.gen_basic(n_base=50, n_txns=8, ops_per_txn=6)
    frames = b.to_table()
    fd = os.path.join(str(tmp_path), "frames")
    wg.write_frames(frames, fd, rows_per_file=500_000)
    bp = os.path.join(str(tmp_path), "base.parquet")
    wg.write_base(base, bp)

    def run(flag):
        monkeypatch.setenv("WALSTREAM_FASTPATH", flag)
        wh = os.path.join(str(tmp_path), f"wh_{flag}")
        eng = E.ReplayEngine(spark, wh)
        eng.bootstrap_table("repos", spark.read.parquet(bp),
                            ["repo", "path"], 8)
        res = eng.replay_frames(fd, batch_frames=100_000)
        lake = eng.table("repos")
        rows = sorted((r["repo"], r["path"], r["content"])
                      for r in lake.read(spark).collect())
        return res["records"][0], rows, lake.applied_lsn()

    rec_fast, rows_fast, lsn_fast = run("1")
    rec_gen, rows_gen, lsn_gen = run("0")
    assert rec_fast.get("fast_path") is True
    assert "fast_path" not in rec_gen
    assert rows_fast == rows_gen and lsn_fast == lsn_gen
    golden_rows, glsn = golden_final_state({"repos": base}, frames, "repos")
    want = sorted((r["repo"], r["path"], r["content"])
                  for r in golden_rows)
    assert rows_fast == want and lsn_fast == glsn


def test_fast_path_speculation_discards_on_truncate(spark, tmp_path,
                                                    monkeypatch):
    """A truncate inside an otherwise fast-eligible batch is only visible
    AFTER decode: the fast path must observe it, discard the written
    files without committing, and the general-path fallback must land the
    exact golden state (exactly-once preserved by the untouched fence)."""
    import pg_walstream_spark.engine as E

    monkeypatch.setattr(E, "FASTPATH_MIN_DML", 10)
    monkeypatch.setenv("WALSTREAM_FASTPATH", "1")
    base, b = wg.gen_truncate(n_base=40)
    frames = b.to_table()
    fd = os.path.join(str(tmp_path), "frames")
    wg.write_frames(frames, fd, rows_per_file=500_000)
    bp = os.path.join(str(tmp_path), "base.parquet")
    wg.write_base(base, bp)
    eng = E.ReplayEngine(spark, os.path.join(str(tmp_path), "wh"))
    eng.bootstrap_table("repos", spark.read.parquet(bp), ["repo", "path"], 8)
    res = eng.replay_frames(fd, batch_frames=100_000)
    rec = res["records"][0]
    assert "fast_path" not in rec  # fell back
    assert "fast_path_fallback" in rec["phase_ms"]  # ...after speculating
    _assert_golden(spark, eng, base, frames)
    # the discarded speculative write left no file referenced by the
    # committed snapshot pointing at a nonexistent path
    lake = eng.table("repos")
    for fl in lake.snapshot()["files"].values():
        for f in fl:
            assert os.path.exists(lake._abs(f))


def test_fast_path_duplicate_batch_fence_skip_no_deadlock(spark, tmp_path,
                                                          monkeypatch):
    """Fresh engine state over an already-applied lake: the fast path's
    merge is skipped by the TABLE fence without running any Spark job —
    the batch observation must then not be read (obs.get on a never-run
    plan blocks forever; the original hang). Since no job verified the
    speculative shape, the fast path must FALL BACK to the general path
    (not commit state on unverified assumptions) and the replay must stay
    idempotent."""
    import pg_walstream_spark.engine as E

    monkeypatch.setattr(E, "FASTPATH_MIN_DML", 10)
    monkeypatch.setenv("WALSTREAM_FASTPATH", "1")
    base, b = wg.gen_basic(n_base=40, n_txns=5, ops_per_txn=5)
    frames = b.to_table()
    fd = os.path.join(str(tmp_path), "frames")
    wg.write_frames(frames, fd, rows_per_file=500_000)
    bp = os.path.join(str(tmp_path), "base.parquet")
    wg.write_base(base, bp)
    wh = os.path.join(str(tmp_path), "wh")
    eng = E.ReplayEngine(spark, wh)
    eng.bootstrap_table("repos", spark.read.parquet(bp), ["repo", "path"], 8)
    res1 = eng.replay_frames(fd, batch_frames=100_000)
    assert res1["records"][0].get("fast_path") is True
    lsn1 = eng.table("repos").applied_lsn()
    os.remove(eng.state_path)  # engine state lost; the lake fence survives
    eng2 = E.ReplayEngine(spark, wh)
    res2 = eng2.replay_frames(fd, batch_frames=100_000)  # hung before fix
    rec = res2["records"][0]
    assert "fast_path" not in rec  # fence skip ⇒ unverified ⇒ fell back
    assert "fast_path_fallback" in rec["phase_ms"]
    assert rec["tables"] == [] or rec["tables"][0].get("skipped")
    assert eng2.table("repos").applied_lsn() == lsn1
    _assert_golden(spark, eng2, base, frames)


def test_fast_path_materializes_no_cache(spark, tmp_path, monkeypatch):
    """The point of the fused fast path is eliminating the full-batch
    events-cache materialization: a fast-path replay must complete without
    a single DataFrame.persist call."""
    from pyspark.sql import DataFrame

    import pg_walstream_spark.engine as E

    monkeypatch.setattr(E, "FASTPATH_MIN_DML", 10)
    monkeypatch.setenv("WALSTREAM_FASTPATH", "1")
    calls = []
    orig = DataFrame.persist

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(DataFrame, "persist", spy)
    base, b = wg.gen_basic(n_base=40, n_txns=5, ops_per_txn=5)
    frames = b.to_table()
    fd = os.path.join(str(tmp_path), "frames")
    wg.write_frames(frames, fd, rows_per_file=500_000)
    bp = os.path.join(str(tmp_path), "base.parquet")
    wg.write_base(base, bp)
    eng = E.ReplayEngine(spark, os.path.join(str(tmp_path), "wh"))
    eng.bootstrap_table("repos", spark.read.parquet(bp), ["repo", "path"], 8)
    res = eng.replay_frames(fd, batch_frames=100_000)
    assert res["records"][0].get("fast_path") is True
    assert not calls, f"fast path persisted {len(calls)} DataFrame(s)"
    _assert_golden(spark, eng, base, frames)


def test_append_metrics_replaces_same_batch_on_retry():
    """An in-place batch retry re-enters with the same in-memory state;
    its metrics row must replace, not duplicate, the prior attempt."""
    st: dict = {}
    row = {"batch_idx": 7, "applied_lsn": 5, "pending": 0, "quarantined": 2}
    _append_metrics(st, row)
    _append_metrics(st, row)
    assert len(st["metrics"]) == 1


def test_pending_store_replace_never_deletes_referenced_delta(
        spark, tmp_path, monkeypatch):
    """In-place batch retry / stop-resume replaces a batch's delta: the
    replacement must be written under a FRESH dir name while the committed
    meta.json still references the old one — a kill between the write and
    the meta commit must leave the store loadable (ADVICE r4: overwrite of
    the referenced dir deletes it first, bricking every restart)."""
    import pytest
    from pyspark.sql import functions as F

    import pg_walstream_spark.engine as E

    eng = E.ReplayEngine(spark, os.path.join(str(tmp_path), "wh"))
    empty = spark.createDataFrame([], E.EVENT_SPARK_DDL)
    row = spark.range(1).select(*[
        (F.lit(7) if f.name == "xid" else F.lit(None)).cast(f.dataType)
        .alias(f.name)
        for f in empty.schema.fields
    ])
    eng._pending_append(row, {7}, set(), batch_idx=3)
    meta1 = eng._pending_meta()
    (d1,) = meta1["order"]

    orig = E._atomic_write

    def boom(path, data):
        raise OSError("killed before meta commit")

    monkeypatch.setattr(E, "_atomic_write", boom)
    with pytest.raises(OSError):
        eng._pending_append(row, {7}, set(), batch_idx=3)  # retry, killed
    monkeypatch.setattr(E, "_atomic_write", orig)
    # committed meta survives AND the dir it references still exists
    assert eng._pending_meta() == meta1
    assert os.path.isdir(os.path.join(eng.pending_dir, d1))
    assert eng._load_pending().count() == 1  # store loads fine
    # a successful retry lands a fresh dir and sweeps the old one
    eng._pending_append(row, {7}, set(), batch_idx=3)
    meta2 = eng._pending_meta()
    (d2,) = meta2["order"]
    assert d2 != d1
    assert not os.path.isdir(os.path.join(eng.pending_dir, d1))
    assert eng._load_pending().count() == 1


def test_version_preflight_rejects_stale_state_dir(spark, tmp_path):
    """Opening a warehouse written by an incompatible engine-state version
    must fail LOUDLY at load (reference version_preflight.rs analog) — the
    round-2 failure was a stale pending dir surfacing as an unreadable-
    parquet crash mid-replay instead."""
    import json

    import pytest

    import pg_walstream_spark.engine as E

    wh = os.path.join(str(tmp_path), "wh")
    eng = E.ReplayEngine(spark, wh)
    eng._save_state(eng._load_state())
    st = json.load(open(eng.state_path))
    assert st["state_version"] == E.ENGINE_STATE_VERSION

    # older version stamp -> loud preflight error naming both versions
    st["state_version"] = E.ENGINE_STATE_VERSION - 1
    E._atomic_write(eng.state_path, json.dumps(st))
    with pytest.raises(E.StateVersionError, match="state version"):
        E.ReplayEngine(spark, wh)._load_state()

    # pre-versioning (missing stamp) state with a compatible layout is the
    # v3 layout minus the stamp: accepted and stamped on load (a round-4
    # warehouse must not be refused)
    del st["state_version"]
    E._atomic_write(eng.state_path, json.dumps(st))
    st2 = E.ReplayEngine(spark, wh)._load_state()
    assert st2["state_version"] == E.ENGINE_STATE_VERSION

    # ...but a missing stamp PLUS a genuinely older pending layout
    # (delta content without the append-delta meta.json manifest) is
    # rejected as version 0
    pend = os.path.join(wh, "pending")
    os.makedirs(os.path.join(pend, "delta-000"), exist_ok=True)
    with open(os.path.join(pend, "delta-000", "part-0.parquet"), "wb") as f:
        f.write(b"PAR1")
    with pytest.raises(E.StateVersionError, match="version 0"):
        E.ReplayEngine(spark, wh)._load_state()
