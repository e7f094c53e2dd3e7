"""Fixture generator + golden applier sanity: every variant replays cleanly
and produces the expected state effects."""

from __future__ import annotations

from pg_walstream_spark.fixtures import wal_gen as wg
from pg_walstream_spark.golden import GoldenApplier, golden_final_state


def test_basic_inserts_grow_state():
    base, b = wg.gen_basic(n_base=50, n_txns=5, ops_per_txn=4)
    rows, applied = golden_final_state(base, b.to_table())
    assert len(rows) == 50 + 5 * 4
    assert applied == b.commit_lsns[-1]
    assert all(len(r["commit"]) == 40 for r in rows)
    assert all("content_sha256" in r for r in rows)


def test_mixed_dml_two_tables():
    base, b = wg.gen_mixed_dml(n_base=60, n_txns=8, ops_per_txn=6)
    half = 30
    bases = {"repos": base.slice(0, half), "repos_full": base.slice(half)}
    g = GoldenApplier({t: tbl.to_pylist() for t, tbl in bases.items()})
    g.apply_frames(b.to_table())
    assert g.applied_lsn == b.commit_lsns[-1]
    assert g.dropped_unknown_relation == 0
    n_d = len(g.final_rows("repos"))
    n_f = len(g.final_rows("repos_full"))
    assert n_d > 0 and n_f > 0
    # keys stay unique
    assert len({(r["repo"], r["path"]) for r in g.final_rows("repos")}) == n_d


def test_toast_carries_content_forward():
    base, b = wg.gen_toast(n_base=30, n_txns=4)
    rows, _ = golden_final_state(base, b.to_table())
    by_key = {(r["repo"], r["path"]): r for r in rows}
    orig = {(r["repo"], r["path"]): r for r in base.to_pylist()}
    assert len(rows) == 30  # updates only
    changed = 0
    for k, r in by_key.items():
        assert r["content"] == orig[k]["content"]  # TOAST 'u' carried forward
        if r["commit"] != orig[k]["commit"]:
            changed += 1
    assert changed > 0  # commits did change


def test_truncate_clears_then_refills():
    base, b = wg.gen_truncate(n_base=40)
    rows, _ = golden_final_state(base, b.to_table())
    # 40 base + 15 inserted → truncated → 10 inserted
    assert len(rows) == 10


def test_schema_evo_adds_column():
    base, b = wg.gen_schema_evo(n_base=20)
    g = GoldenApplier({"repos": base.to_pylist()})
    g.apply_frames(b.to_table())
    assert len(g.schema_changes) == 1
    new_cols = [c[1] for c in g.schema_changes[0]["new"]["columns"]]
    assert "stars" in new_cols
    rows = g.final_rows("repos")
    with_stars = [r for r in rows if r.get("stars") is not None]
    assert len(with_stars) == 8
    assert len(rows) == 20 + 16


def test_streaming_commit_applies_abort_discards():
    base, b = wg.gen_streaming(n_base=25)
    rows, applied = golden_final_state(base, b.to_table())
    assert len(rows) == 25 + 15  # xid_a's 3×5 inserts; xid_b's 12 discarded
    assert not any(r["repo"] == "orgB/doomed" for r in rows)
    assert applied == b.commit_lsns[-1]


def test_two_phase_commit_and_rollback():
    base, b = wg.gen_two_phase(n_base=20)
    rows, _ = golden_final_state(base, b.to_table())
    assert len(rows) == 20 + 6
    assert not any(r["repo"] == "orgR/rolled" for r in rows)


def test_malformed_frames_quarantined():
    base, b = wg.gen_malformed()
    g = GoldenApplier({"repos": base.to_pylist()})
    g.apply_frames(b.to_table())
    assert g.quarantined == 3
    # 3 inserts were emitted well-formed; the truncated one is quarantined,
    # leaving 2 applied
    assert len(g.final_rows("repos")) == 40 + 2


def test_bounded_replay_stops_at_commit_boundary():
    base, b = wg.gen_basic(n_base=30, n_txns=6, ops_per_txn=5)
    # stop strictly between txn 3's and txn 4's commits
    stop = b.commit_lsns[2] + 1
    rows, applied = golden_final_state(base, b.to_table(), stop_at_lsn=stop)
    # the crossing commit's transaction is delivered in full
    assert len(rows) == 30 + 4 * 5
    assert applied == b.commit_lsns[3]


def test_resume_fence_skips_applied_txns():
    base, b = wg.gen_basic(n_base=30, n_txns=6, ops_per_txn=5)
    fence = b.commit_lsns[3]
    g = GoldenApplier({"repos": base.to_pylist()})
    g.apply_frames(b.to_table(), start_after_lsn=fence)
    # only txns 5..6 applied; duplicates of 1..4 skipped → same count as if
    # they were applied once (inserts are idempotent on fresh keys, so the
    # check is: no double-apply of the remaining txns)
    g2 = GoldenApplier({"repos": base.to_pylist()})
    g2.apply_frames(b.to_table())
    assert g.applied_lsn == g2.applied_lsn


def test_bench_generator_scales():
    base, b = wg.gen_bench(n_base=500, n_txns=20, ops_per_txn=10)
    t = b.to_table()
    assert t.num_rows == 1 + 20 * (10 + 2)
    rows, _ = golden_final_state(base, t)
    assert len(rows) > 0
