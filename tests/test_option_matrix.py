"""Option-matrix e2e sweep (slot_matrix analog,
/root/reference/integration-tests/slot_matrix.rs): protocol_version x
streaming x messages x origin x two_phase driven through a COMPOSITE golden
replay per combination — each feature's frames appear only when the option
set enables them, and the final lake state must equal the closed-form
expectation for that combination. Individually these paths are covered by
dedicated tests; the matrix pins the COMBINATIONS (the reference found its
streaming+two_phase and origin+streaming interaction bugs exactly here).
"""

from __future__ import annotations

import os

import pytest

from pg_walstream_spark.engine import ReplayEngine
from pg_walstream_spark.fixtures import wal_gen as wg
from pg_walstream_spark.options import ReplicationOptions
from pg_walstream_spark.protocol import encoder as e

REPOS_OID = wg.REPOS_OID
COLS = wg.REPOS_COLUMNS


def _row(repo, path, content):
    return {"repo": repo, "path": path, "commit": "a" * 40,
            "lang": "python", "content": content}


def _matrix_fixture(opts: ReplicationOptions):
    """Composite WAL stream exercising every feature the option set
    enables. Returns (base_table, builder, expected_extra_keys) where
    expected_extra_keys = {(repo, path)} of rows that must be PRESENT in
    the final state beyond the base (committed inserts only; aborted /
    rolled-back / filtered-origin rows must be absent)."""
    base = wg.gen_repos_base(20, 42)
    b = wg.WalBuilder(42)
    b.relation(REPOS_OID, "repos", COLS)
    expected: set[tuple[str, str]] = set()

    # plain committed txn — always
    b.begin()
    for i in range(3):
        r = _row("orgP/plain", f"p{i}.py", f"plain{i}")
        b.emit(e.encode_insert(REPOS_OID, wg.row_tuple(r)))
        expected.add((r["repo"], r["path"]))
    b.commit()

    # a logical message frame (messages on/off must not affect table state)
    b.begin()
    b.emit(e.encode_message(0, b.lsn, "matrix", b"payload"))
    r = _row("orgP/msg", "m0.py", "with-message")
    b.emit(e.encode_insert(REPOS_OID, wg.row_tuple(r)))
    expected.add((r["repo"], r["path"]))
    b.commit()

    # foreign-origin txn — applied iff origin == 'any'
    b.begin()
    b.emit(e.encode_origin(b.lsn, "upstream_node"))
    for i in range(2):
        r = _row("orgF/foreign", f"f{i}.py", "foreign")
        b.emit(e.encode_insert(REPOS_OID, wg.row_tuple(r)))
        if opts.origin == "any":
            expected.add((r["repo"], r["path"]))
    b.commit()

    if opts.streaming != "off":
        # streamed commit (applied) + streamed abort (discarded)
        xa, xb = b.alloc_xid(), b.alloc_xid()
        for seg in range(2):
            b.emit(e.encode_stream_start(xa, seg == 0))
            r = _row("orgS/streamed", f"s{seg}.py", "streamed")
            b.emit(e.encode_insert(REPOS_OID, wg.row_tuple(r), xid=xa))
            expected.add((r["repo"], r["path"]))
            b.emit(e.encode_stream_stop())
            b.emit(e.encode_stream_start(xb, seg == 0))
            r2 = _row("orgS/doomed", f"d{seg}.py", "aborted")
            b.emit(e.encode_insert(REPOS_OID, wg.row_tuple(r2), xid=xb))
            b.emit(e.encode_stream_stop())
        cl = b.lsn
        b.emit(e.encode_stream_commit(xa, cl, cl + 42, b.seq * 1_000))
        b.commit_lsns.append(cl + 42)
        b.emit(e.encode_stream_abort(xb, xb))

    if opts.two_phase:
        # prepared-then-committed (applied) + prepared-then-rolled-back
        x1, x2 = b.alloc_xid(), b.alloc_xid()
        ts = b.seq * 1_000
        p1 = b.lsn
        b.emit(e.encode_begin_prepare(p1, p1 + 1, ts, x1, "gid-c"))
        r = _row("org2/prepared", "c0.py", "committed-2pc")
        b.emit(e.encode_insert(REPOS_OID, wg.row_tuple(r)))
        expected.add((r["repo"], r["path"]))
        b.emit(e.encode_prepare(p1, b.lsn + 30, b.seq * 1_000, x1, "gid-c"))
        p2 = b.lsn
        b.emit(e.encode_begin_prepare(p2, p2 + 1, b.seq * 1_000, x2,
                                      "gid-r"))
        r2 = _row("org2/rolled", "r0.py", "rolled-back-2pc")
        b.emit(e.encode_insert(REPOS_OID, wg.row_tuple(r2)))
        b.emit(e.encode_prepare(p2, b.lsn + 30, b.seq * 1_000, x2, "gid-r"))
        cl = b.lsn
        b.emit(e.encode_commit_prepared(cl, cl + 40, b.seq * 1_000, x1,
                                        "gid-c"))
        b.commit_lsns.append(cl + 40)
        b.emit(e.encode_rollback_prepared(p2, b.lsn + 20, ts, b.seq * 1_000,
                                          x2, "gid-r"))

    # trailing keepalive heartbeat — must be skipped without looking like
    # a seq gap at any protocol version
    b.keepalive()
    return base, b, expected


MATRIX = [
    # (protocol_version, streaming, messages, origin, two_phase)
    (1, "off", True, "any", False),
    (1, "off", False, "none", False),
    (2, "off", True, "none", False),
    (2, "on", True, "any", False),
    (2, "on", False, "none", False),
    (3, "on", True, "any", True),
    (4, "on", True, "none", True),
    (4, "parallel", True, "any", True),
    (4, "parallel", False, "none", False),
]


@pytest.mark.parametrize("proto,streaming,messages,origin,two_phase", MATRIX)
def test_option_matrix_e2e(spark, tmp_path, proto, streaming, messages,
                           origin, two_phase):
    opts = ReplicationOptions(
        protocol_version=proto, streaming=streaming, messages=messages,
        origin=origin, two_phase=two_phase,
    ).validate()
    base, b, expected = _matrix_fixture(opts)
    frames = b.to_table()
    frames_dir = os.path.join(str(tmp_path), "frames")
    wg.write_frames(frames, frames_dir)
    wh = os.path.join(str(tmp_path), "wh")
    eng = ReplayEngine(spark, wh, options=opts)
    bp = os.path.join(str(tmp_path), "base.parquet")
    wg.write_base(base, bp)
    eng.bootstrap_table("repos", spark.read.parquet(bp), ["repo", "path"], 8)
    # small batches so feature frames split across micro-batch boundaries
    eng.replay_frames(frames_dir, batch_frames=7)

    lake = eng.table("repos")
    got = {(r["repo"], r["path"]) for r in lake.read(spark).collect()}
    base_keys = {(r["repo"], r["path"]) for r in base.to_pylist()}
    want = base_keys | expected
    missing = sorted(want - got)
    extra = sorted(got - want)
    assert got == want, (
        f"matrix combo proto={proto} streaming={streaming} "
        f"messages={messages} origin={origin} two_phase={two_phase}: "
        f"missing={missing[:5]} extra={extra[:5]}")
    assert lake.applied_lsn() > 0


def test_option_matrix_invalid_combos_rejected():
    """The validation cross-checks mirror the reference's option/version
    rules — invalid combos must fail fast, not decode garbage."""
    with pytest.raises(ValueError):
        ReplicationOptions(streaming="on", protocol_version=1).validate()
    with pytest.raises(ValueError):
        ReplicationOptions(streaming="parallel",
                           protocol_version=3).validate()
    with pytest.raises(ValueError):
        ReplicationOptions(two_phase=True, protocol_version=2).validate()
