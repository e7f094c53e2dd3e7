"""Live-tail bridge: recorded replication-stream bytes → frame files →
engine replay must land the exact golden state (docs/LIVE_TAIL.md).
Pins the bridge's XLogData/keepalive framing against the same oracle as
the engine itself."""

from __future__ import annotations

import os

from pg_walstream_spark.engine import ReplayEngine
from pg_walstream_spark.fixtures import wal_gen as wg
from pg_walstream_spark.golden import golden_final_state
from pg_walstream_spark.tools.recvlogical_bridge import (
    bridge_to_frames, iter_recorded_stream, write_recorded_stream,
)


def test_bridge_roundtrip_framing(tmp_path):
    """frames → recorded bytes → parsed records: lossless for both data
    ('w') and keepalive ('k') frames."""
    base, b = wg.gen_keepalives(n_base=20, n_txns=3, ops_per_txn=4)
    frames = b.to_table()
    rec = os.path.join(str(tmp_path), "stream.rec")
    n = write_recorded_stream(frames, rec)
    assert n == frames.num_rows
    got = list(iter_recorded_stream(rec))
    assert len(got) == n
    for row, (kind, ws, we, ts, body) in zip(frames.to_pylist(), got):
        if int(row["tag"]) == ord("k"):
            assert kind == "k" and bytes(body) == bytes(row["data"])
        else:
            assert kind == "w"
            assert (ws, we, ts) == (row["wal_start"], row["wal_end"],
                                    row["server_time"])
            assert bytes(body) == bytes(row["data"])


def test_bridge_e2e_replay_matches_golden(spark, tmp_path):
    """Recorded stream split across TWO recordings (recorder rotation),
    bridged incrementally into one frame dir with small files, replayed —
    final lake state must equal the sequential golden applier."""
    base, b = wg.gen_mixed_dml(n_base=40, n_txns=6, ops_per_txn=5)
    frames = b.to_table()
    half = frames.num_rows // 2
    rec1 = os.path.join(str(tmp_path), "s1.rec")
    rec2 = os.path.join(str(tmp_path), "s2.rec")
    write_recorded_stream(frames.slice(0, half), rec1)
    write_recorded_stream(frames.slice(half), rec2)

    frames_dir = os.path.join(str(tmp_path), "frames")
    st1 = bridge_to_frames(rec1, frames_dir, frames_per_file=11)
    st2 = bridge_to_frames(rec2, frames_dir, frames_per_file=11)
    assert st1["next_seq"] == st2["first_seq"]  # seq auto-resume
    assert st1["frames"] + st2["frames"] == frames.num_rows

    wh = os.path.join(str(tmp_path), "wh")
    eng = ReplayEngine(spark, wh)
    bases = {"repos": base.slice(0, 20), "repos_full": base.slice(20)}
    for n, t in bases.items():
        p = os.path.join(str(tmp_path), f"{n}.parquet")
        wg.write_base(t, p)
        eng.bootstrap_table(n, spark.read.parquet(p), ["repo", "path"], 8)
    eng.replay_frames(frames_dir, batch_frames=25)

    for tname in ("repos", "repos_full"):
        golden_rows, glsn = golden_final_state(bases, frames, tname)
        lake = eng.table(tname)
        got = sorted((r["repo"], r["path"], r["content"])
                     for r in lake.read(spark).collect())
        want = sorted((r["repo"], r["path"], r["content"])
                      for r in golden_rows)
        assert got == want, tname
        assert lake.applied_lsn() == glsn
