"""Replication-stream → frame-file bridge (the live-tail adapter).

The engine replays *frame files*: parquet with schema
``seq, wal_start, wal_end, server_time, tag, data`` — one row per pgoutput
message (fixtures/wal_gen.py mirrors the reference's ``RawXLogData``,
/root/reference/src/stream.rs:60-69). A real deployment needs something
writing those files from a PostgreSQL logical slot. This module converts a
RECORDED COPY-BOTH replication stream into frame files, closing the gap
between "replay-verified engine" and "deployable CDC system" without
pulling a live wire connection into scope (SURVEY.md scope-out).

Recorded-stream format (what a ~20-line recorder captures — see
docs/LIVE_TAIL.md for a psycopg recorder you can paste):

    repeated records of  u32be length | payload
    payload[0] == 'w' : XLogData — u64be wal_start, u64be wal_end,
                        i64be server_time_us, then the pgoutput message
                        body (reference stream.rs XLogData framing)
    payload[0] == 'k' : primary keepalive — u64be wal_end,
                        i64be server_time_us, u8 reply_requested

The bridge assigns dense 0-based ``seq`` in stream order (resumable via
``start_seq``), keeps keepalives as 'k'-tagged frames (the engine skips
them while advancing its received cursor), and rolls output parquet files
every ``frames_per_file`` rows so the streaming source gets bounded,
monotonically-named files.
"""

from __future__ import annotations

import os
import struct
import sys

import pyarrow as pa
import pyarrow.parquet as pq

FRAME_SCHEMA = pa.schema([
    ("seq", pa.int64()),
    ("wal_start", pa.int64()),
    ("wal_end", pa.int64()),
    ("server_time", pa.int64()),
    ("tag", pa.int32()),
    ("data", pa.binary()),
])

_XLOG_HDR = struct.Struct(">QQq")  # wal_start, wal_end, server_time_us
_KEEPALIVE = struct.Struct(">Qq?")


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def write_recorded_stream(frames: pa.Table, path: str) -> int:
    """Inverse of the bridge, for fixtures and differential tests: render a
    wal_gen frame table back into the recorded COPY-stream byte format.
    Returns the number of records written."""
    n = 0
    with open(path, "wb") as f:
        for row in frames.to_pylist():
            tag = int(row["tag"])
            data = bytes(row["data"])
            if tag == ord("k"):
                payload = data  # keepalive body already starts with 'k'
            else:
                payload = (b"w"
                           + _XLOG_HDR.pack(row["wal_start"] & (2**64 - 1),
                                            row["wal_end"] & (2**64 - 1),
                                            row["server_time"])
                           + data)
            f.write(struct.pack(">I", len(payload)) + payload)
            n += 1
    return n


def iter_recorded_stream(path: str):
    """Yield (kind, wal_start, wal_end, server_time, body) per record;
    kind is 'w' or 'k'; for 'k' the body is the full keepalive message
    (tag byte included) and wal_start == wal_end == flush position."""
    with open(path, "rb") as f:
        while True:
            hdr = f.read(4)
            if not hdr:
                return
            if len(hdr) != 4:
                raise ValueError("truncated record length")
            (length,) = struct.unpack(">I", hdr)
            payload = f.read(length)
            if len(payload) != length:
                raise ValueError("truncated record payload")
            if not payload:
                raise ValueError("empty CopyData payload")
            kind = payload[:1]
            if kind == b"w":
                ws, we, ts = _XLOG_HDR.unpack_from(payload, 1)
                yield "w", _signed64(ws), _signed64(we), ts, \
                    payload[1 + _XLOG_HDR.size:]
            elif kind == b"k":
                we, ts, _reply = _KEEPALIVE.unpack_from(payload, 1)
                yield "k", _signed64(we), _signed64(we), ts, payload
            else:
                raise ValueError(
                    f"unknown CopyData kind {kind!r} (expected 'w'/'k')")


def bridge_to_frames(recorded_path: str, frames_dir: str,
                     frames_per_file: int = 5_000,
                     start_seq: int | None = None) -> dict:
    """Convert a recorded stream into frame parquet files under
    ``frames_dir``. ``start_seq`` resumes numbering after the files already
    present (auto-detected when None), so repeated bridge invocations over
    successive recordings extend one logical stream."""
    os.makedirs(frames_dir, exist_ok=True)
    existing = sorted(
        f for f in os.listdir(frames_dir)
        if f.startswith("part-") and f.endswith(".parquet"))
    if start_seq is None:
        start_seq = 0
        if existing:
            last = pq.read_table(
                os.path.join(frames_dir, existing[-1]), columns=["seq"])
            start_seq = int(last.column("seq")[-1].as_py()) + 1
    file_idx = len(existing)
    seq = start_seq
    rows: list[tuple] = []
    files = []

    def _flush():
        nonlocal file_idx, rows
        if not rows:
            return
        cols = list(zip(*rows))
        tbl = pa.table(
            {n: pa.array(cols[i], FRAME_SCHEMA.field(n).type)
             for i, n in enumerate(FRAME_SCHEMA.names)})
        out = os.path.join(frames_dir, f"part-{file_idx:05d}.parquet")
        pq.write_table(tbl, out)
        files.append(out)
        file_idx += 1
        rows = []

    n_data = n_keepalive = 0
    for kind, ws, we, ts, body in iter_recorded_stream(recorded_path):
        rows.append((seq, ws, we, ts, int(body[0]), body))
        seq += 1
        if kind == "k":
            n_keepalive += 1
        else:
            n_data += 1
        if len(rows) >= frames_per_file:
            _flush()
    _flush()
    return {"frames": n_data + n_keepalive, "data_frames": n_data,
            "keepalives": n_keepalive, "files": files,
            "first_seq": start_seq, "next_seq": seq}


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        description="Convert a recorded replication stream to frame files")
    p.add_argument("recorded", help="recorded stream (docs/LIVE_TAIL.md)")
    p.add_argument("frames_dir", help="output frame-file directory")
    p.add_argument("--frames-per-file", type=int, default=5_000)
    a = p.parse_args(argv)
    stats = bridge_to_frames(a.recorded, a.frames_dir, a.frames_per_file)
    print(stats)
    return 0


if __name__ == "__main__":
    sys.exit(main())
