"""Live-tail recorder: replication-stream consumer → recorded-stream files.

The deploy pipeline is ``recorder | bridge | stream`` (docs/LIVE_TAIL.md):
this module is the first stage, promoted from the docs' paste-in snippet to
tested code. It consumes XLogData messages from a started logical
replication cursor (psycopg2's ``LogicalReplicationConnection`` shape — an
OPTIONAL dependency imported lazily, this container doesn't bundle it) and
writes the length-prefixed recorded format the bridge
(tools/recvlogical_bridge.py) converts into engine frame files:

    repeated records of  u32be length | payload
    payload 'w' : XLogData — u64be wal_start, u64be wal_end,
                  i64be server_time_us, then the pgoutput message body
    payload 'k' : primary keepalive — u64be wal_end, i64be server_time_us,
                  u8 reply_requested

The recorder rotates output files by size; every rotated file is a valid
recording on its own (records are never split across files), so the bridge
can run behind the recorder incrementally — seq numbering auto-resumes per
frame directory. Structure mirrors the scoped-out native client's consume
loop (/root/reference/src/connection/native/connection.rs,
``copy.rs`` COPY-BOTH framing) with psycopg2 doing the wire work.

Note for psycopg2 users: ``msg.send_time`` is a ``datetime`` — the recorded
format wants µs since the PostgreSQL epoch; ``send_time_to_us`` converts
(the docs' original snippet packed the datetime raw, which TypeErrors).
"""

from __future__ import annotations

import os
import struct

from ..protocol.constants import PG_EPOCH_OFFSET_US

_XLOG_HDR = struct.Struct(">QQq")
_KEEPALIVE = struct.Struct(">QqB")
_LEN = struct.Struct(">I")


def send_time_to_us(t) -> int:
    """Server send time → µs since the PostgreSQL epoch (2000-01-01).
    Accepts an int (passed through), a float (Unix seconds) or a datetime
    (psycopg2's ``ReplicationMessage.send_time``)."""
    if isinstance(t, int):
        return t
    if isinstance(t, float):
        return int(t * 1_000_000) - PG_EPOCH_OFFSET_US
    # datetime (aware or naive-UTC)
    import datetime as _dt

    if isinstance(t, _dt.datetime):
        if t.tzinfo is None:
            t = t.replace(tzinfo=_dt.timezone.utc)
        return int(t.timestamp() * 1_000_000) - PG_EPOCH_OFFSET_US
    raise TypeError(f"unsupported send_time type {type(t)!r}")


class RecordWriter:
    """Length-prefixed record writer with size-based rotation.

    Files are named ``{prefix}-{idx:05d}.rec`` and the index auto-resumes
    from the files already in ``out_dir``, so a restarted recorder keeps
    extending the same logical stream. Records are atomic with respect to
    rotation: a record is entirely in one file."""

    def __init__(self, out_dir: str, prefix: str = "stream",
                 max_bytes: int = 256 << 20):
        self.out_dir = out_dir
        self.prefix = prefix
        self.max_bytes = max_bytes
        os.makedirs(out_dir, exist_ok=True)
        existing = sorted(
            f for f in os.listdir(out_dir)
            if f.startswith(prefix + "-") and f.endswith(".rec"))
        self._idx = len(existing)
        self._f = None
        self._bytes = 0
        self.records = 0
        self.files: list[str] = []

    def _record(self, payload: bytes) -> None:
        if self._f is None or self._bytes + 4 + len(payload) > self.max_bytes:
            self.rotate()
        self._f.write(_LEN.pack(len(payload)) + payload)
        self._bytes += 4 + len(payload)
        self.records += 1

    def write_xlogdata(self, wal_start: int, wal_end: int,
                       send_time_us: int, body: bytes) -> None:
        self._record(b"w" + _XLOG_HDR.pack(wal_start & (2**64 - 1),
                                           wal_end & (2**64 - 1),
                                           send_time_us) + body)

    def write_keepalive(self, wal_end: int, send_time_us: int,
                        reply_requested: bool = False) -> None:
        self._record(b"k" + _KEEPALIVE.pack(wal_end & (2**64 - 1),
                                            send_time_us,
                                            1 if reply_requested else 0))

    def rotate(self) -> None:
        """Close the current file (if any) and open the next one. A file is
        opened lazily on the first record, so an idle recorder leaves no
        empty files behind."""
        if self._f is not None:
            self._f.flush()
            os.fsync(self._f.fileno())
            self._f.close()
        path = os.path.join(self.out_dir,
                            f"{self.prefix}-{self._idx:05d}.rec")
        self._idx += 1
        self._f = open(path, "wb")
        self._bytes = 0
        self.files.append(path)

    def close(self) -> None:
        if self._f is not None:
            self._f.flush()
            os.fsync(self._f.fileno())
            self._f.close()
            self._f = None

    def __enter__(self) -> "RecordWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def record(out_dir: str, *, dsn: str | None = None,
           slot: str = "walstream", options=None, cursor=None,
           max_bytes_per_file: int = 256 << 20,
           prefix: str = "stream") -> dict:
    """Consume a logical replication stream into recorded files.

    ``cursor``: an already-started replication cursor exposing
    ``consume_stream(callback)`` where the callback receives messages with
    ``payload`` (pgoutput body), ``data_start``, ``wal_end``, ``send_time``
    and a ``cursor.send_feedback(flush_lsn=...)`` — psycopg2's
    ``ReplicationCursor`` shape, injectable for tests. When None, psycopg2
    is imported (optional dependency) and START_REPLICATION is issued on
    ``slot`` with the rendered ``options``
    (pg_walstream_spark.options.ReplicationOptions).

    Feedback policy: flush is confirmed at each message's ``data_start``
    AFTER its record is written — the slot never advances past bytes not
    yet on disk, so a recorder crash re-delivers rather than loses (the
    engine's LSN fence absorbs the redelivery). Runs until the stream
    ends or KeyboardInterrupt; returns writer stats."""
    if cursor is None:
        try:
            import psycopg2
            from psycopg2.extras import LogicalReplicationConnection
        except ImportError as ex:  # pragma: no cover - env without psycopg2
            raise RuntimeError(
                "the live recorder needs psycopg2 (pip install "
                "psycopg2-binary) — or inject a started `cursor`"
            ) from ex
        if options is None:
            from ..options import ReplicationOptions

            options = ReplicationOptions()
        options.validate()
        conn = psycopg2.connect(
            dsn, connection_factory=LogicalReplicationConnection)
        cursor = conn.cursor()
        opt = {"proto_version": str(options.protocol_version),
               "publication_names": ",".join(options.publication_names)}
        if options.messages:
            opt["messages"] = "on"
        if options.streaming != "off":
            opt["streaming"] = options.streaming
        if options.binary:
            opt["binary"] = "on"
        if options.two_phase:
            opt["two_phase"] = "on"
        if options.origin == "none":
            opt["origin"] = "none"
        cursor.start_replication(slot_name=slot, decode=False, options=opt)

    writer = RecordWriter(out_dir, prefix=prefix,
                          max_bytes=max_bytes_per_file)

    def _consume(msg):
        writer.write_xlogdata(msg.data_start, msg.wal_end,
                              send_time_to_us(msg.send_time), msg.payload)
        # confirm AFTER the bytes are written (at-least-once, never lossy)
        msg.cursor.send_feedback(flush_lsn=msg.data_start)

    try:
        cursor.consume_stream(_consume)
    except KeyboardInterrupt:  # pragma: no cover - interactive stop
        pass
    finally:
        writer.close()
    return {"records": writer.records, "files": writer.files}


def main(argv: list[str] | None = None) -> int:  # pragma: no cover - thin
    import argparse
    import json

    from ..options import ReplicationOptions

    p = argparse.ArgumentParser(
        description="Record a logical replication stream "
                    "(recorder | bridge | stream)")
    p.add_argument("--dsn", required=True)
    p.add_argument("--slot", default="walstream")
    p.add_argument("--out", required=True, help="recording directory")
    p.add_argument("--publications", default="pub",
                   help="comma-separated publication names")
    p.add_argument("--protocol-version", type=int, default=2)
    p.add_argument("--streaming", choices=["off", "on", "parallel"],
                   default="off")
    p.add_argument("--two-phase", action="store_true")
    p.add_argument("--no-messages", action="store_true")
    p.add_argument("--origin", choices=["none", "any"], default="any")
    p.add_argument("--max-bytes-per-file", type=int, default=256 << 20)
    a = p.parse_args(argv)
    opts = ReplicationOptions(
        protocol_version=a.protocol_version,
        publication_names=tuple(a.publications.split(",")),
        streaming=a.streaming, messages=not a.no_messages,
        two_phase=a.two_phase, origin=a.origin,
    )
    stats = record(a.out, dsn=a.dsn, slot=a.slot, options=opts,
                   max_bytes_per_file=a.max_bytes_per_file)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys

    sys.exit(main())
