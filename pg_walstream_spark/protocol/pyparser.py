"""Sequential pure-Python pgoutput parser — the golden/reference path.

Functionally equivalent to the reference's connection-free decoder entry
(``PgOutputDecoder::decode_message``, /root/reference/src/protocol.rs:1880-1932):
feed complete message bodies in LSN order, get parsed message dicts out. Used
by the golden applier (tests oracle) and as the correctness anchor for the
vectorized Arrow kernel (pg_walstream_spark.operators.decode). Deliberately
simple and row-at-a-time; the production path is the vectorized kernel.
"""

from __future__ import annotations

import struct

from . import constants as c


class ProtocolError(ValueError):
    pass


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ProtocolError(
                f"truncated message: need {n} bytes at {self.pos}, have {len(self.buf)}"
            )
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self._take(1)[0]

    def u16(self) -> int:
        return struct.unpack(">H", self._take(2))[0]

    def u32(self) -> int:
        return struct.unpack(">I", self._take(4))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def u64(self) -> int:
        return struct.unpack(">Q", self._take(8))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def cstr(self) -> str:
        end = self.buf.find(b"\x00", self.pos)
        if end < 0:
            raise ProtocolError("unterminated cstring")
        try:
            out = self.buf[self.pos : end].decode("utf-8")
        except UnicodeDecodeError as ex:
            # never leak a raw UnicodeDecodeError: malformed frames must
            # surface as ProtocolError so callers can quarantine the row
            # (hypothesis: tag 'Y' + b'\x80' crashed the parser contract)
            raise ProtocolError(f"invalid utf-8 in cstring: {ex}") from ex
        self.pos = end + 1
        return out

    def bytes_(self, n: int) -> bytes:
        return self._take(n)

    @property
    def remaining(self) -> int:
        return len(self.buf) - self.pos


def _parse_tuple(r: _Reader) -> list:
    ncols = r.u16()
    # Alloc cap against bogus counts: each column is at least 1 byte
    # (mirrors the DoS guard at /root/reference/src/protocol.rs:1296-1298).
    if ncols > r.remaining:
        raise ProtocolError(f"bogus column count {ncols} (remaining {r.remaining})")
    out = []
    for _ in range(ncols):
        kind = r.u8()
        if kind == c.COL_NULL:
            out.append(("n", None))
        elif kind == c.COL_UNCHANGED_TOAST:
            out.append(("u", None))
        elif kind == c.COL_TEXT:
            out.append(("t", r.bytes_(r.u32())))
        elif kind == c.COL_BINARY:
            out.append(("b", r.bytes_(r.u32())))
        else:
            raise ProtocolError(f"unknown tuple column kind {kind}")
    return out


class PyWalParser:
    """Stateful sequential parser. Tracks the in-stream xid set by
    StreamStart / cleared by StreamStop (protocol v2+ streamed transactions),
    which determines whether data messages carry a leading xid."""

    def __init__(self, protocol_version: int = 2):
        self.protocol_version = protocol_version
        self.in_stream_xid: int | None = None

    def _data_xid(self, r: _Reader) -> int | None:
        if self.protocol_version >= 2 and self.in_stream_xid is not None:
            return r.u32()
        return None

    def parse(self, data: bytes) -> dict:
        r = _Reader(data)
        tag = r.u8()
        if tag == c.TAG_BEGIN:
            return {
                "event_type": c.EVENT_BEGIN,
                "final_lsn": r.u64(),
                "commit_ts_us": r.i64(),
                "xid": r.u32(),
            }
        if tag == c.TAG_COMMIT:
            return {
                "event_type": c.EVENT_COMMIT,
                "flags": r.u8(),
                "commit_lsn": r.u64(),
                "end_lsn": r.u64(),
                "commit_ts_us": r.i64(),
            }
        if tag == c.TAG_RELATION:
            xid = self._data_xid(r)
            oid = r.u32()
            namespace = r.cstr()
            relname = r.cstr()
            ri = chr(r.u8())
            ncols = r.u16()
            cols = []
            for _ in range(ncols):
                flags = r.u8()
                name = r.cstr()
                type_oid = r.u32()
                typmod = r.i32()
                cols.append((flags, name, type_oid, typmod))
            return {
                "event_type": c.EVENT_RELATION,
                "xid": xid,
                "relation_oid": oid,
                "namespace": namespace,
                "relname": relname,
                "replica_identity": ri,
                "columns": cols,
            }
        if tag == c.TAG_TYPE:
            return {
                "event_type": c.EVENT_TYPE,
                "xid": self._data_xid(r),
                "type_oid": r.u32(),
                "namespace": r.cstr(),
                "name": r.cstr(),
            }
        if tag == c.TAG_ORIGIN:
            return {
                "event_type": c.EVENT_ORIGIN,
                "origin_lsn": r.u64(),
                "name": r.cstr(),
            }
        if tag == c.TAG_MESSAGE:
            xid = self._data_xid(r)
            flags = r.u8()
            lsn = r.u64()
            prefix = r.cstr()
            length = r.u32()
            return {
                "event_type": c.EVENT_MESSAGE,
                "xid": xid,
                "flags": flags,
                "message_lsn": lsn,
                "prefix": prefix,
                "content": r.bytes_(length),
            }
        if tag == c.TAG_INSERT:
            xid = self._data_xid(r)
            oid = r.u32()
            mark = r.u8()
            if mark != c.NEW_TUPLE_MARK:
                raise ProtocolError(f"insert: expected 'N', got {mark}")
            return {
                "event_type": c.EVENT_INSERT,
                "xid": xid,
                "relation_oid": oid,
                "new": _parse_tuple(r),
            }
        if tag == c.TAG_UPDATE:
            xid = self._data_xid(r)
            oid = r.u32()
            sub = r.u8()
            old = None
            key_type = None
            if sub in (c.KEY_TYPE_KEY, c.KEY_TYPE_OLD):
                key_type = chr(sub)
                old = _parse_tuple(r)
                sub = r.u8()
            if sub != c.NEW_TUPLE_MARK:
                raise ProtocolError(f"update: expected 'N', got {sub}")
            return {
                "event_type": c.EVENT_UPDATE,
                "xid": xid,
                "relation_oid": oid,
                "key_type": key_type,
                "old": old,
                "new": _parse_tuple(r),
            }
        if tag == c.TAG_DELETE:
            xid = self._data_xid(r)
            oid = r.u32()
            sub = r.u8()
            if sub not in (c.KEY_TYPE_KEY, c.KEY_TYPE_OLD):
                raise ProtocolError(f"delete: expected 'K'/'O', got {sub}")
            return {
                "event_type": c.EVENT_DELETE,
                "xid": xid,
                "relation_oid": oid,
                "key_type": chr(sub),
                "old": _parse_tuple(r),
            }
        if tag == c.TAG_TRUNCATE:
            xid = self._data_xid(r)
            nrels = r.u32()
            flags = r.u8()
            if nrels * 4 > r.remaining:
                raise ProtocolError(f"bogus truncate relation count {nrels}")
            oids = [r.u32() for _ in range(nrels)]
            return {
                "event_type": c.EVENT_TRUNCATE,
                "xid": xid,
                "flags": flags,
                "oids": oids,
            }
        if tag == c.TAG_STREAM_START:
            xid = r.u32()
            first = r.u8()
            self.in_stream_xid = xid
            return {
                "event_type": c.EVENT_STREAM_START,
                "xid": xid,
                "first_segment": bool(first),
            }
        if tag == c.TAG_STREAM_STOP:
            self.in_stream_xid = None
            return {"event_type": c.EVENT_STREAM_STOP}
        if tag == c.TAG_STREAM_COMMIT:
            return {
                "event_type": c.EVENT_STREAM_COMMIT,
                "xid": r.u32(),
                "flags": r.u8(),
                "commit_lsn": r.u64(),
                "end_lsn": r.u64(),
                "commit_ts_us": r.i64(),
            }
        if tag == c.TAG_STREAM_ABORT:
            xid = r.u32()
            subxid = r.u32()
            out = {"event_type": c.EVENT_STREAM_ABORT, "xid": xid, "subxid": subxid}
            # Protocol v4 appends abort_lsn + abort_ts iff >= 16 bytes remain
            # (same rule as /root/reference/src/protocol.rs:1105-1132).
            if r.remaining >= 16:
                out["abort_lsn"] = r.u64()
                out["abort_ts_us"] = r.i64()
            return out
        if tag in (
            c.TAG_BEGIN_PREPARE,
            c.TAG_PREPARE,
            c.TAG_COMMIT_PREPARED,
            c.TAG_STREAM_PREPARE,
        ):
            flags = r.u8() if tag != c.TAG_BEGIN_PREPARE else 0
            lsn = r.u64()
            end_lsn = r.u64()
            ts = r.i64()
            xid = r.u32()
            gid = r.cstr()
            return {
                "event_type": c.TAG_TO_EVENT[tag],
                "flags": flags,
                "prepare_lsn": lsn,
                "end_lsn": end_lsn,
                "commit_ts_us": ts,
                "xid": xid,
                "gid": gid,
            }
        if tag == c.TAG_ROLLBACK_PREPARED:
            return {
                "event_type": c.EVENT_ROLLBACK_PREPARED,
                "flags": r.u8(),
                "prepare_end_lsn": r.u64(),
                "end_lsn": r.u64(),
                "prepare_ts_us": r.i64(),
                "commit_ts_us": r.i64(),
                "xid": r.u32(),
                "gid": r.cstr(),
            }
        if tag == c.TAG_KEEPALIVE:
            # copy-stream heartbeat (reference protocol.rs:1940-1965); the
            # payload wal_end is the server's flush position and may run
            # ahead of the last data frame
            wal_end = r.u64()
            return {
                "event_type": c.EVENT_KEEPALIVE,
                "wal_end": wal_end,
                "server_ts_us": r.i64(),
                "reply_requested": bool(r.u8()),
            }
        raise ProtocolError(f"unknown message tag {tag} ({chr(tag) if 32 <= tag < 127 else '?'})")
