"""Byte-faithful pgoutput message encoder (fixture generator keystone).

Synthesizes deterministic WAL byte streams for tests and benchmarks, playing
the role the reference's encoder crate plays for its property tests
(/root/reference/src/pgoutput_encode/mod.rs:33 — ``parse(encode(m)) == m``).
Written from the public pgoutput protocol spec; all integers big-endian.

A "tuple" is ``list[tuple[str, bytes | str | None]]`` where the first element
is one of ``'n'`` (null), ``'u'`` (unchanged TOAST), ``'t'`` (text value),
``'b'`` (binary value).
"""

from __future__ import annotations

import struct

from . import constants as c

Tuple = list  # list[(kind, value)]


def _cstr(s: str) -> bytes:
    b = s.encode("utf-8")
    if b"\x00" in b:
        raise ValueError("NUL byte in cstring")
    return b + b"\x00"


def _val(v) -> bytes:
    if isinstance(v, bytes):
        return v
    return str(v).encode("utf-8")


def encode_tuple_data(tup: Tuple) -> bytes:
    parts = [struct.pack(">H", len(tup))]
    for kind, value in tup:
        k = kind if isinstance(kind, int) else ord(kind)
        if k in (c.COL_NULL, c.COL_UNCHANGED_TOAST):
            parts.append(struct.pack(">B", k))
        elif k in (c.COL_TEXT, c.COL_BINARY):
            raw = _val(value)
            parts.append(struct.pack(">BI", k, len(raw)) + raw)
        else:
            raise ValueError(f"bad column kind {kind!r}")
    return b"".join(parts)


def _xid_prefix(xid: int | None) -> bytes:
    """Leading xid carried by data messages inside a streamed transaction
    (protocol version >= 2)."""
    return b"" if xid is None else struct.pack(">I", xid)


def encode_begin(final_lsn: int, ts_us: int, xid: int) -> bytes:
    return struct.pack(">BQqI", c.TAG_BEGIN, final_lsn, ts_us, xid)


def encode_commit(commit_lsn: int, end_lsn: int, ts_us: int, flags: int = 0) -> bytes:
    return struct.pack(">BBQQq", c.TAG_COMMIT, flags, commit_lsn, end_lsn, ts_us)


def encode_relation(
    oid: int,
    namespace: str,
    relname: str,
    replica_identity: str,
    columns: list[tuple[int, str, int, int]],
    xid: int | None = None,
) -> bytes:
    """``columns``: list of (flags, name, type_oid, typmod); flags bit0 = key."""
    head = struct.pack(">B", c.TAG_RELATION) + _xid_prefix(xid)
    body = struct.pack(">I", oid) + _cstr(namespace) + _cstr(relname)
    ri = replica_identity if isinstance(replica_identity, int) else ord(replica_identity)
    body += struct.pack(">BH", ri, len(columns))
    for flags, name, type_oid, typmod in columns:
        body += struct.pack(">B", flags) + _cstr(name) + struct.pack(">Ii", type_oid, typmod)
    return head + body


def encode_type(type_oid: int, namespace: str, name: str, xid: int | None = None) -> bytes:
    return (
        struct.pack(">B", c.TAG_TYPE)
        + _xid_prefix(xid)
        + struct.pack(">I", type_oid)
        + _cstr(namespace)
        + _cstr(name)
    )


def encode_origin(origin_lsn: int, name: str) -> bytes:
    return struct.pack(">BQ", c.TAG_ORIGIN, origin_lsn) + _cstr(name)


def encode_message(
    flags: int, lsn: int, prefix: str, content: bytes, xid: int | None = None
) -> bytes:
    return (
        struct.pack(">B", c.TAG_MESSAGE)
        + _xid_prefix(xid)
        + struct.pack(">BQ", flags, lsn)
        + _cstr(prefix)
        + struct.pack(">I", len(content))
        + content
    )


def encode_insert(oid: int, new_tuple: Tuple, xid: int | None = None) -> bytes:
    return (
        struct.pack(">B", c.TAG_INSERT)
        + _xid_prefix(xid)
        + struct.pack(">IB", oid, c.NEW_TUPLE_MARK)
        + encode_tuple_data(new_tuple)
    )


def encode_update(
    oid: int,
    new_tuple: Tuple,
    old_tuple: Tuple | None = None,
    key_type: str | None = None,
    xid: int | None = None,
) -> bytes:
    body = struct.pack(">B", c.TAG_UPDATE) + _xid_prefix(xid) + struct.pack(">I", oid)
    if old_tuple is not None:
        kt = key_type if isinstance(key_type, int) else ord(key_type or "O")
        if kt not in (c.KEY_TYPE_KEY, c.KEY_TYPE_OLD):
            raise ValueError("key_type must be 'K' or 'O'")
        body += struct.pack(">B", kt) + encode_tuple_data(old_tuple)
    body += struct.pack(">B", c.NEW_TUPLE_MARK) + encode_tuple_data(new_tuple)
    return body


def encode_delete(
    oid: int, old_tuple: Tuple, key_type: str = "K", xid: int | None = None
) -> bytes:
    kt = key_type if isinstance(key_type, int) else ord(key_type)
    if kt not in (c.KEY_TYPE_KEY, c.KEY_TYPE_OLD):
        raise ValueError("key_type must be 'K' or 'O'")
    return (
        struct.pack(">B", c.TAG_DELETE)
        + _xid_prefix(xid)
        + struct.pack(">IB", oid, kt)
        + encode_tuple_data(old_tuple)
    )


def encode_truncate(oids: list[int], flags: int = 0, xid: int | None = None) -> bytes:
    return (
        struct.pack(">B", c.TAG_TRUNCATE)
        + _xid_prefix(xid)
        + struct.pack(">IB", len(oids), flags)
        + b"".join(struct.pack(">I", o) for o in oids)
    )


def encode_stream_start(xid: int, first_segment: bool) -> bytes:
    return struct.pack(">BIB", c.TAG_STREAM_START, xid, 1 if first_segment else 0)


def encode_stream_stop() -> bytes:
    return struct.pack(">B", c.TAG_STREAM_STOP)


def encode_stream_commit(
    xid: int, commit_lsn: int, end_lsn: int, ts_us: int, flags: int = 0
) -> bytes:
    return struct.pack(
        ">BIBQQq", c.TAG_STREAM_COMMIT, xid, flags, commit_lsn, end_lsn, ts_us
    )


def encode_stream_abort(
    xid: int,
    subxid: int,
    abort_lsn: int | None = None,
    abort_ts: int | None = None,
) -> bytes:
    """Protocol v4 appends (abort_lsn, abort_ts); v2 omits them."""
    body = struct.pack(">BII", c.TAG_STREAM_ABORT, xid, subxid)
    if abort_lsn is not None:
        body += struct.pack(">Qq", abort_lsn, abort_ts or 0)
    return body


def _prepare_body(prepare_lsn: int, end_lsn: int, ts_us: int, xid: int, gid: str) -> bytes:
    return struct.pack(">QQqI", prepare_lsn, end_lsn, ts_us, xid) + _cstr(gid)


def encode_begin_prepare(
    prepare_lsn: int, end_lsn: int, ts_us: int, xid: int, gid: str
) -> bytes:
    return struct.pack(">B", c.TAG_BEGIN_PREPARE) + _prepare_body(
        prepare_lsn, end_lsn, ts_us, xid, gid
    )


def encode_prepare(
    prepare_lsn: int, end_lsn: int, ts_us: int, xid: int, gid: str, flags: int = 0
) -> bytes:
    return struct.pack(">BB", c.TAG_PREPARE, flags) + _prepare_body(
        prepare_lsn, end_lsn, ts_us, xid, gid
    )


def encode_commit_prepared(
    commit_lsn: int, end_lsn: int, ts_us: int, xid: int, gid: str, flags: int = 0
) -> bytes:
    return struct.pack(">BB", c.TAG_COMMIT_PREPARED, flags) + _prepare_body(
        commit_lsn, end_lsn, ts_us, xid, gid
    )


def encode_rollback_prepared(
    prepare_end_lsn: int,
    rollback_end_lsn: int,
    prepare_ts: int,
    rollback_ts: int,
    xid: int,
    gid: str,
    flags: int = 0,
) -> bytes:
    return (
        struct.pack(
            ">BBQQqq",
            c.TAG_ROLLBACK_PREPARED,
            flags,
            prepare_end_lsn,
            rollback_end_lsn,
            prepare_ts,
            rollback_ts,
        )
        + struct.pack(">I", xid)
        + _cstr(gid)
    )


def encode_stream_prepare(
    prepare_lsn: int, end_lsn: int, ts_us: int, xid: int, gid: str, flags: int = 0
) -> bytes:
    return struct.pack(">BB", c.TAG_STREAM_PREPARE, flags) + _prepare_body(
        prepare_lsn, end_lsn, ts_us, xid, gid
    )


def encode_keepalive(wal_end: int, ts_us: int,
                     reply_requested: bool = False) -> bytes:
    """Primary keepalive ('k' + wal_end u64 + timestamp i64 + reply u8) —
    copy-stream heartbeat, layout per reference protocol.rs:1940-1965."""
    return struct.pack(">BQqB", c.TAG_KEEPALIVE, wal_end, ts_us,
                       1 if reply_requested else 0)
