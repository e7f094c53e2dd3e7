"""pgoutput protocol constants.

The wire format is PostgreSQL's public logical-replication output plugin
protocol ("pgoutput", documented in the PostgreSQL manual, protocoldoc
"Logical Streaming Replication Protocol"). Tag values and field layouts
mirror what the reference client decodes (see
/root/reference/src/protocol.rs:31-58 for the same constants) but this
module is written from the public protocol spec.
"""

from __future__ import annotations

# Message tag bytes (first byte of every pgoutput message body).
TAG_BEGIN = ord("B")
TAG_COMMIT = ord("C")
TAG_ORIGIN = ord("O")
TAG_RELATION = ord("R")
TAG_TYPE = ord("Y")
TAG_INSERT = ord("I")
TAG_UPDATE = ord("U")
TAG_DELETE = ord("D")
TAG_TRUNCATE = ord("T")
TAG_MESSAGE = ord("M")
TAG_STREAM_START = ord("S")
TAG_STREAM_STOP = ord("E")
TAG_STREAM_COMMIT = ord("c")
TAG_STREAM_ABORT = ord("A")
TAG_BEGIN_PREPARE = ord("b")
TAG_PREPARE = ord("P")
TAG_COMMIT_PREPARED = ord("K")
TAG_ROLLBACK_PREPARED = ord("r")
TAG_STREAM_PREPARE = ord("p")
# Copy-stream-level primary keepalive ('k'): not a pgoutput message, but a
# replay fixture may interleave heartbeat frames the way a live file tail
# would see them (reference /root/reference/src/protocol.rs:1940-1965:
# 'k' + wal_end u64 + timestamp i64 + reply_requested u8).
TAG_KEEPALIVE = ord("k")

# TupleData column kinds.
COL_NULL = ord("n")          # SQL NULL
COL_UNCHANGED_TOAST = ord("u")  # unchanged TOASTed value (not sent)
COL_TEXT = ord("t")          # text-format value, length-prefixed
COL_BINARY = ord("b")        # binary-format value, length-prefixed

# Update/Delete old-tuple submessage kinds.
KEY_TYPE_KEY = ord("K")      # REPLICA IDENTITY index columns only
KEY_TYPE_OLD = ord("O")      # full old row (REPLICA IDENTITY FULL)
NEW_TUPLE_MARK = ord("N")

# Replica identity bytes (pg_class.relreplident).
RI_DEFAULT = ord("d")
RI_NOTHING = ord("n")
RI_FULL = ord("f")
RI_INDEX = ord("i")

# PostgreSQL epoch: 2000-01-01T00:00:00Z, as seconds since the Unix epoch.
PG_EPOCH_OFFSET_SECS = 946_684_800
PG_EPOCH_OFFSET_US = PG_EPOCH_OFFSET_SECS * 1_000_000

# Data-carrying message tags that gain a leading xid (u32) when sent inside
# a streamed transaction with protocol version >= 2.
STREAMABLE_DATA_TAGS = frozenset(
    {
        TAG_RELATION,
        TAG_TYPE,
        TAG_INSERT,
        TAG_UPDATE,
        TAG_DELETE,
        TAG_TRUNCATE,
        TAG_MESSAGE,
    }
)

# Canonical event-type names for the decoded ChangeEvent stream
# (parity with /root/reference/src/types.rs:1260-1282).
EVENT_BEGIN = "begin"
EVENT_COMMIT = "commit"
EVENT_INSERT = "insert"
EVENT_UPDATE = "update"
EVENT_DELETE = "delete"
EVENT_TRUNCATE = "truncate"
EVENT_RELATION = "relation"
EVENT_TYPE = "type"
EVENT_ORIGIN = "origin"
EVENT_MESSAGE = "message"
EVENT_STREAM_START = "stream_start"
EVENT_STREAM_STOP = "stream_stop"
EVENT_STREAM_COMMIT = "stream_commit"
EVENT_STREAM_ABORT = "stream_abort"
EVENT_BEGIN_PREPARE = "begin_prepare"
EVENT_PREPARE = "prepare"
EVENT_COMMIT_PREPARED = "commit_prepared"
EVENT_ROLLBACK_PREPARED = "rollback_prepared"
EVENT_STREAM_PREPARE = "stream_prepare"
EVENT_KEEPALIVE = "keepalive"

TAG_TO_EVENT = {
    TAG_BEGIN: EVENT_BEGIN,
    TAG_COMMIT: EVENT_COMMIT,
    TAG_ORIGIN: EVENT_ORIGIN,
    TAG_RELATION: EVENT_RELATION,
    TAG_TYPE: EVENT_TYPE,
    TAG_INSERT: EVENT_INSERT,
    TAG_UPDATE: EVENT_UPDATE,
    TAG_DELETE: EVENT_DELETE,
    TAG_TRUNCATE: EVENT_TRUNCATE,
    TAG_MESSAGE: EVENT_MESSAGE,
    TAG_STREAM_START: EVENT_STREAM_START,
    TAG_STREAM_STOP: EVENT_STREAM_STOP,
    TAG_STREAM_COMMIT: EVENT_STREAM_COMMIT,
    TAG_STREAM_ABORT: EVENT_STREAM_ABORT,
    TAG_BEGIN_PREPARE: EVENT_BEGIN_PREPARE,
    TAG_PREPARE: EVENT_PREPARE,
    TAG_COMMIT_PREPARED: EVENT_COMMIT_PREPARED,
    TAG_ROLLBACK_PREPARED: EVENT_ROLLBACK_PREPARED,
    TAG_STREAM_PREPARE: EVENT_STREAM_PREPARE,
    TAG_KEEPALIVE: EVENT_KEEPALIVE,
}


def lsn_to_str(lsn: int) -> str:
    """Format a 64-bit LSN as PostgreSQL's ``HI/LO`` hex form."""
    return f"{(lsn >> 32) & 0xFFFFFFFF:X}/{lsn & 0xFFFFFFFF:X}"


def str_to_lsn(text: str) -> int:
    hi, lo = text.split("/", 1)
    return (int(hi, 16) << 32) | int(lo, 16)
