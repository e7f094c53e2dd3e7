"""Arbitrary-bytes fuzz harness over the sequential parser and the
vectorized Arrow decode kernel.

Mirrors the reference's libfuzzer target
(/root/reference/fuzz/fuzz_targets/roundtrip_bytes.rs:13-25): feed the
parser arbitrary byte strings and mutated valid messages; the ONLY
acceptable failure is ProtocolError (the quarantine signal) — any other
exception is a crash bug. The kernel contract on top: whatever the parser
rejects must come out as an ``error`` quarantine row, never an exception,
and no input frame may vanish.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import example, given, settings
from hypothesis import strategies as st

from pg_walstream_spark.protocol import (
    ProtocolError, PyWalParser, constants as c, encoder as e,
)

VALID_TAGS = sorted(c.TAG_TO_EVENT)


def _parse_contract(data: bytes, proto: int, in_stream: bool):
    """Run the parser under the fuzz contract; returns the message dict or
    None (rejected). Anything but ProtocolError propagates = bug."""
    p = PyWalParser(proto)
    if in_stream:
        p.in_stream_xid = 999
    try:
        m = p.parse(data)
    except ProtocolError:
        return None
    assert isinstance(m, dict) and "event_type" in m
    return m


@settings(max_examples=400, deadline=None)
@given(st.binary(min_size=0, max_size=300),
       st.sampled_from([1, 2, 4]), st.booleans())
@example(b"", 2, False)                      # empty frame
@example(b"Y\x80", 2, False)                 # the pinned utf-8 crasher
@example(bytes([0xFF]) * 16, 2, True)        # unknown tag
def test_parser_arbitrary_bytes_only_protocolerror(data, proto, in_stream):
    _parse_contract(data, proto, in_stream)


@settings(max_examples=300, deadline=None)
@given(st.sampled_from(VALID_TAGS), st.binary(min_size=0, max_size=120),
       st.sampled_from([1, 2, 4]), st.booleans())
def test_parser_valid_tag_garbage_body(tag, body, proto, in_stream):
    """Every real tag byte followed by an arbitrary body: exercises each
    message family's length/cstring/count handling."""
    _parse_contract(bytes([tag]) + body, proto, in_stream)


def _corpus() -> list[bytes]:
    """Valid encodings across message families (the mutation seed set)."""
    return [
        e.encode_begin(100, 1_000_000, 42),
        e.encode_commit(100, 200, 1_000_000, 0),
        e.encode_relation(
            16388, "public", "repos", "d",
            [(1, "repo", 25, -1), (1, "path", 25, -1),
             (0, "content", 25, -1)]),
        e.encode_insert(16388, [("t", b"r1"), ("t", b"a/b"), ("n", None)]),
        e.encode_update(
            16388, [("t", b"r1"), ("t", b"a/b"), ("u", None)],
            old_tuple=[("t", b"r1"), ("t", b"a/b"), ("n", None)],
            key_type="K"),
        e.encode_delete(16388, [("t", b"r1"), ("t", b"a/b"), ("n", None)],
                        key_type="K"),
        e.encode_truncate([16388, 16389], 0),
        e.encode_origin(77, "origin-a"),
        e.encode_message(0, 55, "prefix", b"payload"),
        e.encode_type(600, "public", "citext"),
    ]


@settings(max_examples=400, deadline=None)
@given(st.integers(0, len(_corpus()) - 1), st.data())
def test_parser_mutated_valid_messages(idx, data):
    """Single-byte mutations and truncations of valid messages: the parser
    either reparses (a mutation may still be valid) or raises
    ProtocolError — nothing else. The unmutated original must stay
    parseable (canary against corpus rot)."""
    orig = _corpus()[idx]
    assert _parse_contract(orig, 2, False) is not None
    mode = data.draw(st.sampled_from(["flip", "truncate", "extend"]))
    if mode == "flip" and len(orig) > 0:
        pos = data.draw(st.integers(0, len(orig) - 1))
        val = data.draw(st.integers(0, 255))
        mut = orig[:pos] + bytes([val]) + orig[pos + 1:]
    elif mode == "truncate":
        pos = data.draw(st.integers(0, len(orig)))
        mut = orig[:pos]
    else:
        extra = data.draw(st.binary(min_size=1, max_size=16))
        mut = orig + extra
    _parse_contract(mut, 2, False)


def _frames_batch(payloads: list[bytes]) -> pa.RecordBatch:
    n = len(payloads)
    return pa.record_batch(
        {
            "seq": pa.array(np.arange(n, dtype=np.int64)),
            "wal_start": pa.array(np.arange(n, dtype=np.int64) * 100 + 1000),
            "wal_end": pa.array(np.arange(n, dtype=np.int64) * 100 + 1090),
            "server_time": pa.array(np.full(n, 7, dtype=np.int64)),
            "tag": pa.array(
                [int(p[0]) if p else 0 for p in payloads], pa.int32()),
            "data": pa.array(payloads, pa.binary()),
        }
    )


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.one_of(
        st.binary(min_size=0, max_size=80),
        st.sampled_from(_corpus()),
        st.builds(lambda t, b: bytes([t]) + b,
                  st.sampled_from(VALID_TAGS),
                  st.binary(max_size=60)),
    ),
    min_size=1, max_size=24,
))
def test_kernel_quarantines_what_parser_rejects(payloads):
    """The vectorized kernel over a fuzzed frame batch: never raises, emits
    exactly one row per input frame, and every frame the sequential parser
    rejects surfaces as an ``error`` quarantine row (the reference
    WARN-drops unknown/malformed messages, protocol.rs decode loop — here
    they must stay visible for metrics)."""
    from pg_walstream_spark.operators.decode import (
        CONTROL_TAGS, build_context, decode_batch,
    )

    batch = _frames_batch(payloads)
    # driver-side control replay over the batch's control-tagged frames,
    # exactly like engine.process_batch builds its context
    ctrl = [
        {"seq": i, "wal_start": 1000 + i * 100, "data": p}
        for i, p in enumerate(payloads)
        if p and p[0] in CONTROL_TAGS
    ]
    ctx = build_context(ctrl)
    out = decode_batch(batch, ctx)  # must not raise

    seqs = out.column("seq").to_pylist()
    assert sorted(seqs) == list(range(len(payloads))), "frames lost/duped"
    # the engine's quarantine predicate is `error IS NOT NULL`
    # (engine.py apply paths filter error IS NULL): a rejected frame may
    # keep its DML event_type but MUST carry a non-null error
    errors = dict(zip(seqs, out.column("error").to_pylist()))

    parser = PyWalParser(2)
    for i, p in enumerate(payloads):
        parser_rejects = False
        if not p:
            parser_rejects = True
        else:
            try:
                parser.parse(p)
            except ProtocolError:
                parser_rejects = True
        if parser_rejects:
            assert errors[i] is not None, (
                f"frame {i} ({p!r}) rejected by parser but kernel emitted "
                f"a clean row")


def test_u64_lsn_high_bit_control_frames_decode_without_overflow():
    """Deterministic pin of the round-8 hypothesis find: control frames
    whose u64 LSN fields have the top bit set (impossible for a real
    server — 9.2 EB of WAL — but trivial for a fuzzed/corrupt producer)
    must not overflow the kernel's int64 Arrow construction. The parser
    surface keeps true u64 values (spec vector begin_u64_lsn_high_bit);
    the kernel stores the signed two's-complement reinterpretation,
    matching _be64's view of the same bytes."""
    import struct

    from pg_walstream_spark.operators.decode import (
        build_context, decode_batch,
    )

    hi = 0xFFFFFFFF00000001
    payloads = [
        b"B" + struct.pack(">QqI", hi, 0, 1),                 # begin
        b"C" + b"\x00" + struct.pack(">QQq", hi, hi, -2),     # commit
        b"O" + struct.pack(">Q", hi) + b"org\x00",            # origin
        b"M" + b"\x00" + struct.pack(">Q", hi) + b"p\x00"
        + struct.pack(">I", 1) + b"x",                        # message
    ]
    batch = _frames_batch(payloads)
    ctrl = [{"seq": i, "wal_start": 1000 + i, "data": p}
            for i, p in enumerate(payloads)]
    ctx = build_context(ctrl)
    out = decode_batch(batch, ctx)  # must not raise
    assert out.num_rows == len(payloads)
    assert out.column("error").null_count == len(payloads)
    vals = dict(zip(out.column("seq").to_pylist(),
                    out.column("final_lsn").to_pylist()))
    assert vals[0] == hi - (1 << 64)  # signed reinterpretation
