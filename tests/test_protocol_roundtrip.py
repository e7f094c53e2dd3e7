"""Property tests: parse(encode(m)) == m across all 19 message variants.

Mirrors the reference's proptest strategy
(/root/reference/src/pgoutput_encode/roundtrip_tests.rs) in Python/hypothesis.
"""

from __future__ import annotations

from hypothesis import example, given, settings
from hypothesis import strategies as st

from pg_walstream_spark.protocol import PyWalParser, ProtocolError, constants as c, encoder as e

lsn = st.integers(min_value=0, max_value=2**64 - 1)
xid = st.integers(min_value=1, max_value=2**32 - 1)
ts = st.integers(min_value=-(2**62), max_value=2**62)
u8 = st.integers(min_value=0, max_value=255)
name = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF), min_size=0, max_size=24
)
payload = st.binary(max_size=64)

col_kind_val = st.one_of(
    st.tuples(st.just("n"), st.none()),
    st.tuples(st.just("u"), st.none()),
    st.tuples(st.just("t"), payload),
    st.tuples(st.just("b"), payload),
)
tuple_data = st.lists(col_kind_val, max_size=12)


def parse_one(data: bytes, in_stream: bool = False, proto: int = 2) -> dict:
    p = PyWalParser(proto)
    if in_stream:
        p.in_stream_xid = 999
    return p.parse(data)


@given(lsn, ts, xid)
def test_begin_roundtrip(l, t, x):
    m = parse_one(e.encode_begin(l, t, x))
    assert m == {"event_type": "begin", "final_lsn": l, "commit_ts_us": t, "xid": x}


@given(lsn, lsn, ts, u8)
def test_commit_roundtrip(l1, l2, t, f):
    m = parse_one(e.encode_commit(l1, l2, t, f))
    assert (m["commit_lsn"], m["end_lsn"], m["commit_ts_us"], m["flags"]) == (l1, l2, t, f)


@given(
    xid,
    name,
    name,
    st.sampled_from("dnfi"),
    st.lists(
        st.tuples(st.integers(0, 1), name, st.integers(0, 2**32 - 1), st.integers(-1, 2**31 - 1)),
        max_size=8,
    ),
    st.booleans(),
)
def test_relation_roundtrip(oid, ns, rel, ri, cols, streamed):
    sx = 7 if streamed else None
    m = parse_one(e.encode_relation(oid, ns, rel, ri, cols, xid=sx), in_stream=streamed)
    assert m["relation_oid"] == oid
    assert m["namespace"] == ns
    assert m["relname"] == rel
    assert m["replica_identity"] == ri
    assert m["columns"] == cols
    assert m["xid"] == sx


@given(xid, tuple_data, st.booleans())
def test_insert_roundtrip(oid, tup, streamed):
    sx = 42 if streamed else None
    m = parse_one(e.encode_insert(oid, tup, xid=sx), in_stream=streamed)
    assert m["relation_oid"] == oid
    assert m["xid"] == sx
    assert m["new"] == [(k, v if v is None else bytes(v)) for k, v in tup]


@given(xid, tuple_data, st.one_of(st.none(), st.tuples(st.sampled_from("KO"), tuple_data)))
def test_update_roundtrip(oid, new, old_spec):
    old_tuple = old_spec[1] if old_spec else None
    key_type = old_spec[0] if old_spec else None
    m = parse_one(e.encode_update(oid, new, old_tuple, key_type))
    assert m["relation_oid"] == oid
    assert m["key_type"] == key_type
    assert m["old"] == old_tuple
    assert m["new"] == new


@given(xid, tuple_data, st.sampled_from("KO"))
def test_delete_roundtrip(oid, old, kt):
    m = parse_one(e.encode_delete(oid, old, kt))
    assert (m["relation_oid"], m["key_type"], m["old"]) == (oid, kt, old)


@given(st.lists(xid, max_size=8), u8)
def test_truncate_roundtrip(oids, flags):
    m = parse_one(e.encode_truncate(oids, flags))
    assert (m["oids"], m["flags"]) == (oids, flags)


@given(xid, name, name)
def test_type_roundtrip(oid, ns, n):
    m = parse_one(e.encode_type(oid, ns, n))
    assert (m["type_oid"], m["namespace"], m["name"]) == (oid, ns, n)


@given(lsn, name)
def test_origin_roundtrip(l, n):
    m = parse_one(e.encode_origin(l, n))
    assert (m["origin_lsn"], m["name"]) == (l, n)


@given(u8, lsn, name, payload)
def test_message_roundtrip(f, l, p, content):
    m = parse_one(e.encode_message(f, l, p, content))
    assert (m["flags"], m["message_lsn"], m["prefix"], m["content"]) == (f, l, p, content)


@given(xid, st.booleans())
def test_stream_start_sets_state(x, first):
    p = PyWalParser(2)
    m = p.parse(e.encode_stream_start(x, first))
    assert (m["xid"], m["first_segment"]) == (x, first)
    assert p.in_stream_xid == x
    m2 = p.parse(e.encode_stream_stop())
    assert m2["event_type"] == "stream_stop"
    assert p.in_stream_xid is None


@given(xid, u8, lsn, lsn, ts)
def test_stream_commit_roundtrip(x, f, l1, l2, t):
    m = parse_one(e.encode_stream_commit(x, l1, l2, t, f))
    assert (m["xid"], m["flags"], m["commit_lsn"], m["end_lsn"], m["commit_ts_us"]) == (
        x, f, l1, l2, t,
    )


@given(xid, xid, st.one_of(st.none(), st.tuples(lsn, ts)))
def test_stream_abort_roundtrip(x, sub, v4):
    m = parse_one(e.encode_stream_abort(x, sub, *(v4 or (None, None))))
    assert (m["xid"], m["subxid"]) == (x, sub)
    if v4:
        assert (m["abort_lsn"], m["abort_ts_us"]) == v4
    else:
        assert "abort_lsn" not in m


@given(lsn, lsn, ts, xid, name, u8)
def test_two_phase_roundtrips(l1, l2, t, x, gid, f):
    for enc, ev in [
        (lambda: e.encode_begin_prepare(l1, l2, t, x, gid), "begin_prepare"),
        (lambda: e.encode_prepare(l1, l2, t, x, gid, f), "prepare"),
        (lambda: e.encode_commit_prepared(l1, l2, t, x, gid, f), "commit_prepared"),
        (lambda: e.encode_stream_prepare(l1, l2, t, x, gid, f), "stream_prepare"),
    ]:
        m = parse_one(enc())
        assert m["event_type"] == ev
        assert (m["prepare_lsn"], m["end_lsn"], m["commit_ts_us"], m["xid"], m["gid"]) == (
            l1, l2, t, x, gid,
        )
    m = parse_one(e.encode_rollback_prepared(l1, l2, t, t + 1, x, gid, f))
    assert m["event_type"] == "rollback_prepared"
    assert (m["prepare_end_lsn"], m["end_lsn"], m["xid"], m["gid"]) == (l1, l2, x, gid)


@settings(max_examples=200)
@example(b"Y\x00\x00\x00\x00\x80\x00")  # invalid utf-8 inside a cstring
@given(st.binary(min_size=0, max_size=40))
def test_parser_never_panics_on_garbage(data):
    """Fuzz analog of /root/reference/fuzz/fuzz_targets/roundtrip_bytes.rs:
    arbitrary bytes either parse or raise ProtocolError — never crash."""
    try:
        parse_one(data)
    except ProtocolError:
        pass


def test_non_streamed_data_has_no_xid():
    m = parse_one(e.encode_insert(1, [("t", b"x")]), in_stream=False)
    assert m["xid"] is None


def test_proto1_in_stream_has_no_xid():
    # Protocol v1 never reads a leading xid even mid-stream.
    m = parse_one(e.encode_insert(1, [("t", b"x")], xid=None), in_stream=True, proto=1)
    assert m["xid"] is None
