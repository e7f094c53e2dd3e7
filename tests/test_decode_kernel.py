"""Differential tests: vectorized Arrow kernel vs naive sequential decode.

Mirrors the reference's decoder-equivalence tests
(/root/reference/src/protocol.rs:2018-2049 — pgoutput_decoder vs network
path): every fixture variant must decode identically through the
column-vectorized kernel and a trivial PyWalParser-based re-implementation.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from pg_walstream_spark.fixtures import wal_gen as wg
from pg_walstream_spark.operators.decode import (
    CONTROL_TAGS,
    build_context,
    decode_batch,
)
from pg_walstream_spark.protocol import ProtocolError, PyWalParser


def control_rows(frames: pa.Table) -> list[dict]:
    return [
        r
        for r in frames.select(["seq", "wal_start", "tag", "data"]).to_pylist()
        if r["tag"] in CONTROL_TAGS
    ]


def naive_decode(frames: pa.Table, proto: int = 2) -> list[dict]:
    """Trivial sequential re-implementation of the kernel's DML semantics."""
    parser = PyWalParser(proto)
    rows = frames.to_pylist()
    msgs = []
    for fr in rows:
        try:
            m = parser.parse(bytes(fr["data"]))
        except ProtocolError as ex:
            m = {"event_type": "__error__", "error": str(ex)}
        msgs.append((fr, m, parser.in_stream_xid))

    # pass 1: dispositions + begin spans
    dispo: dict[int, tuple] = {}
    aborted_subs: set[int] = set()
    open_xid = None
    begin_span_xid = []  # xid of enclosing non-streamed txn per msg index
    for fr, m, _ in msgs:
        et = m["event_type"]
        if et in ("begin", "begin_prepare"):
            open_xid = m["xid"]
        begin_span_xid.append(open_xid)
        if et == "commit":
            if open_xid is not None:
                dispo[open_xid] = ("committed", m["commit_lsn"], m["end_lsn"],
                                   m["commit_ts_us"])
            open_xid = None
        elif et == "prepare":
            dispo.setdefault(m["xid"], ("prepared", None, None, None))
            open_xid = None
        elif et == "commit_prepared":
            dispo[m["xid"]] = ("committed", m["prepare_lsn"], m["end_lsn"],
                               m["commit_ts_us"])
        elif et == "rollback_prepared":
            dispo[m["xid"]] = ("aborted", None, None, None)
        elif et == "stream_commit":
            dispo[m["xid"]] = ("committed", m["commit_lsn"], m["end_lsn"],
                               m["commit_ts_us"])
        elif et == "stream_abort":
            sub = m.get("subxid", m["xid"])
            if sub == m["xid"]:
                dispo[m["xid"]] = ("aborted", None, None, None)
            else:
                aborted_subs.add(sub)

    # pass 2: catalog timeline + event build
    catalog: dict[int, dict] = {}
    out = []
    for i, (fr, m, in_stream_xid) in enumerate(msgs):
        et = m["event_type"]
        if et == "relation":
            catalog[m["relation_oid"]] = {
                "namespace": m["namespace"], "relname": m["relname"],
                "ri": m["replica_identity"],
                "names": [col[1] for col in m["columns"]],
                "key_flags": [col[0] for col in m["columns"]],
            }
            continue
        if et == "__error__" and fr["tag"] in (ord("I"), ord("U"), ord("D")):
            out.append({"seq": fr["seq"], "event_type": None,
                        "error": m["error"]})
            continue
        if et not in ("insert", "update", "delete"):
            continue
        rel = catalog.get(m["relation_oid"])
        if in_stream_xid is not None and m["xid"] is not None:
            # in-stream: prefix = emitting SUBtransaction; owner = the
            # stream block's top-level xid
            xid, sub = in_stream_xid, m["xid"]
        else:
            xid, sub = (m["xid"] if m["xid"] is not None
                        else begin_span_xid[i]), None
        d = dispo.get(xid, ("open", None, None, None))
        if sub is not None and sub in aborted_subs:
            d = ("aborted", None, None, None)
        ev = {
            "seq": fr["seq"], "event_type": et, "xid": xid,
            "table_name": rel["relname"] if rel else None,
            "schema_name": rel["namespace"] if rel else None,
            "replica_identity": rel["ri"] if rel else None,
            "txn_status": d[0] if rel else None,
            "commit_lsn": d[1] if rel else None,
            "end_lsn": d[2] if rel else None,
            "commit_ts_us": d[3] if rel else None,
            "error": None if rel else "unknown relation",
        }
        if rel:
            names, kf = rel["names"], rel["key_flags"]

            def bind(tup):
                dd, toast = {}, []
                for name, (kind, val) in zip(names, tup):
                    if kind == "u":
                        dd[name] = None
                        toast.append(name)
                    elif kind == "n":
                        dd[name] = None
                    elif kind == "b":
                        dd[name] = "\\x" + val.hex()
                    else:
                        dd[name] = val.decode()
                return dd, toast

            key_names = [n for n, f in zip(names, kf) if f & 1] or list(names)
            kt = m.get("key_type")
            ev["key_type"] = kt
            ev["key_columns"] = list(names) if kt == "O" else key_names
            if et in ("insert", "update"):
                nd, toast = bind(m["new"])
                ev["new_data"], ev["new_toast"] = nd, toast
            else:
                ev["new_data"], ev["new_toast"] = None, None
            if et in ("update", "delete") and m.get("old") is not None:
                ev["old_data"] = bind(m["old"])[0]
            else:
                ev["old_data"] = None
        out.append(ev)
    return out


def kernel_dml(frames: pa.Table, proto: int = 2) -> list[dict]:
    ctx = build_context(control_rows(frames), protocol_version=proto)
    t = decode_batch(frames, ctx)
    out = []
    for r in t.to_pylist():
        if r["event_type"] not in ("insert", "update", "delete"):
            continue
        r = dict(r)
        for k in ("old_data", "new_data"):
            if r[k] is not None:
                r[k] = dict(r[k])
        out.append(r)
    return out


FIELDS = [
    "seq", "event_type", "xid", "table_name", "schema_name",
    "replica_identity", "txn_status", "commit_lsn", "end_lsn", "commit_ts_us",
    "key_type", "key_columns", "old_data", "new_data", "new_toast",
]


def assert_equivalent(frames: pa.Table, proto: int = 2):
    naive = naive_decode(frames, proto)
    naive_good = [e for e in naive if e["error"] is None]
    kern = kernel_dml(frames, proto)
    kern_good = [e for e in kern if e["error"] is None]
    kern_bad = [e for e in kern if e["error"] is not None]
    assert len(kern_good) == len(naive_good), (
        f"good-row count {len(kern_good)} != naive {len(naive_good)}"
    )
    assert len(kern_bad) == len([e for e in naive if e["error"] is not None])
    for ne, ke in zip(naive_good, kern_good):
        for f in FIELDS:
            nv, kv = ne.get(f), ke.get(f)
            if f in ("new_toast",) and nv is not None:
                nv, kv = sorted(nv), sorted(kv or [])
            assert kv == nv, f"seq={ne['seq']} field={f}: kernel={kv!r} naive={nv!r}"


VARIANTS = {
    "basic": lambda: wg.gen_basic(n_base=40, n_txns=6, ops_per_txn=5),
    "mixed": lambda: wg.gen_mixed_dml(n_base=60, n_txns=10, ops_per_txn=8),
    "toast": lambda: wg.gen_toast(n_base=30, n_txns=4),
    "truncate": lambda: wg.gen_truncate(n_base=30),
    "schema_evo": lambda: wg.gen_schema_evo(n_base=20),
    "streaming": lambda: wg.gen_streaming(n_base=25),
    "streaming_subabort": lambda: wg.gen_streaming_subabort(n_base=20),
    "two_phase": lambda: wg.gen_two_phase(n_base=20),
    "malformed": lambda: wg.gen_malformed(),
    "binary_mode": lambda: wg.gen_binary_mode(),
    "bench_small": lambda: wg.gen_bench(n_base=300, n_txns=15, ops_per_txn=20),
}


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_kernel_matches_naive(name):
    _, b = VARIANTS[name]()
    assert_equivalent(b.to_table())


def test_kernel_batch_split_invariance():
    """mapInArrow may hand the kernel arbitrary batch slices; with a
    full-stream context the concatenation must equal the single-shot decode."""
    _, b = VARIANTS["mixed"]()
    frames = b.to_table()
    ctx = build_context(control_rows(frames))
    whole = decode_batch(frames, ctx).to_pylist()
    parts = []
    step = 7
    for i in range(0, frames.num_rows, step):
        parts.extend(decode_batch(frames.slice(i, step), ctx).to_pylist())
    parts.sort(key=lambda r: r["seq"])
    assert len(whole) == len(parts)
    for w, p in zip(whole, parts):
        assert w == p


def test_kernel_streaming_interleave_xids():
    _, b = VARIANTS["streaming"]()
    frames = b.to_table()
    evs = kernel_dml(frames)
    by_status = {}
    for e in evs:
        by_status.setdefault(e["txn_status"], []).append(e)
    assert len(by_status.get("committed", [])) == 15
    assert len(by_status.get("aborted", [])) == 12
    assert all(e["xid"] is not None for e in evs)


def test_kernel_schema_evo_versions():
    _, b = VARIANTS["schema_evo"]()
    frames = b.to_table()
    ctx = build_context(control_rows(frames))
    assert len(ctx.schema_changes) == 1
    evs = kernel_dml(frames)
    with_stars = [e for e in evs if e["new_data"] and "stars" in e["new_data"]]
    without = [e for e in evs if e["new_data"] and "stars" not in e["new_data"]]
    assert len(with_stars) == 8 and len(without) == 8


def test_kernel_malformed_quarantined_not_fatal():
    _, b = VARIANTS["malformed"]()
    frames = b.to_table()
    ctx = build_context(control_rows(frames))
    t = decode_batch(frames, ctx)
    errs = [r for r in t.to_pylist() if r["error"] is not None]
    assert len(errs) == 3
    good = [r for r in t.to_pylist()
            if r["event_type"] == "insert" and r["error"] is None]
    assert len(good) == 2


def test_message_content_delivered():
    """pg_logical_emit_message payload bytes survive decode end-to-end
    (reference protocol.rs:1027-1052 delivers the body; round 1 kept only
    the prefix)."""
    from pg_walstream_spark.protocol import encoder as e

    b = wg.WalBuilder(7)
    b.relation(wg.REPOS_OID, "repos", wg.REPOS_COLUMNS)
    b.begin()
    payload = b"marker:\x00\xffdeploy-42"
    b.emit(e.encode_message(1, b.lsn, "app.markers", payload))
    b.commit()
    frames = b.to_table()
    ctx = build_context(control_rows(frames))
    rows = [r for r in decode_batch(frames, ctx).to_pylist()
            if r["event_type"] == "message"]
    assert len(rows) == 1
    assert rows[0]["table_name"] == "app.markers"
    assert bytes(rows[0]["message_content"]) == payload


def test_carried_catalog_reannounce_is_not_schema_change():
    """Engine state round-trips the catalog through JSON (tuples→lists);
    an identical relation re-announcement after a restart must NOT be
    flagged as a schema change."""
    import json

    from pg_walstream_spark.operators.decode import RelationVersion

    _, b = wg.gen_basic(n_base=10, n_txns=2, ops_per_txn=2)
    frames = b.to_table()
    ctx1 = build_context(control_rows(frames))
    carried = json.loads(json.dumps(
        {oid: [list(v) for v in vs] for oid, vs in ctx1.catalog.items()}
    ))
    carried = {int(oid): vs for oid, vs in carried.items()}
    ctx2 = build_context(control_rows(frames), carry_catalog=carried)
    assert ctx2.schema_changes == []
    for vs in ctx2.catalog.values():
        assert all(isinstance(v, RelationVersion) for v in vs)


def test_fast_begin_commit_matches_parser():
    """build_context's inline Begin/Commit slicing must stay
    field-identical to PyWalParser.parse for every control frame the
    fixtures produce — and defer (return None) on anything it cannot
    prove, including short frames (which must raise through the parser
    exactly as before)."""
    from pg_walstream_spark.operators.decode import _fast_begin_commit

    parser = PyWalParser(2)
    checked = {"begin": 0, "commit": 0, "other": 0}
    for gen in (lambda: wg.gen_basic(n_base=30, n_txns=6, ops_per_txn=4),
                lambda: wg.gen_streaming_2pc()):
        out = gen()
        t = out[1].to_table() if isinstance(out, tuple) else out.to_table()
        for row in t.to_pylist():
            data = bytes(row["data"])
            fast = _fast_begin_commit(data)
            if fast is None:
                checked["other"] += 1
                continue
            assert fast == parser.parse(data)
            checked[fast["event_type"]] += 1
    assert checked["begin"] > 0 and checked["commit"] > 0

    # short/truncated B and C frames must defer to the parser
    assert _fast_begin_commit(b"B") is None
    assert _fast_begin_commit(b"B" + b"\x00" * 19) is None
    assert _fast_begin_commit(b"C" + b"\x00" * 24) is None
    assert _fast_begin_commit(b"") is None
    # trailing bytes are ignored, like the reader
    full_b = b"B" + (7).to_bytes(8, "big") + (9).to_bytes(8, "big") \
        + (3).to_bytes(4, "big")
    assert _fast_begin_commit(full_b + b"xx") == parser.parse(full_b + b"xx")
