"""Raw transport operators (XLogData split, keepalive parse, origin filter)
+ SQL quoting utilities."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from pg_walstream_spark.fixtures import wal_gen as wg
from pg_walstream_spark.functions.quoting import quote_ident, quote_literal
from pg_walstream_spark.operators.decode import (
    CONTROL_TAGS, build_context, decode_frames_df,
)
from pg_walstream_spark.operators.raw import (
    filter_origin, parse_keepalive, split_xlogdata,
)
from pg_walstream_spark.protocol import encoder as e


def raw_wrap(frames_table):
    """Re-wrap pre-split frames as raw 'w'-prefixed CopyData rows, with a
    few interleaved keepalives."""
    rows = []
    for r in frames_table.to_pylist():
        hdr = struct.pack(
            ">BQQq", ord("w"), r["wal_start"], r["wal_end"], r["server_time"]
        )
        rows.append((r["seq"], hdr + bytes(r["data"])))
    rows.append((10_000_000, struct.pack(">BQqB", ord("k"), 999, 123, 1)))
    rows.append((10_000_001, struct.pack(">BQqB", ord("k"), 1000, 124, 0)))
    rows.append((10_000_002, b"\xff\x01"))  # junk
    return rows


def test_split_xlogdata_roundtrip(spark):
    _, b = wg.gen_basic(n_base=20, n_txns=3, ops_per_txn=3)
    frames = b.to_table()
    raw = spark.createDataFrame(raw_wrap(frames), "seq long, raw binary")
    out = split_xlogdata(raw)
    got = {r["seq"]: r for r in out.collect()}
    want = frames.to_pylist()
    assert len(got) == len(want)  # keepalives + junk dropped
    for w in want:
        g = got[w["seq"]]
        assert g["wal_start"] == w["wal_start"]
        assert g["wal_end"] == w["wal_end"]
        assert g["server_time"] == w["server_time"]
        assert bytes(g["data"]) == bytes(w["data"])
        assert g["tag"] == w["tag"]


def test_parse_keepalive(spark):
    _, b = wg.gen_basic(n_base=10, n_txns=1, ops_per_txn=1)
    raw = spark.createDataFrame(raw_wrap(b.to_table()), "seq long, raw binary")
    ks = {r["seq"]: r for r in parse_keepalive(raw).collect()}
    assert len(ks) == 2
    assert ks[10_000_000]["wal_end"] == 999
    assert ks[10_000_000]["reply_requested"] is True
    assert ks[10_000_001]["reply_requested"] is False


def test_filter_origin_drops_foreign_txn(spark):
    """Txn 2 carries an Origin message → its DML is dropped in 'none' mode,
    kept in 'any' mode."""
    base, b = wg.gen_basic(n_base=20, n_txns=1, ops_per_txn=2)
    b.begin()
    b.emit(e.encode_origin(b.lsn, "upstream_node"))
    from pg_walstream_spark.fixtures.wal_gen import REPOS_OID, row_tuple

    b.emit(e.encode_insert(REPOS_OID, row_tuple(
        {"repo": "x/y", "path": "f.py", "commit": "0" * 40,
         "lang": "python", "content": "foreign"})))
    b.commit()
    frames = b.to_table()
    fdf = spark.createDataFrame(frames.to_pandas())
    ctrl = [
        r.asDict()
        for r in fdf.filter(F.col("tag").isin(list(CONTROL_TAGS)))
        .select("seq", "wal_start", "data").sort("seq").collect()
    ]
    events = decode_frames_df(fdf, build_context(ctrl)).localCheckpoint()

    all_dml = events.filter(F.col("event_type") == "insert").count()
    kept = filter_origin(events, "none").filter(
        F.col("event_type") == "insert"
    ).count()
    assert all_dml == 3 and kept == 2
    assert filter_origin(events, "any").filter(
        F.col("event_type") == "insert"
    ).count() == 3
    with pytest.raises(ValueError):
        filter_origin(events, "bogus")


def test_quoting():
    assert quote_ident('we"ird') == '"we""ird"'
    assert quote_literal("it's") == "'it''s'"
    for fn in (quote_ident, quote_literal):
        with pytest.raises(ValueError):
            fn("nul\x00byte")
