"""Complex-type passthrough fidelity (reference
/root/reference/integration-tests/complex_types.rs:137-1154).

pgoutput emits every value as text; the engine's map<string,string> event
model must deliver that text VERBATIM through decode → gate → compaction →
MERGE into the lake — arrays, json, geometry, numeric, uuid, network,
range, interval, timestamptz, bytea, tsvector and composite, across
insert, update (incl. NULL flips both ways) and delete. One replay runs
per module; each family then asserts its columns, mirroring the
reference's per-family test split.
"""

from __future__ import annotations

import os

import pytest

from pg_walstream_spark.engine import ReplayEngine
from pg_walstream_spark.fixtures import wal_gen as wg
from pg_walstream_spark.golden import golden_final_state


@pytest.fixture(scope="module")
def complex_state(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("complex"))
    base, b = wg.gen_complex_types()
    frames = b.to_table()
    frames_dir = os.path.join(tmp, "frames")
    wg.write_frames(frames, frames_dir)
    base_p = os.path.join(tmp, "base.parquet")
    wg.write_base(base, base_p)
    eng = ReplayEngine(spark, os.path.join(tmp, "wh"))
    eng.bootstrap_table("complex", spark.read.parquet(base_p), ["id"],
                        n_buckets=4)
    eng.replay_frames(frames_dir, batch_frames=4)  # txns split across batches
    lake_rows = {
        r["id"]: r.asDict() for r in eng.table("complex").read(spark).collect()
    }
    golden_rows, _ = golden_final_state({"complex": base}, frames, "complex")
    return lake_rows, {r["id"]: r for r in golden_rows}, eng


def _both(complex_state, rid, col):
    lake, golden, _ = complex_state
    assert rid in lake and rid in golden
    return lake[rid][col], golden[rid].get(col)


def test_final_shape_and_golden_equality(complex_state):
    lake, golden, _ = complex_state
    assert set(lake) == {"1", "3"} == set(golden)  # row 2 deleted
    cols = [n for _, n, _, _ in wg.COMPLEX_COLUMNS]
    for rid in lake:
        for c in cols:
            assert lake[rid][c] == golden[rid].get(c), (rid, c)


@pytest.mark.parametrize("col,want", [
    ("int_arr", "{1,2,3}"),
    ("text_arr", "{hello,world,pg}"),
    ("bool_arr", "{t,f,t}"),
    ("float_arr", "{1.1,2.2,3.3}"),
    ("nested_arr", "{{1,2},{3,4}}"),
])
def test_array_types_basic(complex_state, col, want):
    got, gold = _both(complex_state, "1", col)
    assert got == want == gold


def test_json_jsonb_basic(complex_state):
    got, gold = _both(complex_state, "1", "json_doc")
    assert got == '{"a": 1, "b": [1, 2, 3], "c": {"d": "x"}}' == gold
    got, gold = _both(complex_state, "1", "jsonb_doc")
    assert got == '{"a": 1, "b": null}' == gold


@pytest.mark.parametrize("col,want", [
    ("geo_point", "(1.5,2.5)"),
    ("geo_path", "((0,0),(1,1),(2,0))"),
    ("geo_polygon", "((0,0),(1,1),(2,0))"),
    ("geo_circle", "<(1,2),3>"),
])
def test_geometric_types_basic(complex_state, col, want):
    got, gold = _both(complex_state, "1", col)
    assert got == want == gold


@pytest.mark.parametrize("col,want", [
    ("big_numeric", "123456789012345678901234567890.123456789"),
    ("uid", "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11"),
    ("net_inet", "192.168.1.0/24"),
    ("t_range", "[2024-01-01,2024-12-31)"),
    ("t_interval", "1 year 2 mons 3 days 04:05:06"),
    ("ts_tz", "2024-01-01 12:34:56.789012+00"),
    ("raw_bytea", "\\xdeadbeef00ff"),
    ("t_vector", "'cat':3 'fat':2"),
    ("composite", '(1,foo,"(2,bar)")'),
])
def test_scalar_families_verbatim(complex_state, col, want):
    got, gold = _both(complex_state, "1", col)
    assert got == want == gold


def test_update_null_flips_both_ways(complex_state):
    """Row 3 inserted all-NULL then updated: updated columns carry the new
    text, every other complex column is SQL NULL (not empty string)."""
    lake, golden, _ = complex_state
    row = lake["3"]
    assert row["int_arr"] == "{9}"
    assert row["json_doc"] == '{"updated": true}'
    assert row["big_numeric"] == "NaN"
    for _, n, _, _ in wg.COMPLEX_COLUMNS[1:]:
        if n not in wg.COMPLEX_ROW3_UPDATED:
            assert row[n] is None, n
    assert golden["3"].get("int_arr") == "{9}"


def test_delete_complex_row(complex_state):
    lake, golden, _ = complex_state
    assert "2" not in lake and "2" not in golden


def test_quoting_corners_survive_codec_roundtrip(complex_state):
    """Row 2's quoting corners (embedded quotes/commas/braces, NaN floats,
    unicode+escapes in jsonb, IPv6, empty bytea) never reach the final
    state (deleted) — prove they still traveled VERBATIM by decoding the
    stream and round-tripping the insert event through the transport
    codec."""
    import pyarrow as pa

    from pg_walstream_spark.operators.decode import (
        CONTROL_TAGS, build_context, decode_batch,
    )
    from pg_walstream_spark.transport import decode_batch as t_dec
    from pg_walstream_spark.transport import encode_batch as t_enc

    _, b = wg.gen_complex_types()
    frames = b.to_table()
    ctrl = [
        {"seq": r["seq"], "wal_start": r["wal_start"], "data": r["data"]}
        for r in frames.to_pylist() if r["tag"] in CONTROL_TAGS
    ]
    events = decode_batch(frames.to_batches()[0], build_context(ctrl))
    ins = events.filter(
        pa.compute.equal(events.column("event_type"), "insert"))
    rows = {dict(r["new_data"])["id"]: dict(r["new_data"])
            for r in ins.to_pylist()}
    want = wg.COMPLEX_ROWS["2"]
    for col in ("text_arr", "float_arr", "jsonb_doc", "net_inet",
                "raw_bytea", "composite", "t_range"):
        assert rows["2"][col] == want[col], col
    # transport codec: bytes in == bytes out for the full complex batch
    back = t_dec(t_enc(ins.combine_chunks().to_batches()[0]))
    back_rows = {dict(r["new_data"])["id"]: dict(r["new_data"])
                 for r in back.to_pylist()}
    assert back_rows == rows
