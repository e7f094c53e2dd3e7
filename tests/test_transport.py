"""ChangeEvent transport codec: property roundtrip + engine e2e.

Mirrors the reference's wire-format tests for ChangeEvent encode/decode
(/root/reference/src/types.rs:1284-1330, decode :1588+)."""

from __future__ import annotations

import os

from hypothesis import given, settings, strategies as st

from pg_walstream_spark.transport import (
    FIELDS, decode_row, encode_row,
)

_text = st.text(max_size=40)
_kinds = {
    "long": st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
    "str": _text,
    "bin": st.binary(max_size=60),
    "arr": st.lists(_text, max_size=6),
    "map": st.dictionaries(_text, st.one_of(st.none(), _text), max_size=6),
}


@st.composite
def event_rows(draw):
    return {
        name: draw(st.one_of(st.none(), _kinds[kind]))
        for name, kind in FIELDS
    }


@given(event_rows())
@settings(max_examples=300, deadline=None)
def test_roundtrip_property(row):
    assert decode_row(encode_row(row)) == row


@given(st.lists(event_rows(), min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_batch_codec_matches_row_codec(rows):
    """The vectorized Arrow-batch codec is byte-identical to the sequential
    row codec (encode) and an exact inverse (decode) — the same
    differential-oracle strategy as the decode kernel's tests."""
    import pyarrow as pa

    from pg_walstream_spark.operators.decode import EVENT_ARROW_SCHEMA
    from pg_walstream_spark.transport import decode_batch, encode_batch

    tbl = pa.Table.from_pylist(rows, schema=EVENT_ARROW_SCHEMA)
    batch = tbl.combine_chunks().to_batches()[0]
    enc = encode_batch(batch)
    normalized = batch.to_pylist()  # maps surface as (k, v) tuple lists
    assert [enc[i].as_py() for i in range(len(rows))] == \
        [encode_row(r) for r in normalized]
    assert decode_batch(enc).to_pylist() == normalized
    # sliced batches (nonzero Arrow offsets) take the same path
    if len(rows) > 2:
        sl = batch.slice(1, len(rows) - 2)
        enc_sl = encode_batch(sl)
        assert [enc_sl[i].as_py() for i in range(sl.num_rows)] == \
            [encode_row(r) for r in sl.to_pylist()]


def test_decode_batch_rejects_nulls_and_bad_version():
    import pyarrow as pa
    import pytest

    from pg_walstream_spark.transport import decode_batch, encode_batch
    from pg_walstream_spark.operators.decode import EVENT_ARROW_SCHEMA

    row = {name: None for name, _ in FIELDS}
    row["seq"] = 1
    batch = pa.Table.from_pylist(
        [row], schema=EVENT_ARROW_SCHEMA
    ).combine_chunks().to_batches()[0]
    good = encode_batch(batch)[0].as_py()
    with pytest.raises(ValueError, match="null transport payload"):
        decode_batch(pa.array([good, None], pa.binary()))
    with pytest.raises(ValueError, match="codec version"):
        decode_batch(pa.array([b"\x63" + good[1:]], pa.binary()))
    with pytest.raises(ValueError, match="trailing bytes"):
        decode_batch(pa.array([good + b"\x00"], pa.binary()))


def test_roundtrip_fixture_events_e2e(spark, tmp_path):
    """Every event the decode kernel produces from a mixed fixture (DML with
    TOAST/null map values, truncates, streaming control, quarantine rows)
    survives encode_events → decode_events bit-for-bit."""
    from pyspark.sql import functions as F

    from pg_walstream_spark.fixtures import wal_gen as wg
    from pg_walstream_spark.operators.decode import (
        CONTROL_TAGS, build_context, decode_frames_df,
    )
    from pg_walstream_spark.transport import decode_events, encode_events

    _, b = wg.gen_mixed_dml(n_base=40, n_txns=6, ops_per_txn=5)
    frames_dir = os.path.join(str(tmp_path), "frames")
    wg.write_frames(b.to_table(), frames_dir)
    fdf = spark.read.parquet(frames_dir)
    ctrl = [
        r.asDict()
        for r in fdf.filter(F.col("tag").isin(list(CONTROL_TAGS)))
        .select("seq", "wal_start", "data").sort("seq").collect()
    ]
    events = decode_frames_df(fdf, build_context(ctrl))

    encoded = encode_events(events)
    # payloads are compact: smaller than the JSON rendering of the rows
    one = encoded.limit(5).collect()
    assert all(len(r["payload"]) > 0 for r in one)

    back = decode_events(encoded.select("payload"))

    def norm(df):
        rows = []
        for r in df.collect():
            d = r.asDict(recursive=True)
            for k in ("old_data", "new_data"):
                if d[k] is not None:
                    d[k] = tuple(sorted(d[k].items()))
            for k in ("key_columns", "new_toast", "truncate_tables"):
                if d[k] is not None:
                    d[k] = tuple(d[k])
            rows.append(tuple(sorted(d.items())))
        return sorted(rows, key=repr)

    assert norm(back) == norm(events)


def test_batch_codec_rejects_u16_count_overflow():
    """The wire count header is u16: numpy astype('>u2') would silently
    WRAP a >65535-entry list/map into a corrupt payload where the
    sequential oracle's struct.pack('>H') raises — the batch codec must
    be equally loud (ADVICE r4, transport.py count validation)."""
    import pyarrow as pa
    import pytest

    from pg_walstream_spark.operators.decode import EVENT_ARROW_SCHEMA
    from pg_walstream_spark.transport import encode_batch

    for name, kind in (("key_columns", "arr"), ("new_data", "map")):
        row = {n: None for n, _ in FIELDS}
        row[name] = (
            [""] * 65_536 if kind == "arr"
            else {f"k{i}": None for i in range(65_536)}
        )
        batch = pa.Table.from_pylist(
            [row], schema=EVENT_ARROW_SCHEMA
        ).combine_chunks().to_batches()[0]
        with pytest.raises(ValueError, match="u16 wire limit"):
            encode_batch(batch)
        with pytest.raises(Exception):  # struct.error — oracle is loud too
            encode_row(row)
