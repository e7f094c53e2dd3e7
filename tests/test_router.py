"""WalRouter: by-table typed dispatch over decoded change events."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_walstream_spark.fixtures import wal_gen as wg
from pg_walstream_spark.operators.decode import (
    CONTROL_TAGS, build_context, decode_frames_df,
)
from pg_walstream_spark.router import WalRouter


def decoded_events(spark, builder):
    frames_pd = builder.to_table().to_pandas()
    frames = spark.createDataFrame(frames_pd)
    ctrl = [
        r.asDict()
        for r in frames.filter(F.col("tag").isin(list(CONTROL_TAGS)))
        .select("seq", "wal_start", "data").sort("seq").collect()
    ]
    return decode_frames_df(frames, build_context(ctrl))


def test_router_dispatch_by_table_and_op(spark):
    _, b = wg.gen_mixed_dml(n_base=40, n_txns=6, ops_per_txn=6)
    events = decoded_events(spark, b).localCheckpoint()

    got: dict[str, int] = {}

    def mk(name):
        def handler(df):
            got[name] = df.count()
            # typed payload columns are present and typed
            assert "repo" in df.columns and "path" in df.columns
        return handler

    default_hits = []
    router = (
        WalRouter(default=lambda t, op, df: default_hits.append((t, op)))
        .table_spec("repos", {"repo": "string", "path": "string",
                              "commit": "string"})
        .on_insert("repos", mk("repos_ins"))
        .on_update("repos", mk("repos_upd"))
        .on_delete("repos", mk("repos_del"))
    )
    counts = router.dispatch(events)
    routed = {k: v for k, v in counts.items() if k[0] == "repos"}
    assert sum(routed.values()) == sum(got.values()) > 0
    # repos_full had no handlers → default fallback fired
    assert any(t == "repos_full" for t, _ in default_hits)


def test_router_handler_error_terminates(spark):
    _, b = wg.gen_basic(n_base=20, n_txns=3, ops_per_txn=3)
    events = decoded_events(spark, b)

    def bad(df):
        raise RuntimeError("handler failed")

    router = WalRouter().on_insert("repos", bad)
    with pytest.raises(RuntimeError, match="handler failed"):
        router.dispatch(events)


def test_router_delete_routes_type_old_image(spark):
    _, b = wg.gen_mixed_dml(n_base=40, n_txns=8, ops_per_txn=6)
    events = decoded_events(spark, b)
    seen = {}

    def on_del(df):
        rows = df.collect()
        seen["n"] = len(rows)
        assert all(r["repo"] is not None for r in rows)  # key from old image

    WalRouter().table_spec(
        "repos_full", {"repo": "string", "path": "string"}
    ).on_delete("repos_full", on_del).dispatch(events)
    assert seen.get("n", 0) > 0
