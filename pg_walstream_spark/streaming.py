"""Structured Streaming front-end: readStream over a growing frame directory
→ the same micro-batch apply function the bounded replay uses.

Maps the reference's live-tail lifecycle onto Spark's streaming runtime:
- the frame directory is the replication slot (files = COPY frames);
- ``maxFilesPerTrigger`` is the frame pump's batch drain
  (/root/reference/src/stream.rs:646-694);
- the checkpointLocation is the slot's restart cursor (received LSN);
- the LakeTable LSN fence is the applied-LSN feedback — a batch replayed
  after a crash is skipped by the fence, so delivery is exactly-once end to
  end (the contract of /root/reference/src/stream.rs:1563-1582: ack only
  after successful apply).

Delivery-order independence: the ingest does NOT trust the file source's
listing order. Files beyond a seq gap are held (by path, in engine state)
and released once the gap fills — see ``ingest_frames_batch``. This is the
fix for the round-1/2 exactly-once flake: Spark's file source occasionally
delivered frame files out of mtime order, the engine applied the later
segment's commits, and the LSN fence then silently discarded the middle
segment's transactions as "duplicates" when they finally arrived.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .engine import ReplayEngine

FRAME_SPARK_DDL = (
    "seq long, wal_start long, wal_end long, server_time long, tag int, "
    "data binary"
)


def ingest_frames_batch(engine: ReplayEngine, df: DataFrame,
                        epoch_id: int) -> dict | None:
    """Apply one micro-batch of frame files with WAL-order repair
    (hold-and-release). Shared by the streaming sink and tests.

    Frames carry DENSE 0-based seq numbers and files are the transport's
    atomic delivery unit. The file source CAN deliver files out of WAL
    order (observed ~1/5 full-suite runs despite strictly increasing
    mtimes): a batch of files {1,3} would apply file 3's commits, advance
    the LSN fence past them, and then silently fence off file 2's
    transactions when it arrived "behind" the high-water mark. Instead of
    trusting delivery order, each batch:

    - skips files entirely at-or-behind the consumed seq (at-least-once
      redelivery — the LSN fence would no-op them anyway),
    - processes the files extending the consumed range contiguously,
    - HOLDS files beyond a gap (by path, in engine state) until a later
      batch fills the gap.

    Delivery order no longer matters; only a seq that never arrives (real
    WAL loss) blocks progress, and it stays visible as ``held_frames`` in
    the engine state / health report.
    """
    from pyspark.sql import functions as F

    # foreachBatch hands a DataFrame bound to a CLONED SparkSession;
    # re-root the engine on it so every DataFrame the batch touches
    # (pending reads, dispo frames, target scans, the MERGE write) lives on
    # ONE session. Mixing the clone with the original session deadlocks
    # observed metrics (the write runs on one session's listener bus, the
    # observation waits on the other's) and leaves conf divergence between
    # plan fragments.
    engine.spark = df.sparkSession
    st = engine._load_state()

    spans = [
        {"path": r["path"], "lo": int(r["lo"]), "hi": int(r["hi"]),
         "n": int(r["n"])}
        for r in df.groupBy(F.input_file_name().alias("path"))
        .agg(F.min("seq").alias("lo"), F.max("seq").alias("hi"),
             F.count("seq").alias("n")).collect()
    ]
    for s in spans:
        # a gap INSIDE one file is corruption, not reordering — no later
        # delivery can heal it, so fail loudly
        if s["n"] != s["hi"] - s["lo"] + 1:
            raise RuntimeError(
                f"WAL frame gap inside file {s['path']} (micro-batch "
                f"{epoch_id}): seq span [{s['lo']}, {s['hi']}] but only "
                f"{s['n']} frames present — frame file is corrupt."
            )
    held = list(st.get("held_frames", []))
    known = {s["path"] for s in spans}
    candidates = spans + [h for h in held if h["path"] not in known]
    if not candidates:
        return None
    consumed = st.get("max_seq")
    expected = int(consumed) + 1 if consumed is not None else 0
    process, new_held = [], []
    for s in sorted(candidates, key=lambda s: s["lo"]):
        if s["hi"] < expected:
            continue  # fully consumed already (at-least-once redelivery)
        if s["lo"] <= expected:
            process.append(s)
            expected = s["hi"] + 1
        else:
            new_held.append(s)
    if [h["path"] for h in new_held] != [h["path"] for h in held]:
        st["reorder_events"] = int(st.get("reorder_events", 0)) + 1
    st["held_frames"] = new_held
    if not process:
        engine._save_state(st)
        return None
    paths = [s["path"] for s in process]
    engine._tune_input_splits(paths)
    if set(paths) == known and not held:
        batch_df = df  # common in-order case: reuse the source's batch
    else:
        batch_df = df.sparkSession.read.schema(FRAME_SPARK_DDL).parquet(
            *paths
        )
    start = int(consumed) + 1 if consumed is not None else 0
    lo = max(min(s["lo"] for s in process), start)
    hi = max(s["hi"] for s in process)

    # control sidecar: if the frame pump wrote a ``<frames>_control`` dir
    # (fixtures/wal_gen.write_frames), read the batch's control rows with
    # pyarrow on the driver — skipping the per-batch Spark control-scan
    # job, the same core-count-independent serial tail the bounded replay
    # already avoids
    control_rows = None
    ctrl_dir = os.path.dirname(
        paths[0][7:] if paths[0].startswith("file://") else paths[0]
    ).rstrip("/") + "_control"
    if os.path.isdir(ctrl_dir):
        import pyarrow.parquet as _pq

        # push the seq range into the parquet read: a live stream's
        # sidecar grows without bound, and re-reading the full history
        # every micro-batch would be an O(stream age) driver-serial cost —
        # row groups outside the range are pruned by their seq statistics
        file_lo = min(s["lo"] for s in process)
        control_rows = _pq.read_table(
            ctrl_dir, columns=["seq", "wal_start", "data"],
            filters=[("seq", ">=", file_lo), ("seq", "<=", hi)],
        ).sort_by("seq").to_pylist()

    # a transient failure inside foreachBatch (FS hiccup, executor loss)
    # retries the batch in place under the taxonomy's backoff budget —
    # Spark's query restart would also recover, but at whole-restart cost
    # (the reference retries inside the consume loop for the same reason,
    # /root/reference/src/stream.rs:957-1044); the LSN fence makes the
    # partial re-application idempotent
    from .retry import retry_call

    return retry_call(
        lambda: engine.process_batch(
            batch_df, int(epoch_id), st,
            # clamp lo: a file straddling the consumed boundary (partial
            # redelivery) still EXTENDS the range contiguously — the LSN
            # fence no-ops its already-applied prefix
            seq_range=(lo, hi),
            control_rows=control_rows,
        ),
        engine.retry_config,
    )


def start_stream(
    spark: SparkSession,
    frames_path: str,
    warehouse: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    available_now: bool = True,
    protocol_version: int = 2,
):
    """Start (or resume) the streaming ingest. Returns the StreamingQuery.

    With ``available_now=True`` the query drains everything currently in the
    directory and stops — bounded replay with streaming semantics. With
    False it keeps tailing for new frame files (the live CDC mode).
    """
    engine = ReplayEngine(spark, warehouse, protocol_version)

    reader = (
        spark.readStream.schema(FRAME_SPARK_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(frames_path)
    )

    def apply_batch(df, epoch_id: int):
        ingest_frames_batch(engine, df, int(epoch_id))

    writer = (
        reader.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
