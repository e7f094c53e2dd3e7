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

Frame files MUST carry non-decreasing modification times in WAL order:
the file source orders by mtime (ties broken arbitrarily, NOT by name), so
the frame pump stamps strictly increasing mtimes (see
fixtures/wal_gen.write_frames). The engine additionally verifies each
batch's seq range is contiguous with what it has already consumed and
fails loudly on out-of-order delivery — a reordered WAL segment would
otherwise be silently fenced off as a duplicate.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .engine import ReplayEngine

FRAME_SPARK_DDL = (
    "seq long, wal_start long, wal_end long, server_time long, tag int, "
    "data binary"
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
        from pyspark.sql import functions as F

        # foreachBatch hands a DataFrame bound to a CLONED SparkSession;
        # re-root the engine on it so every DataFrame the batch touches
        # (pending reads, dispo frames, target scans, the MERGE write)
        # lives on ONE session. Mixing the clone with the original session
        # deadlocks observed metrics (the write runs on one session's
        # listener bus, the observation waits on the other's) and leaves
        # conf divergence between plan fragments.
        engine.spark = df.sparkSession
        st = engine._load_state()
        rng = df.agg(F.min("seq"), F.max("seq")).collect()[0]
        if rng[0] is None:
            return
        engine.process_batch(df, int(epoch_id), st,
                             seq_range=(int(rng[0]), int(rng[1])))

    writer = (
        reader.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
