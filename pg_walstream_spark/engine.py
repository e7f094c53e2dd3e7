"""Replay engine: WAL frames → decoded events → txn gating → compaction →
exactly-once LakeTable MERGE (SURVEY.md §7 stages 0-6, end-to-end).

Micro-batch loop (same contract whether driven by bounded replay or
Structured Streaming's foreachBatch — see ``streaming.py``):

1. **Control scan** — read only control-tag frames of the batch (parquet
   predicate pushdown on the tiny ``tag`` column), replay them sequentially
   on the driver → DecodeContext (relation catalog timeline, stream spans,
   txn index). Control frames are a small fraction of the stream (2 per
   transaction), so this is broadcast-sized by construction.
2. **Vectorized decode** — mapInArrow kernel over the full batch (narrow).
3. **Transaction gating** — events stamped committed are applied; open /
   prepared transactions spill to a pending store (parquet) and are
   re-stamped when a later batch resolves their xid (commit → apply,
   abort/rollback → discard). This is the reference's
   transaction-buffered consumer (examples/safe-transaction-consumer).
4. **Schema evolution** — relation-diff events → LakeTable.add_columns
   before the merge (Iceberg ADD COLUMN analog,
   /root/reference/src/protocol.rs:1430-1483).
5. **Compaction** — salted-free max-by last-image reduce (see compact.py).
6. **MERGE** — LSN-fenced idempotent commit per target table. A replayed
   or duplicate batch is skipped by the fence, giving exactly-once end to
   end under at-least-once batch delivery.

Resume: engine state (batch index, catalog, open-txn carry) is persisted
atomically per batch; restart replays from the checkpoint and the fence
makes reprocessing idempotent.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from .lake.table import LakeTable, _atomic_write
from .operators.compact import compact_changes, dml_images
from .options import ReplicationOptions
from .operators.decode import (
    CONTROL_TAGS,
    EVENT_SPARK_DDL,
    build_context,
    decode_frames_df,
)

# pg type oid → spark type for schema evolution
_PG_TYPE_TO_SPARK = {16: "boolean", 20: "bigint", 21: "smallint", 23: "int",
                     25: "string", 700: "float", 701: "double", 1043: "string",
                     1114: "timestamp", 1184: "timestamp"}

# The frame-file contract (fixtures/wal_gen.FRAME_SCHEMA). Replay reads
# pass it explicitly — parquet schema inference otherwise spends a
# footer-sampling Spark job per replay_frames call (streaming already
# reads schema-fixed; the contracts must stay identical).
FRAME_SPARK_DDL = (
    "seq long, wal_start long, wal_end long, server_time long, tag int, "
    "data binary"
)

def tune_input_splits(spark: SparkSession, paths) -> None:
    """Size parquet input splits to the replay input so the decode scan
    gets ~2 tasks per core.

    Frame files are written a few MB each; Spark's default split packing
    (maxPartitionBytes=128 MB, openCostInBytes=4 MB) bundles a whole
    250 MB batch into ~4 splits, capping the decode stage at ~4 tasks
    REGARDLESS of cores — the dominant scaling loss at small core counts.
    Decode is CPU-bound per byte, so a couple of waves per core smooths
    per-task decode skew without paying per-task fixed costs. No-op for
    non-local paths (cluster deployments size this via submit conf)."""
    import glob as _glob

    sizes = []
    try:
        for p in paths:
            p = p[7:] if p.startswith("file://") else p
            if os.path.isdir(p):
                for f in _glob.glob(os.path.join(p, "*.parquet")):
                    sizes.append(os.path.getsize(f))
            elif os.path.isfile(p):
                sizes.append(os.path.getsize(p))
    except OSError:
        return
    total = sum(sizes)
    if not total:
        return
    cores = spark.sparkContext.defaultParallelism

    # Pick maxPartitionBytes by SIMULATING Spark's split packing (sort
    # desc, close a partition when adding the next split would exceed the
    # cap) and scoring the resulting stage: wave quantization — a task
    # count that leaves the last wave half-empty idles those cores for a
    # whole wave — against per-task fixed cost (~50 ms scheduling + Arrow
    # setup; one-task-per-file measured 40% slower). File granularity
    # makes this discrete: "total/(2*cores)" regularly packs into e.g. 10
    # bins at 4 cores (a 2.5-wave stage at 83% utilization) when a
    # slightly larger cap gives 8 bins at 100%.
    oc = 256 << 10
    desc = sorted(sizes, reverse=True)

    def _bins(cap: int) -> int:
        nbins, cur = 0, None
        for s in desc:
            if cur is None or cur + s > cap:
                nbins += 1
                cur = 0
            cur += s + oc
        return nbins

    best = None
    for waves in (2, 3, 4):
        t_target = waves * cores
        if t_target > len(sizes):
            continue
        cap = max(total // t_target, max(desc))
        # grow the cap until the packing fits the target task count (the
        # remainder otherwise spills into an extra, mostly-empty wave)
        for _ in range(8):
            n = _bins(cap)
            if n <= t_target:
                break
            cap = int(cap * 1.15)
        n = _bins(cap)
        w = -(-n // cores)
        util = n / (w * cores)
        # ~50 ms fixed cost per task vs ~linear scan time per byte: favor
        # full waves first, then fewer tasks
        score = (util, -w, -n)
        if best is None or score > best[0]:
            best = (score, cap)
    if best is None:
        cap = max(8 << 20, min(128 << 20, total // max(cores * 2, 1)))
    else:
        cap = max(4 << 20, min(256 << 20, best[1]))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(int(cap)))
    spark.conf.set("spark.sql.files.openCostInBytes", str(oc))


# Engine state is re-read/rewritten every batch: an unbounded per-batch
# metrics list would make the state file itself a serial cost at 10^6
# batches. Keep the last N rows; older ones roll into aggregate counters.
METRICS_CAP = int(os.environ.get("WALSTREAM_METRICS_CAP", "200"))


def seq_spans_from_footers(paths) -> list[dict] | None:
    """Per-file ``{path, lo, hi, n}`` for the frame files' ``seq`` column,
    read from parquet FOOTER statistics on the driver — no Spark job.

    Replaces a full-scan min/max aggregation (bounded replay) and a
    per-file groupBy (streaming ingest): each burned a fixed ~0.2-0.4 s
    Spark job per call purely on scheduling + a scan whose answer already
    sits in the footers — a core-count-independent serial tail paid by
    every micro-batch. int64 min/max footer statistics are exact (no
    truncation, unlike strings); ``n`` is the footer row count, so the
    in-file gap check keeps working. Files without usable statistics
    (foreign producers, stats disabled) return None and the callers fall
    back to the Spark aggregation — as does a batch larger than
    WALSTREAM_FOOTER_SPAN_MAX_FILES (default 4096): footer reads are
    ~1 ms each but SERIAL on the driver, so past a few thousand files
    the parallel Spark scan is the better plan.
    """
    import pyarrow.parquet as pq

    cap = int(os.environ.get("WALSTREAM_FOOTER_SPAN_MAX_FILES", "4096"))
    if len(paths) > cap:
        return None
    spans: list[dict] = []
    for p in paths:
        local = p[7:] if p.startswith("file://") else p
        try:
            md = pq.ParquetFile(local).metadata
        except Exception:
            return None
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        try:
            ci = names.index("seq")
        except ValueError:
            return None
        lo = hi = None
        for rg in range(md.num_row_groups):
            cst = md.row_group(rg).column(ci).statistics
            if cst is None or not cst.has_min_max:
                return None
            # `n` below is the footer ROW count while the Spark fallback
            # counts NON-NULL seq values — with null seqs present the two
            # paths would disagree on the in-file gap corruption check.
            # Null seqs are a foreign-producer shape: defer to the fallback.
            if not cst.has_null_count or cst.null_count > 0:
                return None
            lo = cst.min if lo is None else min(lo, cst.min)
            hi = cst.max if hi is None else max(hi, cst.max)
        if lo is None:
            continue  # zero row groups: empty file contributes nothing
        spans.append({"path": p, "lo": int(lo), "hi": int(hi),
                      "n": int(md.num_rows)})
    return spans


def _append_metrics(st: dict, rec: dict) -> None:
    ml = st.setdefault("metrics", [])
    # an in-place batch retry (retry_call around process_batch) re-enters
    # with the same in-memory state: replace, don't duplicate, this
    # batch's row — duplicates would double-count in the rollup
    ml[:] = [m for m in ml if m.get("batch_idx") != rec["batch_idx"]]
    ml.append({k: rec[k] for k in ("batch_idx", "applied_lsn", "pending",
                                   "quarantined", "quarantine_dir")
               if k in rec})
    tot = st.setdefault("metrics_rollup", {"batches": 0, "quarantined": 0})
    while len(ml) > METRICS_CAP:
        old = ml.pop(0)
        tot["batches"] += 1
        tot["quarantined"] += int(old.get("quarantined") or 0)


class _FastPathViolation(Exception):
    """A speculative fast-path batch observed a shape it cannot handle
    (pending txn rows, truncates, DML on an unexpected table); the merge
    is aborted before commit and the general path re-processes the batch."""


# Minimum estimated DML rows for the one-job speculative merge; below it
# the general cached path (with its bucket-pruning planning job) is the
# better plan anyway
FASTPATH_MIN_DML = int(os.environ.get("WALSTREAM_FASTPATH_MIN_DML",
                                      "50000"))


DML_TYPES = ("insert", "update", "delete")
# everything the apply path consumes: DML plus truncate — truncates of a
# still-open transaction must survive a micro-batch boundary in the pending
# spill exactly like DML, or a batch split between TRUNCATE and its COMMIT
# silently drops the truncate
APPLY_TYPES = DML_TYPES + ("truncate",)


# Engine-state / warehouse layout version. Bump whenever the persisted
# layout changes incompatibly (events schema columns, pending-store delta
# format, metrics rollup shape). v3 = sub_xid/message_content events schema
# + generation-suffixed append-delta pending store + capped metrics rollup.
ENGINE_STATE_VERSION = 3


class StateVersionError(RuntimeError):
    """A warehouse written by an incompatible engine version was opened.

    The reference performs the same preflight against server/slot versions
    before streaming (/root/reference/integration-tests/version_preflight.rs);
    here the failure mode is a stale warehouse dir — e.g. a pending store
    from an older events-schema era, which would otherwise surface as an
    unreadable-parquet crash mid-replay (or worse, quietly wrong columns)."""


class ReplayEngine:
    def __init__(self, spark: SparkSession, warehouse: str,
                 protocol_version: int = 2,
                 options: ReplicationOptions | None = None,
                 retry_config=None):
        self.spark = spark
        self.warehouse = warehouse
        # transient-vs-permanent batch retry budget (retry.py); None keeps
        # the defaults mirroring the reference's RetryConfig
        self.retry_config = retry_config
        # the START_REPLICATION option set selects decoder/engine behavior
        # here (see options.py); protocol_version kwarg kept as shorthand
        self.options = (
            options or ReplicationOptions(protocol_version=protocol_version)
        ).validate()
        self.protocol_version = self.options.protocol_version
        # bigger Arrow batches amortize python-worker IPC in the decode kernel
        if spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                          None) in (None, "10000"):
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                           "20000")
        # smaller AQE target partitions keep the compaction/merge shuffle at
        # ~per-core parallelism for micro-batch-sized inputs (the default
        # 64 MB advisory coalesces a ~150 MB change set to 2-3 partitions,
        # serializing the join+write on small executors); measured -20% on
        # the flagship replay at 4 cores
        if spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", None
        ) in (None, "64MB", "67108864", "67108864b"):
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m"
            )
        # Observations guard merge invariants; AQE empty-relation
        # propagation can erase CollectMetrics on runtime-empty writes
        # (delete-everything batches) — see lake/table.py
        from .lake.table import _ensure_observation_safe_aqe

        _ensure_observation_safe_aqe(spark)
        self.tables_dir = os.path.join(warehouse, "tables")
        self.state_path = os.path.join(warehouse, "engine_state.json")
        self.pending_dir = os.path.join(warehouse, "pending")
        os.makedirs(self.tables_dir, exist_ok=True)

    def _tune_input_splits(self, paths) -> None:
        tune_input_splits(self.spark, paths)

    # ------------------------------------------------------------------ state

    def _load_state(self) -> dict:
        if os.path.exists(self.state_path):
            with open(self.state_path) as f:
                st = json.load(f)
            found = st.get("state_version")
            if found is None and self._pre_version_layout_compatible():
                # state files written just before versioning was introduced
                # ARE the v3 layout (the stamp, not the layout, is what was
                # missing) — stamp and continue rather than refusing a
                # perfectly compatible warehouse. Only a pending store in
                # the pre-append-delta format (parquet deltas without a
                # meta.json manifest) marks a genuinely older layout.
                st["state_version"] = ENGINE_STATE_VERSION
                found = ENGINE_STATE_VERSION
            if found is None or int(found) != ENGINE_STATE_VERSION:
                raise StateVersionError(
                    f"warehouse {self.warehouse!r} was written by engine "
                    f"state version {0 if found is None else int(found)}, "
                    f"this engine speaks "
                    f"{ENGINE_STATE_VERSION}. Refusing to replay onto an "
                    f"incompatible layout (pending/catalog formats differ). "
                    f"Re-bootstrap into a fresh warehouse, or replay with "
                    f"the matching engine version."
                )
            return st
        return {"batch_idx": 0, "catalog": {}, "open_xid": None,
                "applied_lsn": 0, "metrics": [],
                "state_version": ENGINE_STATE_VERSION}

    def _pre_version_layout_compatible(self) -> bool:
        """Is an unstamped (pre-version-field) warehouse actually the
        current layout? The only persisted structure that changed across
        the unstamped era is the pending store: the append-delta format
        always carries a ``meta.json`` manifest; delta/parquet content
        WITHOUT one is the older full-rewrite store and must be refused."""
        if not os.path.isdir(self.pending_dir):
            return True
        entries = [e for e in os.listdir(self.pending_dir)
                   if not e.startswith(".")]
        if not entries:
            return True
        return os.path.exists(os.path.join(self.pending_dir, "meta.json"))

    def _save_state(self, st: dict) -> None:
        st.setdefault("state_version", ENGINE_STATE_VERSION)
        _atomic_write(self.state_path, json.dumps(st, indent=1))

    def table(self, name: str) -> LakeTable:
        return LakeTable(os.path.join(self.tables_dir, name))

    def tables(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.tables_dir)
            if os.path.isdir(os.path.join(self.tables_dir, d))
        )

    def metrics_df(self) -> "DataFrame":
        """Per-partition lineage + throughput metrics as a DataFrame (the
        reference's heartbeat/throughput reporting analog): one row per
        (table, applied batch) from the lake snapshots' lineage log, plus
        engine-level batch rows (pending, quarantined)."""
        rows = []
        for t in self.tables():
            for rec in LakeTable(
                os.path.join(self.tables_dir, t)
            ).snapshot()["lineage"]:
                if rec.get("event"):
                    rows.append((t, None, rec.get("lsn"), None, None, None,
                                 None, None, str(rec["event"])))
                    continue
                rows.append((
                    t, str(rec.get("batch_id")), rec.get("applied_lsn"),
                    rec.get("upserts"), rec.get("deletes"),
                    len(rec.get("buckets_rewritten", []) or []),
                    rec.get("wall_ms"), bool(rec.get("skipped")), "merge",
                ))
        st = self._load_state()
        tot = st.get("metrics_rollup")
        if tot and tot.get("batches"):
            rows.append((
                None, None, None, None, None, None, None, None,
                f"metrics_rollup batches={tot['batches']} "
                f"quarantined={tot['quarantined']}",
            ))
        for m in st.get("metrics", []):
            rows.append((
                None, f"b{m['batch_idx']}", m.get("applied_lsn"),
                None, None, None, None, None,
                f"batch pending={m.get('pending')} quarantined={m.get('quarantined')}",
            ))
        # frame files held behind a WAL-order gap (streaming hold-and-
        # release): a non-empty set that never drains means a seq range was
        # lost in transport — surface it as a health row
        if st.get("held_frames"):
            spans = ", ".join(
                f"[{h['lo']},{h['hi']}]" for h in st["held_frames"]
            )
            rows.append((
                None, None, st.get("applied_lsn"), None, None, None, None,
                None,
                f"held_frames={len(st['held_frames'])} spans {spans} "
                f"(waiting for seq {int(st.get('max_seq', -1)) + 1})",
            ))
        # streaming drain rate + applied-vs-seen lag from the last trigger
        # (the reference's events/sec + LSN-feedback observability)
        ing = st.get("ingest")
        if ing:
            rows.append((
                None, f"e{ing['epoch']}", st.get("applied_lsn"), None, None,
                None, None, None,
                f"ingest frames={ing['frames']} chunks={ing['chunks']} "
                f"frames_per_sec={ing['frames_per_sec']} "
                f"lag_frames={ing['lag_frames']} lag_spans={ing['lag_spans']}",
            ))
        return self.spark.createDataFrame(
            rows,
            "table string, batch_id string, applied_lsn long, upserts long, "
            "deletes long, buckets_rewritten int, wall_ms long, "
            "skipped boolean, kind string",
        )

    def bootstrap_table(self, name: str, base_df: DataFrame,
                        key_columns: list[str], n_buckets: int = 16) -> LakeTable:
        return LakeTable.create(
            self.spark, os.path.join(self.tables_dir, name), base_df,
            key_columns, n_buckets, properties=self._table_properties(),
        )

    @staticmethod
    def _table_properties() -> dict:
        """Creation-time table properties. WALSTREAM_CHANGELOG=1 enables the
        change-data-feed on every table this engine creates: each MERGE also
        persists its compacted change records (LakeTable.read_changes is the
        consumer surface — the lake-side analog of the reference's typed
        event delivery to downstream consumers)."""
        props = {}
        if os.environ.get("WALSTREAM_CHANGELOG", "0") == "1":
            props["changelog"] = True
        return props

    # ---------------------------------------------------------------- pending
    #
    # Append-delta pending store (round 4). The round-3 store rewrote the
    # FULL pending set to parquet every batch — with many long-open
    # transactions the rewrite grows with pending volume, a per-batch
    # driver-serial tail at exactly the scale the north rule measures
    # (reference analog: the consumer's per-xid buffer grows incrementally,
    # examples/safe-transaction-consumer/src/main.rs:50-60). Now each batch
    # appends ONE delta holding only its newly-pending rows; resolved xids
    # are tombstoned in a driver-side meta file and masked at read, deltas
    # whose xids are all resolved are deleted outright, and the store is
    # compacted (one filtered rewrite) only when the delta count exceeds
    # PENDING_COMPACT_DELTAS — so per-batch spill cost tracks NEW pending
    # volume, not total open-transaction volume.

    PENDING_COMPACT_DELTAS = 8

    def _pending_meta_path(self) -> str:
        return os.path.join(self.pending_dir, "meta.json")

    def _pending_meta(self) -> dict | None:
        p = self._pending_meta_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None

    def _load_pending(self) -> DataFrame | None:
        meta = self._pending_meta()
        if not meta or not meta["order"]:
            return None
        paths = [os.path.join(self.pending_dir, d) for d in meta["order"]]
        df = self.spark.read.schema(EVENT_SPARK_DDL).parquet(*paths)
        dead = [int(x) for x in meta.get("dead_xids", [])]
        if dead:
            # rows of already-resolved xids still physically present in
            # partially-live deltas — applied (or discarded) in an earlier
            # batch; masked here until their delta is dropped or compacted
            df = df.filter(~F.col("xid").isin(dead))
        return df

    def _pending_clear(self) -> None:
        import shutil

        if os.path.exists(self.pending_dir):
            shutil.rmtree(self.pending_dir)

    def _pending_append(self, new_df: DataFrame | None, new_xids: set[int],
                        resolved_xids: set[int], batch_idx: int) -> None:
        import shutil

        meta = self._pending_meta() or {
            "order": [], "deltas": {}, "dead_xids": [],
        }
        # Crash-safety: directory deletions happen only AFTER the
        # meta.json write (as an unreferenced-dir sweep), and every write
        # goes to a FRESH generation-suffixed dir — never to a dir the
        # committed meta still references. Deleting (or overwriting, which
        # deletes first) a referenced dir would open a window where a kill
        # leaves meta pointing at a missing dir and every restart fails
        # loading the store; fresh-name-then-sweep only leaves garbage
        # dirs, removed by the next sweep.
        gen = int(meta.get("gen", 0)) + 1
        meta["gen"] = gen
        name = f"delta_b{batch_idx}_g{gen}"
        # bounded-replay stop / in-place batch retry → the batch
        # reprocesses: drop the prior attempt's delta from meta (its dir
        # survives until the post-commit sweep) and write a fresh one
        prefix = f"delta_b{batch_idx}"
        for d in [d for d in meta["order"]
                  if d == prefix or d.startswith(prefix + "_g")]:
            meta["order"].remove(d)
            del meta["deltas"][d]
        # tombstone resolved xids; drop deltas with no live xid left
        dead = {int(x) for x in meta["dead_xids"]} | {
            int(x) for x in resolved_xids
        }
        keep = []
        for d in meta["order"]:
            if set(meta["deltas"][d]) <= dead:
                del meta["deltas"][d]
            else:
                keep.append(d)
        meta["order"] = keep
        if new_df is not None and new_xids:
            new_df.write.mode("overwrite").parquet(
                os.path.join(self.pending_dir, name)
            )
            meta["order"].append(name)
            meta["deltas"][name] = sorted(int(x) for x in new_xids)
        live = {int(x) for d in meta["order"] for x in meta["deltas"][d]}
        # keep only tombstones that still mask physical rows
        meta["dead_xids"] = sorted(dead & live)
        if len(meta["order"]) > self.PENDING_COMPACT_DELTAS:
            # amortized compaction: one filtered rewrite replaces all deltas
            paths = [os.path.join(self.pending_dir, d)
                     for d in meta["order"]]
            df = self.spark.read.schema(EVENT_SPARK_DDL).parquet(*paths)
            if meta["dead_xids"]:
                df = df.filter(~F.col("xid").isin(meta["dead_xids"]))
            cname = f"compact_b{batch_idx}_g{gen}"
            df.write.mode("overwrite").parquet(
                os.path.join(self.pending_dir, cname)
            )
            meta = {"order": [cname],
                    "deltas": {cname: sorted(live - dead)},
                    "dead_xids": [], "gen": gen}
        os.makedirs(self.pending_dir, exist_ok=True)
        _atomic_write(self._pending_meta_path(), json.dumps(meta))
        # delete AFTER the meta commit: everything not referenced by the
        # new meta — this batch's dropped/compacted deltas plus any
        # garbage a crash inside an earlier window left behind
        referenced = set(meta["order"])
        for entry in os.listdir(self.pending_dir):
            p = os.path.join(self.pending_dir, entry)
            if os.path.isdir(p) and entry not in referenced:
                shutil.rmtree(p, ignore_errors=True)

    # ----------------------------------------------------------------- replay

    def replay_frames(self, frames_path: str, batch_frames: int = 500_000,
                      stop_at_lsn: int | None = None) -> dict:
        """Bounded replay of a frame directory in micro-batches of
        ``batch_frames`` frames (seq order). Returns summary metrics.

        If the frame pump wrote a ``<frames>_control`` sidecar (see
        fixtures/wal_gen.write_frames), the per-batch control scan reads it
        instead of re-scanning the full WAL payload column — the control
        channel is a few thousand tiny rows per million frames."""
        import time as _time

        setup_ms = {}
        _t = _time.monotonic()
        self._tune_input_splits([frames_path])
        setup_ms["tune"] = int((_time.monotonic() - _t) * 1000)
        _t = _time.monotonic()
        all_frames = self.spark.read.schema(FRAME_SPARK_DDL).parquet(
            frames_path)
        setup_ms["read_plan"] = int((_time.monotonic() - _t) * 1000)
        _t = _time.monotonic()
        ctrl_path = frames_path.rstrip("/") + "_control"
        control_table = None
        if os.path.isdir(ctrl_path):
            # the control channel is a few thousand tiny local rows — read
            # it once with pyarrow on the driver; spending a Spark job (and
            # its fixed scheduling cost) per batch on it is pure overhead
            import pyarrow.parquet as _pq

            control_table = _pq.read_table(
                ctrl_path, columns=["seq", "wal_start", "data"]
            ).sort_by("seq")
        setup_ms["control_read"] = int((_time.monotonic() - _t) * 1000)
        _t = _time.monotonic()
        # seq bounds from parquet footers (driver-side, no Spark job);
        # Spark full-scan agg only as the fallback for foreign files
        # without statistics. Two layout hazards around the flat
        # *.parquet listing:
        # - a top-level frame file WITHOUT a .parquet suffix is still read
        #   by spark.read.parquet (the listing is not suffix-filtered) —
        #   a footer walk over *.parquet alone would cap `hi` below it and
        #   silently never replay its frames ⇒ abandon the fast path, let
        #   the Spark agg (same file set Spark reads) bound the replay;
        # - a MIXED flat+nested layout is incoherent in Spark itself
        #   (plain subdirs are ignored; partition-style subdirs shadow the
        #   flat files) — ANY lo/hi source silently replays a subset, so
        #   refuse loudly instead (pinned by tests/test_footer_spans.py::
        #   test_replay_refuses_mixed_flat_nested_layout).
        local_files: list | None = []
        if os.path.isdir(frames_path):
            subdirs = []
            for f in sorted(os.listdir(frames_path)):
                if f.startswith((".", "_")):
                    continue  # spark ignores hidden/meta entries too
                p = os.path.join(frames_path, f)
                if os.path.isdir(p):
                    subdirs.append(f)
                elif not f.endswith(".parquet"):
                    local_files = None  # foreign suffix: Spark-agg bounds
                elif local_files is not None:
                    local_files.append(p)
            if subdirs and (local_files is None or local_files):
                raise ValueError(
                    f"mixed flat+nested frame layout under {frames_path} "
                    f"(subdirectories {subdirs[:3]} alongside top-level "
                    "frame files): Spark reads an ill-defined subset of "
                    "such a tree, so the replay would silently skip "
                    "frames. Keep frame files flat in one directory."
                )
        spans = seq_spans_from_footers(local_files) if local_files else None
        setup_ms["spans"] = int((_time.monotonic() - _t) * 1000)
        if spans is not None:
            if not spans:
                return {"batches": 0,
                        "applied_lsn": self._load_state()["applied_lsn"]}
            lo = min(s["lo"] for s in spans)
            hi = max(s["hi"] for s in spans)
        else:
            bounds = all_frames.agg(
                F.min("seq").alias("lo"), F.max("seq").alias("hi")
            ).collect()[0]
            if bounds["lo"] is None:
                return {"batches": 0,
                        "applied_lsn": self._load_state()["applied_lsn"]}
            lo = int(bounds["lo"])
            hi = int(bounds["hi"])
        st = self._load_state()
        batch_idx = 0
        summary = []
        for start in range(lo, hi + 1, batch_frames):
            end = start + batch_frames - 1
            if batch_idx < st["batch_idx"]:
                batch_idx += 1
                continue  # already applied (checkpoint resume)
            in_range = (F.col("seq") >= start) & (F.col("seq") <= end)
            batch = all_frames.filter(in_range)
            control_rows = None
            if control_table is not None:
                import pyarrow.compute as _pc

                control_rows = control_table.filter(
                    _pc.and_(
                        _pc.greater_equal(control_table.column("seq"), start),
                        _pc.less_equal(control_table.column("seq"), end),
                    )
                ).to_pylist()
            # transient failures (FS hiccups, executor loss surfacing as a
            # job failure) retry the WHOLE batch under a backoff budget —
            # safe because the LSN fence makes partial re-application a
            # no-op; permanent ones (ProtocolError floods, schema
            # hard-miss) raise immediately with their diagnostics
            # (/root/reference/src/retry.rs:36-62 + error.rs:221-245)
            from .retry import retry_call

            retries: list[dict] = []
            rec = retry_call(
                lambda: self.process_batch(
                    batch, batch_idx, st, stop_at_lsn=stop_at_lsn,
                    control_rows=control_rows,
                    est_frames=min(end, hi) - start + 1,
                ),
                self.retry_config,
                on_retry=lambda attempt, delay, exc: retries.append(
                    {"attempt": attempt, "delay_s": round(delay, 3),
                     "error": f"{type(exc).__name__}: {exc}"[:200]}
                ),
            )
            if retries:
                rec["retries"] = retries
            summary.append(rec)
            batch_idx += 1
            if rec.get("stopped"):
                break
        return {"batches": len(summary), "applied_lsn": st["applied_lsn"],
                "records": summary, "setup_ms": setup_ms}

    # -------------------------------------------------- speculative fast path

    def _process_batch_fast(self, frames: DataFrame, ctx, batch_idx: int,
                            st: dict, tname: str, phase_t: dict, mark,
                            seq_range) -> dict | None:
        """ONE-job merge for a batch whose shape the control channel proves
        simple: all transactions resolved (committed/aborted), nothing
        carried or pending, one known table, no truncates/schema changes.

        decode → committed-DML filter → compaction → MERGE run as a single
        Spark action; quarantine/pending/truncate/foreign-table statistics
        ride as Observations on the decode output and are verified in the
        merge's pre-commit hook — a violated assumption discards the
        written files and returns None so the general cached path
        re-processes the batch (the untouched LSN fence keeps that
        exactly-once). The general path's events-cache materialization job
        (the single largest non-merge cost per batch) never runs."""
        names = ("open", "committed", "aborted", "prepared")
        hi_commit = max(
            (int(el) for el, s in zip(ctx.xid_end_lsn, ctx.xid_status)
             if names[int(s)] == "committed" and el is not None),
            default=None,
        )
        fence_floor = int(st.get("applied_lsn", 0))
        if hi_commit is None or hi_commit <= fence_floor:
            # nothing new commits in this batch (all aborted, or an
            # at-least-once redelivery): no merge job needed at all
            rec = {
                "batch_idx": batch_idx, "applied_lsn": fence_floor,
                "tables": [], "pending": 0, "quarantined": 0,
                "schema_changes": 0, "stopped": False, "fast_path": True,
                "phase_ms": phase_t,
            }
            self._finish_fast(st, ctx, batch_idx, fence_floor, seq_range,
                              rec)
            return rec

        events = decode_frames_df(frames, ctx)
        if not self.options.messages:
            events = events.filter("event_type != 'message'")
        if self.options.origin == "none" and getattr(ctx, "has_origin",
                                                     False):
            from .operators.raw import filter_origin

            events = filter_origin(
                events, "none",
                foreign_xids=sorted(getattr(ctx, "origin_xids", ())),
            )
        # plan built from SQL strings, not Column objects: the fast path
        # runs once per micro-batch and every Column construction is a
        # py4j round trip — ~25 of them here measured as a visible slice
        # of the per-batch driver-serial tail (same reason as the r3
        # selectExpr conversion in compact/merge)
        from .operators.compact import _qs

        dml_sql = ("event_type IN ("
                   + ",".join(f"'{t}'" for t in DML_TYPES)
                   + ") AND error IS NULL")
        apply_sql = ("event_type IN ("
                     + ",".join(f"'{t}'" for t in APPLY_TYPES)
                     + ") AND error IS NULL")
        tq = _qs(tname)
        from pyspark.sql import Observation

        obs = Observation()
        # ONE struct-valued metric instead of four scalar ones: at this
        # box's py4j latency every extra Column is ~10 ms of per-batch
        # driver-serial time
        ev = events.observe(
            obs,
            F.expr(
                "named_struct("
                "'quar', count(CASE WHEN error IS NOT NULL THEN 1 END), "
                f"'pend', count(CASE WHEN {apply_sql} AND txn_status IN "
                "('open','prepared') THEN 1 END), "
                "'trunc', count(CASE WHEN event_type = 'truncate' AND "
                "txn_status = 'committed' THEN 1 END), "
                f"'other_tables', count(CASE WHEN {dml_sql} AND txn_status"
                f" = 'committed' AND table_name != {tq} THEN 1 END))"
            ).alias("m"),
        ).filter(
            f"{dml_sql} AND txn_status = 'committed' AND table_name = "
            f"{tq} AND end_lsn > {int(fence_floor)}"
        )
        t = self.table(tname)
        snap = t.snapshot()
        key_cols = snap["key_columns"]
        key_types = {n: ty for n, ty in snap["schema"] if n in key_cols}
        data_cols = [(n, ty) for n, ty in snap["schema"]
                     if n not in key_cols]

        def _check(_record):
            m = obs.get["m"]
            if int(m["pend"]) or int(m["trunc"]) or int(m["other_tables"]):
                raise _FastPathViolation(
                    f"pend={int(m['pend'])} trunc={int(m['trunc'])} "
                    f"other_tables={int(m['other_tables'])}"
                )

        # Bucket-co-located Arrow merge (lake/merge_kernel.py): one shuffle
        # of the change rows by bucket; compaction+join+write fused in the
        # kernel and the target never shuffled. Declarative-plan merge
        # (compact_changes + LakeTable.merge) stays as the fallback for
        # tables with rename/column_since history and as the reference
        # implementation (WALSTREAM_FASTPATH_MERGE=join forces it).
        from .lake.merge_kernel import bucketed_merge_eligible

        use_kernel = (
            os.environ.get("WALSTREAM_FASTPATH_MERGE", "bucketed")
            != "join" and bucketed_merge_eligible(snap)
        )
        try:
            if use_kernel:
                images = dml_images(ev, key_cols, data_cols,
                                    key_types=key_types)
                mark("fast_plan")
                trec = t.merge_bucketed(
                    self.spark, images, applied_lsn=int(hi_commit),
                    batch_id=f"b{batch_idx}-{uuid.uuid4().hex[:6]}",
                    pre_commit_check=_check,
                )
            else:
                changes = compact_changes(ev, key_cols, data_cols,
                                          aliases=snap.get("aliases"),
                                          key_types=key_types)
                mark("fast_plan")
                trec = t.merge(
                    self.spark, changes, applied_lsn=int(hi_commit),
                    batch_id=f"b{batch_idx}-{uuid.uuid4().hex[:6]}",
                    pre_commit_check=_check,
                )
        except _FastPathViolation:
            return None
        mark("fast_merge")
        if trec.get("skipped"):
            # table-level fence skipped the merge (duplicate batch against
            # an already-advanced table, e.g. fresh engine state over an
            # existing lake): NO job ran, so the speculative-shape
            # observations were never verified — reading obs.get here
            # would block forever, and committing engine state on the
            # unverified assumptions could silently discard pending /
            # truncate / other-table rows. Fall back: the general path
            # reprocesses the batch and the fence keeps it idempotent.
            return None
        trec["table"] = tname
        self._maybe_rebucket(st, batch_idx, trec)
        quar = int(obs.get["m"]["quar"])
        rec = {
            "batch_idx": batch_idx,
            "applied_lsn": max(fence_floor, int(hi_commit)),
            "tables": [trec], "pending": 0, "quarantined": quar,
            "schema_changes": 0, "stopped": False, "fast_path": True,
            "phase_ms": phase_t,
        }
        if quar:
            # rare error batch: one extra decode pass for just the rejects
            # (the fast path never persists, by design)
            qd = self._write_quarantine(events, batch_idx)
            if qd:
                rec["quarantine_dir"] = qd
        self._finish_fast(st, ctx, batch_idx, rec["applied_lsn"],
                          seq_range, rec)
        return rec

    def _finish_fast(self, st: dict, ctx, batch_idx: int, applied: int,
                     seq_range, rec: dict) -> None:
        st["batch_idx"] = batch_idx + 1
        st["catalog"] = {
            str(oid): [list(v) for v in versions]
            for oid, versions in ctx.catalog.items()
        }
        st["open_xid"] = None
        st["open_stream_xid"] = None
        st["aborted_subxids"] = []
        st["origin_xids"] = sorted(
            int(x) for x in getattr(ctx, "origin_carry", ())
        )
        st["applied_lsn"] = applied
        if seq_range is not None:
            st["max_seq"] = max(int(st.get("max_seq") or -1),
                                int(seq_range[1]))
        import time as _time

        _t0 = _time.monotonic()
        _append_metrics(st, rec)
        self._save_state(st)
        rec.setdefault("phase_ms", {})["state_save"] = int(
            (_time.monotonic() - _t0) * 1000)
        self._maybe_expire(batch_idx)

    def _maybe_rebucket(self, st: dict, batch_idx: int, trec: dict) -> None:
        """Answer a ``kernel_reroute`` signal inline: when a merge had to
        fall back to the declarative path because a bucket outgrew
        WALSTREAM_KERNEL_MAX_BUCKET_BYTES, rewrite the table at a larger
        bucket count (LakeTable.rebucket — one bucketed write job, atomic
        commit, row conservation enforced) so subsequent batches return to
        the kernel merge. The engine is the table's single writer, so the
        rewrite is safe to run between micro-batches; it extends THIS
        batch by one full-table write, which is the cost of the fallback
        path recurring forever otherwise.

        Sizing reads the POST-merge snapshot's file sizes (driver-local
        getsize, no Spark job — the reroute's own sizes are pre-merge) and
        doubles the count until the worst bucket fits in half the cap,
        bounded by WALSTREAM_AUTO_REBUCKET_MAX total buckets and a 64x
        single-step factor. A cooldown (WALSTREAM_AUTO_REBUCKET_COOLDOWN
        batches per table, persisted in engine state) prevents rewrite
        thrash when the cap is misconfigured or a single giant row can
        never fit. WALSTREAM_AUTO_REBUCKET=0 disables; failures are logged
        to the table's event log and never fail the batch (the merge
        already committed — the fallback path remains correct)."""
        rr = trec.get("kernel_reroute")
        if not rr or int(os.environ.get("WALSTREAM_AUTO_REBUCKET",
                                        "1")) <= 0:
            return
        cap = int(rr.get("max_bucket_bytes") or 0)
        if cap <= 0:
            return
        tname = trec["table"]
        cooldown = int(os.environ.get(
            "WALSTREAM_AUTO_REBUCKET_COOLDOWN", "8"))
        last = (st.get("rebucket_at") or {}).get(tname)
        if last is not None and batch_idx - int(last) < cooldown:
            return
        t = self.table(tname)
        snap = t.snapshot()
        n = int(snap["n_buckets"])
        worst = 0
        for fl in snap["files"].values():
            sz = 0
            for f in fl:
                try:
                    sz += os.path.getsize(t._abs(f))
                except OSError:
                    pass
            worst = max(worst, sz)
        max_total = int(os.environ.get(
            "WALSTREAM_AUTO_REBUCKET_MAX", "65536"))
        factor = 1
        while (worst / factor > cap / 2 and factor < 64
               and n * factor * 2 <= max_total):
            factor *= 2
        if factor == 1:
            # post-merge sizes already fit (the rerouted batch shrank the
            # bucket, e.g. deletes) — nothing to answer
            return
        try:
            rec = t.rebucket(self.spark, n * factor,
                             reason=f"auto:kernel_reroute b{batch_idx}")
        except Exception as e:  # noqa: BLE001 — optimization must not
            # fail the batch: the merge already committed correctly
            t.log_event({"event": "auto_rebucket_failed",
                         "error": str(e)[:500]})
            return
        st.setdefault("rebucket_at", {})[tname] = batch_idx
        trec["auto_rebucket"] = {"from": n, "to": n * factor,
                                 "rows": rec.get("rows"),
                                 "wall_ms": rec.get("wall_ms")}

    EXPIRE_EVERY = int(os.environ.get("WALSTREAM_EXPIRE_EVERY", "64"))
    EXPIRE_KEEP = int(os.environ.get("WALSTREAM_EXPIRE_KEEP", "64"))

    def _maybe_expire(self, batch_idx: int) -> None:
        """Periodic snapshot expiry: without it every merge's superseded
        bucket files stay on disk forever and a long-running stream grows
        the warehouse without bound. Runs every EXPIRE_EVERY batches,
        keeping EXPIRE_KEEP versions per table (WALSTREAM_EXPIRE_EVERY=0
        disables for deployments wanting unbounded time travel). Driver-
        local file ops; cost is proportional to the retained window, which
        expiry itself keeps bounded."""
        if self.EXPIRE_EVERY <= 0 or (batch_idx + 1) % self.EXPIRE_EVERY:
            return
        for name in self.tables():
            t = self.table(name)
            stats = t.expire_snapshots(self.EXPIRE_KEEP)
            if stats["snapshots_deleted"] or stats["files_deleted"]:
                t.log_event({"event": "expire_snapshots", **{
                    k: stats[k] for k in (
                        "expired_before_version", "snapshots_deleted",
                        "files_deleted", "bytes_deleted")}})

    # ------------------------------------------------------------- one batch

    def process_batch(self, frames: DataFrame, batch_idx: int, st: dict,
                      stop_at_lsn: int | None = None,
                      control_rows: list[dict] | None = None,
                      seq_range: tuple[int, int] | None = None,
                      est_frames: int | None = None) -> dict:
        import time as _time

        phase_t = {}
        _t0 = _time.monotonic()

        # WAL order guard: a transport that reorders frame files would have
        # the late-arriving earlier segment silently fenced off as a
        # duplicate (exactly what mtime-tied file listings produced). New
        # data must extend the consumed range contiguously; a batch
        # entirely at-or-behind the high-water mark is an at-least-once
        # redelivery and proceeds (the LSN fence makes it a no-op).
        if seq_range is not None:
            lo, hi = seq_range
            last = st.get("max_seq")
            if last is not None and hi > last and lo != last + 1:
                raise RuntimeError(
                    f"WAL frames delivered out of order: batch covers seq "
                    f"[{lo}, {hi}] but frames through {last} were already "
                    f"consumed and the batch does not start at {last + 1}. "
                    f"The frame transport must preserve WAL order "
                    f"(file-based pumps: non-decreasing mtimes in seq order)."
                )

        if est_frames is None and seq_range is not None:
            est_frames = int(seq_range[1]) - int(seq_range[0]) + 1

        def _mark(name):
            nonlocal _t0
            now = _time.monotonic()
            phase_t[name] = round((now - _t0) * 1000)
            _t0 = now

        # 1. control scan — pre-extracted sidecar rows if the frame pump
        # wrote a control channel (driver-local, zero Spark jobs), else a
        # tag-pushdown filter on the batch frames
        # Driver-memory guard: control-frame volume scales with TRANSACTION
        # count, not data volume — a pathological batch of millions of tiny
        # transactions would push millions of boundary rows through the
        # driver. The limit(cap+1) bounds the collect itself (TakeOrdered,
        # never materializing past the cap on the driver); exceeding it is
        # a loud, actionable error, because the right fix is upstream batch
        # sizing (max_frames_per_batch / max_bytes_per_batch), not silent
        # truncation that would corrupt transaction assembly.
        control_cap = int(os.environ.get(
            "WALSTREAM_CONTROL_MAX_ROWS", str(2_000_000)))
        if control_rows is not None:
            control = control_rows
        else:
            control = [
                r.asDict()
                for r in frames.filter(F.col("tag").isin(list(CONTROL_TAGS)))
                .select("seq", "wal_start", "data").sort("seq")
                .limit(control_cap + 1).collect()
            ]
        if len(control) > control_cap:
            raise RuntimeError(
                f"batch carries more than WALSTREAM_CONTROL_MAX_ROWS="
                f"{control_cap} control frames (begin/commit/relation...); "
                "the driver-side transaction assembly would not hold them. "
                "Lower max_frames_per_batch / max_bytes_per_batch on the "
                "ingest, or raise the cap for a driver with more memory.")
        carry_catalog = {
            int(oid): [tuple(v) for v in versions]
            for oid, versions in st.get("catalog", {}).items()
        }
        ctx = build_context(
            control,
            protocol_version=self.protocol_version,
            carry_catalog=carry_catalog,
            carry_open_xid=st.get("open_xid"),
            carry_open_stream_xid=st.get("open_stream_xid"),
            carry_aborted_subxids=st.get("aborted_subxids"),
            carry_origin_xids=st.get("origin_xids"),
        )

        _mark("control_scan")

        # Speculative fast path for the dominant batch shape: every
        # transaction completes inside the batch, nothing pending or
        # carried, one known target table, no truncates/schema changes —
        # then decode → compact → MERGE fuses into ONE job with the batch
        # statistics riding as Observations, and the events-cache
        # materialization job disappears entirely. The assumptions are
        # VERIFIED from the observed metrics before the snapshot commit;
        # on violation the written files are discarded and the general
        # path below re-processes the batch (exactly-once preserved by
        # the untouched fence).
        names4 = ("open", "committed", "aborted", "prepared")
        fast_ok = (
            os.environ.get("WALSTREAM_FASTPATH", "1") == "1"
            and stop_at_lsn is None
            and self._pending_meta() is None
            and getattr(ctx, "open_xid_carry", None) is None
            and getattr(ctx, "open_stream_carry", None) is None
            # len(), not truthiness: aborted_subxids may be a numpy array,
            # whose bool() raises for size >= 2
            and len(getattr(ctx, "aborted_subxids", ())) == 0
            and not ctx.schema_changes
            # origin-marked batches keep the general path: the fence there
            # advances over the origin-filtered event set, and the two
            # paths must agree on applied_lsn
            and not getattr(ctx, "has_origin", False)
            and all(names4[int(s)] in ("committed", "aborted")
                    for s in ctx.xid_status)
        )
        if fast_ok and est_frames is not None \
                and est_frames - len(control) >= FASTPATH_MIN_DML:
            tnames = {v.relname for vs in ctx.catalog.values() for v in vs}
            if len(tnames) == 1:
                tname = next(iter(tnames))
                if self.table(tname).exists:
                    rec = self._process_batch_fast(
                        frames, ctx, batch_idx, st, tname, phase_t, _mark,
                        seq_range,
                    )
                    if rec is not None:
                        return rec
                    _mark("fast_path_fallback")

        # 2. vectorized decode (narrow); materialized ONCE — every downstream
        # consumer (committed set, pending spill, quarantine count, truncate
        # scan) reads the checkpointed result instead of re-running the
        # kernel. ``_carried`` marks rows re-read from the pending store so
        # the spill step appends only THIS batch's newly-pending rows
        # (append-delta store — see _pending_append).
        events = decode_frames_df(frames, ctx).withColumn(
            "_carried", F.lit(False)
        )

        # 3. pending resolution: re-stamp prior open/prepared events with this
        # batch's dispositions
        pending = self._load_pending()
        if pending is not None:
            resolution = self._dispo_df(ctx)
            pending = (
                pending.withColumn("_carried", F.lit(True))
                .drop("txn_status", "commit_lsn", "end_lsn", "commit_ts_us")
                .join(F.broadcast(resolution), on="xid", how="left")
                .withColumn("txn_status", F.coalesce("txn_status", F.lit("open")))
                .select(*events.columns)
            )
            # spilled rows of a since-stream-aborted SUBtransaction must not
            # apply when their top-level txn commits
            aborted_subs = [int(x) for x in getattr(ctx, "aborted_subxids", [])]
            if aborted_subs:
                pending = pending.filter(
                    F.col("sub_xid").isNull()
                    | ~F.col("sub_xid").isin(aborted_subs)
                )
            events = events.unionByName(pending)

        # option-driven event shaping (the replay analog of the reference's
        # START_REPLICATION options, src/stream.rs:1377-1446)
        if not self.options.messages:
            events = events.filter(F.col("event_type") != "message")
        if self.options.origin == "none" and getattr(ctx, "has_origin", False):
            from .operators.raw import filter_origin

            # the context's xid set includes carried marks, so a foreign
            # transaction split across micro-batches stays poisoned
            events = filter_origin(
                events, "none",
                foreign_xids=sorted(getattr(ctx, "origin_xids", ())),
            )

        # Materialize the decoded batch once, then ONE global aggregate
        # computes every batch-level statistic the apply plan needs. Two
        # modes (WALSTREAM_EVENTS_MAT):
        # - "persist" (default): MEMORY_AND_DISK cache whose FIRST action
        #   is the stats aggregate itself — one job materializes + counts,
        #   and downstream scans get InMemoryRelation column pruning;
        #   released at batch end. Measured ~25% faster per batch than the
        #   round-2 checkpoint variant (the checkpoint spent a dedicated
        #   full-width materialization job before the stats agg).
        # - "checkpoint": localCheckpoint — raw row blocks, kept as the
        #   fallback for memory-starved executors (cache rebuild on
        #   eviction re-runs the decode kernel; the checkpoint never does).
        # Fewer driver round-trips per micro-batch is the main Amdahl lever
        # at scale.
        is_dml = (
            F.col("event_type").isin(list(DML_TYPES)) & F.col("error").isNull()
        )
        is_apply = (
            F.col("event_type").isin(list(APPLY_TYPES))
            & F.col("error").isNull()
        )
        mat_mode = os.environ.get("WALSTREAM_EVENTS_MAT", "persist")
        released = None
        if mat_mode == "checkpoint":
            events = events.localCheckpoint()
        else:
            if os.environ.get("WALSTREAM_CACHE_SER") == "1":
                from pyspark import StorageLevel

                events = events.persist(StorageLevel.MEMORY_AND_DISK)
            else:
                events = events.persist()
            released = events
        # any mid-batch failure (exactly what the retry taxonomy
        # re-enters on) must release the events cache, or each retry
        # attempt would persist a fresh copy and accumulate executor
        # cache pressure across attempts
        try:
            m = events.agg(
                F.count(F.when(F.col("error").isNotNull(), 1)).alias("quar"),
                F.count(
                    F.when(
                        is_apply & F.col("txn_status").isin(["open", "prepared"]),
                        1,
                    )
                ).alias("pend"),
                F.count(
                    F.when(
                        is_apply
                        & F.col("txn_status").isin(["open", "prepared"])
                        & ~F.col("_carried"),
                        1,
                    )
                ).alias("pend_new"),
                F.collect_set(
                    F.when(
                        is_apply
                        & F.col("txn_status").isin(["open", "prepared"])
                        & ~F.col("_carried"),
                        F.col("xid"),
                    )
                ).alias("pend_new_xids"),
                F.count(
                    F.when(
                        is_dml & (F.col("txn_status") == "committed"), 1
                    )
                ).alias("n_committed"),
                F.max(
                    F.when(F.col("txn_status") == "committed", F.col("end_lsn"))
                ).alias("hi_commit"),
                F.count(
                    F.when(
                        (F.col("event_type") == "truncate")
                        & (F.col("txn_status") == "committed"),
                        1,
                    )
                ).alias("trunc"),
                F.collect_set(
                    F.when(
                        is_dml & (F.col("txn_status") == "committed"),
                        F.col("table_name"),
                    )
                ).alias("tables"),
            ).collect()[0]
            _mark("decode_ckpt")

            quarantined = int(m["quar"])
            n_pending = int(m["pend"])
            n_pending_new = int(m["pend_new"])
            pend_new_xids = {
                int(x) for x in (m["pend_new_xids"] or []) if x is not None
            }
            n_committed = int(m["n_committed"])
            hi_commit = m["hi_commit"]
            has_trunc = int(m["trunc"]) > 0
            tables = sorted(t for t in (m["tables"] or []) if t is not None)

            dml = events.filter(is_dml)
            committed = dml.filter(F.col("txn_status") == "committed")

            # bounded replay: apply only transactions whose commit end_lsn is at
            # or before the crossing commit (commit-boundary rule)
            effective_stop = None
            if stop_at_lsn is not None:
                crossing = (
                    events.filter(
                        (F.col("txn_status") == "committed")
                        & F.col("end_lsn").isNotNull()
                        & (F.col("end_lsn") >= stop_at_lsn)
                    )
                    .agg(F.min("end_lsn"))
                    .collect()[0][0]
                )
                if crossing is not None:
                    effective_stop = int(crossing)
                    committed = committed.filter(F.col("end_lsn") <= effective_stop)
                    tables = sorted(
                        r["table_name"]
                        for r in committed.select("table_name").distinct().collect()
                    )
            _mark("batch_stats")

            # next-batch pending delta: ONLY rows newly pending from this
            # batch's frames (carried rows already live in the store); spills
            # every apply-relevant type (DML + truncate) so open-txn truncates
            # survive batch boundaries
            nxt = events.filter(
                is_apply
                & F.col("txn_status").isin(["open", "prepared"])
                & ~F.col("_carried")
            ).drop("_carried")

            # 4. schema evolution before merge
            for change in ctx.schema_changes:
                self._apply_schema_change(change)

            # 5+6. per-table compaction + fenced merge. Every table merged this
            # batch is fenced at the batch's global committed high-water mark —
            # the engine applies batches in sequence against one global fence
            # floor, so per-table fences only need to be monotonic with it, and
            # the global hi makes duplicate-batch skips exact for all tables.
            fence_floor = int(st.get("applied_lsn", 0))
            batch_applied = fence_floor
            merged = []
            truncates = (
                self._committed_truncates(events, effective_stop, fence_floor)
                if has_trunc
                else {}
            )
            batch_hi = (
                effective_stop if effective_stop is not None
                else (int(hi_commit) if hi_commit is not None else None)
            )
            _mark("plan_tables")
            merge_list = sorted(set(tables) | set(truncates))

            def _one(tname):
                return self._merge_table(
                    tname, committed, truncates.get(tname), batch_idx,
                    fence_floor, ctx, batch_hi, n_committed=n_committed,
                )

            if len(merge_list) > 1:
                # per-table merges are independent (distinct table dirs,
                # distinct snapshot logs) — run them as concurrent driver
                # threads so their Spark jobs interleave instead of serializing
                # one table's write behind another's
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(min(len(merge_list), 8)) as pool:
                    recs = list(pool.map(_one, merge_list))
            else:
                recs = [_one(t) for t in merge_list]
            for rec in recs:
                if rec:
                    merged.append(rec)
                    batch_applied = max(batch_applied, rec["applied_lsn"])

            # max applied lsn this batch (even for tables with no DML)
            if batch_hi is not None:
                batch_applied = max(batch_applied, int(batch_hi))

            _mark("merges")

            # 7. carry-over: newly-pending rows append one delta; resolved xids
            # tombstone; store cleared outright once nothing is pending
            if n_pending:
                names = ("open", "committed", "aborted", "prepared")
                resolved = {
                    int(x) for x, i in zip(ctx.xid_sorted, ctx.xid_status)
                    if names[i] in ("committed", "aborted")
                }
                self._pending_append(
                    nxt if n_pending_new else None, pend_new_xids,
                    resolved, batch_idx,
                )
            else:
                self._pending_clear()
            _mark("pending_spill")

            # 8. persist engine state (atomic). A bounded-replay stop leaves the
            # batch NOT fully applied — keep the cursor on it so a later resume
            # reprocesses it (the LSN fence makes that idempotent), exactly the
            # reference's restart-from-confirmed-LSN contract.
            st["batch_idx"] = batch_idx + (0 if effective_stop is not None else 1)
            st["catalog"] = {
                str(oid): [list(v) for v in versions]
                for oid, versions in ctx.catalog.items()
            }
            st["open_xid"] = getattr(ctx, "open_xid_carry", None)
            st["open_stream_xid"] = getattr(ctx, "open_stream_carry", None)
            # sub-abort markers must outlive the batch while their top-level
            # txns are still pending; once nothing is pending they are spent
            st["aborted_subxids"] = (
                [int(x) for x in getattr(ctx, "aborted_subxids", [])]
                if n_pending else []
            )
            # origin marks of still-unresolved foreign txns survive the batch
            st["origin_xids"] = sorted(
                int(x) for x in getattr(ctx, "origin_carry", ())
            )
            st["applied_lsn"] = batch_applied
            if seq_range is not None:
                st["max_seq"] = max(int(st.get("max_seq") or -1), int(seq_range[1]))
            rec = {
                "batch_idx": batch_idx,
                "applied_lsn": batch_applied,
                "tables": merged,
                "pending": n_pending,
                "quarantined": quarantined,
                "schema_changes": len(ctx.schema_changes),
                "stopped": effective_stop is not None,
                "phase_ms": phase_t,
            }
            if quarantined:
                qd = self._write_quarantine(events, batch_idx)
                if qd:
                    rec["quarantine_dir"] = qd
            _append_metrics(st, rec)
            self._save_state(st)
            self._maybe_expire(batch_idx)
            return rec
        finally:
            if released is not None:
                released.unpersist()

    # ---------------------------------------------------------------- helpers

    def _write_quarantine(self, events: DataFrame, batch_idx) -> str | None:
        """Dead-letter persistence of decode-rejected frames: the engine
        only COUNTED quarantined rows before, so a malformed frame (a
        producer bug, a protocol drift) was diagnosable only as a number.
        When WALSTREAM_QUARANTINE=1 (default), batches with rejects also
        write the rejected rows — locator columns (seq, lsn, xid) plus the
        decode error string — under <warehouse>/quarantine/, so an operator
        can inspect, fix the producer, and re-extract the raw frames from
        the retained WAL files by seq. Runs only when the reject count is
        already known non-zero (zero cost on clean batches; on the general
        path the events cache makes it one cheap filtered scan). The
        reference's analog is the error event surfaced to the consumer
        (decode error path); here the consumer is the lake, so rejects get
        a durable side channel instead. Never fails the batch."""
        if os.environ.get("WALSTREAM_QUARANTINE", "1") != "1":
            return None
        qdir = os.path.join(self.warehouse, "quarantine",
                            f"b{batch_idx}-{uuid.uuid4().hex[:6]}")
        try:
            (events.filter("error IS NOT NULL")
             .selectExpr("seq", "lsn", "xid", "event_type", "schema_name",
                         "table_name", "relation_oid", "error")
             .write.mode("overwrite").parquet(qdir))
            return qdir
        except Exception as e:  # diagnostics must never fail the batch
            import logging

            logging.getLogger(__name__).warning(
                "quarantine write failed: %s", e)
            return None

    def _dispo_df(self, ctx) -> DataFrame:
        names = ["open", "committed", "aborted", "prepared"]
        rows = [
            (int(x), names[i], int(cl) if names[i] == "committed" else None,
             int(el) if names[i] == "committed" else None,
             int(ts) if names[i] == "committed" else None)
            for x, i, cl, el, ts in zip(
                ctx.xid_sorted, ctx.xid_status,
                ctx.xid_commit_lsn, ctx.xid_end_lsn, ctx.xid_ts,
            )
        ]
        return self.spark.createDataFrame(
            rows,
            "xid long, txn_status string, commit_lsn long, end_lsn long, "
            "commit_ts_us long",
        )

    # widening PG type promotions the lake applies as metadata-only schema
    # updates (parquet up-casts old files at read time); anything else is
    # surfaced loudly as schema_evolution_unsupported
    _PG_PROMOTIONS = {(21, 23), (21, 20), (23, 20), (700, 701)}

    def _apply_schema_change(self, change: dict) -> None:
        """Structural relation diff → lake schema evolution
        (/root/reference/src/protocol.rs:1430-1443 diffs all of: names,
        types, replica identity). Supported: ADD, positional RENAME
        (read-alias, no rewrite), DROP, widening type promotion. A table
        rename, non-widening type change, or key/replica-identity change
        is recorded as a loud ``schema_evolution_unsupported`` lineage
        event instead of silently mis-mapping columns."""
        new = change["new"]
        old = change["old"]
        lsn = change.get("lsn")
        tname = new[2]
        if old[2] != new[2]:
            t = self.table(old[2])
            if t.exists:
                t.log_event({
                    "event": "schema_evolution_unsupported",
                    "kind": "table_rename", "from": old[2], "to": new[2],
                    "lsn": lsn,
                })
            return
        t = self.table(tname)
        if not t.exists:
            return
        old_names, new_names = list(old[4]), list(new[4])
        old_types, new_types = list(old[6]), list(new[6])

        renames = []
        if len(old_names) == len(new_names):
            for i, (a, b) in enumerate(zip(old_names, new_names)):
                if (a != b and old_types[i] == new_types[i]
                        and a not in new_names and b not in old_names):
                    renames.append((a, b))
        ren_old = {a for a, _ in renames}
        ren_new = {b for _, b in renames}

        for a, b in renames:
            t.rename_column(a, b, lsn=lsn)
        added = [
            (n, _PG_TYPE_TO_SPARK.get(toid, "string"))
            for n, toid in zip(new_names, new_types)
            if n not in old_names and n not in ren_new
        ]
        if added:
            t.add_columns(added, lsn=lsn)
        dropped = [n for n in old_names
                   if n not in new_names and n not in ren_old]
        if dropped:
            keys = set(t.snapshot()["key_columns"])
            undroppable = [n for n in dropped if n in keys]
            if undroppable:
                t.log_event({
                    "event": "schema_evolution_unsupported",
                    "kind": "drop_key_column", "columns": undroppable,
                    "lsn": lsn,
                })
            t.drop_columns([n for n in dropped if n not in keys], lsn=lsn)

        ot_map = dict(zip(old_names, old_types))
        for n, nt in zip(new_names, new_types):
            ot = ot_map.get(n)
            if ot is None or ot == nt:
                continue
            if (ot, nt) in self._PG_PROMOTIONS:
                t.promote_column(
                    n, _PG_TYPE_TO_SPARK.get(nt, "string"), lsn=lsn
                )
            else:
                t.log_event({
                    "event": "schema_evolution_unsupported",
                    "kind": "type_change", "column": n,
                    "from_oid": int(ot), "to_oid": int(nt), "lsn": lsn,
                })

        old_keys = [n for n, fl in zip(old_names, old[5]) if fl & 1]
        new_keys = [n for n, fl in zip(new_names, new[5]) if fl & 1]
        new_keys_mapped = [
            next((b for a, b in renames if a == k), k) for k in old_keys
        ]
        if sorted(new_keys) != sorted(new_keys_mapped):
            t.log_event({
                "event": "schema_evolution_unsupported",
                "kind": "key_change", "from": old_keys, "to": new_keys,
                "lsn": lsn,
            })

    def _committed_truncates(self, events: DataFrame, effective_stop,
                             fence_floor: int) -> dict:
        tr = events.filter(
            (F.col("event_type") == "truncate")
            & (F.col("txn_status") == "committed")
            & (F.col("end_lsn") > fence_floor)
        )
        if effective_stop is not None:
            tr = tr.filter(F.col("end_lsn") <= effective_stop)
        out: dict[str, tuple] = {}
        for r in tr.select("truncate_tables", "commit_lsn", "seq",
                           "end_lsn").collect():
            for t in r["truncate_tables"] or []:
                cur = out.get(t)
                pos = (r["commit_lsn"], r["seq"], r["end_lsn"])
                if cur is None or pos[:2] > cur[:2]:
                    out[t] = pos
        return out

    # below this many committed DML rows in the batch, spend one narrow job
    # computing the touched-bucket set so the MERGE reads only affected
    # target files; above it, a batch touches essentially every bucket and
    # the planning job would cost more than the pruning saves
    PRUNE_BUCKETS_BELOW = 50_000

    def _merge_table(self, tname: str, committed: DataFrame,
                     truncate_pos, batch_idx: int, fence_floor: int, ctx,
                     lsn_hi=None, n_committed: int | None = None):
        t = self.table(tname)
        ev = committed.filter(
            (F.col("table_name") == tname) & (F.col("end_lsn") > fence_floor)
        )
        if truncate_pos is not None:
            # discard images at or before the truncate position
            tc, tseq, _ = truncate_pos
            ev = ev.filter(
                (F.col("commit_lsn") > tc)
                | ((F.col("commit_lsn") == tc) & (F.col("seq") > tseq))
            )
        if not t.exists:
            # table appeared mid-stream: create empty from the relation
            # catalog's announced schema (name + type oids + key flags)
            rel = None
            for versions in ctx.catalog.values():
                for v in versions:
                    if v.relname == tname:
                        rel = v
            if rel is None:
                return None
            ddl = ", ".join(
                f"`{n}` {_PG_TYPE_TO_SPARK.get(toid, 'string')}"
                for n, toid in zip(rel.names, rel.type_oids)
            )
            keys = [n for n, fl in zip(rel.names, rel.key_flags) if fl & 1] \
                or list(rel.names)
            t = LakeTable.create(
                self.spark, os.path.join(self.tables_dir, tname),
                self.spark.createDataFrame([], ddl), keys,
                properties=self._table_properties(),
            )
        snap = t.snapshot()
        key_cols = snap["key_columns"]
        key_types = {n: ty for n, ty in snap["schema"] if n in key_cols}
        data_cols = [(n, ty) for n, ty in snap["schema"] if n not in key_cols]
        if truncate_pos is not None:
            lsn_hi = max(int(lsn_hi or 0), int(truncate_pos[2]))
        if lsn_hi is None:
            return None
        affected = None
        if (
            truncate_pos is None
            and n_committed is not None
            and n_committed <= self.PRUNE_BUCKETS_BELOW
        ):
            # narrow planning job: key columns only (no payloads) → distinct
            # touched buckets, so the MERGE scans only affected target files.
            # Both new AND old key images count: a key-changing update emits
            # a synthetic delete of the OLD key during compaction, and its
            # bucket must be read or the stale row would survive the merge.
            al = snap.get("aliases", {})

            def _ma(mc, nm):
                alts = [nm] + list(al.get(nm, []))
                if len(alts) == 1:
                    return F.element_at(mc, nm)
                return F.coalesce(*[F.element_at(mc, a) for a in alts])

            is_del = F.col("event_type") == "delete"
            new_keys = ev.filter(~is_del).select(*[
                _ma("new_data", k).alias(k) for k in key_cols
            ])
            old_keys = ev.filter(
                F.col("old_data").isNotNull()
            ).select(*[
                _ma("old_data", k).alias(k) for k in key_cols
            ])
            new_keys = new_keys.select(*[
                F.col(k).cast(key_types.get(k, "string")) for k in key_cols
            ])
            old_keys = old_keys.select(*[
                F.col(k).cast(key_types.get(k, "string")) for k in key_cols
            ])
            bucket = t._bucket_expr(key_cols, snap["n_buckets"])
            affected = sorted(
                r[0]
                for r in new_keys.unionByName(old_keys)
                .select(bucket.alias("b")).distinct().collect()
                if r[0] is not None
            )
        changes = compact_changes(ev, key_cols, data_cols,
                                  aliases=snap.get("aliases"),
                                  key_types=key_types)
        rec = t.merge(
            self.spark, changes, applied_lsn=int(lsn_hi),
            batch_id=f"b{batch_idx}-{uuid.uuid4().hex[:6]}",
            truncate_first=truncate_pos is not None,
            affected_buckets=affected,
        )
        rec["table"] = tname
        return rec
