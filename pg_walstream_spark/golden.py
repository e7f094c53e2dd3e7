"""Golden applier: sequential, trivially-correct WAL replay oracle.

Plays the role PostgreSQL itself plays in the reference's integration tests
(/root/reference/integration-tests/pgoutput_fidelity.rs,
safe_transaction_consumer.rs): a row-at-a-time decoder + transaction-buffered
applier whose final table state the distributed Spark engine must reproduce
exactly (per-row sha256(content) equality per BASELINE.json input_hint).

Transaction semantics mirrored:
- buffer from Begin, apply atomically on Commit (ack-after-apply);
- streamed transactions buffer per-xid across StreamStart/Stop segments,
  apply on StreamCommit, discard on StreamAbort;
- two-phase: hold buffer on Prepare, apply on CommitPrepared, discard on
  RollbackPrepared;
- unchanged-TOAST ('u') columns carry the old value forward;
- unknown-relation DML is counted and dropped (reference WARN-drops,
  /root/reference/src/protocol.rs:1502-1505);
- Truncate clears the named tables;
- bounded replay: stop after the commit whose end_lsn >= stop_at_lsn,
  delivering that transaction in full (commit-boundary rule,
  /root/reference/src/stream.rs:378-387).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from .protocol import PyWalParser, ProtocolError


class GoldenApplier:
    def __init__(self, base_tables: dict[str, list[dict]] | None = None,
                 protocol_version: int = 2):
        self.parser = PyWalParser(protocol_version)
        self.catalog: dict[int, dict] = {}   # oid -> relation info
        self.unkeyed_base = dict(base_tables or {})  # table -> raw rows
        self.state: dict[str, dict[tuple, dict]] = {}  # table -> key -> row
        self.cur_txn: list | None = None
        self.stream_bufs: dict[int, list] = {}
        self.prepared: dict[str, list] = {}
        self.applied_lsn = 0
        self.dropped_unknown_relation = 0
        self.quarantined = 0
        self.schema_changes: list[dict] = []

    # -- name binding -------------------------------------------------------

    def _bind(self, rel: dict, tup) -> tuple[dict, set]:
        """Positional tuple -> (named {col: str|None}, toast_cols)."""
        row, toast = {}, set()
        for (flags, name, _, _), (kind, val) in zip(rel["columns"], tup):
            if kind == "u":
                toast.add(name)
            elif kind == "n":
                row[name] = None
            elif kind == "b":
                # binary-format value → PostgreSQL bytea hex text (lossless)
                row[name] = "\\x" + val.hex()
            else:
                row[name] = val.decode("utf-8") if isinstance(val, bytes) else val
        return row, toast

    def _key_of(self, rel: dict, row: dict) -> tuple:
        return tuple(row.get(n) for (f, n, _, _) in rel["columns"] if f & 1)

    def _table_state(self, rel: dict) -> dict:
        name = rel["relname"]
        if name not in self.state:
            raw = self.unkeyed_base.pop(name, [])
            self.state[name] = {self._key_of(rel, r): dict(r) for r in raw}
        return self.state[name]

    # -- replay -------------------------------------------------------------

    def apply_frames(self, frames: pa.Table | list, stop_at_lsn: int | None = None,
                     start_after_lsn: int = 0) -> None:
        """``frames``: pyarrow table or list of (seq, wal_start, wal_end,
        server_time, tag, data). ``start_after_lsn`` skips whole transactions
        whose commit end_lsn <= that fence (exactly-once resume semantics)."""
        rows = frames.to_pylist() if isinstance(frames, pa.Table) else [
            {"wal_start": f[1], "data": f[5]} for f in frames
        ]
        for fr in rows:
            data = fr["data"]
            lsn = fr["wal_start"]
            try:
                m = self.parser.parse(bytes(data))
            except ProtocolError:
                self.quarantined += 1
                continue
            done = self._handle(m, lsn, stop_at_lsn, start_after_lsn)
            if done:
                return

    def _handle(self, m: dict, lsn: int, stop_at_lsn, start_after_lsn) -> bool:
        et = m["event_type"]
        if et == "relation":
            old = self.catalog.get(m["relation_oid"])
            new = {k: m[k] for k in
                   ("relation_oid", "namespace", "relname", "replica_identity",
                    "columns")}
            if old is not None and old != new:
                self.schema_changes.append({"old": old, "new": new, "lsn": lsn})
                # positional RENAME (same arity/type, both names unique to
                # their side) migrates stored row keys — the engine's
                # read-alias rename keeps old data under the new name
                on = [c[1] for c in old["columns"]]
                nn = [c[1] for c in new["columns"]]
                if len(on) == len(nn) and old["relname"] == new["relname"]:
                    rens = [
                        (a, b) for i, (a, b) in enumerate(zip(on, nn))
                        if a != b and a not in nn and b not in on
                        and old["columns"][i][2] == new["columns"][i][2]
                    ]
                    if rens:
                        tbl = self.state.get(new["relname"])
                        if tbl is not None:
                            for row in tbl.values():
                                for a, b in rens:
                                    if a in row:
                                        row[b] = row.pop(a)
                        for row in self.unkeyed_base.get(new["relname"], []):
                            for a, b in rens:
                                if a in row:
                                    row[b] = row.pop(a)
            self.catalog[m["relation_oid"]] = new
            return False
        if et == "begin":
            self.cur_txn = []
            return False
        if et in ("insert", "update", "delete", "truncate"):
            op = self._build_op(m)
            if op is None:
                return False
            if m.get("xid") is not None and self.parser.in_stream_xid is not None:
                # buffer under the TOP-level xid (the stream block's), tagged
                # with the per-message xid (the emitting SUBtransaction) so a
                # stream_abort(top, sub) can surgically discard the sub span
                self.stream_bufs.setdefault(
                    self.parser.in_stream_xid, []
                ).append((m["xid"], op))
            elif self.cur_txn is not None:
                self.cur_txn.append(op)
            return False
        if et == "commit":
            if self.cur_txn is not None and m["end_lsn"] > start_after_lsn:
                self._apply_ops(self.cur_txn)
                self.applied_lsn = m["end_lsn"]
            self.cur_txn = None
            return stop_at_lsn is not None and m["end_lsn"] >= stop_at_lsn
        if et == "stream_commit":
            ops = [op for _sub, op in self.stream_bufs.pop(m["xid"], [])]
            if m["end_lsn"] > start_after_lsn:
                self._apply_ops(ops)
                self.applied_lsn = m["end_lsn"]
            return stop_at_lsn is not None and m["end_lsn"] >= stop_at_lsn
        if et == "stream_abort":
            # whole-txn abort iff subxid == xid; otherwise discard ONLY the
            # subtransaction's ops (reference protocol.rs:1105-1132)
            sub = m.get("subxid", m["xid"])
            if sub == m["xid"]:
                self.stream_bufs.pop(m["xid"], None)
            elif m["xid"] in self.stream_bufs:
                self.stream_bufs[m["xid"]] = [
                    (s, op) for s, op in self.stream_bufs[m["xid"]]
                    if s != sub
                ]
            return False
        if et == "prepare":
            if self.cur_txn is not None:
                self.prepared[m["gid"]] = self.cur_txn
                self.cur_txn = None
            return False
        if et == "stream_prepare":
            self.prepared[m["gid"]] = [
                op for _sub, op in self.stream_bufs.pop(m["xid"], [])
            ]
            return False
        if et == "commit_prepared":
            ops = self.prepared.pop(m["gid"], [])
            if m["end_lsn"] > start_after_lsn:
                self._apply_ops(ops)
                self.applied_lsn = m["end_lsn"]
            return stop_at_lsn is not None and m["end_lsn"] >= stop_at_lsn
        if et == "rollback_prepared":
            self.prepared.pop(m["gid"], None)
            return False
        if et == "begin_prepare":
            self.cur_txn = []
            return False
        # origin / type / message / stream_start / stream_stop: no state effect
        return False

    def _build_op(self, m: dict):
        et = m["event_type"]
        if et == "truncate":
            tables = [self.catalog[o]["relname"] for o in m["oids"]
                      if o in self.catalog]
            return ("truncate", tables)
        rel = self.catalog.get(m["relation_oid"])
        if rel is None:
            self.dropped_unknown_relation += 1
            return None
        if et == "insert":
            row, _ = self._bind(rel, m["new"])
            return ("insert", rel, row)
        if et == "update":
            new, toast = self._bind(rel, m["new"])
            old = self._bind(rel, m["old"])[0] if m["old"] is not None else None
            return ("update", rel, old, new, toast)
        if et == "delete":
            old, _ = self._bind(rel, m["old"])
            return ("delete", rel, old)
        return None

    def _apply_ops(self, ops: list) -> None:
        for op in ops:
            kind = op[0]
            if kind == "truncate":
                for t in op[1]:
                    self.state[t] = {}
                continue
            rel = op[1]
            tbl = self._table_state(rel)
            if kind == "insert":
                row = op[2]
                tbl[self._key_of(rel, row)] = row
            elif kind == "update":
                _, _, old, new, toast = op
                old_key = self._key_of(rel, old if old is not None else new)
                prev = tbl.pop(old_key, {})
                merged = dict(prev)
                merged.update(new)
                # toast columns absent from `new` keep prev values implicitly
                tbl[self._key_of(rel, merged)] = merged
            elif kind == "delete":
                old = op[2]
                tbl.pop(self._key_of(rel, old), None)

    # -- output -------------------------------------------------------------

    def final_rows(self, table: str = "repos") -> list[dict]:
        if table not in self.state and table in self.unkeyed_base:
            # no Relation message ever arrived for this table → untouched base
            rows = [dict(r) for r in self.unkeyed_base[table]]
        else:
            rows = [dict(r) for r in self.state.get(table, {}).values()]
        for r in rows:
            if r.get("content") is not None:
                r["content_sha256"] = hashlib.sha256(
                    r["content"].encode("utf-8")).hexdigest()
        return sorted(rows, key=lambda r: (r.get("repo") or "", r.get("path") or ""))


def golden_final_state(base, frames: pa.Table, table: str = "repos",
                       stop_at_lsn: int | None = None,
                       protocol_version: int = 2) -> tuple[list[dict], int]:
    """Convenience: replay frames over base, return (sorted rows, applied_lsn).
    ``base``: a pa.Table seeding ``table``, or a dict {table: pa.Table} for
    fixtures that split the base across relations."""
    if isinstance(base, pa.Table):
        base = {table: base}
    g = GoldenApplier({t: tbl.to_pylist() for t, tbl in base.items()},
                      protocol_version=protocol_version)
    g.apply_frames(frames, stop_at_lsn=stop_at_lsn)
    return g.final_rows(table), g.applied_lsn
