"""Metastore analog: split manifest + source checkpoints.

Re-expresses the reference metastore data model
(`quickwit/quickwit-metastore/src/split_metadata.rs:61-135` for the split
fields, `checkpoint.rs:170-188` for source checkpoints, and the
file-backed metastore's atomic-publish semantics) as a single JSON
manifest per index, updated by the driver only, committed via
write-to-temp + atomic rename. The transactional publish of
(new splits, replaced splits, checkpoint delta) —
`quickwit/quickwit-indexing/src/actors/publisher.rs:137-160` — maps to
one `Manifest.publish()` call = one atomic rename.

Split states: staged -> published -> marked_for_deletion
(`split_metadata.rs:294-303`). Artifacts on disk but absent from the
manifest (or staged/marked) are garbage-collectible.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field
from typing import Any, Iterable, Optional


@dataclass
class SplitMetadata:
    split_id: str
    index_id: str
    num_docs: int
    uncompressed_docs_size_in_bytes: int
    # source partition lineage: which input fragment produced this split
    source_partition_id: str = ""
    # routing partition (doc_mapping.partition_key), 0 when unpartitioned
    partition_id: int = 0
    time_range_start: Optional[int] = None  # timestamp field min, epoch micros
    time_range_end: Optional[int] = None
    create_timestamp: float = 0.0
    tags: dict[str, list[str]] = field(default_factory=dict)
    num_merge_ops: int = 0
    delete_opstamp: int = 0
    split_state: str = "published"  # staged | published | marked_for_deletion
    # last state-transition time (quickwit's update_timestamp): set when
    # the split is marked for deletion, so the GC grace period runs from
    # the MARK, not the dir's creation mtime — an old split replaced a
    # second ago must still get its full in-flight-reader grace. 0.0 on
    # legacy rows (GC falls back to dir mtime).
    update_timestamp: float = 0.0
    # per-text-field stats needed for BM25 (per-split statistics!)
    field_stats: dict[str, dict[str, float]] = field(default_factory=dict)

    def to_json(self) -> dict[str, Any]:
        return asdict(self)

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "SplitMetadata":
        return SplitMetadata(**obj)

    @property
    def is_mature(self) -> bool:
        # maturity is decided by the merge policy; kept here for parity
        return False


def _atomic_write_json(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".manifest-")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, separators=(",", ":"))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)  # atomic on POSIX
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


COMPACT_EVERY = 64  # log entries between snapshot compactions


class StaleReplaceError(ValueError):
    """A publish's replaced splits are no longer published — another
    writer (a concurrent merge, a delete-task rewrite, retention)
    replaced or dropped them first. The quickwit metastore's
    publish_splits split-state check analog: without it, two concurrent
    rewriters of the same split would BOTH land and the split's docs
    would be double-counted (caught live by tests/test_soak.py). The
    caller must discard its output split and re-plan."""


# per-index-root write locks for the OBJECT manifest backend: whole-object
# PUTs are atomic but a read-modify-write is not — same-process writer
# threads (serve: ingest handlers + the janitor loop) must serialize.
# Keyed by index root; process-wide (the cross-process contract on object
# roots remains single-writer, documented in _load_object).
import threading as _threading

_OBJECT_ROOT_LOCKS: dict[str, _threading.RLock] = {}
_OBJECT_ROOT_LOCKS_GUARD = _threading.Lock()


def _object_root_write_lock(index_dir: str) -> _threading.RLock:
    with _OBJECT_ROOT_LOCKS_GUARD:
        lock = _OBJECT_ROOT_LOCKS.get(index_dir)
        if lock is None:
            lock = _OBJECT_ROOT_LOCKS[index_dir] = _threading.RLock()
        return lock


def _index_uid(index_dir: str) -> str:
    """Deterministic per-index uid scoping rows in a SHARED postgres
    database (the reference's index_uid, postgres/metastore.rs). Derived
    from the artifact path/URI so every Manifest(index_dir) resolves the
    same rows without extra coordination."""
    import hashlib

    from quickwit_ray import storage

    key = index_dir if storage.is_object_uri(index_dir) \
        else os.path.abspath(index_dir)
    return hashlib.sha1(key.encode()).hexdigest()[:16]


class Manifest:
    """Driver-side single-writer manifest for one index.

    Persistence is an APPEND-LOG + periodic snapshot (round-2 rework):
    every transactional operation appends one fsync'd JSON line to
    ``manifest.log`` — O(delta) bytes per commit instead of rewriting the
    whole split list (which is a scale-killer at 10^5-10^6 splits). Every
    ``COMPACT_EVERY`` appends the full state is snapshotted to
    ``manifest.json`` via atomic rename and the log is atomically
    truncated. Loading = read snapshot, replay log; a torn trailing line
    (crash mid-append) is ignored; replaying ops already folded into the
    snapshot is idempotent."""

    def __init__(self, index_dir: str, backend: Optional[str] = None,
                 dsn: Optional[str] = None, _shared_lock: bool = True):
        from quickwit_ray import storage

        self.index_dir = index_dir
        self._is_object = storage.is_object_uri(index_dir)
        self.path = storage.join(index_dir, "manifest.json")
        self.log_path = storage.join(index_dir, "manifest.log")
        self.db_path = storage.join(index_dir, "metastore.db")
        self.index_config_json: Optional[dict[str, Any]] = None
        # incremental-refresh bookkeeping (file backend): snapshot
        # identity + consumed log bytes, see _refresh_file_locked
        self._snap_sig = None
        self._log_offset = 0
        self.splits: dict[str, SplitMetadata] = {}
        # committed source partitions: partition_id -> {"committed_at": ts}
        self.checkpoints: dict[str, dict[str, Any]] = {}
        # delete tasks (stored queries applied at compaction time,
        # quickwit-janitor/src/actors/delete_task_planner.rs):
        # [{"opstamp": int, "query": str}]
        self.delete_tasks: list[dict[str, Any]] = []
        # message-queue shard ownership (queue_sources/shared_state.rs:
        # shard id = message content id, token = pipeline publish token):
        # {shard_id: {"token": str, "ts": float}}; COMPLETION is the
        # "mq:{shard_id}" checkpoint, transactional with split publish
        self.shards: dict[str, dict[str, Any]] = {}
        # declarative source configs (source-config.md; metastore
        # add_source/delete_source/toggle_source): {source_id: config}
        self.sources: dict[str, dict[str, Any]] = {}
        self._log_entries = 0
        self._store = None
        self._dsn = dsn
        # backend auto-detection: a metastore.json pointer marks a shared
        # PostgreSQL metastore (quickwit-metastore/src/metastore/postgres);
        # a metastore.db marks the per-index sqlite DB; else the
        # append-log file backend. SQL backends get real ACID
        # transactions instead of the append-log.
        if backend is None:
            from quickwit_ray.state.sql import read_pointer

            ptr = read_pointer(index_dir)
            if ptr is not None:
                backend = ptr.get("backend", "postgres")
            elif self._is_object:
                # object root: snapshot-per-op whole-object PUTs — the
                # reference's FILE metastore on S3 does exactly this
                # (one put_object of the full index metadata per op)
                backend = "object"
            elif os.path.exists(self.db_path):
                backend = "sqlite"
            else:
                backend = "file"
        if backend == "file" and self._is_object:
            backend = "object"
        if backend in ("sqlite", "object") and \
                (self._is_object != (backend == "object")):
            raise ValueError(
                f"metastore backend {backend!r} does not fit "
                f"{'object' if self._is_object else 'local'} root "
                f"{index_dir!r} (sqlite needs a local file; use "
                f"metastore='postgres' or the object snapshot backend)")
        self._backend = backend
        if self._backend == "object":
            self._load_object()
        elif self._backend in ("sqlite", "postgres"):
            if self._backend == "postgres" or os.path.exists(self.db_path):
                self._load_sql()
        elif os.path.exists(self.path) or os.path.exists(self.log_path):
            self._load(shared_lock=_shared_lock)

    # -- persistence --------------------------------------------------------

    def _load_object(self) -> None:
        """Object-store backend: the full state lives in ONE manifest.json
        object; a whole-object PUT is atomic by the store's contract, so
        readers see the previous or the next state, never a torn one
        (quickwit's file-backed metastore on S3 has the same model and the
        same SINGLE-WRITER-per-index contract; multi-writer deployments
        use the SQL metastore with artifacts on the object store)."""
        from quickwit_ray import storage

        if not storage.exists(self.path):
            return
        obj = json.loads(storage.read_bytes(self.path))
        self.index_config_json = obj.get("index_config")
        self.splits = {s["split_id"]: SplitMetadata.from_json(s)
                       for s in obj["splits"]}
        self.checkpoints = obj.get("checkpoints", {})
        self.delete_tasks = obj.get("delete_tasks", [])
        self.shards = obj.get("shards", {})
        self.sources = obj.get("sources", {})

    def _commit_object(self) -> None:
        from quickwit_ray import storage

        storage.write_bytes(
            self.path,
            json.dumps(self._snapshot_obj(), separators=(",", ":")).encode())

    def _commit_object_locked(self) -> None:
        """Whole-state object rewrite (clear / create) under the same
        per-root lock as `_append`'s read-modify-write."""
        with _object_root_write_lock(self.index_dir):
            self._commit_object()

    def _load(self, shared_lock: bool = True) -> None:
        """Load snapshot + replay log. Readers hold a SHARED flock across
        the two reads so a concurrent writer's compaction (snapshot
        replace + log truncate, done under the exclusive lock) cannot
        interleave — without it a reader could pair the OLD snapshot with
        the NEW (truncated) log and miss up to COMPACT_EVERY-1 ops."""
        if shared_lock and (os.path.exists(self.path)
                            or os.path.exists(self.log_path)):
            import fcntl

            fd = os.open(os.path.join(self.index_dir, ".manifest.lock"),
                         os.O_CREAT | os.O_RDWR)
            try:
                fcntl.flock(fd, fcntl.LOCK_SH)
                self._load(shared_lock=False)
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
                os.close(fd)
            return
        self._snap_sig = self._stat_sig(self.path)
        if os.path.exists(self.path):
            with open(self.path) as f:
                obj = json.load(f)
            self.index_config_json = obj.get("index_config")
            self.splits = {s["split_id"]: SplitMetadata.from_json(s)
                           for s in obj["splits"]}
            self.checkpoints = obj.get("checkpoints", {})
            self.delete_tasks = obj.get("delete_tasks", [])
            self.shards = obj.get("shards", {})
            self.sources = obj.get("sources", {})
        self._log_offset = 0
        if os.path.exists(self.log_path):
            with open(self.log_path, "rb") as f:
                raw = f.read()
            self._replay_log_bytes(raw, base_offset=0)

    @staticmethod
    def _stat_sig(path: str):
        """Identity signature of the snapshot file (compaction replaces
        it via atomic rename, so (ino, mtime_ns, size) changes)."""
        try:
            st = os.stat(path)
            return (st.st_ino, st.st_mtime_ns, st.st_size)
        except OSError:
            return None

    def _replay_log_bytes(self, raw: bytes, base_offset: int) -> None:
        """Fold raw log bytes starting at ``base_offset`` into the state;
        advances ``_log_offset`` past the last COMPLETE line (a torn tail
        is re-read on the next refresh, once the writer finishes it)."""
        consumed = raw.rfind(b"\n") + 1  # 0 when no complete line yet
        for chunk in raw[:consumed].split(b"\n"):
            if not chunk.strip():
                continue
            try:
                op = json.loads(chunk)
            except json.JSONDecodeError:
                # torn fragment from a writer that died mid-append (its
                # op was never acknowledged) — or a writer's append IN
                # FLIGHT while we read. NEVER truncate here: a reader
                # racing the single writer must not destroy the line the
                # writer is about to complete. The writer path starts
                # every append on a fresh line (see _append), so a
                # skipped fragment stays isolated and unacknowledged.
                continue
            self._apply(op)
            self._log_entries += 1
        self._log_offset = base_offset + consumed
        # a newline-less tail that parses as a COMPLETE op (a crashed
        # writer persisted everything but the terminator) must be VISIBLE
        # now: the next writer's fresh-line repair will terminate it and
        # every later replay applies it BEFORE subsequent ops, so a CAS
        # that didn't see it could approve a conflicting replacement
        # (double-count). Fold it in WITHOUT advancing the cursor — it is
        # re-read (idempotently) once terminated. A strict prefix of a
        # JSON object can never parse as complete, so a half-written line
        # stays invisible as before.
        tail = raw[consumed:].strip()
        if tail:
            try:
                self._apply(json.loads(tail))
            except json.JSONDecodeError:
                pass

    def _refresh_file_locked(self) -> None:
        """Incremental freshness for the FILE backend (caller holds the
        manifest flock, shared or exclusive): if the snapshot was
        replaced (a compaction), reload everything; otherwise fold only
        the log bytes appended since our last read. Keeps the
        replacement-publish CAS O(delta), not O(total splits) — at 10^6
        splits a full reload per merge publish would parse ~100 MB of
        JSON per compaction step."""
        sig = self._stat_sig(self.path)
        if sig != self._snap_sig:
            # compaction (or first snapshot) happened: full reload
            self._reset_state()
            self._load(shared_lock=False)
            return
        if not os.path.exists(self.log_path):
            return
        with open(self.log_path, "rb") as f:
            f.seek(self._log_offset)
            raw = f.read()
        if raw:
            self._replay_log_bytes(raw, base_offset=self._log_offset)

    def _apply(self, op: dict[str, Any]) -> None:
        """Fold one log entry into the in-memory state (replay-idempotent)."""
        kind = op["op"]
        if kind == "create":
            self.index_config_json = op["index_config"]
        elif kind == "update_config":
            self.index_config_json = op["index_config"]
        elif kind == "publish":
            for sj in op.get("splits", ()):
                sm = SplitMetadata.from_json(sj)
                sm.split_state = "published"
                self.splits[sm.split_id] = sm
            for sid in op.get("replaced", ()):
                if sid in self.splits:
                    self.splits[sid].split_state = "marked_for_deletion"
                    # ts from the OP (write time), not replay time — a
                    # log replay must reconstruct identical state
                    self.splits[sid].update_timestamp = op.get("ts", 0.0)
            for pid, cp in op.get("checkpoints", {}).items():
                self.checkpoints[pid] = cp
        elif kind == "mark_for_deletion":
            for sid in op["split_ids"]:
                if sid in self.splits:
                    self.splits[sid].split_state = "marked_for_deletion"
                    self.splits[sid].update_timestamp = op.get("ts", 0.0)
        elif kind == "delete_splits":
            for sid in op["split_ids"]:
                self.splits.pop(sid, None)
        elif kind == "delete_task":
            if not any(t["opstamp"] == op["opstamp"] for t in self.delete_tasks):
                self.delete_tasks.append({"opstamp": op["opstamp"],
                                          "query": op["query"]})
        elif kind == "shard_open":
            self.shards.setdefault(op["id"], {"token": op["token"],
                                              "ts": op["ts"]})
        elif kind == "shard_acquire":
            self.shards[op["id"]] = {"token": op["token"], "ts": op["ts"]}
        elif kind == "shard_prune":
            for i in op["ids"]:
                self.shards.pop(i, None)
                self.checkpoints.pop(f"mq:{i}", None)
        elif kind == "source_add":
            self.sources[op["source"]["source_id"]] = op["source"]
        elif kind == "source_delete":
            self.sources.pop(op["source_id"], None)
        elif kind == "source_toggle":
            if op["source_id"] in self.sources:
                self.sources[op["source_id"]]["enabled"] = bool(op["enable"])
        elif kind == "checkpoint_reset":
            for k in op["keys"]:
                self.checkpoints.pop(k, None)
        elif kind == "clear":
            # `index clear` (index_api clear handler): all splits, source
            # checkpoints, delete tasks and shards drop in ONE op; the
            # index config survives
            self.splits = {}
            self.checkpoints = {}
            self.delete_tasks = []
            self.shards = {}
            # source CONFIGS survive a clear (only data/state drops),
            # matching the config-survives semantics of the index config
        else:  # pragma: no cover — forward compat
            raise ValueError(f"unknown manifest op {kind!r}")

    # -- SQL backend driver (sqlite file DB, or a shared PostgreSQL
    # server via state/sql.py — the reference's postgres metastore; same
    # transactional semantics either way: one op = one ACID transaction,
    # state survives without snapshot/compaction) ------------------------

    def _sql(self):
        from quickwit_ray.state.sql import SqlStore, connect_dsn, read_pointer

        if self._store is None:
            if self._backend == "postgres":
                ptr = read_pointer(self.index_dir)
                dsn = self._dsn or (ptr or {}).get("dsn")
                if dsn is None:
                    raise FileNotFoundError(
                        f"no metastore.json pointer at {self.index_dir}")
                uid = (ptr or {}).get("index_uid") or _index_uid(self.index_dir)
                self._store = SqlStore(connect_dsn(dsn), "postgres", uid)
            else:
                import sqlite3

                os.makedirs(self.index_dir, exist_ok=True)
                conn = sqlite3.connect(self.db_path)
                conn.execute("PRAGMA journal_mode=WAL")
                self._store = SqlStore(conn, "sqlite")
            self._store.create_tables()
        return self._store

    def _reset_state(self) -> None:
        self.index_config_json = None
        self.splits = {}
        self.checkpoints = {}
        self.delete_tasks = []
        self.shards = {}
        self.sources = {}
        self._log_entries = 0

    def _load_sql(self) -> None:
        # full overwrite, never a merge: the CAS paths re-load a WARM
        # instance, where merging would keep DB-deleted splits alive as
        # stale 'published' rows and re-append every delete task
        self._reset_state()
        st = self._sql()
        for k, v in st.select_all("meta"):
            if k == "index_config":
                self.index_config_json = json.loads(v)
        for _sid, j in st.select_all("splits"):
            sm = SplitMetadata.from_json(json.loads(j))
            self.splits[sm.split_id] = sm
        for p, j in st.select_all("checkpoints"):
            self.checkpoints[p] = json.loads(j)
        for o, q in st.select_all("delete_tasks", order_by="opstamp"):
            self.delete_tasks.append({"opstamp": int(o), "query": q})
        for sid, j in st.select_all("shards"):
            self.shards[sid] = json.loads(j)
        for sid, j in st.select_all("sources"):
            self.sources[sid] = json.loads(j)

    def _apply_sql(self, op: dict[str, Any]) -> None:
        """One op = one ACID transaction. Split rows are re-serialized from
        the in-memory state (already updated by _apply), so state-changing
        ops like replacement marking stay consistent."""
        st = self._sql()
        kind = op["op"]
        with st.tx() as cur:
            if kind in ("create", "update_config"):
                st.upsert(cur, "meta",
                          ("index_config", json.dumps(op["index_config"])))
            elif kind == "publish":
                for sj in op.get("splits", ()):
                    sid = sj["split_id"]
                    st.upsert(cur, "splits",
                              (sid, json.dumps(self.splits[sid].to_json())))
                for sid in op.get("replaced", ()):
                    if sid in self.splits:
                        st.upsert(cur, "splits",
                                  (sid, json.dumps(self.splits[sid].to_json())))
                for pid in op.get("checkpoints", {}):
                    st.upsert(cur, "checkpoints",
                              (pid, json.dumps(self.checkpoints[pid])))
            elif kind == "mark_for_deletion":
                for sid in op["split_ids"]:
                    if sid in self.splits:
                        st.upsert(cur, "splits",
                                  (sid, json.dumps(self.splits[sid].to_json())))
            elif kind == "delete_splits":
                for sid in op["split_ids"]:
                    st.delete_where_pk(cur, "splits", sid)
            elif kind == "delete_task":
                st.insert_ignore(cur, "delete_tasks",
                                 (op["opstamp"], op["query"]))
            elif kind == "shard_open":
                st.insert_ignore(cur, "shards",
                                 (op["id"], json.dumps(self.shards[op["id"]])))
            elif kind == "shard_acquire":
                st.upsert(cur, "shards",
                          (op["id"], json.dumps(self.shards[op["id"]])))
            elif kind == "shard_prune":
                for i in op["ids"]:
                    st.delete_where_pk(cur, "shards", i)
                    st.delete_where_pk(cur, "checkpoints", f"mq:{i}")
            elif kind == "source_add":
                sid = op["source"]["source_id"]
                st.upsert(cur, "sources", (sid, json.dumps(op["source"])))
            elif kind == "source_delete":
                st.delete_where_pk(cur, "sources", op["source_id"])
            elif kind == "source_toggle":
                sid = op["source_id"]
                if sid in self.sources:
                    st.upsert(cur, "sources",
                              (sid, json.dumps(self.sources[sid])))
            elif kind == "checkpoint_reset":
                for k in op["keys"]:
                    st.delete_where_pk(cur, "checkpoints", k)
            elif kind == "clear":
                for t in ("splits", "checkpoints", "delete_tasks", "shards"):
                    st.delete_all(cur, t)
            else:  # pragma: no cover
                raise ValueError(f"unknown manifest op {kind!r}")

    def _writer_lock(self):
        """Exclusive advisory lock serializing file-backend writers: the
        design is single-writer (the reference metastore serializes in
        its service), but two accidental concurrent publishers must not
        interleave partial appends or race the compaction rename. SQL
        backends get this from their transactions."""
        import fcntl
        from contextlib import contextmanager

        @contextmanager
        def lock():
            os.makedirs(self.index_dir, exist_ok=True)
            fd = os.open(os.path.join(self.index_dir, ".manifest.lock"),
                         os.O_CREAT | os.O_RDWR)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX)
                yield
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
                os.close(fd)

        return lock()

    def _append(self, op: dict[str, Any]) -> None:
        if self._backend == "object":
            # snapshot-per-op: read-modify-write under a process-wide
            # per-root lock. Reload the CURRENT object, fold this op into
            # the fresh state (ops are replay-complete — the file
            # backend's log replay depends on that), then one atomic
            # whole-object PUT. Same-process concurrent writers (serve:
            # HTTP ingest threads + the janitor) serialize here and never
            # lose each other's updates; the cross-PROCESS contract stays
            # SINGLE WRITER per index root (use the SQL metastore for
            # multi-writer).
            with _object_root_write_lock(self.index_dir):
                self._load_object()
                self._apply(op)
                self._commit_object()
            return
        if self._backend in ("sqlite", "postgres"):
            self._apply_sql(op)
            return
        with self._writer_lock():
            self._append_locked(op)

    def _append_locked(self, op: dict[str, Any]) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        with open(self.log_path, "ab") as f:
            pre = f.tell()
            # start on a fresh line even after a predecessor's torn tail
            # (writer-side repair; readers never mutate the log)
            if pre > 0:
                with open(self.log_path, "rb") as rf:
                    rf.seek(-1, os.SEEK_END)
                    last = rf.read(1)
                if last != b"\n":
                    f.write(b"\n")
            f.write(json.dumps(op, separators=(",", ":")).encode() + b"\n")
            f.flush()
            os.fsync(f.fileno())
            # advance the refresh cursor past our own append — but ONLY
            # if we were current up to the pre-write end of the log. If
            # another writer appended bytes we haven't folded (or a torn
            # tail sits between), skipping ahead would hide those lines
            # from the next _refresh_file_locked; leaving the cursor put
            # just re-replays idempotent ops instead.
            if self._log_offset == pre:
                self._log_offset = f.tell()
        self._log_entries += 1
        # LSM-style amortization: a snapshot costs O(total state), so the
        # trigger scales with state size — at 10^6 splits a fixed
        # every-64-ops policy would rewrite a huge manifest.json per 64
        # publishes; letting the log grow to ~state/8 keeps compaction
        # cost O(1) amortized per op while replay stays bounded
        if self._log_entries >= max(COMPACT_EVERY, len(self.splits) // 8):
            self._compact()

    def _snapshot_obj(self) -> dict[str, Any]:
        return {
            "index_config": self.index_config_json,
            "splits": [s.to_json() for s in self.splits.values()],
            "checkpoints": self.checkpoints,
            "delete_tasks": self.delete_tasks,
            "shards": self.shards,
            "sources": self.sources,
        }

    def _compact(self) -> None:
        """Snapshot + truncate the log, both via atomic rename. A crash
        between the two leaves snapshot + stale log: replay is idempotent,
        so the state converges either way. (No-op for the SQL backends —
        transactions ARE the durable state.)

        Runs under the writer lock, and snapshots the ON-DISK state (a
        fresh snapshot+log replay), not this instance's memory: if
        another writer appended ops after this instance loaded, a
        memory-based snapshot would silently destroy them when the log
        truncates. The re-load also heals this instance's staleness."""
        if self._backend in ("sqlite", "postgres", "object"):
            return
        # _shared_lock=False: we HOLD the exclusive writer lock here — a
        # shared re-acquisition on a second fd would self-deadlock
        fresh = Manifest(self.index_dir, backend="file", _shared_lock=False)
        self.index_config_json = fresh.index_config_json
        self.splits = fresh.splits
        self.checkpoints = fresh.checkpoints
        self.delete_tasks = fresh.delete_tasks
        self.shards = fresh.shards
        self.sources = fresh.sources
        _atomic_write_json(self.path, self._snapshot_obj())
        fd, tmp = tempfile.mkstemp(dir=self.index_dir, prefix=".log-")
        os.close(fd)
        os.replace(tmp, self.log_path)
        self._log_entries = 0
        # we ARE the post-compaction state: refresh bookkeeping restarts
        # at the new snapshot + empty log
        self._snap_sig = self._stat_sig(self.path)
        self._log_offset = 0

    def _commit(self) -> None:
        """Full-snapshot commit (kept for the rare whole-state rewrites)."""
        if self._backend == "object":
            self._commit_object_locked()
            return
        if self._backend in ("sqlite", "postgres"):
            st = self._sql()
            with st.tx() as cur:
                for t in ("splits", "checkpoints", "delete_tasks", "shards",
                          "sources"):
                    st.delete_all(cur, t)
                if self.index_config_json is not None:
                    st.upsert(cur, "meta",
                              ("index_config",
                               json.dumps(self.index_config_json)))
                for s in self.splits.values():
                    st.upsert(cur, "splits",
                              (s.split_id, json.dumps(s.to_json())))
                for p, c in self.checkpoints.items():
                    st.upsert(cur, "checkpoints", (p, json.dumps(c)))
                for t in self.delete_tasks:
                    st.upsert(cur, "delete_tasks",
                              (t["opstamp"], t["query"]))
                for sid, v in self.shards.items():
                    st.upsert(cur, "shards", (sid, json.dumps(v)))
                for sid, v in self.sources.items():
                    st.upsert(cur, "sources", (sid, json.dumps(v)))
            return
        _atomic_write_json(self.path, self._snapshot_obj())

    # -- message-queue shard ownership (queue_sources/shared_state.rs) ----

    def open_shard(self, shard_id: str, token: str) -> str:
        """First-caller-wins ownership claim (OpenShards analog): records
        (shard_id -> token) if unclaimed and returns the OWNING token —
        the caller proceeds only when it equals its own. The claim check
        runs under the write lock on fresh state, so a losing concurrent
        claimant gets the WINNER's token back, never its own."""
        cur = self.shards.get(shard_id)
        if cur is not None:
            return cur["token"]

        def build() -> Optional[dict[str, Any]]:
            if shard_id in self.shards:
                return None  # lost the claim race: keep the winner
            return {"op": "shard_open", "id": shard_id, "token": token,
                    "ts": time.time()}

        self._append_rmw(build)
        return self.shards[shard_id]["token"]

    def acquire_shard(self, shard_id: str, token: str) -> None:
        """Steal a stale shard (AcquireShards analog). Subject to the same
        documented race as the reference: two pipelines may acquire
        concurrently and one loses at commit time (the mq checkpoint
        no-ops the duplicate publish)."""
        op = {"op": "shard_acquire", "id": shard_id, "token": token,
              "ts": time.time()}
        self._apply(op)
        self._append(op)

    def shard_info(self, shard_id: str) -> Optional[dict[str, Any]]:
        return self.shards.get(shard_id)

    def is_shard_completed(self, shard_id: str) -> bool:
        return f"mq:{shard_id}" in self.checkpoints

    def prune_shards(self, older_than_sec: float) -> int:
        """GC shard rows (and their completion checkpoints) older than the
        deduplication window (design.md 'Cleanup of old shards'): bounds
        the table; a duplicate delivery AFTER the window would reprocess —
        the documented trade."""
        before = time.time() - older_than_sec
        ids = [k for k, v in self.shards.items() if v["ts"] < before]
        if not ids:
            return 0
        op = {"op": "shard_prune", "ids": ids}
        self._apply(op)
        self._append(op)
        return len(ids)

    def drop(self) -> None:
        """Remove this index's rows from a shared SQL metastore entirely
        (index deletion — unlike ``clear``, the config and source rows go
        too). File-backed state needs no extra work: deleting the index
        dir removes it."""
        if self._backend not in ("sqlite", "postgres"):
            return
        st = self._sql()
        with st.tx() as cur:
            for t in ("meta", "splits", "checkpoints", "delete_tasks",
                      "shards", "sources"):
                st.delete_all(cur, t)

    # -- declarative source configs (metastore add_source/delete_source/
    # toggle_source, quickwit-metastore index_metadata.rs) ----------------

    def add_source(self, source_config: dict[str, Any]) -> None:
        sid = source_config["source_id"]
        if sid in self.sources:
            raise ValueError(f"source {sid!r} already exists")
        op = {"op": "source_add", "source": source_config}
        self._apply(op)
        self._append(op)

    def delete_source(self, source_id: str) -> None:
        if source_id not in self.sources:
            raise KeyError(f"no source {source_id!r}")
        op = {"op": "source_delete", "source_id": source_id}
        self._apply(op)
        self._append(op)

    def toggle_source(self, source_id: str, enable: bool) -> None:
        if source_id not in self.sources:
            raise KeyError(f"no source {source_id!r}")
        op = {"op": "source_toggle", "source_id": source_id,
              "enable": bool(enable)}
        self._apply(op)
        self._append(op)

    def reset_source_checkpoint(self, source_id: str) -> int:
        """Drop every committed checkpoint of one source (the reference's
        PUT .../sources/{id}/reset-checkpoint): the next ingestion run
        re-reads the source from the beginning. Returns keys removed."""
        prefix = f"src.{source_id}:"
        keys = [k for k in self.checkpoints if k.startswith(prefix)]
        if not keys:
            return 0
        op = {"op": "checkpoint_reset", "keys": keys}
        self._apply(op)
        self._append(op)
        return len(keys)

    def create_delete_task(self, query: str) -> int:
        """Record a stored delete query; returns its opstamp. The
        opstamp is allocated UNDER the write lock from fresh state —
        derived pre-lock, two concurrent creators would pick the same
        value and replay's opstamp-dedup would silently drop one query.
        On the SQL backends another PROCESS can still win the same
        opstamp between our reload and tx (insert_ignore drops ours), so
        verify our row survived in the post-commit reload and retry."""
        for _ in range(16):
            out: dict[str, int] = {}

            def build() -> dict[str, Any]:
                opstamp = max((t["opstamp"] for t in self.delete_tasks),
                              default=0) + 1
                out["opstamp"] = opstamp
                return {"op": "delete_task", "opstamp": opstamp,
                        "query": query}

            self._append_rmw(build)
            stamp = out["opstamp"]
            if any(t["opstamp"] == stamp and t["query"] == query
                   for t in self.delete_tasks):
                return stamp
        raise RuntimeError(
            "could not allocate a delete-task opstamp after 16 tries "
            "(pathological cross-process contention)")

    @property
    def last_delete_opstamp(self) -> int:
        return max((t["opstamp"] for t in self.delete_tasks), default=0)

    # -- transactional operations (each = one atomic rename) ----------------

    def create(self, index_config_json: dict[str, Any]) -> None:
        op = {"op": "create", "index_config": index_config_json}
        self._apply(op)
        self._append(op)
        # snapshot immediately: manifest.json presence is the "index
        # exists" signal for Index.open and the reader caches
        if self._backend == "file":
            with self._writer_lock():
                self._compact()
        else:
            self._compact()

    def update_config(self, index_config_json: dict[str, Any]) -> None:
        """Replace the stored index config (`quickwit index update` /
        metastore ``update_index`` analog). Validation of what may change
        lives in ``config.validate_config_update`` — the manifest records
        whatever the API layer approved. Existing splits are untouched
        (the reference's update semantics: no reindex; old splits keep the
        artifacts built under the old mapping)."""
        op = {"op": "update_config", "index_config": index_config_json}
        self._apply(op)
        self._append(op)

    def publish(self, new_splits: Iterable[SplitMetadata],
                replaced_split_ids: Iterable[str] = (),
                checkpoint_partition: Optional[str] = None,
                require_published: Iterable[str] = ()) -> None:
        """Atomic publish: add new splits, mark replaced ones for deletion,
        record the source-partition checkpoint. A re-publish of an
        already-committed partition is a no-op (exactly-once semantics).
        One append-log line = one transaction (publisher.rs:137-160).

        Replacement publishes run under a split-state CAS (raise
        :class:`StaleReplaceError` when a replaced split already left the
        published state). ``require_published`` adds the same CAS to a
        metadata-only republish (delete-opstamp bump) WITHOUT marking the
        ids for deletion — re-publishing a split another writer merged
        away would otherwise resurrect its docs next to the merged
        copy's."""
        if checkpoint_partition is not None and checkpoint_partition in self.checkpoints:
            return  # duplicate commit = no-op (checkpoint.rs contiguity analog)
        op: dict[str, Any] = {
            "op": "publish",
            "splits": [sm.to_json() for sm in new_splits],
            "replaced": list(replaced_split_ids),
        }
        if op["replaced"]:
            op["ts"] = time.time()  # mark time for the GC grace period
        if checkpoint_partition is not None:
            op["checkpoints"] = {checkpoint_partition: {"committed_at": time.time()}}
        check_ids = op["replaced"] + [s for s in require_published
                                      if s not in op["replaced"]]
        if check_ids:
            self._append_replace_cas(op, check_ids)
            return
        self._apply(op)
        self._append(op)

    def _append_rmw(self, build_op) -> None:
        """Read-modify-write append: refresh to the FRESHEST committed
        state under the per-root write lock, let ``build_op()`` derive
        the op from that state (return None to no-op, raise to abort),
        then apply + commit atomically. Required whenever the op's
        VALUE depends on current state (opstamp allocation, shard
        first-claim, split-state CAS) — an op derived from a pre-lock
        snapshot can collide with a concurrent writer's and be silently
        dropped by idempotent replay. Same-process writers serialize on
        the per-root lock for every backend; the file backend
        additionally holds its cross-process flock across refresh +
        append (O(delta) via the incremental log-tail refresh)."""
        with _object_root_write_lock(self.index_dir):
            if self._backend == "object":
                self._load_object()
                op = build_op()
                if op is None:
                    return
                self._apply(op)
                self._commit_object()
                return
            if self._backend in ("sqlite", "postgres"):
                # reload + tx run back-to-back under the per-root
                # process lock. The lock only covers THIS process: a
                # writer in ANOTHER process can commit between our
                # reload and our tx, and insert_ignore silently drops
                # the colliding row — so re-load the DB truth after the
                # commit. Callers whose op VALUE must win (opstamp
                # allocation) verify against the reloaded state and
                # retry; first-claim callers (open_shard) read the
                # committed winner from it.
                self._load_sql()
                op = build_op()
                if op is None:
                    return
                self._apply(op)
                self._apply_sql(op)
                self._load_sql()
                return
            with self._writer_lock():
                self._refresh_file_locked()
                op = build_op()
                if op is None:
                    return
                self._apply(op)
                self._append_locked(op)

    def _append_replace_cas(self, op: dict[str, Any],
                            check_ids: list[str]) -> None:
        """Publish-with-replacement under a split-state CAS: every
        replaced id must still be PUBLISHED in the freshest manifest
        state, checked and committed atomically (quickwit metastore
        publish_splits refuses when a source split left the Published
        state)."""

        def build() -> Optional[dict[str, Any]]:
            for sid in check_ids:
                sm = self.splits.get(sid)
                if sm is None or sm.split_state != "published":
                    raise StaleReplaceError(
                        f"replaced split {sid!r} is no longer published "
                        "(concurrent merge/delete/retention won the race)"
                        " — discard the output and re-plan")
            cps = op.get("checkpoints")
            if cps and any(p in self.checkpoints for p in cps):
                return None  # duplicate commit raced in: no-op
            return op

        self._append_rmw(build)

    def publish_many(self, by_partition: dict[str, list[SplitMetadata]]) -> None:
        """Publish several completed source partitions in ONE atomic manifest
        append (same exactly-once semantics; coarser commit batching so a
        build doesn't pay one fsync per partition)."""
        op: dict[str, Any] = {"op": "publish", "splits": [], "replaced": [],
                              "checkpoints": {}}
        for pid, sms in by_partition.items():
            if pid in self.checkpoints:
                continue
            op["splits"].extend(sm.to_json() for sm in sms)
            op["checkpoints"][pid] = {"committed_at": time.time()}
        if op["checkpoints"]:
            self._apply(op)
            self._append(op)

    def source_offset(self, partition: str):
        """Committed stream position for a queue partition (0 = nothing
        committed). Positions are ints (Kafka/file-queue record offsets)
        or OPAQUE ORDERED STRINGS (the reference's `Position` bytestring,
        position.rs:31-68 — Kinesis sequence numbers, Pulsar message ids;
        producers zero-pad so lexicographic order == stream order).
        Offsets live in the same checkpoint map the batch builds use, so
        batch and stream ingestion share one transactional publish path
        (checkpoint.rs:170-188 SourceCheckpoint analog)."""
        cp = self.checkpoints.get(partition)
        if not cp:
            return 0
        off = cp.get("offset", 0)
        return off if isinstance(off, str) else int(off)

    def publish_stream(self, by_partition: dict[str, tuple[list["SplitMetadata"], int, int]]) -> None:
        """Atomic publish of streaming micro-batches with their offset
        deltas: ``partition -> (splits, from_offset, to_offset)``.

        Exactly-once semantics per the reference checkpoint contiguity
        rules (checkpoint.rs:170-188 / IndexCheckpointDelta):
          * committed >= to  -> duplicate replay, no-op
          * committed != from -> gap or overlap, refuse (the poller must
            restart from the committed offset)
          * else commit splits + offset in ONE manifest write
        """
        op: dict[str, Any] = {"op": "publish", "splits": [], "replaced": [],
                              "checkpoints": {}}

        def ge(a, b) -> bool:
            # position order: int 0 == Beginning < every opaque string;
            # like kinds compare natively (opaque producers zero-pad)
            if isinstance(a, str) != isinstance(b, str):
                return isinstance(a, str)  # a opaque, b Beginning(0)
            return a >= b

        for pid, (sms, frm, to) in by_partition.items():
            cur = self.source_offset(pid)
            if ge(cur, to):
                continue  # duplicate commit = no-op
            if cur != frm:
                raise ValueError(
                    f"checkpoint delta not contiguous for {pid!r}: "
                    f"committed {cur}, delta [{frm}, {to})")
            op["splits"].extend(sm.to_json() for sm in sms)
            op["checkpoints"][pid] = {"committed_at": time.time(),
                                      "offset": (to if isinstance(to, str)
                                                 else int(to))}
        if op["checkpoints"]:
            self._apply(op)
            self._append(op)

    def clear(self) -> list[str]:
        """Reset the index to empty (`quickwit index clear` /
        index_api clear handler): every split, source checkpoint, delete
        task and shard drops in one atomic op; the index config and id
        survive. Returns the dropped split ids so the caller can delete
        their artifact dirs."""
        ids = list(self.splits)
        op = {"op": "clear"}
        self._apply(op)
        self._append(op)
        return ids

    def mark_for_deletion(self, split_ids: Iterable[str]) -> None:
        op = {"op": "mark_for_deletion", "split_ids": list(split_ids),
              "ts": time.time()}
        self._apply(op)
        self._append(op)

    def delete_splits(self, split_ids: Iterable[str]) -> None:
        op = {"op": "delete_splits", "split_ids": list(split_ids)}
        self._apply(op)
        self._append(op)

    # -- queries ------------------------------------------------------------

    def published_splits(self) -> list[SplitMetadata]:
        return [s for s in self.splits.values() if s.split_state == "published"]

    def is_partition_committed(self, partition_id: str) -> bool:
        return partition_id in self.checkpoints

    def list_splits(self, time_start: Optional[int] = None,
                    time_end: Optional[int] = None,
                    tags: Optional[dict[str, list[str]]] = None) -> list[SplitMetadata]:
        """Split pruning 'semi-join' (root.rs:1108-1154 / ListSplitsQuery):
        keep splits whose time range overlaps [time_start, time_end) and
        whose tag sets intersect the requested tag values."""
        out = []
        for s in self.published_splits():
            if time_start is not None and s.time_range_end is not None \
                    and s.time_range_end < time_start:
                continue
            if time_end is not None and s.time_range_start is not None \
                    and s.time_range_start >= time_end:
                continue
            if tags:
                pruned = False
                for fld, wanted in tags.items():
                    have = s.tags.get(fld)
                    # tag sets are only recorded up to a cardinality cap;
                    # absence of the field in tags = no pruning possible
                    if have is not None and not (set(have) & set(wanted)):
                        pruned = True
                        break
                if pruned:
                    continue
            out.append(s)
        return out
