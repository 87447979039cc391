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


class Manifest:
    """Driver-side single-writer manifest for one index."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.path = os.path.join(index_dir, "manifest.json")
        self.index_config_json: Optional[dict[str, Any]] = None
        self.splits: dict[str, SplitMetadata] = {}
        # committed source partitions: partition_id -> {"committed_at": ts}
        self.checkpoints: dict[str, dict[str, Any]] = {}
        # delete tasks (stored queries applied at compaction time,
        # quickwit-janitor/src/actors/delete_task_planner.rs):
        # [{"opstamp": int, "query": str}]
        self.delete_tasks: list[dict[str, Any]] = []
        if os.path.exists(self.path):
            self._load()

    def _load(self) -> None:
        with open(self.path) as f:
            obj = json.load(f)
        self.index_config_json = obj.get("index_config")
        self.splits = {s["split_id"]: SplitMetadata.from_json(s) for s in obj["splits"]}
        self.checkpoints = obj.get("checkpoints", {})
        self.delete_tasks = obj.get("delete_tasks", [])

    def _commit(self) -> None:
        _atomic_write_json(self.path, {
            "index_config": self.index_config_json,
            "splits": [s.to_json() for s in self.splits.values()],
            "checkpoints": self.checkpoints,
            "delete_tasks": self.delete_tasks,
        })

    def create_delete_task(self, query: str) -> int:
        """Record a stored delete query; returns its opstamp."""
        opstamp = (max((t["opstamp"] for t in self.delete_tasks), default=0) + 1)
        self.delete_tasks.append({"opstamp": opstamp, "query": query})
        self._commit()
        return opstamp

    @property
    def last_delete_opstamp(self) -> int:
        return max((t["opstamp"] for t in self.delete_tasks), default=0)

    # -- transactional operations (each = one atomic rename) ----------------

    def create(self, index_config_json: dict[str, Any]) -> None:
        self.index_config_json = index_config_json
        self._commit()

    def publish(self, new_splits: Iterable[SplitMetadata],
                replaced_split_ids: Iterable[str] = (),
                checkpoint_partition: Optional[str] = None) -> None:
        """Atomic publish: add new splits, mark replaced ones for deletion,
        record the source-partition checkpoint. A re-publish of an
        already-committed partition is a no-op (exactly-once semantics)."""
        if checkpoint_partition is not None and checkpoint_partition in self.checkpoints:
            return  # duplicate commit = no-op (checkpoint.rs contiguity analog)
        for sm in new_splits:
            sm.split_state = "published"
            self.splits[sm.split_id] = sm
        for sid in replaced_split_ids:
            if sid in self.splits:
                self.splits[sid].split_state = "marked_for_deletion"
        if checkpoint_partition is not None:
            self.checkpoints[checkpoint_partition] = {"committed_at": time.time()}
        self._commit()

    def publish_many(self, by_partition: dict[str, list[SplitMetadata]]) -> None:
        """Publish several completed source partitions in ONE atomic manifest
        write (same exactly-once semantics; coarser commit batching so a
        build doesn't pay one fsync per partition)."""
        changed = False
        for pid, sms in by_partition.items():
            if pid in self.checkpoints:
                continue
            for sm in sms:
                sm.split_state = "published"
                self.splits[sm.split_id] = sm
            self.checkpoints[pid] = {"committed_at": time.time()}
            changed = True
        if changed:
            self._commit()

    def source_offset(self, partition: str) -> int:
        """Committed stream offset for a queue partition (0 = nothing
        committed). Offsets live in the same checkpoint map the batch
        builds use, so batch and stream ingestion share one transactional
        publish path (checkpoint.rs:170-188 SourceCheckpoint analog)."""
        cp = self.checkpoints.get(partition)
        return int(cp.get("offset", 0)) if cp else 0

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
        changed = False
        for pid, (sms, frm, to) in by_partition.items():
            cur = self.source_offset(pid)
            if cur >= to:
                continue  # duplicate commit = no-op
            if cur != frm:
                raise ValueError(
                    f"checkpoint delta not contiguous for {pid!r}: "
                    f"committed {cur}, delta [{frm}, {to})")
            for sm in sms:
                sm.split_state = "published"
                self.splits[sm.split_id] = sm
            self.checkpoints[pid] = {"committed_at": time.time(),
                                     "offset": int(to)}
            changed = True
        if changed:
            self._commit()

    def mark_for_deletion(self, split_ids: Iterable[str]) -> None:
        for sid in split_ids:
            if sid in self.splits:
                self.splits[sid].split_state = "marked_for_deletion"
        self._commit()

    def delete_splits(self, split_ids: Iterable[str]) -> None:
        for sid in split_ids:
            self.splits.pop(sid, None)
        self._commit()

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
