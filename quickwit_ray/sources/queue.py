"""Kafka-shaped streaming source.

Re-expresses the reference's queue-source model
(`quickwit-indexing/src/source/kafka_source.rs` — per-partition consumers,
offset checkpoints; `checkpoint.rs:170-188` — contiguity-checked
SourceCheckpoint deltas committed transactionally with the split publish,
`actors/publisher.rs:137-160`) on top of the repo's manifest:

  * ``PartitionedQueue`` — a durable partitioned append-only record log on
    disk (the simulated broker for tests/bench: one directory per
    partition, one parquet segment per append; the record offset is the
    record's index within its partition).
  * ``ingest_queue`` — the poller: reads each partition from its COMMITTED
    offset (manifest checkpoint ``queue:{partition}``), cuts <=
    ``max_batch_bytes`` micro-batches, builds one split per micro-batch in
    a Ray task (deterministic split id from (partition, from, to) so
    retries overwrite instead of duplicating), and commits splits + offset
    deltas in one atomic manifest write per wave.

Exactly-once: a kill at ANY point resumes cleanly —
  - killed before publish: offsets unchanged, the same ranges are rebuilt
    under the same split ids (staged dirs are overwritten);
  - killed after publish: offsets advanced, the ranges are never re-read
    (``Manifest.publish_stream`` no-ops duplicate deltas and refuses
    non-contiguous ones).
"""

from __future__ import annotations

import glob
import json
import os
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from quickwit_ray.config import IndexConfig
from quickwit_ray.state.manifest import Manifest, SplitMetadata

DEFAULT_MAX_BATCH_BYTES = 5 << 20  # 5 MiB micro-batches (reference default
# batch sizing for queue sources is a few MiB per doc batch)


class PartitionedQueue:
    """Durable partitioned append-only record log (simulated broker)."""

    def __init__(self, queue_dir: str):
        self.queue_dir = queue_dir
        meta_path = os.path.join(queue_dir, "queue.json")
        with open(meta_path) as f:
            self.meta = json.load(f)
        self.num_partitions = int(self.meta["num_partitions"])

    # -- producer ----------------------------------------------------------

    @staticmethod
    def create(queue_dir: str, num_partitions: int) -> "PartitionedQueue":
        os.makedirs(queue_dir, exist_ok=True)
        for p in range(num_partitions):
            os.makedirs(os.path.join(queue_dir, f"p{p:04d}"), exist_ok=True)
        with open(os.path.join(queue_dir, "queue.json"), "w") as f:
            json.dump({"num_partitions": num_partitions}, f)
        return PartitionedQueue(queue_dir)

    def _part_dir(self, partition: int) -> str:
        return os.path.join(self.queue_dir, f"p{partition:04d}")

    def _segments(self, partition: int) -> list[tuple[int, int, str]]:
        """[(start_offset, num_rows, path)] sorted by start."""
        out = []
        for path in sorted(glob.glob(os.path.join(self._part_dir(partition),
                                                  "seg-*.parquet"))):
            name = os.path.basename(path)[4:-8]  # seg-<start>-<n>.parquet
            start_s, n_s = name.split("-")
            out.append((int(start_s), int(n_s), path))
        return out

    def end_offset(self, partition: int) -> int:
        segs = self._segments(partition)
        if not segs:
            return 0
        s, n, _ = segs[-1]
        return s + n

    def append(self, partition: int, table: pa.Table) -> tuple[int, int]:
        """Append records; returns the (from, to) offset range assigned."""
        start = self.end_offset(partition)
        n = table.num_rows
        path = os.path.join(self._part_dir(partition),
                            f"seg-{start:012d}-{n:010d}.parquet")
        pq.write_table(table, path, compression="zstd", compression_level=1)
        return start, start + n

    # -- consumer ----------------------------------------------------------

    def read(self, partition: int, from_offset: int,
             to_offset: Optional[int] = None) -> pa.Table:
        """Records of ``[from_offset, to_offset)`` (to end when None)."""
        end = self.end_offset(partition) if to_offset is None else to_offset
        pieces = []
        for start, n, path in self._segments(partition):
            if start + n <= from_offset or start >= end:
                continue
            t = pq.read_table(path)
            lo = max(from_offset - start, 0)
            hi = min(end - start, n)
            pieces.append(t.slice(lo, hi - lo))
        if not pieces:
            return pa.table({})
        return pa.concat_tables(pieces, promote_options="default")

    def estimate_batch_ranges(self, partition: int, from_offset: int,
                              max_batch_bytes: int) -> list[tuple[int, int]]:
        """Cut [from_offset, end) into micro-batch offset ranges of roughly
        <= max_batch_bytes, ALIGNED to segment boundaries wherever possible
        (a range crossing into a segment forces that whole parquet file to
        decompress, so unaligned batches re-read segments up to
        segment/batch times). A single oversized segment is split by the
        per-record byte-rate estimate — the re-read stays bounded to that
        one segment. Never reads record data."""
        segs = self._segments(partition)
        end = self.end_offset(partition)
        if from_offset >= end:
            return []
        out: list[tuple[int, int]] = []
        cur = from_offset
        acc_bytes = 0
        for s, n, p in segs:
            seg_end = s + n
            if seg_end <= from_offset:
                continue
            size = os.path.getsize(p)
            if size > max_batch_bytes:
                # flush what we have, then split the big segment internally
                if cur < s:
                    out.append((cur, s))
                    cur = s
                    acc_bytes = 0
                per_rec = max(size / max(n, 1), 1.0)
                step = max(int(max_batch_bytes / per_rec), 1)
                lo = max(cur, s)
                while lo < seg_end:
                    hi = min(lo + step, seg_end)
                    out.append((lo, hi))
                    lo = hi
                cur = seg_end
                acc_bytes = 0
                continue
            # prorate a segment the cursor sits inside (resume mid-segment):
            # only its remaining rows contribute pending bytes
            if cur > s:
                size = int(size * (seg_end - cur) / max(n, 1))
            if acc_bytes + size > max_batch_bytes and cur < s:
                out.append((cur, s))
                cur = s
                acc_bytes = 0
            acc_bytes += size
        if cur < end:
            out.append((cur, end))
        return out


def _build_queue_split(client_factory, partition: int, frm: int, to: int,
                       config_json: dict, index_dir: str,
                       checkpoint_prefix: str = "queue") -> str:
    """One Ray task: read a micro-batch offset range and build one split.
    The split id is deterministic in (partition, frm, to), so a retried or
    re-polled range overwrites its own staged artifacts (exactly-once with
    the manifest's offset checkpoint). ``client_factory`` constructs the
    queue client INSIDE the task (a broker consumer is not picklable;
    every task owns its own connection, kafka_source.rs's
    per-source-consumer model)."""
    from quickwit_ray.index.writer import SplitBuilder

    config = IndexConfig.from_json(config_json)
    queue = client_factory()
    table = queue.read(partition, frm, to)
    builder = SplitBuilder(config, index_dir,
                           f"{checkpoint_prefix}:{partition}:{frm}-{to}", 0)
    if table.num_rows:
        builder.add_batch(table)
    sm = builder.flush()
    return json.dumps(sm.to_json() if sm is not None else None)


@dataclass
class StreamStats:
    num_commits: int = 0
    num_splits: int = 0
    num_docs: int = 0
    elapsed_sec: float = 0.0


def ingest_queue(queue_dir: str, index_dir: str, config: IndexConfig, *,
                 max_batch_bytes: int = DEFAULT_MAX_BATCH_BYTES,
                 execution: str = "ray",
                 poll_rounds: int = 1,
                 poll_interval_sec: float = 0.0,
                 max_batches_per_wave: Optional[int] = None,
                 fault_after_commits: Optional[int] = None,
                 client_factory=None,
                 checkpoint_prefix: str = "queue") -> StreamStats:
    """Poll the queue and index everything past the committed offsets.

    ``client_factory`` swaps the broker implementation: any zero-arg
    callable returning an object with the ``PartitionedQueue`` read
    contract (``num_partitions``, ``end_offset``, ``read``,
    ``estimate_batch_ranges``) — e.g. ``sources.kafka.KafkaQueueClient``
    — defaults to the on-disk simulated broker at ``queue_dir``.

    One call drains the current backlog ``poll_rounds`` times (a real
    deployment loops forever; tests use 1-2 rounds). Each wave:
      1. per partition, plan micro-batch ranges from the committed offset
      2. build one split per range (Ray task fan-out; ``execution="local"``
         runs the same code in-process)
      3. ``Manifest.publish_stream`` commits every completed partition's
         splits + offset delta in ONE atomic manifest write

    ``fault_after_commits`` raises RuntimeError after N commit waves —
    the kill-mid-stream hook for the exactly-once tests.
    """
    t0 = time.time()
    if client_factory is None:
        client_factory = lambda: PartitionedQueue(queue_dir)  # noqa: E731
    queue = client_factory()
    manifest = Manifest(index_dir)
    if manifest.index_config_json is None:
        manifest.create(config.to_json())
    stats = StreamStats()
    config_json = config.to_json()

    for rnd in range(poll_rounds):
        if rnd and poll_interval_sec:
            time.sleep(poll_interval_sec)
        # plan this wave: (partition, frm, to) work items
        work: list[tuple[int, int, int]] = []
        for p in range(queue.num_partitions):
            frm = manifest.source_offset(f"{checkpoint_prefix}:{p}")
            for (a, b) in queue.estimate_batch_ranges(p, frm, max_batch_bytes):
                work.append((p, a, b))
        if max_batches_per_wave is not None:
            # bounded in-flight per wave; the slice keeps a contiguous
            # offset prefix per partition (work is (partition, frm) sorted)
            work = work[:max_batches_per_wave]
        if not work:
            continue
        if execution == "ray":
            import ray

            task = ray.remote(num_cpus=1)(_build_queue_split)
            futs = [(p, a, b, task.remote(client_factory, p, a, b,
                                          config_json, index_dir,
                                          checkpoint_prefix))
                    for (p, a, b) in work]
            results = [(p, a, b, ray.get(f)) for (p, a, b, f) in futs]
        else:
            results = [(p, a, b, _build_queue_split(client_factory, p, a, b,
                                                    config_json, index_dir,
                                                    checkpoint_prefix))
                       for (p, a, b) in work]
        # commit wave: contiguous ranges per partition collapse into one
        # delta; splits of a partition publish together with its offset
        by_partition: dict[str, tuple[list[SplitMetadata], int, int]] = {}

        def _pos_key(v):
            # int offsets (Kafka/file queue) and opaque string positions
            # (Kinesis/Pulsar) sort uniformly: Beginning(int) first
            return (1, v) if isinstance(v, str) else (0, v)

        for p, a, b, sj in sorted(results,
                                  key=lambda r: (r[0], _pos_key(r[1]))):
            sm_json = json.loads(sj)
            sms: list[SplitMetadata] = (
                [SplitMetadata.from_json(sm_json)] if sm_json else [])
            key = f"{checkpoint_prefix}:{p}"
            if key in by_partition:
                prev_sms, frm0, to0 = by_partition[key]
                assert to0 == a, "micro-batch ranges must be contiguous"
                by_partition[key] = (prev_sms + sms, frm0, b)
            else:
                by_partition[key] = (sms, a, b)
        manifest.publish_stream(by_partition)
        stats.num_commits += 1
        stats.num_splits += sum(len(s) for s, _, _ in by_partition.values())
        stats.num_docs += sum(sum(x.num_docs for x in s)
                              for s, _, _ in by_partition.values())
        if fault_after_commits is not None and stats.num_commits >= fault_after_commits:
            raise RuntimeError(f"injected fault after {stats.num_commits} commits")
    stats.elapsed_sec = time.time() - t0
    return stats


def queue_from_parquet(input_path: str, queue_dir: str, *,
                       num_partitions: int = 4,
                       partition_col: Optional[str] = None,
                       records_per_append: int = 0) -> PartitionedQueue:
    """Load a parquet table into a simulated queue, routed by
    hash(partition_col) % num_partitions (or round-robin block split when
    no column is given). Multiple appends per partition simulate the
    broker's segmented log."""
    import pandas as pd

    tbl = pq.read_table(input_path)
    q = PartitionedQueue.create(queue_dir, num_partitions)
    if partition_col is not None:
        key = tbl[partition_col].to_pandas()
        from quickwit_ray.functions.stablehash import hash64 as _h64

        pids = _h64(key.to_numpy()) % np.uint64(num_partitions)
    else:
        pids = np.arange(tbl.num_rows) % num_partitions
    for p in range(num_partitions):
        sub = tbl.filter(pa.array(pids == p))
        if sub.num_rows == 0:
            continue
        step = records_per_append or max(sub.num_rows // 3, 1)
        for off in range(0, sub.num_rows, step):
            q.append(p, sub.slice(off, step))
    return q
