"""Multi-index continuous-ingestion scheduler — the control-plane analog.

Re-expresses the reference control plane's indexing scheduler
(`quickwit-control-plane/src/indexing_scheduler/mod.rs:255-350`): the
control plane lists every (index_uid, source_id) pair that should be
ingesting, builds a PHYSICAL PLAN assigning one pipeline per pair to an
indexer node with bounded per-node load, applies the diff between the
running and desired plans, and RESCHEDULES when the indexer set changes
(a node died, a node joined).

Ray-native mapping:

  * indexer node  -> a long-lived Ray actor (``IndexerWorker``); its
    death is observed as ``RayActorError`` on the pipeline future —
    the chitchat-membership analog with Ray's failure detector.
  * physical plan -> least-loaded assignment of pending pipelines to
    live workers, ``max_pipelines_per_worker`` bounding node load
    (the reference's per-node capacity scoring, simplified to a slot
    count).
  * apply + converge loop -> ``run_once`` drains every pipeline's
    current backlog; ``run_loop`` repeats it (continuous ingestion).

Exactly-once across failures comes from the layer below, NOT from the
scheduler: every source type checkpoints through the manifest
(``Manifest.publish_stream`` offset deltas / commit-id checkpoints), so
a pipeline killed mid-run and re-assigned to another worker re-publishes
nothing (the same guarantee the reference gets from metastore
checkpoints when the control plane moves a pipeline between indexers).

The scheduler never calls ``ray.init`` — the embedding driver owns the
session (driver contract).
"""

from __future__ import annotations

import logging
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

log = logging.getLogger(__name__)


@dataclass(frozen=True)
class PipelineSpec:
    """One (index, source) ingestion pipeline — the scheduling unit
    (the reference's ``IndexingTask``: index_uid + source_id)."""

    index_dir: str
    source_id: str
    #: zero-arg picklable broker-client factory (queue/kafka/mq sources);
    #: None = the source's default (file-backed queue / file / wal)
    client_factory: Optional[Callable[[], Any]] = None
    #: extra kwargs for Index.ingest_source
    kw: tuple = field(default=())

    @property
    def key(self) -> str:
        return f"{self.index_dir}::{self.source_id}"


def _run_pipeline(index_dir: str, source_id: str, client_factory, kw):
    """Executed inside a worker actor: drain one source's backlog.
    ``execution="local"``: the pipeline runs ON its assigned node (the
    reference's indexer runs its pipelines in-process; cluster-level
    parallelism comes from many pipelines over many workers)."""
    from quickwit_ray.api import Index

    idx = Index.open(index_dir)
    return idx.ingest_source(source_id, execution="local",
                             client_factory=client_factory, **dict(kw))


class IndexingScheduler:
    """Driver-side scheduler owning N indexes x M sources over a pool of
    worker actors, with bounded per-worker load, dead-worker replacement
    and pipeline re-assignment.

    >>> sched = IndexingScheduler([PipelineSpec(dir1, "src-a"), ...],
    ...                           num_workers=3)
    >>> report = sched.run_once()     # drain every backlog once
    >>> sched.run_loop(rounds=10, poll_interval_sec=5)   # continuous
    >>> sched.shutdown()
    """

    def __init__(self, pipelines: list[PipelineSpec], *,
                 num_workers: int = 2,
                 max_pipelines_per_worker: int = 2,
                 max_attempts_per_pipeline: int = 3):
        self.pipelines = list(pipelines)
        self.num_workers = int(num_workers)
        self.max_per_worker = int(max_pipelines_per_worker)
        self.max_attempts = int(max_attempts_per_pipeline)
        self._workers: list[Any] = []
        self._worker_cls = None
        # observability (reference exposes the running plan via gRPC)
        self.last_report: dict[str, Any] = {}
        self.workers_replaced = 0

    # -- worker pool --------------------------------------------------------

    def _make_worker(self):
        import ray

        if self._worker_cls is None:
            # num_cpus=0.25: long-lived coordinator actors must not pin
            # whole logical CPUs against the Ray Data jobs the pipelines
            # themselves spawn (the round-4 leaf-pool deadlock lesson);
            # max_concurrency lets one worker run its slot count in
            # parallel threads.
            @ray.remote(num_cpus=0.25, max_concurrency=max(self.max_per_worker, 1))
            class IndexerWorker:
                def run_pipeline(self, index_dir, source_id, client_factory,
                                 kw):
                    return _run_pipeline(index_dir, source_id,
                                         client_factory, kw)

                def ping(self):
                    return "ok"

            self._worker_cls = IndexerWorker
        return self._worker_cls.remote()

    def _ensure_workers(self) -> None:
        while len(self._workers) < self.num_workers:
            self._workers.append(self._make_worker())

    def kill_worker(self, i: int) -> None:
        """Chaos hook (tests): hard-kill one worker actor, no restart —
        the node-death event the scheduler must absorb."""
        import ray

        ray.kill(self._workers[i], no_restart=True)

    def shutdown(self) -> None:
        import ray

        for w in self._workers:
            try:
                ray.kill(w, no_restart=True)
            except Exception:  # noqa: BLE001 — already dead
                pass
        self._workers = []

    # -- scheduling ---------------------------------------------------------

    def run_once(self) -> dict[str, Any]:
        """Drain every pipeline's current backlog once.

        Least-loaded assignment, bounded per-worker slots; a worker death
        (RayActorError) replaces the actor IN ITS SLOT and re-queues its
        in-flight pipelines (attempt-bounded) — re-runs publish nothing
        already committed. Returns {pipeline_key: stats | Exception}."""
        import ray

        self._ensure_workers()
        pending: deque[PipelineSpec] = deque(self.pipelines)
        attempts: dict[str, int] = {}
        # future -> (spec, slot, generation): generations keep the load
        # accounting honest when a dead worker's remaining futures drain
        # AFTER its slot was already re-staffed
        inflight: dict[Any, tuple[PipelineSpec, int, int]] = {}
        load = [0] * len(self._workers)
        gen = [0] * len(self._workers)
        results: dict[str, Any] = {}

        def submit(spec: PipelineSpec) -> bool:
            free = [(ld, i) for i, ld in enumerate(load)
                    if ld < self.max_per_worker]
            if not free:
                return False
            _, widx = min(free)
            fut = self._workers[widx].run_pipeline.remote(
                spec.index_dir, spec.source_id, spec.client_factory, spec.kw)
            inflight[fut] = (spec, widx, gen[widx])
            load[widx] += 1
            return True

        while pending or inflight:
            while pending and submit(pending[0]):
                pending.popleft()
            if not inflight:
                continue  # all workers full raced a completion; re-check
            done, _ = ray.wait(list(inflight), num_returns=1)
            for fut in done:
                spec, widx, g = inflight.pop(fut)
                if g == gen[widx]:
                    load[widx] -= 1
                try:
                    results[spec.key] = ray.get(fut)
                    continue
                except ray.exceptions.RayActorError:
                    # node death: replace the worker in its slot (the
                    # rebalance event, mod.rs:255-350) and re-queue —
                    # manifest checkpoints make the re-run exactly-once
                    if g == gen[widx]:
                        log.warning("indexer worker %d died; replacing and "
                                    "re-queuing %s", widx, spec.key)
                        self._workers[widx] = self._make_worker()
                        self.workers_replaced += 1
                        gen[widx] += 1
                        load[widx] = 0
                    # every other pipeline in flight on that worker also
                    # surfaces RayActorError and re-queues below
                except Exception as e:  # noqa: BLE001 — pipeline bug/data
                    log.warning("pipeline %s failed: %s", spec.key, e)
                    results[spec.key] = e
                n = attempts[spec.key] = attempts.get(spec.key, 0) + 1
                if n < self.max_attempts:
                    results.pop(spec.key, None)
                    pending.append(spec)
                elif spec.key not in results:
                    results[spec.key] = RuntimeError(
                        f"pipeline {spec.key} exhausted "
                        f"{self.max_attempts} attempts")
        self.last_report = results
        return results

    def run_loop(self, rounds: int, poll_interval_sec: float = 1.0,
                 stop_when: Optional[Callable[[], bool]] = None
                 ) -> list[dict[str, Any]]:
        """Continuous ingestion: repeat ``run_once`` (each round drains
        whatever arrived since the last) until ``rounds`` or
        ``stop_when()``."""
        out = []
        for r in range(rounds):
            out.append(self.run_once())
            if stop_when is not None and stop_when():
                break
            if r + 1 < rounds and poll_interval_sec:
                time.sleep(poll_interval_sec)
        return out
