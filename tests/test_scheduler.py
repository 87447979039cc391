"""Multi-index continuous-ingestion scheduler (quickwit_ray/scheduler.py)
— the control-plane analog (indexing_scheduler/mod.rs:255-350): N indexes
x M sources over a bounded worker-actor pool, dead-worker replacement,
exactly-once through manifest checkpoints."""

import threading
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quickwit_ray.api import Index
from quickwit_ray.config import (
    IndexSettings,
    documents_doc_mapping,
)
from quickwit_ray.scheduler import IndexingScheduler, PipelineSpec
from quickwit_ray.sources.queue import PartitionedQueue

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _mk_index(tmp_path, name: str) -> Index:
    return Index.create(str(tmp_path / name), name, documents_doc_mapping(),
                        IndexSettings(split_num_docs_target=100_000))


def _mk_queue(tmp_path, name: str, lo: int, hi: int) -> str:
    qdir = str(tmp_path / f"q-{name}")
    q = PartitionedQueue.create(qdir, 2)
    t = pq.read_table(DOCS).slice(lo, hi - lo)
    half = t.num_rows // 2
    q.append(0, t.slice(0, half))
    q.append(1, t.slice(half))
    return qdir


def _wire(tmp_path, n_indexes: int = 3) -> tuple[list[Index], list[PipelineSpec]]:
    """n indexes x 2 queue sources each; the two sources of one index
    carry disjoint doc ranges, so a drained index holds exactly 500."""
    indexes, specs = [], []
    for i in range(n_indexes):
        idx = _mk_index(tmp_path, f"idx{i}")
        for j, (lo, hi) in enumerate([(0, 250), (250, 500)]):
            qdir = _mk_queue(tmp_path, f"{i}-{j}", lo, hi)
            idx.add_source({"source_id": f"src{j}", "source_type": "queue",
                            "params": {"queue_dir": qdir}})
            specs.append(PipelineSpec(idx.index_dir, f"src{j}"))
        indexes.append(idx)
    return indexes, specs


def test_scheduler_drains_all_pipelines(tmp_path, ray_session):
    indexes, specs = _wire(tmp_path, n_indexes=2)
    sched = IndexingScheduler(specs, num_workers=2,
                              max_pipelines_per_worker=2)
    try:
        report = sched.run_once()
        assert len(report) == 4
        assert not [k for k, v in report.items()
                    if isinstance(v, Exception)], report
        for idx in indexes:
            assert idx.search("*", max_hits=0).num_hits == 500
        # a second control-loop round over drained sources is a no-op
        report2 = sched.run_once()
        assert not [k for k, v in report2.items()
                    if isinstance(v, Exception)]
        for idx in indexes:
            assert Index.open(idx.index_dir).search(
                "*", max_hits=0).num_hits == 500
    finally:
        sched.shutdown()


def test_scheduler_rebalances_on_worker_death_exactly_once(tmp_path,
                                                           ray_session):
    """The verdict's done-criterion: 3 indexes x 2 sources running
    concurrently to completion with one injected worker death —
    checkpoints exactly-once throughout (500 docs per index, no dupes,
    no loss), the dead worker replaced in its slot."""
    indexes, specs = _wire(tmp_path, n_indexes=3)
    # poll_rounds=2 + poll_interval keeps every pipeline on its worker
    # long enough for the kill to land mid-flight
    specs = [PipelineSpec(s.index_dir, s.source_id,
                          kw=(("poll_rounds", 2),
                              ("poll_interval_sec", 1.5)))
             for s in specs]
    sched = IndexingScheduler(specs, num_workers=3,
                              max_pipelines_per_worker=2)

    killer = threading.Timer(0.8, lambda: sched.kill_worker(0))
    killer.start()
    try:
        report = sched.run_once()
    finally:
        killer.cancel()
        sched.shutdown()
    errs = {k: v for k, v in report.items() if isinstance(v, Exception)}
    assert not errs, errs
    assert sched.workers_replaced >= 1    # the death was absorbed
    for idx in indexes:
        got = Index.open(idx.index_dir)
        assert got.search("*", max_hits=0).num_hits == 500  # exactly-once
        r = got.search("text:scan", max_hits=600, fetch_fields=["doc_id"])
        assert len(set(r.hits["doc_id"])) == len(r.hits)    # no dupes


def test_scheduler_bounds_worker_load(tmp_path, ray_session):
    """max_pipelines_per_worker is a hard slot bound: 6 pipelines over 1
    worker with 2 slots still complete (queueing, not overload)."""
    indexes, specs = _wire(tmp_path, n_indexes=3)
    sched = IndexingScheduler(specs, num_workers=1,
                              max_pipelines_per_worker=2)
    try:
        report = sched.run_once()
        assert not [k for k, v in report.items() if isinstance(v, Exception)]
        for idx in indexes:
            assert idx.search("*", max_hits=0).num_hits == 500
    finally:
        sched.shutdown()


def test_scheduler_surfaces_poison_pipeline(tmp_path, ray_session):
    """A pipeline that fails deterministically (missing source) exhausts
    its attempt budget and lands in the report as an error WITHOUT
    blocking the healthy pipelines."""
    indexes, specs = _wire(tmp_path, n_indexes=1)
    specs = specs + [PipelineSpec(indexes[0].index_dir, "no-such-source")]
    sched = IndexingScheduler(specs, num_workers=2,
                              max_pipelines_per_worker=2,
                              max_attempts_per_pipeline=2)
    try:
        report = sched.run_once()
    finally:
        sched.shutdown()
    bad = report[f"{indexes[0].index_dir}::no-such-source"]
    assert isinstance(bad, Exception)
    assert indexes[0].search("*", max_hits=0).num_hits == 500
