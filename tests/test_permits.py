"""Memory-budgeted search admission (reference SearchPermitProvider,
quickwit-search/src/search_permit_provider.rs + node_config defaults).

Unit tests drive the provider directly; the integration test runs
concurrent fat queries over a real index under a tiny budget and asserts
the budget held (tracked via the readers' actual materialized bytes)."""

import threading
import time

import pytest

from quickwit_ray.search.permits import (
    SearchPermitProvider,
    compute_initial_memory_allocation,
    configure,
    get_permit_provider,
    split_allocation_from_footer,
)


def test_initial_allocation_formula():
    GB = 1024 ** 3
    # large split: capped by the initial allocation
    assert compute_initial_memory_allocation(50 * GB, 50_000_000, GB) == GB
    # small split: capped by split size
    assert compute_initial_memory_allocation(200_000_000, 10_000_000, GB) \
        == 200_000_000
    # few docs: proportional allocation wins
    assert compute_initial_memory_allocation(
        5 * GB, 1_000_000, GB) == GB // 10
    # floor at 10 MB
    assert compute_initial_memory_allocation(1000, 10, GB) == 10_000_000


def test_budget_gates_admission_fifo():
    prov = SearchPermitProvider(memory_budget=100, num_warmup_slots=10)
    p1 = prov.acquire(60)
    p2 = prov.acquire(40)  # fits exactly
    order: list[int] = []

    def want(n, size):
        p = prov.acquire(size)
        order.append(n)
        time.sleep(0.01)
        p.release()

    # third (50) must wait; fourth (1) would fit but FIFO forbids overtake
    t3 = threading.Thread(target=want, args=(3, 50))
    t4 = threading.Thread(target=want, args=(4, 1))
    t3.start()
    time.sleep(0.05)
    t4.start()
    time.sleep(0.05)
    assert order == []  # both queued behind the exhausted budget
    p1.release()
    t3.join(timeout=5)
    t4.join(timeout=5)
    assert order == [3, 4]  # strict request order
    p2.release()
    assert prov.allocated == 0 and prov.in_flight == 0
    assert prov.peak_allocated <= 100


def test_oversized_single_split_still_admitted():
    prov = SearchPermitProvider(memory_budget=100)
    p = prov.acquire(10_000)  # bigger than the whole budget: progress
    assert prov.in_flight == 1
    # nothing else gets in while the giant runs
    got = []
    t = threading.Thread(target=lambda: got.append(prov.acquire(10)))
    t.start()
    time.sleep(0.05)
    assert got == []
    p.release()
    t.join(timeout=5)
    assert len(got) == 1
    got[0].release()


def test_warmup_slots_cap_concurrency():
    prov = SearchPermitProvider(memory_budget=10**9, num_warmup_slots=2)
    p1, p2 = prov.acquire(10), prov.acquire(10)
    blocked = []
    t = threading.Thread(target=lambda: blocked.append(prov.acquire(10)))
    t.start()
    time.sleep(0.05)
    assert blocked == []  # both slots busy despite free budget
    # reporting actual memory frees the warmup slot (reference: warmup
    # done -> download slot released, memory kept)
    p1.set_actual_memory(5)
    t.join(timeout=5)
    assert len(blocked) == 1
    for p in (p2, blocked[0], p1):
        p.release()
    assert prov.allocated == 0


def test_actual_memory_overshoot_blocks_new_permits():
    prov = SearchPermitProvider(memory_budget=100, num_warmup_slots=10)
    p1 = prov.acquire(50)
    p1.set_actual_memory(120)  # exceeded its estimate: budget overshot
    queued = []
    t = threading.Thread(target=lambda: queued.append(prov.acquire(10)))
    t.start()
    time.sleep(0.05)
    assert queued == []  # no admission until memory frees
    p1.release()
    t.join(timeout=5)
    assert len(queued) == 1
    queued[0].release()


def test_footer_allocation_and_global_configure(tmp_path):
    import json
    import os

    d = str(tmp_path / "s")
    os.makedirs(d)
    with open(os.path.join(d, "footer.json"), "w") as f:
        json.dump({"num_docs": 1000,
                   "files": {"postings.parquet": 5_000_000}}, f)
    assert split_allocation_from_footer(d) == 10_000_000  # floored
    prov = configure(memory_budget=123, num_warmup_slots=4)
    try:
        assert get_permit_provider() is prov
        assert prov.memory_budget == 123 and prov.num_warmup_slots == 4
    finally:
        configure(memory_budget=100 * 1024 ** 3, num_warmup_slots=100)


# -- integration: concurrent fat queries under a tiny budget -----------------

def test_concurrent_queries_respect_budget(tmp_path):
    import pyarrow.parquet as pq

    from quickwit_ray.api import Index
    from quickwit_ray.config import IndexSettings, documents_doc_mapping

    idx = Index.create(str(tmp_path / "b"), "b", documents_doc_mapping(),
                       settings=IndexSettings(split_num_docs_target=150))
    rows = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet").slice(0, 600).to_pylist()
    idx.ingest_docs(rows, commit_id="seed")  # -> 4 splits
    from quickwit_ray.search.engine import get_searcher
    s = get_searcher(idx.index_dir)
    baseline = s.search("the data", max_hits=20, aggs={
        "l": {"terms": {"field": "lang"}}})
    # tiny budget: at most 2 in-flight 10 MB reservations at once
    prov = configure(memory_budget=25_000_000, num_warmup_slots=100)
    try:
        results, errs = [], []
        # distinct queries: the leaf request cache must not absorb the
        # fan-out (admission is per real leaf evaluation)
        queries = ["the data", "a system", "information model",
                   "the data set", "a data system", "new information"]

        def run(q):
            try:
                r = s.search(q, max_hits=20, aggs={
                    "l": {"terms": {"field": "lang"}}})
                results.append(r)
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=run, args=(q,)) for q in queries]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errs
        assert len(results) == 6
        prov = get_permit_provider()
        # admission happened (4 splits x 6 queries, minus leaf-cache hits)
        assert prov.total_admissions >= 4
        # the byte budget was never exceeded by ADMITTED allocations:
        # estimates are 10 MB pessimistic floors, actual reader reads are
        # far smaller, so peak tracked allocation stays within budget
        assert prov.peak_allocated <= 25_000_000
        # degradation to bounded concurrency: never more than
        # floor(budget / 10MB) = 2 leaves in flight
        assert prov.peak_in_flight <= 2
        # results identical to the unbudgeted baseline for the shared query
        unbudgeted = [r for r in results
                      if r.num_hits == baseline.num_hits]
        assert any(r.aggs == baseline.aggs for r in unbudgeted)
    finally:
        configure(memory_budget=100 * 1024 ** 3, num_warmup_slots=100)
