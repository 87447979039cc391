"""Memory-budgeted search admission (the reference's SearchPermitProvider).

Re-expresses `quickwit-search/src/search_permit_provider.rs:35-140` +
`quickwit-config/src/node_config/mod.rs:274-275` for this engine's
synchronous leaf searches: every leaf evaluation first acquires a permit
that pessimistically reserves warmup memory for its split; permits are
granted FIFO while the shared byte budget holds, so a burst of fat
queries over fat posting lists degrades to (partially) sequential
execution instead of OOMing the searcher process.

Semantics kept from the reference:

* permits are served strictly in request order (no small-split overtake);
* each permit also consumes one *warmup slot*
  (``max_num_concurrent_split_searches``-style cap) until the caller
  reports actual usage or releases;
* the initial reservation is ``compute_initial_memory_allocation``:
  ``min(split_size, initial_alloc * num_docs / 10M, initial_alloc)``
  floored at 10 MB (constants from the reference);
* ``set_actual_memory`` replaces the estimate with measured usage —
  total allocation may then temporarily exceed the budget, in which case
  no new permit is granted until memory frees (exactly the reference's
  documented overshoot rule);
* a permit for a split larger than the whole budget is still granted
  when nothing else is in flight (progress guarantee — the reference
  gets this from per-permit caps).

One provider exists per process (driver for local/threaded execution,
each search actor for the Ray pool — the per-searcher-node budget
analog). The sandbox default budget (100 GB) never gates the bench;
tests construct small-budget providers or call :func:`configure`.
"""

from __future__ import annotations

import json
import os
import threading
from collections import deque
from typing import Optional

# reference defaults (node_config/mod.rs:274-275 SearcherConfig)
DEFAULT_MEMORY_BUDGET = 100 * 1024 ** 3          # warmup_memory_budget
DEFAULT_INITIAL_ALLOCATION = 1 * 1024 ** 3       # single_split_initial_allocation
DEFAULT_WARMUP_SLOTS = 100                       # max_num_concurrent_split_searches
_MINIMUM_ALLOCATION = 10_000_000                 # MINIMUM_ALLOCATION_BYTES
_LARGE_SPLIT_NUM_DOCS = 10_000_000               # LARGE_SPLIT_NUM_DOCS


def compute_initial_memory_allocation(
        split_size_bytes: int, num_docs: int,
        initial_allocation: int = DEFAULT_INITIAL_ALLOCATION) -> int:
    """Pessimistic pre-warmup reservation for one split search
    (search_permit_provider.rs ``compute_initial_memory_allocation``)."""
    proportional = initial_allocation * max(int(num_docs), 0) \
        // _LARGE_SPLIT_NUM_DOCS
    size = min(int(split_size_bytes), proportional, initial_allocation)
    return max(size, _MINIMUM_ALLOCATION)


_ALLOC_CACHE: dict[tuple[str, int], int] = {}
_ALLOC_CACHE_LOCK = threading.Lock()


def split_allocation_from_footer(split_dir: str,
                                 initial_allocation: int =
                                 DEFAULT_INITIAL_ALLOCATION) -> int:
    """Reservation estimate from a split's footer.json alone (the analog
    of sizing from SplitIdAndFooterOffsets metadata, pre-open). Cached —
    split artifacts are immutable, so one footer read per split per
    process; hot-query paths never re-stat."""
    key = (split_dir, initial_allocation)
    with _ALLOC_CACHE_LOCK:
        hit = _ALLOC_CACHE.get(key)
        if hit is not None:
            return hit
    alloc = _split_allocation_uncached(split_dir, initial_allocation)
    with _ALLOC_CACHE_LOCK:
        if len(_ALLOC_CACHE) > 65536:
            _ALLOC_CACHE.clear()
        _ALLOC_CACHE[key] = alloc
    return alloc


def _split_allocation_uncached(split_dir: str,
                               initial_allocation: int) -> int:
    try:
        from quickwit_ray import storage

        footer = json.loads(
            storage.read_bytes(os.path.join(split_dir, "footer.json")))
    except OSError:
        return _MINIMUM_ALLOCATION
    size = sum(int(v) for v in (footer.get("files") or {}).values())
    return compute_initial_memory_allocation(
        size or _MINIMUM_ALLOCATION, footer.get("num_docs", 0),
        initial_allocation)


class SearchPermit:
    """One granted split-search admission. Release exactly once (context
    manager recommended); ``set_actual_memory`` may be called once after
    warmup to replace the pessimistic estimate with measured bytes."""

    def __init__(self, provider: "SearchPermitProvider", allocated: int):
        self._provider = provider
        self.allocated = int(allocated)
        self._warmup_slot_held = True
        self._released = False

    def set_actual_memory(self, actual_bytes: int) -> None:
        """Replace the estimate with measured usage and free the warmup
        slot (the reference's post-warmup ``update_memory_usage`` +
        ``free_warmup_slot``)."""
        if self._released:
            return
        self._provider._update(self, int(actual_bytes),
                               free_warmup=self._warmup_slot_held)
        self._warmup_slot_held = False

    def release(self) -> None:
        if self._released:
            return
        self._released = True
        self._provider._drop(self.allocated,
                             free_warmup=self._warmup_slot_held)
        self._warmup_slot_held = False

    def __enter__(self) -> "SearchPermit":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


class SearchPermitProvider:
    """Thread-safe FIFO byte-budget + warmup-slot gate."""

    def __init__(self, memory_budget: int = DEFAULT_MEMORY_BUDGET,
                 num_warmup_slots: int = DEFAULT_WARMUP_SLOTS,
                 initial_allocation: int = DEFAULT_INITIAL_ALLOCATION):
        self.memory_budget = int(memory_budget)
        self.num_warmup_slots = int(num_warmup_slots)
        self.initial_allocation = int(initial_allocation)
        self._allocated = 0
        self._warmup_in_use = 0
        self._in_flight = 0
        self._cond = threading.Condition()
        self._queue: deque[int] = deque()   # FIFO tickets
        self._next_ticket = 0
        # observability: high-water marks (asserted in tests, exported by
        # /metrics)
        self.peak_allocated = 0
        self.peak_in_flight = 0
        self.total_admissions = 0

    # -- public --------------------------------------------------------

    def acquire(self, size_bytes: int) -> SearchPermit:
        """Block until ``size_bytes`` fits the budget AND a warmup slot is
        free AND every earlier request was served. Always admits when
        nothing is in flight (progress for over-budget singles)."""
        size = int(size_bytes)
        with self._cond:
            ticket = self._next_ticket
            self._next_ticket += 1
            self._queue.append(ticket)
            self._cond.wait_for(
                lambda: self._queue[0] == ticket and self._admittable(size))
            self._queue.popleft()
            self._allocated += size
            self._warmup_in_use += 1
            self._in_flight += 1
            self.total_admissions += 1
            self.peak_allocated = max(self.peak_allocated, self._allocated)
            self.peak_in_flight = max(self.peak_in_flight, self._in_flight)
            self._cond.notify_all()
        return SearchPermit(self, size)

    def acquire_for_split(self, split_dir: str) -> SearchPermit:
        return self.acquire(split_allocation_from_footer(
            split_dir, self.initial_allocation))

    @property
    def allocated(self) -> int:
        return self._allocated

    @property
    def in_flight(self) -> int:
        return self._in_flight

    # -- internal ------------------------------------------------------

    def _admittable(self, size: int) -> bool:
        if self._in_flight == 0:
            return True
        return (self._allocated + size <= self.memory_budget
                and self._warmup_in_use < self.num_warmup_slots)

    def _update(self, permit: SearchPermit, actual: int,
                free_warmup: bool) -> None:
        with self._cond:
            self._allocated += actual - permit.allocated
            permit.allocated = actual
            if free_warmup:
                self._warmup_in_use -= 1
            self.peak_allocated = max(self.peak_allocated, self._allocated)
            self._cond.notify_all()

    def _drop(self, size: int, free_warmup: bool) -> None:
        with self._cond:
            self._allocated -= size
            if free_warmup:
                self._warmup_in_use -= 1
            self._in_flight -= 1
            self._cond.notify_all()


# -- process-global provider (per searcher process, like the reference's
# per-node provider) ---------------------------------------------------

_GLOBAL: Optional[SearchPermitProvider] = None
_GLOBAL_LOCK = threading.Lock()


def get_permit_provider() -> SearchPermitProvider:
    global _GLOBAL
    if _GLOBAL is None:
        with _GLOBAL_LOCK:
            if _GLOBAL is None:
                _GLOBAL = SearchPermitProvider()
    return _GLOBAL


def configure(memory_budget: Optional[int] = None,
              num_warmup_slots: Optional[int] = None,
              initial_allocation: Optional[int] = None
              ) -> SearchPermitProvider:
    """Replace the process-global provider (searcher config reload)."""
    global _GLOBAL
    with _GLOBAL_LOCK:
        cur = _GLOBAL or SearchPermitProvider()
        _GLOBAL = SearchPermitProvider(
            memory_budget if memory_budget is not None else cur.memory_budget,
            num_warmup_slots if num_warmup_slots is not None
            else cur.num_warmup_slots,
            initial_allocation if initial_allocation is not None
            else cur.initial_allocation)
        return _GLOBAL
