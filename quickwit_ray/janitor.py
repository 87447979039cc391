"""Janitor service — the periodic maintenance loop.

Re-expresses `quickwit-janitor/src/lib.rs` (the janitor service spawns
the retention-policy executor `retention_policy_execution.rs:39-100`,
the garbage collector `garbage_collection.rs:106-220`, and the
delete-task pipeline) as one background thread over a registry of
indexes:

  per index, each cycle:
    1. apply the configured retention policy (mark expired splits),
    2. apply pending delete tasks to lagging splits,
    3. garbage-collect unreferenced / marked artifacts past the grace
       period.

Safety with live queries: marking + GC never mutate a split in place —
artifacts are immutable, the manifest flips state atomically, and
already-open searchers keep serving their loaded snapshot (the round-4
live-merge snapshot-isolation property); the next manifest resolve sees
the post-retention state. A cycle failure on one index is logged and
does not stop the loop (the reference janitor's per-index error
isolation)."""

from __future__ import annotations

import logging
import threading
import time
from typing import Callable, Iterable, Optional

log = logging.getLogger(__name__)

#: default artifact grace period before GC removes an unreferenced dir —
#: quickwit's deletion_grace_period (janitor service default 2h scaled to
#: this engine's test-sized splits is still 2h; callers override)
DEFAULT_GRACE_PERIOD_SECS = 2 * 3600.0


def run_janitor_cycle(index_dirs: Iterable[str], *,
                      grace_period_secs: float = DEFAULT_GRACE_PERIOD_SECS,
                      now: Optional[float] = None) -> dict[str, dict]:
    """One maintenance pass over every index. Returns per-index
    {"retention_marked": [...], "deletes_applied": n, "gc_removed": [...]}
    (an erroring index reports {"error": ...} and the pass continues)."""
    from quickwit_ray.api import Index
    from quickwit_ray.state.manifest import Manifest

    report: dict[str, dict] = {}
    for d in index_dirs:
        try:
            idx = Index.open(d)
            marked = idx.apply_retention(now=now) or []
            applied = idx.apply_deletes() if \
                Manifest(d).delete_tasks else 0
            removed = idx.gc(grace_period_secs=grace_period_secs)
            report[d] = {"retention_marked": marked,
                         "deletes_applied": applied,
                         "gc_removed": removed}
        except Exception as e:  # noqa: BLE001 — per-index isolation
            log.warning("janitor cycle failed for %s: %s", d, e)
            report[d] = {"error": repr(e)}
    return report


class _PeriodicLoop:
    """Shared scaffolding for background maintenance threads over a LIVE
    index registry: period validation, a stop event, a crash-surviving
    loop, start/stop. Subclasses implement ``run_cycle``.

    ``index_dirs`` is a zero-arg callable returning the current index
    roots (the serving tier's registry — indexes created after the loop
    started are picked up on the next cycle)."""

    _thread_name = "quickwit-ray-loop"
    _join_timeout = 30.0

    def __init__(self, index_dirs: Callable[[], Iterable[str]],
                 period_secs: float):
        if not period_secs or period_secs <= 0:
            raise ValueError(
                f"{type(self).__name__} period must be > 0 seconds, got "
                f"{period_secs!r} (Event.wait(0) would busy-spin cycles "
                "back-to-back)")
        self._index_dirs = index_dirs
        self.period_secs = float(period_secs)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.cycles = 0

    def run_cycle(self):  # pragma: no cover — abstract
        raise NotImplementedError

    def _loop(self) -> None:
        while not self._stop.wait(self.period_secs):
            try:
                self.run_cycle()
            except Exception as e:  # noqa: BLE001 — loop must survive
                log.warning("%s cycle crashed: %s", type(self).__name__, e)

    def start(self):
        self._thread = threading.Thread(target=self._loop,
                                        name=self._thread_name,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self._join_timeout)


class Janitor(_PeriodicLoop):
    """Background retention + delete-task + GC thread.

    >>> j = Janitor(lambda: [idx.index_dir], period_secs=3600).start()
    ...
    >>> j.stop()
    """

    _thread_name = "quickwit-ray-janitor"

    def __init__(self, index_dirs: Callable[[], Iterable[str]],
                 period_secs: float,
                 grace_period_secs: float = DEFAULT_GRACE_PERIOD_SECS):
        super().__init__(index_dirs, period_secs)
        self.grace_period_secs = float(grace_period_secs)
        self.last_report: dict[str, dict] = {}

    def run_cycle(self) -> dict[str, dict]:
        self.last_report = run_janitor_cycle(
            list(self._index_dirs()),
            grace_period_secs=self.grace_period_secs)
        self.cycles += 1
        return self.last_report


class MergeLoop(_PeriodicLoop):
    """Background merge thread (the reference runs merges continuously
    inside its indexing pipelines — merge_planner.rs wakes on every
    publish; a period approximates that for the serve tier).
    Replacement publishes are split-state-CAS'd, so this loop coexists
    with delete tasks, retention and the janitor."""

    _thread_name = "quickwit-ray-merge-loop"

    def __init__(self, index_dirs: Callable[[], Iterable[str]],
                 period_secs: float, execution: str = "local"):
        super().__init__(index_dirs, period_secs)
        self.execution = execution
        self.total_merges = 0

    def run_cycle(self) -> int:
        from quickwit_ray.index.merge import run_merge_pipeline

        n = 0
        for d in list(self._index_dirs()):
            try:
                n += run_merge_pipeline(d, execution=self.execution)
            except Exception as e:  # noqa: BLE001 — per-index isolation
                log.warning("merge cycle failed for %s: %s", d, e)
        self.cycles += 1
        self.total_merges += n
        return n
