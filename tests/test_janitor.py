"""Janitor loop (quickwit_ray/janitor.py) — the quickwit-janitor service
analog: periodic retention + delete-task + GC cycles over a live index
registry, wired into the serve loop. Retention-expired splits must vanish
from search results (manifest flip) and from disk (post-grace GC) without
disturbing concurrent queries."""

import threading
import time

import pytest

from quickwit_ray import storage
from quickwit_ray.api import Index
from quickwit_ray.config import (
    DocMapping,
    FieldMapping,
    IndexSettings,
)
from quickwit_ray.janitor import Janitor, run_janitor_cycle
from quickwit_ray.search.engine import IndexSearcher


def _mapping() -> DocMapping:
    return DocMapping(
        field_mappings=(
            FieldMapping(name="msg", type="text"),
            FieldMapping(name="ts", type="datetime", fast=True),
        ),
        timestamp_field="ts", doc_id_field=None,
        default_search_fields=("msg",))


def _mk(tmp_path, name: str, retention_secs=3600) -> Index:
    return Index.create(
        str(tmp_path / name), name, _mapping(),
        settings=IndexSettings(retention_secs=retention_secs))


def _ingest_old_and_fresh(idx: Index, now: float) -> None:
    idx.ingest_docs([{"msg": "ancient log entry", "ts": now - 7200}],
                    commit_id="old")
    idx.ingest_docs([{"msg": "fresh log entry", "ts": now}],
                    commit_id="fresh")


def test_cycle_retention_marks_then_gc_removes(tmp_path, ray_session):
    now = time.time()
    idx = _mk(tmp_path, "ret")
    _ingest_old_and_fresh(idx, now)
    assert idx.search("log", max_hits=10).num_hits == 2

    # cycle 1: LONG grace — the expired split leaves the manifest (and
    # every new search) but its artifacts stay on disk for in-flight
    # readers (quickwit deletion_grace_period semantics)
    rep = run_janitor_cycle([idx.index_dir], grace_period_secs=3600,
                            now=now)
    r = rep[idx.index_dir]
    assert len(r["retention_marked"]) == 1
    assert r["gc_removed"] == []
    assert idx.search("log", max_hits=10).num_hits == 1
    marked = r["retention_marked"][0]
    split_dir = storage.join(idx.index_dir, "splits", marked)
    assert storage.isdir(split_dir)

    # cycle 2: grace elapsed — artifacts leave disk too
    rep2 = run_janitor_cycle([idx.index_dir], grace_period_secs=0.0,
                             now=now)
    assert marked in rep2[idx.index_dir]["gc_removed"]
    assert not storage.isdir(split_dir)
    assert idx.search("log", max_hits=10).num_hits == 1


def test_cycle_applies_delete_tasks(tmp_path, ray_session):
    now = time.time()
    idx = _mk(tmp_path, "del", retention_secs=None)
    _ingest_old_and_fresh(idx, now)
    idx.create_delete_task("msg:ancient")
    rep = run_janitor_cycle([idx.index_dir], grace_period_secs=3600)
    r = rep[idx.index_dir]
    assert r["retention_marked"] == []  # no retention configured
    assert r["deletes_applied"] >= 1
    assert idx.search("log", max_hits=10).num_hits == 1
    assert idx.search("ancient", max_hits=10).num_hits == 0


def test_cycle_error_isolation(tmp_path, ray_session):
    now = time.time()
    idx = _mk(tmp_path, "good")
    _ingest_old_and_fresh(idx, now)
    bogus = str(tmp_path / "not-an-index")
    rep = run_janitor_cycle([bogus, idx.index_dir],
                            grace_period_secs=3600, now=now)
    assert "error" in rep[bogus]
    assert len(rep[idx.index_dir]["retention_marked"]) == 1


def test_live_queries_undisturbed_by_janitor(tmp_path, ray_session):
    """Hammer searches from a thread while janitor cycles run: every
    snapshot sees either the pre-retention corpus (2 hits) or the
    post-retention corpus (1 hit) — never an error, never a torn state.
    GC runs with a long grace first (so a concurrently-resolved manifest
    can still read its split), then with grace 0 once the manifest flip
    is visible everywhere."""
    now = time.time()
    idx = _mk(tmp_path, "live")
    _ingest_old_and_fresh(idx, now)

    errors: list = []
    observed: list[int] = []
    stop = threading.Event()

    def hammer():
        try:
            while not stop.is_set():
                s = IndexSearcher(idx.index_dir)
                observed.append(s.search("log", max_hits=0).num_hits)
        except Exception as e:  # pragma: no cover — surfaced below
            errors.append(e)

    t = threading.Thread(target=hammer, daemon=True)
    t.start()
    try:
        time.sleep(0.1)
        run_janitor_cycle([idx.index_dir], grace_period_secs=3600, now=now)
        time.sleep(0.1)
        run_janitor_cycle([idx.index_dir], grace_period_secs=0.0, now=now)
        time.sleep(0.1)
    finally:
        stop.set()
        t.join()
    assert not errors, errors[0]
    assert len(observed) > 3
    assert set(observed) <= {1, 2}
    assert observed[-1] == 1


def test_janitor_thread_tracks_live_registry(tmp_path, ray_session):
    """The background thread re-reads the registry each cycle: an index
    added after start() joins the next pass (API-created indexes become
    janitor-managed with no restart)."""
    now = time.time()
    registry: dict[str, Index] = {}
    j = Janitor(lambda: [ix.index_dir for ix in registry.values()],
                period_secs=0.05, grace_period_secs=3600)
    j.start()
    try:
        idx = _mk(tmp_path, "latejoin")
        _ingest_old_and_fresh(idx, now)
        registry["latejoin"] = idx
        deadline = time.time() + 10
        while time.time() < deadline:
            if idx.search("log", max_hits=0).num_hits == 1:
                break
            time.sleep(0.05)
        assert idx.search("log", max_hits=0).num_hits == 1
        assert j.cycles >= 1
    finally:
        j.stop()


def test_server_janitor_wiring(tmp_path, ray_session):
    """serve --janitor-period-secs: the SearchServer owns a janitor over
    its live index registry; retention-expired splits vanish from HTTP
    search results while the server runs."""
    import json
    import urllib.request

    from quickwit_ray.server import SearchServer

    now = time.time()
    idx = _mk(tmp_path, "served")
    _ingest_old_and_fresh(idx, now)
    srv = SearchServer({idx.config.index_id: idx},
                       janitor_period_secs=0.05,
                       janitor_grace_secs=3600).start()
    try:
        assert srv.janitor is not None
        url = (f"http://127.0.0.1:{srv.port}/api/v1/served/search"
               "?query=log&max_hits=0")
        deadline = time.time() + 10
        hits = None
        while time.time() < deadline:
            with urllib.request.urlopen(url) as resp:
                hits = json.loads(resp.read())["num_hits"]
            if hits == 1:
                break
            time.sleep(0.05)
        assert hits == 1
        assert srv.janitor.cycles >= 1
    finally:
        srv.stop()
    # stop() joins the janitor thread
    assert not srv.janitor._thread.is_alive()


def test_server_merge_loop_compacts_while_serving(tmp_path, ray_session):
    """serve --merge-period-secs: continuous compaction over the live
    registry, concurrent with the janitor and HTTP search — split count
    drops while every response stays whole-wave consistent."""
    import json
    import urllib.request

    from quickwit_ray.config import MergePolicyConfig
    from quickwit_ray.server import SearchServer
    from quickwit_ray.state.manifest import Manifest

    now = time.time()
    idx = Index.create(
        str(tmp_path / "compact"), "compact", _mapping(),
        settings=IndexSettings(
            split_num_docs_target=100_000,
            merge_policy=MergePolicyConfig(merge_factor=3,
                                           max_merge_factor=4,
                                           min_level_num_docs=10_000)))
    for w in range(9):
        idx.ingest_docs([{"msg": f"compact probe {i}", "ts": now}
                         for i in range(40)], commit_id=f"w{w}")
    assert len(Manifest(idx.index_dir).published_splits()) == 9

    # grace 1s (not 0): GC must never reap a replaced split dir a
    # still-running merge round is reading — the grace period IS the
    # in-flight-reader protection (quickwit deletion_grace_period)
    srv = SearchServer({"compact": idx},
                       janitor_period_secs=0.05, janitor_grace_secs=1.0,
                       merge_period_secs=0.05).start()
    try:
        url = (f"http://127.0.0.1:{srv.port}/api/v1/compact/search"
               "?query=probe&max_hits=0")
        deadline = time.time() + 30
        while time.time() < deadline:
            with urllib.request.urlopen(url) as resp:
                assert json.loads(resp.read())["num_hits"] == 9 * 40
            n_splits = len(Manifest(idx.index_dir).published_splits())
            if n_splits <= 3 and srv.merge_loop.cycles >= 1:
                break
            time.sleep(0.05)
        assert len(Manifest(idx.index_dir).published_splits()) <= 3
        assert srv.merge_loop.total_merges >= 2
        # janitor GC'd the replaced split dirs (grace 0)
        deadline = time.time() + 15
        import os
        while time.time() < deadline:
            n_dirs = len(os.listdir(
                os.path.join(idx.index_dir, "splits")))
            if n_dirs <= 3:
                break
            time.sleep(0.05)
        assert n_dirs <= 3
    finally:
        srv.stop()
    assert not srv.merge_loop._thread.is_alive()


def test_gc_grace_runs_from_mark_time_not_dir_mtime(tmp_path, ray_session):
    """An OLD split replaced/marked a second ago must get its FULL grace
    (in-flight readers may hold it) — before the round-5 fix the grace
    ran from dir mtime, so aged dirs were reaped instantly on mark."""
    import os

    from quickwit_ray.index.build import garbage_collect
    from quickwit_ray.state.manifest import Manifest

    idx = _mk(tmp_path, "grace", retention_secs=None)
    idx.ingest_docs([{"msg": "aged doc", "ts": time.time()}], commit_id="a")
    m = Manifest(idx.index_dir)
    sid = m.published_splits()[0].split_id
    d = storage.join(idx.index_dir, "splits", sid)
    # age the artifacts: dir mtime 2 days in the past
    old = time.time() - 2 * 86400
    os.utime(d, (old, old))
    m.mark_for_deletion([sid])
    # marked JUST NOW -> a 1h grace must keep it on disk
    assert garbage_collect(idx.index_dir, grace_period_secs=3600) == []
    assert storage.isdir(d)
    # grace elapsed (0) -> reaped
    assert sid in garbage_collect(idx.index_dir, grace_period_secs=0.0)
    assert not storage.isdir(d)


def test_retention_mark_mid_merge_discards_merge_output(tmp_path,
                                                        ray_session):
    """Retention marks a split while a merge that includes it is in
    flight: the merge's publish must fail the split-state CAS and its
    output must be discarded — landing it would RESURRECT the expired
    docs inside the merged split."""
    from quickwit_ray.index.merge import execute_merge
    from quickwit_ray.state.manifest import Manifest, StaleReplaceError

    now = time.time()
    idx = _mk(tmp_path, "race")  # retention 3600s
    idx.ingest_docs([{"msg": "expired doc", "ts": now - 7200}],
                    commit_id="old")
    idx.ingest_docs([{"msg": "fresh one", "ts": now}], commit_id="f1")
    idx.ingest_docs([{"msg": "fresh two", "ts": now}], commit_id="f2")
    m = Manifest(idx.index_dir)
    sids = [s.split_id for s in m.published_splits()]
    assert len(sids) == 3

    # the merge executor finishes its artifact FIRST...
    new_sm = execute_merge(idx.index_dir, sids, idx.config.index_id, 1)
    # ...then retention lands before the merge can publish
    assert len(idx.apply_retention(now=now)) == 1
    with pytest.raises(StaleReplaceError):
        m.publish([new_sm], replaced_split_ids=sids)
    # expired doc stays gone; fresh docs stay exactly once
    s = IndexSearcher(idx.index_dir)
    assert s.search("msg:expired", max_hits=0).num_hits == 0
    assert s.search("msg:fresh", max_hits=0).num_hits == 2
    # the orphaned merge artifact is unpublished -> GC reaps it
    from quickwit_ray.index.build import garbage_collect
    assert new_sm.split_id in garbage_collect(idx.index_dir,
                                              grace_period_secs=0.0)
