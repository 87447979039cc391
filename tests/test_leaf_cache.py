"""Leaf request cache (quickwit-search/src/leaf_cache.rs analog):
per-(split, request) partial results are memoized; split immutability
makes entries permanently valid; new splits change the key set so
results never go stale."""

import pyarrow.parquet as pq

from quickwit_ray.api import Index
from quickwit_ray.config import IndexSettings, documents_doc_mapping
from quickwit_ray.search import engine

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_leaf_cache_hits_and_freshness(tmp_path):
    idx = Index.create(str(tmp_path / "i"), "docs", documents_doc_mapping(),
                       settings=IndexSettings(split_num_docs_target=10_000))
    rows = pq.read_table(DOCS).to_pylist()
    idx.ingest_docs(rows[:300], commit_id="a")
    engine._GLOBAL_LEAF_CACHE.clear()
    h0, m0 = engine._GLOBAL_LEAF_CACHE.hits, engine._GLOBAL_LEAF_CACHE.misses

    r1 = idx.search("text:scan", max_hits=20, fetch_fields=["doc_id"])
    assert engine._GLOBAL_LEAF_CACHE.misses > m0
    r2 = idx.search("text:scan", max_hits=20, fetch_fields=["doc_id"])
    assert engine._GLOBAL_LEAF_CACHE.hits > h0
    assert r1.num_hits == r2.num_hits
    assert list(r1.hits["doc_id"]) == list(r2.hits["doc_id"])
    # aggs partials are cached safely (merge folds states in place — the
    # cache must hand out copies)
    a1 = idx.search("*", max_hits=0, aggs={
        "l": {"terms": {"field": "lang"}}}).aggs
    a2 = idx.search("*", max_hits=0, aggs={
        "l": {"terms": {"field": "lang"}}}).aggs
    assert a1 == a2
    # new split -> new (split, request) keys -> fresh results, no staleness
    idx.ingest_docs(rows[300:500], commit_id="b")
    r3 = idx.search("text:scan", max_hits=1000, fetch_fields=["doc_id"])
    batch = Index.create(str(tmp_path / "ref"), "ref",
                         documents_doc_mapping())
    batch.ingest_docs(rows, commit_id="all")
    want = batch.search("text:scan", max_hits=1000,
                        fetch_fields=["doc_id"])
    assert sorted(r3.hits["doc_id"]) == sorted(want.hits["doc_id"])


def test_leaf_cache_respects_flags(tmp_path):
    """Toggling ENABLE_MAXSCORE or disabling the cache must never serve a
    stale-flag entry (the pruned-vs-naive equivalence tests depend on
    this)."""
    idx = Index.create(str(tmp_path / "i"), "docs", documents_doc_mapping())
    idx.ingest_docs(pq.read_table(DOCS).slice(0, 200).to_pylist(),
                    commit_id="a")
    engine._GLOBAL_LEAF_CACHE.clear()
    idx.search("text:scan", max_hits=10)
    n1 = engine._GLOBAL_LEAF_CACHE.misses
    old = engine.ENABLE_MAXSCORE
    try:
        engine.ENABLE_MAXSCORE = not old
        idx.search("text:scan", max_hits=10)
        assert engine._GLOBAL_LEAF_CACHE.misses > n1  # distinct key
        engine.ENABLE_LEAF_CACHE = False
        h = engine._GLOBAL_LEAF_CACHE.hits
        idx.search("text:scan", max_hits=10)
        assert engine._GLOBAL_LEAF_CACHE.hits == h  # fully bypassed
    finally:
        engine.ENABLE_MAXSCORE = old
        engine.ENABLE_LEAF_CACHE = True
