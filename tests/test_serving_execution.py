"""Root/leaf serving over the Ray actor pool.

The reference's serving tier is a root searcher node fanning leaf
searches out to long-lived leaf searcher processes
(`quickwit-search/src/cluster_client.rs`, search_job_placer.rs). Here the
HTTP server process is the root and the shared mapping-agnostic actor
pool is the leaf tier: `SearchServer(search_execution="ray")` /
`serve --search-execution ray` flips the process-wide default that
`get_searcher` resolves; the pool is process-global (one leaf tier
serves every index, as in the reference) so it survives manifest
changes and searcher rebuilds by construction."""

import json
import urllib.request

import pytest

from quickwit_ray.config import IndexConfig, IndexSettings, documents_doc_mapping
from quickwit_ray.index.build import build_index
from quickwit_ray.search.engine import get_searcher, set_default_search_execution

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture()
def small_index(tmp_path):
    config = IndexConfig(
        index_id="servedocs",
        doc_mapping=documents_doc_mapping(),
        settings=IndexSettings(split_num_docs_target=200, batch_size=128),
    )
    index_dir = str(tmp_path / "index")
    build_index(DOCS, index_dir, config, execution="local",
                read_batch_size=128)
    return index_dir


def _get(url: str) -> dict:
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def test_server_ray_execution_matches_local(small_index, ray_session):
    """The SAME HTTP request answered by in-process threads and by the
    leaf actor pool returns identical hits — execution mode is invisible
    to clients (root.rs merges leaf partials the same way either side)."""
    from quickwit_ray.api import Index
    from quickwit_ray.server import SearchServer

    q = "/api/v1/_elastic/servedocs/_search?q=text:scan&size=8"
    try:
        with SearchServer({"servedocs": Index.open(small_index)},
                          search_execution="local") as srv:
            want = _get(f"http://127.0.0.1:{srv.port}{q}")
        with SearchServer({"servedocs": Index.open(small_index)},
                          search_execution="ray") as srv:
            base = f"http://127.0.0.1:{srv.port}"
            got = _get(base + q)
            assert got["hits"]["total"] == want["hits"]["total"]
            assert got["hits"]["hits"] == want["hits"]["hits"]  # full payload
            # the leaf pool is live -> /cluster lists leaf members
            cl = _get(base + "/api/v1/cluster")
            assert cl["search_execution"] == "ray"
            leafs = [n for n in cl["live_nodes"] if n.startswith("leaf-")]
            assert leafs, cl
    finally:
        set_default_search_execution("local")


def test_ray_searcher_pool_survives_publish(small_index, ray_session):
    """A manifest change rebuilds the cached ray searcher but transplants
    its actor pool — leaf actors (and their split-affine reader caches)
    survive split publishes, like the reference's long-lived leaf nodes."""
    from quickwit_ray.api import Index

    set_default_search_execution("ray")
    try:
        s1 = get_searcher(small_index)
        assert s1.execution == "ray"
        n0 = s1.search("text:zzunique", max_hits=5).num_hits
        assert n0 == 0
        pool = s1._actor_pool
        assert pool is not None
        assert get_searcher(small_index) is s1  # cached while fresh

        Index.open(small_index).ingest_docs(
            [{"doc_id": 999_999_001, "text": "zzunique serving leaf",
              "lang": "en"}])

        s2 = get_searcher(small_index)
        assert s2 is not s1  # manifest stamp moved -> rebuilt
        assert s2.search("text:zzunique", max_hits=5).num_hits == 1
        assert s2._actor_pool is pool  # ...but the leaf tier survived
    finally:
        set_default_search_execution("local")
