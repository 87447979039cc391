"""Groupby-term shuffle build path: artifact-equivalent to the direct
per-partition build (same split boundaries -> identical BM25 scores)."""

import numpy as np
import pytest

from quickwit_ray.config import IndexConfig, IndexSettings, documents_doc_mapping
from quickwit_ray.index.build import build_index
from quickwit_ray.search.engine import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def both_indexes(tmp_path_factory, ray_session):
    from quickwit_ray.index.build_shuffle import build_index_shuffle

    tmp = tmp_path_factory.mktemp("shufidx")
    cfg = IndexConfig("documents", documents_doc_mapping(),
                      IndexSettings(split_num_docs_target=10_000))
    direct = str(tmp / "direct")
    shuffled = str(tmp / "shuffled")
    build_index(DOCS, direct, cfg, execution="local")
    st = build_index_shuffle(DOCS, shuffled, cfg)
    assert st.num_docs == 500 and st.num_splits == 1
    return direct, shuffled


QUERIES = ["text:scan", "+text:scan +text:merge", "text:scan -text:merge",
           'text:"table scan"', "lang: IN [de fr]", "n_chars:[500 TO 900}",
           "text:mer*"]


def test_counts_identical(both_indexes):
    d, s = both_indexes
    sd, ss = IndexSearcher(d), IndexSearcher(s)
    for q in QUERIES:
        assert sd.search(q, max_hits=0).num_hits == ss.search(q, max_hits=0).num_hits, q


def test_bm25_scores_identical(both_indexes):
    d, s = both_indexes
    sd, ss = IndexSearcher(d), IndexSearcher(s)
    for q in ["text:scan", "text:scan OR text:merge", 'text:"table scan"']:
        hd = sd.search(q, max_hits=25, sort_by="_score", fetch_fields=[]).hits
        hs = ss.search(q, max_hits=25, sort_by="_score", fetch_fields=[]).hits
        assert list(hd["_doc_id"]) == list(hs["_doc_id"]), q
        assert np.allclose(hd["sort_key0"], hs["sort_key0"], rtol=0, atol=0), q


def test_shuffle_resume_noop(both_indexes, tmp_path):
    from quickwit_ray.index.build_shuffle import build_index_shuffle

    _, s = both_indexes
    cfg = IndexConfig("documents", documents_doc_mapping(),
                      IndexSettings(split_num_docs_target=10_000))
    st = build_index_shuffle(DOCS, s, cfg)
    assert st.num_docs == 0  # checkpointed partition skipped
