"""Conformance over the canonical `pages` corpus (FIXTURES.md):
planted phrases, rare terms, timestamp/tag split pruning (verified to
actually skip splits), chinese rows, html passthrough."""

import numpy as np
import pyarrow.parquet as pq
import pytest

import quickwit_ray.search.engine as engine_mod
from quickwit_ray.config import IndexConfig, IndexSettings, pages_doc_mapping
from quickwit_ray.functions.tokenizers import tokenize
from quickwit_ray.index.build import build_index
from quickwit_ray.search.engine import IndexSearcher
from quickwit_ray.sources.fixtures import PLANTED_PHRASES, ensure_pages

N_DOCS, N_FILES = 3000, 6


@pytest.fixture(scope="module")
def pages(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pagesconf")
    paths = ensure_pages(str(tmp / "pages"), N_DOCS, N_FILES, filler_bytes=2048)
    d = str(tmp / "idx")
    cfg = IndexConfig("pages", pages_doc_mapping(),
                      IndexSettings(split_num_docs_target=100_000))
    build_index(paths, d, cfg, execution="local")
    import pandas as pd

    truth = pd.concat([pq.read_table(p).to_pandas() for p in paths],
                      ignore_index=True)
    return d, truth


def test_planted_phrases(pages):
    d, truth = pages
    s = IndexSearcher(d)
    for phrase in PLANTED_PHRASES:
        expected = int(truth["text"].str.contains(phrase, regex=False).sum())
        got = s.search(f'text:"{phrase}"', max_hits=0).num_hits
        assert got == expected and got > 0, phrase


def test_rare_terms_unique(pages):
    d, truth = pages
    s = IndexSearcher(d)
    for i in (10, 500, 2990):
        resp = s.search(f"text:rareterm{i}", max_hits=5, fetch_fields=["url"])
        assert resp.num_hits == 1
        row = truth[truth["text"].str.contains(f"rareterm{i} ", regex=False)
                    | truth["text"].str.endswith(f"rareterm{i}")]
        assert list(resp.hits["url"]) == list(row["url"])


def test_timestamp_pruning_skips_splits(pages):
    d, truth = pages
    s = IndexSearcher(d)
    # warc_ts is monotone over the corpus -> each file/split covers a
    # disjoint time range; a narrow window must prune to ~1 split
    all_splits = s.manifest.published_splits()
    t0 = truth["warc_ts"].min()
    lo = int(t0.value // 1000) + 1_000_000
    hi = lo + 37_000_000 * 100  # ~100 docs worth of time
    pruned = s.manifest.list_splits(lo, hi, {})
    assert len(pruned) < len(all_splits)
    n = s.search(None, max_hits=0, start_timestamp=lo, end_timestamp=hi,
                 aggs={"c": {"cardinality": {"field": "lang"}}}).num_hits
    ts_us = truth["warc_ts"].astype("datetime64[us]").astype("int64")
    expected = int(((ts_us >= lo) & (ts_us < hi)).sum())
    assert n == expected


def test_query_ast_timestamp_bounds_prune(pages):
    d, truth = pages
    s = IndexSearcher(d)
    ts = truth["warc_ts"].iloc[150]
    q = f'+text:aaterm0 +warc_ts:[2024-01-01T00:00:00Z TO {ts.isoformat()}Z}}'
    got = s.search(q, max_hits=0).num_hits
    m = truth["warc_ts"] < ts
    toks = truth.loc[m, "text"].apply(lambda t: "aaterm0" in tokenize(t, "default"))
    assert got == int(toks.sum())


def test_tag_pruning(pages):
    d, truth = pages
    s = IndexSearcher(d)
    n_zh = s.search("lang:zh", max_hits=0).num_hits
    assert n_zh == int((truth["lang"] == "zh").sum())


def test_html_bytes_roundtrip(pages):
    d, truth = pages
    s = IndexSearcher(d)
    resp = s.search("text:rareterm10", max_hits=1,
                    fetch_fields=["url", "html", "text"])
    row = resp.hits.iloc[0]
    t = truth[truth["url"] == row["url"]].iloc[0]
    assert bytes(row["html"]) == bytes(t["html"])
    assert row["text"] == t["text"]  # byte-identical text invariant


def test_url_exact_term(pages):
    d, truth = pages
    s = IndexSearcher(d)
    url = truth["url"].iloc[42]
    resp = s.search(f"url:{url}", max_hits=5, fetch_fields=["url"])
    # url is a raw-tokenizer field: exact term match, unique hit
    assert resp.num_hits >= 1
    assert url in set(resp.hits["url"])
