"""Native tests for the round-3 ES-surface engine features, independent of
the reference conformance corpus (tests/test_es_conformance.py replays the
real thing when /root/reference is present)."""

import numpy as np
import pyarrow as pa
import pytest

from quickwit_ray.api import Index
from quickwit_ray.config import DocMapping, FieldMapping as FM


@pytest.fixture(scope="module")
def shop_idx(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("esfeat")
    idx = Index.create(str(tmp / "i"), "shop", DocMapping(
        field_mappings=(
            FM("title", "text", record="position", fieldnorms=True,
               fast=True, fast_normalizer="lowercase"),
            FM("attrs", "json", record="position"),
            FM("ts", "datetime", fast=True, fast_precision="milliseconds",
               input_formats=("rfc3339",)),
            FM("price", "f64", fast=True),
            FM("doc_id", "i64", stored=True, fast=True)),
        mode="lenient", timestamp_field="ts", doc_id_field="doc_id",
        default_search_fields=("title",)))
    idx.ingest_docs([
        {"doc_id": 1, "title": "Red Widget Pro", "price": 10.0,
         "ts": "2024-01-01T00:00:00.001999Z",
         "attrs": {"color": "red", "desc": "a fine Journal of widgets"}},
        {"doc_id": 2, "title": "Blue Widget", "price": 20.0,
         "ts": "2024-01-01T00:00:00.00001Z",
         "attrs": {"color": "blue", "desc": "jour* entry and unix tips"}},
        {"doc_id": 3, "title": "Red Gadget", "price": 15.0,
         "ts": "2024-01-02T00:00:00Z",
         "attrs": {"color": "red", "tags": ["a", "b"]}},
    ])
    return idx


def _ids(resp):
    return sorted(int(x) for x in resp.hits["doc_id"])


def test_fast_normalizer_lowercase_terms_agg(shop_idx):
    resp = shop_idx.search("*", max_hits=0, aggs={
        "t": {"terms": {"field": "title", "size": 10}}})
    keys = [b["key"] for b in resp.aggs["t"]["buckets"]]
    assert "red widget pro" in keys and "blue widget" in keys


def test_fast_precision_truncates_values_and_bounds(shop_idx):
    from quickwit_ray.search.ast import RangeQuery

    # stored .001999 truncates to .001; bounds quantize the same way
    r = shop_idx.search(RangeQuery("ts", gte="2024-01-01T00:00:00.001999Z",
                                   lte="2024-01-01T00:00:00.001999Z"),
                        max_hits=10)
    assert _ids(r) == [1]
    r2 = shop_idx.search(RangeQuery("ts", gte="2024-01-01T00:00:00.001Z",
                                    lt="2024-01-01T00:00:00.002Z"),
                         max_hits=10)
    assert _ids(r2) == [1]


def test_datetime_int_bound_auto_unit(shop_idx):
    from quickwit_ray.search.ast import RangeQuery

    # epoch millis (13 digits) auto-detects; raw micros would be year 1970+
    millis = 1704153600000  # 2024-01-02T00:00:00Z
    r = shop_idx.search(RangeQuery("ts", gte=millis), max_hits=10)
    assert _ids(r) == [3]


def test_termset_on_json_path(shop_idx):
    from quickwit_ray.search.ast import TermSetQuery

    r = shop_idx.search(TermSetQuery("attrs.color", ("red", "green")),
                        max_hits=10)
    assert _ids(r) == [1, 3]


def test_wildcard_literal_runs_normalized_by_tokenizer(shop_idx):
    # `Jou*al` lowercases through the tokenizer; `jour\*` normalizes the
    # escaped punctuation away, leaving the exact term `jour`
    r = shop_idx.search("attrs.desc:Jou*al", max_hits=10)
    assert _ids(r) == [1]
    r2 = shop_idx.search("attrs.desc:jour\\*", max_hits=10)
    assert _ids(r2) == [2]


def test_match_bool_prefix_operator_and(shop_idx):
    from quickwit_ray.search.es_dsl import es_query_to_ast

    node = es_query_to_ast({"match_bool_prefix": {
        "title": {"query": "red wid", "operator": "AND"}}})
    assert _ids(shop_idx.search(node, max_hits=10)) == [1]
    node_or = es_query_to_ast({"match_bool_prefix": {"title": "red wid"}})
    assert _ids(shop_idx.search(node_or, max_hits=10)) == [1, 2, 3]


def test_minimum_should_match_percent_and_negative():
    from quickwit_ray.search.es_dsl import es_query_to_ast

    q = {"bool": {"should": [{"term": {"a": "x"}}] * 4,
                  "minimum_should_match": "50%"}}
    assert es_query_to_ast(q).minimum_should_match == 2
    q["bool"]["minimum_should_match"] = -2
    assert es_query_to_ast(q).minimum_should_match == 2


def test_parser_rejects_dangling_operator():
    from quickwit_ray.search.parser import parse_query

    with pytest.raises(ValueError, match="dangling"):
        parse_query("title:x OR", ("title",))


def test_query_string_field_validation():
    from quickwit_ray.search.es_dsl import es_query_to_ast

    with pytest.raises(ValueError):
        es_query_to_ast({"query_string": {"query": "x", "fields": "title"}})
    with pytest.raises(ValueError):
        es_query_to_ast({"query_string": {"query": "x", "fields": ["a"],
                                          "default_field": "b"}})


def test_hll_sparse_exact_small_cardinality():
    from quickwit_ray.functions.sketches import HyperLogLog

    h = HyperLogLog()
    h.add(np.array([1.0, 2.0, 3.0, 2.0, 1.0]))
    assert h.estimate() == 3.0
    h2 = HyperLogLog.from_bytes(h.to_bytes())
    assert h2.estimate() == 3.0
    merged = h.merge(h2)
    assert merged.estimate() == 3.0
    # densify beyond the sparse cap still estimates within HLL error
    big = HyperLogLog()
    big.add(np.arange(100_000, dtype=np.float64))
    est = big.estimate()
    assert 97_000 < est < 103_000


def test_terms_split_size_truncation_and_error_bound(tmp_path):
    idx = Index.create(str(tmp_path / "i"), "t", DocMapping(
        field_mappings=(FM("name", "text", fast=True),
                        FM("doc_id", "i64", stored=True, fast=True)),
        mode="lenient", doc_id_field="doc_id"))
    # two splits: split1 five distinct names, split2 fritz x2 + 3 others
    idx.ingest_docs([{"doc_id": i, "name": n} for i, n in enumerate(
        ["albert", "fred", "fritz", "horst", "manfred"])])
    idx.ingest_docs([{"doc_id": 10 + i, "name": n} for i, n in enumerate(
        ["fritz", "fritz", "holger", "werner", "bernhard"])])
    resp = idx.search("*", max_hits=0, aggs={
        "names": {"terms": {"field": "name", "size": 1, "split_size": 1}}})
    agg = resp.aggs["names"]
    assert agg["buckets"] == [{"key": "fritz", "doc_count": 2}]
    assert agg["sum_other_doc_count"] == 8
    assert agg["doc_count_error_upper_bound"] == 2


def test_percentiles_keyed_false_shape(shop_idx):
    resp = shop_idx.search("*", max_hits=0, aggs={
        "p": {"percentiles": {"field": "price", "percents": [50],
                              "keyed": False}}})
    vals = resp.aggs["p"]["values"]
    assert isinstance(vals, list) and vals[0]["key"] == 50.0
    assert 10.0 <= vals[0]["value"] <= 20.0


def test_terms_agg_multivalued_and_exact_u64(tmp_path):
    idx = Index.create(str(tmp_path / "i"), "t", DocMapping(
        field_mappings=(FM("tags", "text", fast=True),
                        FM("big", "u64", fast=True),
                        FM("doc_id", "i64", stored=True, fast=True)),
        mode="lenient", doc_id_field="doc_id"))
    idx.ingest_docs([
        {"doc_id": 1, "tags": ["nice", "cool"], "big": 1769070189829214200},
        {"doc_id": 2, "tags": ["nice", "nice"]},
    ])
    resp = idx.search("*", max_hits=0, aggs={
        "t": {"terms": {"field": "tags"}},
        "b": {"terms": {"field": "big"}}})
    t = {x["key"]: x["doc_count"] for x in resp.aggs["t"]["buckets"]}
    assert t == {"nice": 2, "cool": 1}  # doc 2 counts once for "nice"
    # u64 beyond float53 stays integer-exact
    assert resp.aggs["b"]["buckets"] == [
        {"key": 1769070189829214200, "doc_count": 1}]


def test_histogram_gap_fill_and_extended_bounds(shop_idx):
    resp = shop_idx.search("*", max_hits=0, aggs={
        "h": {"histogram": {"field": "price", "interval": 5.0}}})
    buckets = resp.aggs["h"]["buckets"]
    assert [b["key"] for b in buckets] == [10.0, 15.0, 20.0]
    assert [b["doc_count"] for b in buckets] == [1, 1, 1]
    resp2 = shop_idx.search("*", max_hits=0, aggs={
        "h": {"histogram": {"field": "price", "interval": 5.0,
                            "extended_bounds": {"min": 0, "max": 30}}}})
    keys = [b["key"] for b in resp2.aggs["h"]["buckets"]]
    assert keys == [0.0, 5.0, 10.0, 15.0, 20.0, 25.0, 30.0]


def test_es_rest_service_roundtrip(shop_idx):
    from quickwit_ray.search.es_rest import EsRestService

    svc = EsRestService({"shop": shop_idx})
    status, resp = svc.request("POST", "shop/_search", {}, {
        "query": {"match": {"title": "widget"}}, "size": 10,
        "sort": [{"price": {"order": "desc"}}]})
    assert status == 200
    assert resp["hits"]["total"] == {"value": 2, "relation": "eq"}
    assert [h["sort"][0] for h in resp["hits"]["hits"]] == [20, 10]
    # _count with q param
    status, resp = svc.request("GET", "shop/_count", {"q": "title:widget"})
    assert (status, resp["count"]) == (200, 2)
    # invalid query -> 400
    status, resp = svc.request("POST", "shop/_search", {}, {
        "query": {"query_string": {"query": "title:x OR"}}})
    assert status == 400
    # stats includes segments
    status, resp = svc.request("GET", "_stats", {})
    assert resp["_all"]["primaries"]["docs"]["count"] == 3
    assert resp["_all"]["primaries"]["segments"]["count"] >= 1


def test_scroll_ttl_cap():
    from quickwit_ray.search.scroll import parse_ttl

    with pytest.raises(ValueError, match="1800"):
        parse_ttl("31m")
    assert parse_ttl("30m") == 1800.0


def test_empty_sources_column_roundtrip(shop_idx):
    # lenient extra column with a list type must not break ingest
    assert shop_idx.search("attrs.tags:a", max_hits=10).num_hits == 1


def test_top_hits_agg(tmp_path):
    """tantivy TopHits metric agg (passed through by the reference):
    top-level and nested under terms, merged across several splits,
    verified against a pandas recomputation."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from quickwit_ray.config import (DocMapping, FieldMapping, IndexConfig,
                                     IndexSettings)
    from quickwit_ray.index.build import build_index
    from quickwit_ray.search.engine import IndexSearcher

    rng = np.random.default_rng(17)
    n = 900
    langs = rng.choice(["de", "en", "fr"], n)
    nch = rng.integers(10, 5000, n)
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                    "lang": langs.tolist(),
                    "n_chars": pa.array(nch, pa.int64()),
                    "text": [f"doc {i}" for i in range(n)]})
    inp = str(tmp_path / "in.parquet")
    pq.write_table(tbl, inp)
    mapping = DocMapping(
        field_mappings=(
            FieldMapping(name="text", type="text", record="freq"),
            FieldMapping(name="lang", type="text", tokenizer="raw",
                         fast=True),
            FieldMapping(name="n_chars", type="i64", fast=True),
            FieldMapping(name="doc_id", type="i64", fast=True, stored=True)),
        doc_id_field="doc_id", default_search_fields=("text",))
    d = str(tmp_path / "idx")
    build_index(inp, d, IndexConfig("th", mapping,
                                    IndexSettings(split_num_docs_target=100_000,
                                                  commit_docs_threshold=250)),
                execution="local", read_batch_size=250)
    s = IndexSearcher(d)
    th = {"size": 2,
          "sort": [{"n_chars": {"order": "desc"}},
                   {"doc_id": {"order": "asc"}}],
          "docvalue_fields": ["doc_id"]}
    r = s.search("*", max_hits=0, aggs={
        "top": {"top_hits": th},
        "by_lang": {"terms": {"field": "lang"},
                    "aggs": {"top": {"top_hits": dict(th)}}}})
    df = pd.DataFrame({"lang": langs, "n_chars": nch,
                       "doc_id": np.arange(n)})
    want = df.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True]).head(2)
    got = r.aggs["top"]["hits"]
    assert got["total"]["value"] == n
    assert [h["fields"]["doc_id"][0] for h in got["hits"]] == list(want["doc_id"])
    assert [h["sort"][0] for h in got["hits"]] == list(want["n_chars"])
    for b in r.aggs["by_lang"]["buckets"]:
        sub = df[df["lang"] == b["key"]].sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]).head(2)
        ids = [h["fields"]["doc_id"][0] for h in b["top"]["hits"]["hits"]]
        assert ids == list(sub["doc_id"]), b["key"]
        assert b["top"]["hits"]["total"]["value"] == int(
            (langs == b["key"]).sum())


def test_malformed_es_bodies_return_400_never_crash(shop_idx):
    """Fuzz-derived regression corpus: structurally-invalid DSL shapes
    (lists where objects are required, scalar clause bodies, missing
    mandatory keys, junk sort/aggs) must come back as 400 parse errors
    through the REST tier — the reference's x_content_parse_exception
    behavior — never an unhandled exception / 500."""
    from quickwit_ray.search.es_dsl import es_query_to_ast
    from quickwit_ray.search.es_rest import EsRestService

    svc = EsRestService({"shop": shop_idx})
    corpus = [
        {"query": {"bool": []}},
        {"query": {"bool": True}},
        {"query": {"bool": ""}},
        {"query": {"match_phrase_prefix": [True]}},
        {"query": {"match_phrase_prefix": None}},
        {"query": {"multi_match": -1.5}},
        {"query": {"multi_match": {"query": "x"}}},     # missing fields
        {"query": {"query_string": {}}},                # missing query
        {"query": {"range": 5}},
        {"query": {"terms": None}},
        {"query": {"bool": {"must": 5}}},
        {"sort": True, "query": {"match_all": {}}},
        {"sort": [None]},
        {"sort": 5},
        {"search_after": 5},
        {"size": {"a": 1}},
        {"aggs": {"a": {"terms": "x"}}},
        {"aggs": {"a": []}},
    ]
    for body in corpus:
        status, resp = svc.request("POST", "shop/_search", {}, body)
        assert status == 400, (body, status, resp)
        assert resp.get("status") == 400
    # library-level contract: the DSL converter raises ValueError only
    # (corpus[:11] are the malformed-QUERY cases; the rest malform
    # sort/aggs/size around a valid or absent query)
    for body in corpus[:11]:
        with pytest.raises(ValueError):
            es_query_to_ast(body["query"])
