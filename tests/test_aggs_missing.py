"""`missing` aggregation parameter (reference docs/reference/
aggregation.md: terms + every metric agg treat docs without a value as
if they had the configured one)."""

import pytest

from quickwit_ray.api import Index
from quickwit_ray.config import (
    DocMapping,
    FieldMapping,
    IndexSettings,
)


@pytest.fixture()
def idx(tmp_path):
    mapping = DocMapping(
        field_mappings=(
            FieldMapping(name="genre", type="text", tokenizer="raw",
                         fast=True, fast_normalizer="raw"),
            FieldMapping(name="price", type="f64", fast=True),
            FieldMapping(name="doc_id", type="i64", fast=True),
        ),
        mode="lenient", doc_id_field="doc_id",
        default_search_fields=("genre",),
    )
    ix = Index.create(str(tmp_path / "m"), "m", mapping,
                      settings=IndexSettings(split_num_docs_target=1000))
    ix.ingest_docs([
        {"doc_id": 0, "genre": "jazz", "price": 10.0},
        {"doc_id": 1, "genre": "rock", "price": 20.0},
        {"doc_id": 2, "price": 30.0},               # genre missing
        {"doc_id": 3, "genre": "jazz"},              # price missing
        {"doc_id": 4},                               # both missing
    ], commit_id="a")
    return ix


def _buckets(resp, name):
    return {b["key"]: b["doc_count"]
            for b in resp.aggs[name]["buckets"]}


def test_terms_missing_substitution(idx):
    r = idx.search("*", max_hits=0, aggs={
        "g": {"terms": {"field": "genre", "missing": "NO_DATA"}}})
    assert _buckets(r, "g") == {"jazz": 2, "rock": 1, "NO_DATA": 2}
    # without the param, missing docs don't bucket
    r2 = idx.search("*", max_hits=0, aggs={
        "g": {"terms": {"field": "genre"}}})
    assert _buckets(r2, "g") == {"jazz": 2, "rock": 1}


def test_metric_missing_substitution(idx):
    r = idx.search("*", max_hits=0, aggs={
        "avg_p": {"avg": {"field": "price", "missing": 100.0}},
        "n": {"value_count": {"field": "price", "missing": 0}},
        "mx": {"max": {"field": "price", "missing": "45.5"}},
    })
    # prices: 10, 20, 30, 100, 100
    assert r.aggs["avg_p"]["value"] == pytest.approx(52.0)
    assert r.aggs["n"]["value"] == 5
    assert r.aggs["mx"]["value"] == pytest.approx(45.5)


def test_cardinality_missing(idx):
    r = idx.search("*", max_hits=0, aggs={
        "c": {"cardinality": {"field": "genre", "missing": "NO_DATA"}},
        "c0": {"cardinality": {"field": "genre"}},
    })
    assert r.aggs["c"]["value"] == 3
    assert r.aggs["c0"]["value"] == 2


def test_terms_missing_numeric_field(idx):
    r = idx.search("*", max_hits=0, aggs={
        "p": {"terms": {"field": "price", "missing": 0.0}}})
    got = _buckets(r, "p")
    assert got.get(0.0, got.get("0.0")) == 2


def test_terms_min_doc_count(idx):
    r = idx.search("*", max_hits=0, aggs={
        "g": {"terms": {"field": "genre", "min_doc_count": 2}}})
    assert _buckets(r, "g") == {"jazz": 2}  # rock (1) filtered out
    r2 = idx.search("*", max_hits=0, aggs={
        "g": {"terms": {"field": "genre", "min_doc_count": 1}}})
    assert _buckets(r2, "g") == {"jazz": 2, "rock": 1}


def test_histogram_hard_bounds_min_doc_count_keyed(idx):
    # prices: 10, 20, 30 (+2 missing); interval 10 -> buckets 10/20/30
    r = idx.search("*", max_hits=0, aggs={
        "h": {"histogram": {"field": "price", "interval": 10.0,
                            "hard_bounds": {"min": 10, "max": 20}}}})
    assert [b["key"] for b in r.aggs["h"]["buckets"]] == [10.0, 20.0]
    r2 = idx.search("*", max_hits=0, aggs={
        "h": {"histogram": {"field": "price", "interval": 5.0,
                            "min_doc_count": 1}}})
    # gap buckets (15, 25) filtered by min_doc_count=1
    assert [b["key"] for b in r2.aggs["h"]["buckets"]] == [10.0, 20.0, 30.0]
    r3 = idx.search("*", max_hits=0, aggs={
        "h": {"histogram": {"field": "price", "interval": 10.0,
                            "keyed": True}}})
    assert r3.aggs["h"]["buckets"]["10.0"]["doc_count"] == 1


def test_keyed_through_es_response(idx):
    """keyed buckets (hashmap) must survive the ES response renderer,
    including sub-agg walking."""
    es = idx.es_search({"size": 0, "aggs": {
        "h": {"histogram": {"field": "price", "interval": 10.0,
                            "keyed": True},
              "aggs": {"m": {"avg": {"field": "price"}}}}}})
    b = es.aggs["h"]["buckets"]
    assert isinstance(b, dict)
    assert b["10.0"]["doc_count"] == 1
    assert b["10.0"]["m"]["value"] == pytest.approx(10.0)


def test_range_keyed(idx):
    r = idx.search("*", max_hits=0, aggs={
        "pr": {"range": {"field": "price", "keyed": True, "ranges": [
            {"key": "cheap", "to": 15.0},
            {"key": "rest", "from": 15.0}]}}})
    b = r.aggs["pr"]["buckets"]
    assert isinstance(b, dict)
    assert b["cheap"]["doc_count"] == 1 and b["rest"]["doc_count"] == 2


def test_extended_stats_sigma_bounds(idx):
    r = idx.search("*", max_hits=0, aggs={
        "s": {"extended_stats": {"field": "price", "sigma": 3.0}}})
    st = r.aggs["s"]
    assert st["std_deviation_bounds"]["upper"] == pytest.approx(
        st["avg"] + 3.0 * st["std_deviation"])
    assert st["std_deviation_bounds"]["lower"] == pytest.approx(
        st["avg"] - 3.0 * st["std_deviation"])


def test_non_numeric_missing_on_numeric_field_rejected(idx):
    """A non-numeric `missing` on a numeric field/agg must raise BEFORE
    leaf fan-out — a leaf-side ValueError would be swallowed into
    failed_splits and look like a valid empty result (round-3 ADVICE)."""
    with pytest.raises(ValueError, match="missing"):
        idx.search("*", max_hits=0, aggs={
            "a": {"avg": {"field": "price", "missing": "NO_DATA"}}})
    with pytest.raises(ValueError, match="missing"):
        idx.search("*", max_hits=0, aggs={
            "t": {"terms": {"field": "price", "missing": "NO_DATA"}}})
    with pytest.raises(ValueError, match="missing"):  # nested sub-agg too
        idx.search("*", max_hits=0, aggs={
            "g": {"terms": {"field": "genre"},
                  "aggs": {"m": {"max": {"field": "price",
                                         "missing": "oops"}}}}})
    # numeric strings and text-field substitutes remain fine
    r = idx.search("*", max_hits=0, aggs={
        "mx": {"max": {"field": "price", "missing": "45.5"}},
        "g": {"terms": {"field": "genre", "missing": "NO_DATA"}}})
    assert r.aggs["mx"]["value"] == pytest.approx(45.5)


def test_keyed_date_histogram_es_keys_are_formatted(tmp_path):
    """keyed=true date_histogram: the ES response hashmap is keyed by
    key_as_string, not the internal microsecond key (round-3 ADVICE)."""
    mapping = DocMapping(
        field_mappings=(
            FieldMapping(name="created_at", type="datetime", fast=True),
            FieldMapping(name="doc_id", type="i64", fast=True),
        ), mode="lenient", doc_id_field="doc_id")
    ix = Index.create(str(tmp_path / "dh"), "dh", mapping,
                      settings=IndexSettings(split_num_docs_target=1000))
    ix.ingest_docs([
        {"doc_id": 0, "created_at": "2015-01-01T12:10:30Z"},
        {"doc_id": 1, "created_at": "2015-01-01T18:00:00Z"},
        {"doc_id": 2, "created_at": "2015-01-02T00:30:00Z"},
    ], commit_id="a")
    from quickwit_ray.search.es_rest import EsRestService
    svc = EsRestService({"dh": ix})
    st, resp = svc.request("POST", "dh/_search", body={
        "size": 0, "aggs": {
            "d": {"date_histogram": {"field": "created_at",
                                     "fixed_interval": "1d",
                                     "keyed": True}}}})
    assert st == 200
    b = resp["aggregations"]["d"]["buckets"]
    assert isinstance(b, dict)
    assert set(b) == {"2015-01-01T00:00:00Z", "2015-01-02T00:00:00Z"}
    assert b["2015-01-01T00:00:00Z"]["doc_count"] == 2
    assert b["2015-01-01T00:00:00Z"]["key_as_string"] == \
        "2015-01-01T00:00:00Z"


def test_missing_with_sub_agg(idx):
    r = idx.search("*", max_hits=0, aggs={
        "g": {"terms": {"field": "genre", "missing": "NO_DATA"},
              "aggs": {"avg_p": {"avg": {"field": "price"}}}}})
    by = {b["key"]: b for b in r.aggs["g"]["buckets"]}
    # NO_DATA bucket holds docs 2 (price 30) and 4 (no price)
    assert by["NO_DATA"]["doc_count"] == 2
    assert by["NO_DATA"]["avg_p"]["value"] == pytest.approx(30.0)


def test_aggregation_bucket_limit(tmp_path):
    """aggregation_bucket_limit (node_config/mod.rs:270, 65k default): a
    high-cardinality terms/histogram agg errors as a request rejection,
    never an empty-looking result (leaf errors are otherwise folded into
    failed_splits)."""
    import quickwit_ray.search.aggs as aggs_mod

    mapping = DocMapping(
        field_mappings=(
            FieldMapping(name="k", type="i64", fast=True),
            FieldMapping(name="doc_id", type="i64", fast=True)),
        mode="lenient", doc_id_field="doc_id")
    ix = Index.create(str(tmp_path / "bl"), "bl", mapping,
                      settings=IndexSettings(split_num_docs_target=10_000))
    ix.ingest_docs([{"doc_id": i, "k": i} for i in range(300)],
                   commit_id="a")
    old = aggs_mod.MAX_BUCKETS
    aggs_mod.MAX_BUCKETS = 100  # shrink the limit for the test
    try:
        with pytest.raises(ValueError, match="bucket limit"):
            ix.search("*", max_hits=0, aggs={
                "t": {"terms": {"field": "k", "size": 100000}}})
        with pytest.raises(ValueError, match="bucket limit"):
            ix.search("*", max_hits=0, aggs={
                "h": {"histogram": {"field": "k", "interval": 1.0}}})
    finally:
        aggs_mod.MAX_BUCKETS = old
    # within the limit the same request works (limit counts buckets
    # CREATED during collection, like tantivy's AggregationLimits —
    # size= truncation happens after)
    r = ix.search("*", max_hits=0, aggs={
        "t": {"terms": {"field": "k", "size": 10, "split_size": 50}}})
    assert len(r.aggs["t"]["buckets"]) == 10


def test_aggregation_memory_limit():
    """aggregation_memory_limit (node_config/mod.rs:269): oversized
    intermediate states are rejected at the merge."""
    import numpy as np

    import quickwit_ray.search.aggs as aggs_mod

    old = aggs_mod.AGG_MEMORY_LIMIT
    aggs_mod.AGG_MEMORY_LIMIT = 1024
    try:
        fat = [{"m": {"count": 1, "sum": 1.0, "min": 0.0, "max": 1.0,
                      "sum_sq": 1.0,
                      "pad": np.zeros(4096, np.int64)}}]
        with pytest.raises(ValueError, match="memory limit"):
            aggs_mod.merge_partial_aggs({"m": {"avg": {"field": "x"}}}, fat)
    finally:
        aggs_mod.AGG_MEMORY_LIMIT = old
