"""Push ingestion (_bulk, ingest docs, input-format decode incl. OTLP) +
ES REST surface breadth (_field_caps, _stats, _cat/indices)."""

import json

import pytest

from quickwit_ray.api import Index
from quickwit_ray.config import DocMapping, FieldMapping, IndexSettings
from quickwit_ray.sources.ingest import (
    decode_input,
    parse_bulk_ndjson,
    parse_otlp_logs_json,
    parse_otlp_spans_json,
)


def _mk_index(tmp_path, mode="strict"):
    mapping = DocMapping(
        field_mappings=(
            FieldMapping(name="body", type="text", record="position",
                         fieldnorms=True, stored=True),
            FieldMapping(name="service_name", type="text", tokenizer="raw",
                         record="basic", stored=True, fast=True),
            FieldMapping(name="severity_number", type="i64", stored=True,
                         fast=True),
            FieldMapping(name="timestamp_nanos", type="i64", stored=True,
                         fast=True)),
        mode=mode, doc_id_field="timestamp_nanos",
        default_search_fields=("body",))
    return Index.create(str(tmp_path / "idx"), "logs", mapping,
                        IndexSettings(split_num_docs_target=100_000))


def test_parse_bulk_ndjson():
    payload = "\n".join([
        json.dumps({"index": {"_index": "logs", "_id": "a1"}}),
        json.dumps({"body": "hello world", "severity_number": 3}),
        json.dumps({"create": {}}),
        json.dumps({"body": "second doc"}),
        "",
    ])
    docs = parse_bulk_ndjson(payload)
    assert len(docs) == 2
    assert docs[0]["_id"] == "a1" and docs[0]["severity_number"] == 3
    with pytest.raises(ValueError, match="not supported"):
        parse_bulk_ndjson(json.dumps({"delete": {"_id": "x"}}))
    with pytest.raises(ValueError, match="without a document"):
        parse_bulk_ndjson(json.dumps({"index": {}}))


def test_bulk_ingest_and_search(tmp_path):
    idx = _mk_index(tmp_path)
    payload = "\n".join([
        '{"index": {}}',
        json.dumps({"body": "connection refused on port 443",
                    "service_name": "gateway", "severity_number": 17,
                    "timestamp_nanos": 1}),
        '{"index": {}}',
        json.dumps({"body": "request completed ok",
                    "service_name": "gateway", "severity_number": 9,
                    "timestamp_nanos": 2}),
    ])
    assert idx.bulk(payload, commit_id="c1") == 2
    # idempotent replay of the same commit id
    assert idx.bulk(payload, commit_id="c1") == 0
    r = idx.search("body:refused", max_hits=5, fetch_fields=["service_name"])
    assert r.num_hits == 1 and r.hits["service_name"].iloc[0] == "gateway"
    assert idx.search("severity_number:>=10", max_hits=0).num_hits == 1
    # second bulk without commit id appends
    assert idx.bulk(payload.replace('"timestamp_nanos": 1',
                                    '"timestamp_nanos": 3')) == 2
    assert idx.search("*", max_hits=0).num_hits == 4


OTLP_LOGS = json.dumps({
    "resourceLogs": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": "checkout"}},
            {"key": "host", "value": {"stringValue": "h1"}}]},
        "scopeLogs": [{
            "scope": {"name": "lib", "version": "1.2"},
            "logRecords": [
                {"timeUnixNano": "1700000000000000000",
                 "severityText": "ERROR", "severityNumber": 17,
                 "body": {"stringValue": "payment failed badly"},
                 "attributes": [{"key": "code", "value": {"intValue": "502"}}],
                 "traceId": "0102030405060708090a0b0c0d0e0f10",
                 "spanId": "0102030405060708"},
                {"observedTimeUnixNano": "1700000001000000000",
                 "severityNumber": 9,
                 "body": {"stringValue": "retry scheduled"}},
            ]}]}]})


def test_parse_otlp_logs():
    docs = parse_otlp_logs_json(OTLP_LOGS)
    assert len(docs) == 2
    d = docs[0]
    assert d["service_name"] == "checkout"
    assert d["timestamp_nanos"] == 1700000000000000000
    assert d["severity_text"] == "ERROR" and d["severity_number"] == 17
    assert d["body"] == "payment failed badly"
    assert d["attributes"] == {"code": 502}
    assert d["resource_attributes"] == {"host": "h1"}
    assert d["trace_id"] == "0102030405060708090a0b0c0d0e0f10"
    assert d["scope_name"] == "lib" and d["scope_version"] == "1.2"
    # record 2: time falls back to observed; absent ids are None
    assert docs[1]["timestamp_nanos"] == 1700000001000000000
    assert docs[1]["trace_id"] is None and docs[1]["severity_text"] is None


def test_parse_otlp_spans():
    payload = json.dumps({
        "resourceSpans": [{
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "api"}}]},
            "scopeSpans": [{"scope": {"name": "tracer"}, "spans": [
                {"traceId": "aa" * 16, "spanId": "bb" * 8,
                 "name": "GET /users", "kind": 2,
                 "startTimeUnixNano": "1000000000", "endTimeUnixNano": "4000000000",
                 "attributes": [{"key": "http.status",
                                 "value": {"intValue": "200"}}]},
                {"traceId": "aa" * 16, "spanId": "cc" * 8,
                 "parentSpanId": "bb" * 8, "name": "db.query", "kind": 3,
                 "startTimeUnixNano": "2000000000",
                 "endTimeUnixNano": "2500000000"},
            ]}]}]})
    docs = parse_otlp_spans_json(payload)
    assert len(docs) == 2
    root, child = docs
    assert root["service_name"] == "api" and root["span_name"] == "GET /users"
    assert root["is_root"] and not child["is_root"]
    assert child["parent_span_id"] == "bb" * 8
    assert root["span_duration_millis"] == 3000
    assert root["span_attributes"] == {"http.status": 200}
    # QwSpan parity fields (traces.rs Span::from_otlp)
    assert root["span_fingerprint"] == "api\x002\x00GET /users"
    assert root["span_status"] == {"code": "unset"}
    assert root["events"] == [] and root["links"] == []
    assert root["event_names"] == []


def test_parse_otlp_span_events_links_status():
    payload = json.dumps({
        "resourceSpans": [{
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "api"}},
                {"key": "host", "value": {"stringValue": "h1"}}],
                "droppedAttributesCount": 3},
            "scopeSpans": [{"spans": [
                {"traceId": "aa" * 16, "spanId": "bb" * 8,
                 "kind": 3,
                 "startTimeUnixNano": "1000000000",
                 "endTimeUnixNano": "1500000000",
                 "status": {"code": 2, "message": "boom"},
                 "droppedEventsCount": 1,
                 "events": [
                     {"timeUnixNano": "1100000000", "name": "exception",
                      "attributes": [{"key": "exception.type",
                                      "value": {"stringValue": "IOError"}}],
                      "droppedAttributesCount": 2}],
                 "links": [
                     {"traceId": "dd" * 16, "spanId": "ee" * 8,
                      "traceState": "k=v",
                      "attributes": [{"key": "rel",
                                      "value": {"stringValue": "retry"}}]}]},
            ]}]}]})
    (d,) = parse_otlp_spans_json(payload)
    # empty span names default to "unknown" (traces.rs from_otlp)
    assert d["span_name"] == "unknown"
    assert d["span_fingerprint"] == "api\x003\x00unknown"
    assert d["resource_attributes"] == {"host": "h1"}
    assert d["resource_dropped_attributes_count"] == 3
    assert d["span_status"] == {"code": "error", "message": "boom"}
    assert d["span_dropped_events_count"] == 1
    assert d["events"] == [{
        "event_timestamp_nanos": 1100000000, "event_name": "exception",
        "event_attributes": {"exception.type": "IOError"},
        "event_dropped_attributes_count": 2}]
    assert d["event_names"] == ["exception"]
    assert d["links"] == [{
        "link_trace_id": "dd" * 16, "link_span_id": "ee" * 8,
        "link_trace_state": "k=v", "link_attributes": {"rel": "retry"},
        "link_dropped_attributes_count": 0}]


def test_plaintext_and_ndjson_decode():
    assert decode_input("line one\nline two\n", "plain_text") == [
        {"plain_text": "line one"}, {"plain_text": "line two"}]
    assert decode_input('{"a": 1}\n{"a": 2}', "ndjson") == [{"a": 1}, {"a": 2}]
    with pytest.raises(ValueError):
        decode_input("x", "protobuf")


def test_otlp_ingest_end_to_end(tmp_path):
    idx = _mk_index(tmp_path, mode="dynamic")
    n = idx.ingest_payload(OTLP_LOGS, "otlp_logs_json", commit_id="otlp1")
    assert n == 2
    r = idx.search("body:payment", max_hits=5,
                   fetch_fields=["service_name", "severity_number"])
    assert r.num_hits == 1
    assert r.hits["service_name"].iloc[0] == "checkout"
    assert int(r.hits["severity_number"].iloc[0]) == 17


def test_es_rest_breadth(tmp_path):
    idx = _mk_index(tmp_path)
    idx.bulk("\n".join([
        '{"index": {}}',
        json.dumps({"body": "hello", "severity_number": 3,
                    "timestamp_nanos": 1})]))
    caps = idx.es_field_caps()
    assert caps["indices"] == ["logs"]
    assert caps["fields"]["body"]["text"]["searchable"]
    assert caps["fields"]["severity_number"]["long"]["aggregatable"]
    stats = idx.es_stats()
    assert stats["_all"]["primaries"]["docs"]["count"] == 1
    assert stats["indices"]["logs"]["primaries"]["store"]["size_in_bytes"] > 0
    cat = idx.es_cat_indices()
    assert cat[0]["index"] == "logs" and cat[0]["docs.count"] == "1"


# ---------------------------------------------------------------------------
# ingest workbench (actors/indexer.rs:592-626 commit triggers)
# ---------------------------------------------------------------------------

def _n_splits(idx):
    from quickwit_ray.state.manifest import Manifest

    return len(Manifest(idx.index_dir).published_splits())


def _doc(i):
    return json.dumps({"index": {}}) + "\n" + json.dumps(
        {"body": f"workbench doc {i} refused", "service_name": "gw",
         "severity_number": i, "timestamp_nanos": i})


def test_workbench_many_bulks_one_split(tmp_path):
    """N small bulks buffer into ONE split at close() — not N splits."""
    idx = _mk_index(tmp_path)
    with idx.open_ingest_workbench(commit_timeout_secs=3600,
                                   commit_docs_threshold=10_000) as wb:
        for i in range(10):
            assert wb.bulk(_doc(i), commit_id=f"b{i}") == 1
        # nothing searchable before the commit trigger fires
        assert idx.search("*", max_hits=0).num_hits == 0
        assert _n_splits(idx) == 0
    assert _n_splits(idx) == 1
    assert idx.search("*", max_hits=0).num_hits == 10
    assert idx.search("body:refused", max_hits=0).num_hits == 10


def test_workbench_docs_threshold_autocommits(tmp_path):
    idx = _mk_index(tmp_path)
    wb = idx.open_ingest_workbench(commit_timeout_secs=3600,
                                   commit_docs_threshold=4)
    for i in range(7):
        wb.bulk(_doc(i))
    # the 4th doc tripped the threshold: one commit wave published
    assert wb.commits == 1 and _n_splits(idx) == 1
    assert idx.search("*", max_hits=0).num_hits == 4
    wb.close()
    assert _n_splits(idx) == 2
    assert idx.search("*", max_hits=0).num_hits == 7


def test_workbench_timeout_trigger(tmp_path):
    import time as _t

    idx = _mk_index(tmp_path)
    wb = idx.open_ingest_workbench(commit_timeout_secs=0.05)
    wb.bulk(_doc(1))
    assert not wb.poll() or True  # may or may not have elapsed yet
    _t.sleep(0.08)
    assert wb.poll() is True
    assert idx.search("*", max_hits=0).num_hits == 1


def test_workbench_exactly_once_replay(tmp_path):
    """Kill-mid-wave analog: an uncommitted workbench loses its buffer;
    replaying the same commit_ids into a fresh workbench ingests exactly
    once, and committed ids no-op everywhere."""
    idx = _mk_index(tmp_path)
    wb = idx.open_ingest_workbench(commit_timeout_secs=3600)
    wb.bulk(_doc(1), commit_id="w1")
    wb.bulk(_doc(2), commit_id="w2")
    # same id within the open workbench: pending -> no-op
    assert wb.bulk(_doc(1), commit_id="w1") == 0
    del wb  # crash before commit: buffer lost, nothing published
    assert idx.search("*", max_hits=0).num_hits == 0

    wb2 = idx.open_ingest_workbench(commit_timeout_secs=3600)
    assert wb2.bulk(_doc(1), commit_id="w1") == 1
    assert wb2.bulk(_doc(2), commit_id="w2") == 1
    assert wb2.close() == 2
    assert idx.search("*", max_hits=0).num_hits == 2

    # replay after commit: both ids are checkpointed in the manifest
    wb3 = idx.open_ingest_workbench(commit_timeout_secs=3600)
    assert wb3.bulk(_doc(1), commit_id="w1") == 0
    assert wb3.bulk(_doc(2), commit_id="w2") == 0
    assert wb3.close() == 0
    assert idx.search("*", max_hits=0).num_hits == 2
    assert _n_splits(idx) == 1


def test_workbench_strict_rejects_at_push(tmp_path):
    idx = _mk_index(tmp_path, mode="strict")
    wb = idx.open_ingest_workbench(commit_timeout_secs=3600)
    wb.bulk(_doc(1))
    bad = json.dumps({"index": {}}) + "\n" + json.dumps(
        {"body": "x", "no_such_field": 1})
    with pytest.raises(ValueError, match="unknown fields"):
        wb.bulk(bad)
    # the poison push did not contaminate the open buffer
    assert wb.close() == 1
    assert idx.search("*", max_hits=0).num_hits == 1


def test_workbench_split_target_chunking(tmp_path):
    """A commit larger than split_num_docs_target seals multiple splits."""
    mapping = DocMapping(
        field_mappings=(
            FieldMapping(name="body", type="text", record="freq",
                         fieldnorms=True, stored=True),
            FieldMapping(name="timestamp_nanos", type="i64", stored=True,
                         fast=True)),
        mode="strict", doc_id_field="timestamp_nanos",
        default_search_fields=("body",))
    idx = Index.create(str(tmp_path / "idx2"), "logs2", mapping,
                       IndexSettings(split_num_docs_target=25))
    wb = idx.open_ingest_workbench(commit_timeout_secs=3600,
                                   commit_docs_threshold=10_000)
    for i in range(60):
        wb.push([{"body": f"doc {i}", "timestamp_nanos": i}])
    wb.close()
    assert _n_splits(idx) == 3
    assert idx.search("*", max_hits=0).num_hits == 60


# ---------------------------------------------------------------------------
# OTLP protobuf wire decode (public opentelemetry-proto field numbers)
# ---------------------------------------------------------------------------
# The encoder below is written INDEPENDENTLY from the decoder, straight off
# the public .proto files, so a transposed field number in either side
# fails the round-trip.

import struct as _struct


def _ev(n):  # varint
    out = b""
    n &= (1 << 64) - 1
    while True:
        b, n = n & 0x7F, n >> 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _etag(fn, wt):
    return _ev(fn << 3 | wt)


def _elen(fn, payload: bytes) -> bytes:
    return _etag(fn, 2) + _ev(len(payload)) + payload


def _estr(fn, s: str) -> bytes:
    return _elen(fn, s.encode())


def _ef64(fn, v: int) -> bytes:
    return _etag(fn, 1) + _struct.pack("<Q", v)


def _ef32(fn, v: int) -> bytes:
    return _etag(fn, 5) + _struct.pack("<I", v)


def _evint(fn, v: int) -> bytes:
    return _etag(fn, 0) + _ev(v)


def _e_anyvalue(v) -> bytes:
    if isinstance(v, str):
        return _estr(1, v)
    if isinstance(v, bool):
        return _evint(2, int(v))
    if isinstance(v, int):
        return _evint(3, v)
    if isinstance(v, float):
        return _etag(4, 1) + _struct.pack("<d", v)
    if isinstance(v, list):
        inner = b"".join(_elen(1, _e_anyvalue(x)) for x in v)
        return _elen(5, inner)
    if isinstance(v, dict):
        inner = b"".join(_elen(1, _e_kv(k, x)) for k, x in v.items())
        return _elen(6, inner)
    if isinstance(v, bytes):
        return _elen(7, v)
    raise TypeError(type(v))


def _e_kv(key, val) -> bytes:
    return _estr(1, key) + _elen(2, _e_anyvalue(val))


def _e_attrs(fn, attrs: dict) -> bytes:
    return b"".join(_elen(fn, _e_kv(k, v)) for k, v in attrs.items())


def _e_resource(attrs: dict) -> bytes:
    return _e_attrs(1, attrs)


def _e_scope(name=None, version=None) -> bytes:
    out = b""
    if name:
        out += _estr(1, name)
    if version:
        out += _estr(2, version)
    return out


def test_otlp_logs_proto_matches_json():
    # logical content with every AnyValue shape; observed timestamps are
    # explicit so json/proto parses are time-independent
    rec1 = (_ef64(1, 1_700_000_000_000_000_000)
            + _evint(2, 17) + _estr(3, "ERROR")
            + _elen(5, _e_anyvalue("payment failed badly"))
            + _e_attrs(6, {"code": 502, "ratio": 0.5, "ok": False,
                           "tags": ["a", "b"], "ctx": {"k": "v"},
                           "blob": b"\x01\x02", "neg": -7})
            + _ef32(8, 1)
            + _elen(9, bytes.fromhex("0102030405060708090a0b0c0d0e0f10"))
            + _elen(10, bytes.fromhex("0102030405060708"))
            + _ef64(11, 1_700_000_000_500_000_000))
    rec2 = (_evint(2, 9) + _elen(5, _e_anyvalue("retry scheduled"))
            + _ef64(11, 1_700_000_001_000_000_000))
    scope_logs = (_elen(1, _e_scope("lib", "1.2"))
                  + _elen(2, rec1) + _elen(2, rec2))
    resource_logs = (_elen(1, _e_resource({"service.name": "checkout",
                                           "host": "h1"}))
                     + _elen(2, scope_logs))
    wire = _elen(1, resource_logs)

    js = json.dumps({"resourceLogs": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": "checkout"}},
            {"key": "host", "value": {"stringValue": "h1"}}]},
        "scopeLogs": [{
            "scope": {"name": "lib", "version": "1.2"},
            "logRecords": [
                {"timeUnixNano": "1700000000000000000",
                 "severityText": "ERROR", "severityNumber": 17,
                 "body": {"stringValue": "payment failed badly"},
                 "attributes": [
                     {"key": "code", "value": {"intValue": "502"}},
                     {"key": "ratio", "value": {"doubleValue": 0.5}},
                     {"key": "ok", "value": {"boolValue": False}},
                     {"key": "tags", "value": {"arrayValue": {"values": [
                         {"stringValue": "a"}, {"stringValue": "b"}]}}},
                     {"key": "ctx", "value": {"kvlistValue": {"values": [
                         {"key": "k", "value": {"stringValue": "v"}}]}}},
                     {"key": "blob", "value": {"bytesValue": "AQI="}},
                     {"key": "neg", "value": {"intValue": "-7"}}],
                 "flags": 1,
                 "traceId": "0102030405060708090a0b0c0d0e0f10",
                 "spanId": "0102030405060708",
                 "observedTimeUnixNano": "1700000000500000000"},
                {"severityNumber": 9,
                 "body": {"stringValue": "retry scheduled"},
                 "observedTimeUnixNano": "1700000001000000000"},
            ]}]}]})

    from quickwit_ray.sources.ingest import parse_otlp_logs_proto

    assert parse_otlp_logs_proto(wire) == parse_otlp_logs_json(js)
    # and through the decode_input front
    assert decode_input(wire, "otlp_logs_protobuf") == parse_otlp_logs_json(js)


def test_otlp_spans_proto_matches_json():
    event = (_ef64(1, 1_100_000_000) + _estr(2, "exception")
             + _e_attrs(3, {"exception.type": "IOError"}) + _evint(4, 2))
    link = (_elen(1, b"\xdd" * 16) + _elen(2, b"\xee" * 8)
            + _estr(3, "k=v") + _e_attrs(4, {"rel": "retry"}))
    span1 = (_elen(1, b"\xaa" * 16) + _elen(2, b"\xbb" * 8)
             + _estr(5, "GET /users") + _evint(6, 2)
             + _ef64(7, 1_000_000_000) + _ef64(8, 4_000_000_000)
             + _e_attrs(9, {"http.status": 200})
             + _evint(10, 1) + _elen(11, event) + _evint(12, 3)
             + _elen(13, link) + _evint(14, 4)
             + _elen(15, _estr(2, "oops") + _evint(3, 2)))
    span2 = (_elen(1, b"\xaa" * 16) + _elen(2, b"\xcc" * 8)
             + _elen(4, b"\xbb" * 8) + _estr(5, "db.query") + _evint(6, 3)
             + _ef64(7, 2_000_000_000) + _ef64(8, 2_500_000_000))
    scope_spans = _elen(1, _e_scope("tracer")) + _elen(2, span1) + _elen(2, span2)
    resource_spans = (_elen(1, _e_resource({"service.name": "api"}))
                      + _elen(2, scope_spans))
    wire = _elen(1, resource_spans)

    js = json.dumps({"resourceSpans": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": "api"}}]},
        "scopeSpans": [{"scope": {"name": "tracer"}, "spans": [
            {"traceId": "aa" * 16, "spanId": "bb" * 8,
             "name": "GET /users", "kind": 2,
             "startTimeUnixNano": "1000000000",
             "endTimeUnixNano": "4000000000",
             "attributes": [{"key": "http.status",
                             "value": {"intValue": "200"}}],
             "droppedAttributesCount": 1, "droppedEventsCount": 3,
             "droppedLinksCount": 4,
             "events": [{"timeUnixNano": "1100000000", "name": "exception",
                         "attributes": [{"key": "exception.type",
                                         "value": {"stringValue": "IOError"}}],
                         "droppedAttributesCount": 2}],
             "links": [{"traceId": "dd" * 16, "spanId": "ee" * 8,
                        "traceState": "k=v",
                        "attributes": [{"key": "rel",
                                        "value": {"stringValue": "retry"}}]}],
             "status": {"message": "oops", "code": 2}},
            {"traceId": "aa" * 16, "spanId": "cc" * 8,
             "parentSpanId": "bb" * 8, "name": "db.query", "kind": 3,
             "startTimeUnixNano": "2000000000",
             "endTimeUnixNano": "2500000000"},
        ]}]}]})

    from quickwit_ray.sources.ingest import parse_otlp_spans_proto

    assert parse_otlp_spans_proto(wire) == parse_otlp_spans_json(js)
    assert decode_input(wire, "otlp_traces_protobuf") == parse_otlp_spans_json(js)


def test_otlp_proto_ingest_end_to_end(tmp_path):
    idx = _mk_index(tmp_path, mode="dynamic")
    rec = (_ef64(1, 1) + _evint(2, 17) + _estr(3, "ERROR")
           + _elen(5, _e_anyvalue("disk full on node"))
           + _ef64(11, 2))
    wire = _elen(1, _elen(1, _e_resource({"service.name": "store"}))
                 + _elen(2, _elen(2, rec)))
    assert idx.ingest_payload(wire, "otlp_logs_protobuf", commit_id="p1") == 1
    assert idx.ingest_payload(wire, "otlp_logs_protobuf", commit_id="p1") == 0
    r = idx.search("body:disk", max_hits=5, fetch_fields=["service_name"])
    assert r.num_hits == 1 and r.hits["service_name"].iloc[0] == "store"


def test_otlp_proto_decoders_reject_malformed_bytes_with_valueerror():
    """Fuzz-derived: random wire bytes must raise ValueError (the HTTP
    layer's 400), never IndexError/TypeError from the varint walker."""
    import random

    import pytest

    from quickwit_ray.sources.ingest import (
        parse_otlp_logs_proto,
        parse_otlp_spans_proto,
    )

    crashers = [
        b"\xdf\x8d\x9b\xab\xbd\xd1\xe9\xba\xb4",
        b"\x08B\xba,zE\xba-\t\xa5\xb4\xb9\x83\xf3\x99'n\xf7\x13\x9fC"
        b"\x7f\xd5,\x7f\x9f\xdd\xdb\x9d",
    ]
    random.seed(123)
    crashers += [bytes(random.randint(0, 255)
                       for _ in range(random.randint(1, 60)))
                 for _ in range(2000)]
    for data in crashers:
        for fn in (parse_otlp_logs_proto, parse_otlp_spans_proto):
            try:
                fn(data)  # many random payloads ARE valid protobuf
            except ValueError:
                pass
            except Exception as e:  # pragma: no cover
                pytest.fail(f"{fn.__name__} leaked {type(e).__name__} "
                            f"on {data[:20]!r}: {e}")


def test_otlp_proto_nesting_bomb_rejected_with_valueerror():
    """Round-4 ADVICE: a crafted ExportLogsServiceRequest with deeply
    nested arrayValue previously escaped the parse boundary as
    RecursionError, killing the handler thread. The decoder now caps
    AnyValue nesting (ValueError past ~100 levels)."""
    import pytest

    from quickwit_ray.sources.ingest import (
        parse_otlp_logs_proto,
        parse_otlp_spans_proto,
    )

    # build the nesting-bomb ITERATIVELY (a recursive encoder would blow
    # the test's own stack): anyvalue(arrayValue{values:[inner]}) x 500
    inner = _estr(1, "x")
    for _ in range(500):
        inner = _elen(5, _elen(1, inner))
    rec = _elen(5, inner)                      # LogRecord.body = 5
    req = _elen(1, _elen(2, _elen(2, rec)))    # rl=1 > sl=2 > records=2
    assert len(req) < 40_000
    with pytest.raises(ValueError, match="nested deeper"):
        parse_otlp_logs_proto(req)

    # same bomb through a span attribute (Span.attributes = 9)
    span = _estr(1, "deadbeefdeadbeefdeadbeefdeadbeef") and b""
    span = _elen(9, _estr(1, "k") + _elen(2, inner))
    sreq = _elen(1, _elen(2, _elen(2, span)))  # rs=1 > ss=2 > spans=2
    with pytest.raises(ValueError, match="nested deeper"):
        parse_otlp_spans_proto(sreq)

    # a legal shallow payload still decodes fine after the cap
    ok = _elen(1, _elen(2, _elen(2, _elen(5, _e_anyvalue(["a", ["b"]])))))
    docs = parse_otlp_logs_proto(ok)
    assert docs and docs[0]["body"] == ["a", ["b"]]
