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
