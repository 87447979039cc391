"""Jaeger query API over an OTLP traces index (quickwit-jaeger/src/lib.rs
+ quickwit-serve/src/jaeger_api/): services, operations, find-traces with
filters, trace fetch in the Jaeger UI JSON model."""

import json

import pytest

from quickwit_ray.api import Index
from quickwit_ray.config import IndexSettings, otel_traces_doc_mapping
from quickwit_ray.index_api import IndexApiService

NS = 1_000_000_000


def _span(trace, span, svc, op, start_s, dur_ms, parent=None, attrs=None,
          events=None):
    return {
        "traceId": trace, "spanId": span,
        "name": op, "kind": 2,
        "startTimeUnixNano": str(start_s * NS),
        "endTimeUnixNano": str(start_s * NS + dur_ms * 1_000_000),
        **({"parentSpanId": parent} if parent else {}),
        "attributes": [{"key": k, "value": {"stringValue": v}}
                       for k, v in (attrs or {}).items()],
        **({"events": events} if events else {}),
    }


def _payload(svc, spans):
    return json.dumps({"resourceSpans": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": svc}}]},
        "scopeSpans": [{"spans": spans}],
    }]}).encode()


@pytest.fixture()
def svc(tmp_path):
    idx = Index.create(str(tmp_path / "traces"), "otel-traces-v0_9",
                       otel_traces_doc_mapping(),
                       settings=IndexSettings(split_num_docs_target=10_000))
    api = IndexApiService({"otel-traces-v0_9": idx})
    t0 = 1_700_000_000
    api.request("POST", "otlp/v1/traces", body=_payload("checkout", [
        _span("aa010000000000000000000000000001", "a100000000000001", "checkout", "POST /pay", t0, 120,
              attrs={"http.method": "POST"},
              events=[{"timeUnixNano": str((t0 + 1) * NS),
                       "name": "charge.accepted"}]),
        _span("aa010000000000000000000000000001", "a200000000000002", "checkout", "db.query", t0, 40, parent="a100000000000001"),
        _span("bb020000000000000000000000000002", "a300000000000003", "checkout", "POST /pay", t0 + 100, 800,
              attrs={"http.method": "POST", "error": "true"}),
    ]), params={"_content_type": "application/json"})
    api.request("POST", "otlp/v1/traces", body=_payload("inventory", [
        _span("cc030000000000000000000000000003", "a400000000000004", "inventory", "GET /stock", t0 + 200, 15),
    ]), params={"_content_type": "application/json"})
    return api, t0


def test_services_and_operations(svc):
    api, _ = svc
    st, r = api.request("GET", "otel-traces-v0_9/jaeger/api/services")
    assert st == 200 and r["data"] == ["checkout", "inventory"]
    st, ops = api.request(
        "GET", "otel-traces-v0_9/jaeger/api/services/checkout/operations")
    assert ops["data"] == ["POST /pay", "db.query"]


def test_find_traces_filters_and_model(svc):
    api, t0 = svc
    st, r = api.request("GET", "otel-traces-v0_9/jaeger/api/traces",
                        params={"service": "checkout", "limit": "10"})
    assert st == 200
    ids = [t["traceID"] for t in r["data"]]
    assert set(ids) == {"aa010000000000000000000000000001", "bb020000000000000000000000000002"}
    assert ids[0] == "bb020000000000000000000000000002"  # newest first (max span start)
    # operation + duration filters
    st, r2 = api.request("GET", "otel-traces-v0_9/jaeger/api/traces",
                         params={"service": "checkout",
                                 "operation": "POST /pay",
                                 "minDuration": "500ms"})
    assert [t["traceID"] for t in r2["data"]] == ["bb020000000000000000000000000002"]
    # tag filter reaches span_attributes via json path
    st, r3 = api.request("GET", "otel-traces-v0_9/jaeger/api/traces",
                         params={"tags": json.dumps({"error": "true"})})
    assert [t["traceID"] for t in r3["data"]] == ["bb020000000000000000000000000002"]
    # time window (micros) excludes the late trace
    st, r4 = api.request("GET", "otel-traces-v0_9/jaeger/api/traces",
                         params={"service": "checkout",
                                 "start": str(t0 * 1_000_000),
                                 "end": str((t0 + 50) * 1_000_000)})
    assert [t["traceID"] for t in r4["data"]] == ["aa010000000000000000000000000001"]


def test_get_trace_jaeger_span_model(svc):
    api, t0 = svc
    st, r = api.request("GET", "otel-traces-v0_9/jaeger/api/traces/aa010000000000000000000000000001")
    assert st == 200 and len(r["data"]) == 1
    trace = r["data"][0]
    spans = {s["spanID"]: s for s in trace["spans"]}
    assert set(spans) == {"a100000000000001", "a200000000000002"}
    root = spans["a100000000000001"]
    assert root["operationName"] == "POST /pay"
    assert root["references"] == []
    assert root["startTime"] == t0 * 1_000_000
    assert root["duration"] == 120_000  # micros
    assert {"key": "http.method", "type": "string",
            "value": "POST"} in root["tags"]
    assert {"key": "span.kind", "type": "string",
            "value": "server"} in root["tags"]
    assert root["logs"] == [{"timestamp": (t0 + 1) * 1_000_000,
                             "fields": [{"key": "event", "type": "string",
                                         "value": "charge.accepted"}]}]
    child = spans["a200000000000002"]
    assert child["references"] == [{"refType": "CHILD_OF",
                                    "traceID": "aa010000000000000000000000000001", "spanID": "a100000000000001"}]
    # one process per service
    assert len(trace["processes"]) == 1
    pid = root["processID"]
    assert trace["processes"][pid]["serviceName"] == "checkout"
    # unknown trace -> empty data
    st, r0 = api.request("GET", "otel-traces-v0_9/jaeger/api/traces/ee990000000000000000000000000009")
    assert r0["data"] == []
