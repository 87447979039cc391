"""Jaeger query service over an OTLP traces index.

Re-expresses the reference's Jaeger integration
(`quickwit-jaeger/src/lib.rs` SpanReaderPlugin: GetServices = terms on
service_name, GetOperations = terms on span_name filtered by service,
FindTraceIDs = top-N distinct trace ids by max span start, GetTrace =
span fetch + Jaeger JSON conversion; REST shapes from
`quickwit-serve/src/jaeger_api/` — the `{"data", "total", "limit",
"offset", "errors"}` envelope and the Jaeger UI trace/span/process
model, model.rs) on the repo's searcher primitives:

  * services/operations ride the terms aggregation;
  * find_traces rides the terms agg with custom order by a max-timestamp
    sub-agg (the FindTraceIdsCollector analog — per-split partial top-N,
    merged on the driver);
  * get_traces fetches spans by a trace_id TermSet and converts rows to
    Jaeger spans, deduplicating processes per service name exactly like
    model.rs build_process_map.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from quickwit_ray.search.ast import BoolQuery, MatchAll, RangeQuery, TermQuery, TermSetQuery

_TS = "span_start_timestamp_nanos"
_TE = "span_end_timestamp_nanos"


def _envelope(data: list) -> dict:
    return {"data": data, "total": len(data), "limit": 0, "offset": 0,
            "errors": None}


class JaegerService:
    """Jaeger HTTP API over one traces index (lazy searcher reuse)."""

    def __init__(self, index, max_fetch_spans: int = 10_000):
        from quickwit_ray.search.engine import get_searcher

        self.index = index
        self.searcher = get_searcher(index.index_dir)
        # JaegerConfig.max_fetch_spans (node_config/mod.rs:449, 10k):
        # hard cap on spans materialized per fetch
        self.max_fetch_spans = int(max_fetch_spans)

    # -- endpoints ---------------------------------------------------------

    def services(self) -> dict:
        resp = self.searcher.search(MatchAll(), max_hits=0, aggs={
            "svc": {"terms": {"field": "service_name", "size": 1000}}})
        names = sorted(b["key"] for b in resp.aggs["svc"]["buckets"])
        return _envelope(names)

    def operations(self, service: str,
                   span_kind: Optional[int] = None) -> dict:
        node: Any = TermQuery("service_name", service)
        if span_kind is not None:
            node = BoolQuery(must=(node,),
                             filter=(RangeQuery("span_kind", gte=span_kind,
                                                lte=span_kind),))
        resp = self.searcher.search(node, max_hits=0, aggs={
            "op": {"terms": {"field": "span_name", "size": 1000}}})
        names = sorted(b["key"] for b in resp.aggs["op"]["buckets"])
        return _envelope(names)

    def find_traces(self, params: dict) -> dict:
        """`GET .../api/traces` — service/operation/tags/time/duration
        filters, newest `limit` traces (Jaeger times are MICROseconds)."""
        must: list = []
        filt: list = []
        if params.get("service"):
            must.append(TermQuery("service_name", params["service"]))
        if params.get("operation"):
            must.append(TermQuery("span_name", params["operation"]))
        tags = params.get("tags")
        if tags:
            tags = json.loads(tags) if isinstance(tags, str) else tags
            for k, v in tags.items():
                must.append(TermQuery(f"span_attributes.{k}", str(v)))
        lo_us = params.get("start")
        hi_us = params.get("end")
        if lo_us is not None or hi_us is not None:
            filt.append(RangeQuery(
                _TS,
                gte=int(lo_us) * 1000 if lo_us is not None else None,
                lt=int(hi_us) * 1000 if hi_us is not None else None))
        mind = _parse_duration_us(params.get("minDuration"))
        maxd = _parse_duration_us(params.get("maxDuration"))
        if mind is not None or maxd is not None:
            filt.append(RangeQuery(
                "span_duration_millis",
                gte=mind // 1000 if mind is not None else None,
                lte=maxd // 1000 if maxd is not None else None))
        node: Any = (BoolQuery(must=tuple(must), filter=tuple(filt))
                     if (must or filt) else MatchAll())
        limit = int(params.get("limit", 20))
        resp = self.searcher.search(node, max_hits=0, aggs={
            "tids": {"terms": {"field": "trace_id", "size": limit,
                               "order": {"max_ts": "desc"},
                               "split_size": max(limit * 4, 64)},
                     "aggs": {"max_ts": {"max": {"field": _TS}}}}})
        trace_ids = [b["key"] for b in resp.aggs["tids"]["buckets"]]
        return _envelope(self._traces_data(trace_ids))

    def get_trace(self, trace_id: str) -> dict:
        data = self._traces_data([trace_id])
        return _envelope(data)

    # -- span fetch + Jaeger model conversion -------------------------------

    _FETCH = ["trace_id", "span_id", "parent_span_id", "span_name",
              "service_name", "span_kind", _TS, _TE, "span_attributes",
              "span_status", "events"]

    def _traces_data(self, trace_ids: list[str]) -> list[dict]:
        if not trace_ids:
            return []
        # span fetch is the reference's bounded root_search (jaeger
        # lib.rs:343 max_hits = max_fetch_spans, default 10k,
        # node_config/mod.rs:449): per-split top-k + grouped doc-store
        # point reads — driver memory is bounded by the cap, never by
        # trace size
        resp = self.searcher.search(
            TermSetQuery("trace_id", tuple(trace_ids)),
            max_hits=self.max_fetch_spans, fetch_fields=self._FETCH)
        by_trace: dict[str, list[dict]] = {}
        for row in resp.hits.to_dict("records"):
            span = _to_jaeger_span(row)
            by_trace.setdefault(span["traceID"], []).append(span)
        out = []
        for tid in trace_ids:
            spans = by_trace.get(tid)
            if not spans:
                continue
            spans.sort(key=lambda s: s["startTime"])
            # process map: one processID per distinct service name
            # (model.rs build_process_map)
            processes: dict[str, dict] = {}
            svc_to_pid: dict[str, str] = {}
            for s in spans:
                svc = s.pop("_service_name")
                pid = svc_to_pid.get(svc)
                if pid is None:
                    pid = f"p{len(svc_to_pid) + 1}"
                    svc_to_pid[svc] = pid
                    processes[pid] = {"serviceName": svc, "tags": []}
                s["processID"] = pid
            out.append({"traceID": tid, "spans": spans,
                        "processes": processes, "warnings": None})
        return out


def _us(v) -> int:
    """Stored start/end timestamps -> microseconds (datetime fast columns
    surface micros; raw nanos from the docstore are scaled down)."""
    v = int(v)
    return v // 1000 if v > 10 ** 17 else v


def _parse_duration_us(v) -> Optional[int]:
    """Jaeger duration strings: '100ms', '1.2s', '300us' (quickwit
    jaeger_api/parse_duration.rs subset)."""
    if v in (None, ""):
        return None
    s = str(v).strip()
    for suffix, mult in (("us", 1), ("µs", 1), ("ms", 1000), ("s", 1_000_000),
                         ("m", 60_000_000), ("h", 3_600_000_000)):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * mult)
    return int(float(s))  # bare number = microseconds


def _maybe_json(v):
    if isinstance(v, str):
        try:
            return json.loads(v)
        except json.JSONDecodeError:
            return v
    return v


def _to_jaeger_span(row) -> dict:
    import pandas as pd

    start_us = _us(row[_TS])
    end_us = _us(row[_TE]) if not pd.isna(row.get(_TE)) else start_us
    tags = [{"key": k, "type": "string", "value": str(v)}
            for k, v in sorted((_maybe_json(row.get("span_attributes"))
                                or {}).items())]
    kind = row.get("span_kind")
    if kind is not None and not pd.isna(kind):
        tags.append({"key": "span.kind", "type": "string",
                     "value": _KIND.get(int(kind), str(int(kind)))})
    status = _maybe_json(row.get("span_status")) or {}
    if status.get("code") and status["code"] != "unset":
        tags.append({"key": "otel.status_code", "type": "string",
                     "value": str(status["code"]).upper()})
    logs = []
    for ev in _maybe_json(row.get("events")) or []:
        logs.append({
            "timestamp": int(ev.get("event_timestamp_nanos", 0)) // 1000,
            "fields": [{"key": "event", "type": "string",
                        "value": ev.get("event_name", "")}],
        })
    parent = row.get("parent_span_id")
    refs = ([] if parent is None or (isinstance(parent, float) and
                                     pd.isna(parent)) or parent == ""
            else [{"refType": "CHILD_OF", "traceID": row["trace_id"],
                   "spanID": parent}])
    return {
        "traceID": row["trace_id"],
        "spanID": row["span_id"],
        "operationName": row["span_name"],
        "references": refs,
        "startTime": start_us,
        "duration": max(end_us - start_us, 0),
        "tags": tags,
        "logs": logs,
        "warnings": None,
        "_service_name": row.get("service_name") or "unknown_service",
    }


_KIND = {0: "unspecified", 1: "internal", 2: "server", 3: "client",
         4: "producer", 5: "consumer"}
