"""Push ingestion + input-format decoding — the ingest-API front door.

Re-expresses:
  * ES `_bulk` NDJSON (reference `rest_handler.rs:71-294` routes `_bulk`
    into ingest v2): alternating action/doc lines; `index` and `create`
    actions supported, `delete`/`update` rejected (the reference's bulk
    only appends).
  * Source input formats (`actors/doc_processor.rs:153-226`):
    json / ndjson, plain_text (one doc per line under the "plain_text"
    key, doc_processor.rs:47), otlp_logs_json and otlp_traces_json
    (flattening per `quickwit-opentelemetry/src/otlp/logs.rs:396-505` and
    `traces.rs:184-245` — one doc per logRecord / span with the reference
    model's field names).

`ingest_docs` turns a parsed doc list into one committed split (SplitBuilder
-> atomic manifest publish): one bulk call = one commit wave, mirroring the
ingest API's commit-on-request semantics at this engine's granularity.
"""

from __future__ import annotations

import base64
import json
import time
from typing import Any, Optional

import pyarrow as pa

PLAIN_TEXT_FIELD = "plain_text"  # doc_processor.rs:47


# ---------------------------------------------------------------------------
# ES _bulk
# ---------------------------------------------------------------------------

def parse_bulk_ndjson(payload: bytes | str) -> list[dict[str, Any]]:
    """Parse an ES `_bulk` body: action line then (for index/create) the
    document line. Returns the documents; `_id` from the action metadata is
    attached as `_id` when present."""
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8")
    docs: list[dict[str, Any]] = []
    lines = [ln for ln in payload.split("\n") if ln.strip()]
    i = 0
    while i < len(lines):
        action = json.loads(lines[i])
        if not isinstance(action, dict) or len(action) != 1:
            raise ValueError(f"bad bulk action line: {lines[i][:80]!r}")
        kind, meta = next(iter(action.items()))
        if kind in ("delete", "update"):
            raise ValueError(f"bulk action {kind!r} not supported (append-only)")
        if kind not in ("index", "create"):
            raise ValueError(f"unknown bulk action {kind!r}")
        i += 1
        if i >= len(lines):
            raise ValueError("bulk action line without a document line")
        doc = json.loads(lines[i])
        if not isinstance(doc, dict):
            raise ValueError("bulk document line must be a JSON object")
        if isinstance(meta, dict) and meta.get("_id") is not None:
            doc = dict(doc, _id=meta["_id"])
        docs.append(doc)
        i += 1
    return docs


# ---------------------------------------------------------------------------
# OTLP JSON decoding
# ---------------------------------------------------------------------------

def _attr_value(v: dict) -> Any:
    if "stringValue" in v:
        return v["stringValue"]
    if "intValue" in v:
        return int(v["intValue"])
    if "doubleValue" in v:
        return float(v["doubleValue"])
    if "boolValue" in v:
        return bool(v["boolValue"])
    if "arrayValue" in v:
        return [_attr_value(x) for x in v["arrayValue"].get("values", [])]
    if "kvlistValue" in v:
        return {kv["key"]: _attr_value(kv["value"])
                for kv in v["kvlistValue"].get("values", [])}
    if "bytesValue" in v:
        return base64.b64decode(v["bytesValue"])
    return None


def _extract_attributes(attrs: list[dict]) -> dict[str, Any]:
    return {a["key"]: _attr_value(a.get("value", {})) for a in attrs or []}


_HEX_CHARS = set("0123456789abcdefABCDEF")


def _hex_id(value: Optional[str]) -> Optional[str]:
    """Normalize an OTLP JSON trace/span id to lowercase hex; None when
    absent or all-zero. The OTLP/JSON spec encodes ids as hex (16 chars for
    span, 32 for trace); base64 only appears from proto-JSON transcoders,
    so hex-shaped values are taken verbatim and base64 is the fallback."""
    if not value:
        return None
    if len(value) in (16, 32) and set(value) <= _HEX_CHARS:
        hexed = value.lower()
    else:
        try:
            hexed = base64.b64decode(value, validate=True).hex()
        except Exception:  # noqa: BLE001
            hexed = value.lower()
    return None if set(hexed) <= {"0"} else hexed


def parse_otlp_logs_json(payload: bytes | str) -> list[dict[str, Any]]:
    """ExportLogsServiceRequest JSON -> one flat doc per logRecord
    (logs.rs:396-505 model: timestamps, service_name from
    resource.attributes['service.name'], severity, body, attributes,
    trace/span ids, resource/scope context)."""
    obj = json.loads(payload)
    now_nanos = int(time.time() * 1e9)
    docs = []
    for rl in obj.get("resourceLogs", []):
        resource_attrs = _extract_attributes(
            (rl.get("resource") or {}).get("attributes", []))
        service_name = resource_attrs.pop("service.name", "unknown_service")
        if not isinstance(service_name, str):
            service_name = "unknown_service"
        for sl in rl.get("scopeLogs", []):
            scope = sl.get("scope") or {}
            scope_name = scope.get("name") or None
            scope_version = scope.get("version") or None
            scope_attrs = _extract_attributes(scope.get("attributes", []))
            for rec in sl.get("logRecords", []):
                observed = int(rec.get("observedTimeUnixNano", 0) or 0)
                if observed == 0:
                    observed = now_nanos
                ts = int(rec.get("timeUnixNano", 0) or 0) or observed
                body = rec.get("body")
                if isinstance(body, dict):
                    body = _attr_value(body)
                docs.append({
                    "timestamp_nanos": ts,
                    "observed_timestamp_nanos": observed,
                    "service_name": service_name,
                    "severity_text": rec.get("severityText") or None,
                    "severity_number": int(rec.get("severityNumber", 0) or 0),
                    "body": body,
                    "attributes": _extract_attributes(rec.get("attributes", [])),
                    "trace_id": _hex_id(rec.get("traceId")),
                    "span_id": _hex_id(rec.get("spanId")),
                    "trace_flags": int(rec.get("flags", 0) or 0),
                    "resource_attributes": resource_attrs,
                    "scope_name": scope_name,
                    "scope_version": scope_version,
                    "scope_attributes": scope_attrs,
                })
    return docs


def parse_otlp_spans_json(payload: bytes | str) -> list[dict[str, Any]]:
    """ExportTraceServiceRequest JSON -> one flat doc per span
    (traces.rs:184-245 model field names)."""
    obj = json.loads(payload)
    docs = []
    for rs in obj.get("resourceSpans", []):
        resource_attrs = _extract_attributes(
            (rs.get("resource") or {}).get("attributes", []))
        service_name = resource_attrs.pop("service.name", "unknown_service")
        if not isinstance(service_name, str):
            service_name = "unknown_service"
        for ss in rs.get("scopeSpans", []):
            scope = ss.get("scope") or {}
            for sp in ss.get("spans", []):
                start = int(sp.get("startTimeUnixNano", 0) or 0)
                end = int(sp.get("endTimeUnixNano", 0) or 0)
                parent = _hex_id(sp.get("parentSpanId"))
                docs.append({
                    "trace_id": _hex_id(sp.get("traceId")),
                    "trace_state": sp.get("traceState") or None,
                    "service_name": service_name,
                    "resource_attributes": resource_attrs,
                    "scope_name": scope.get("name") or None,
                    "scope_version": scope.get("version") or None,
                    "span_id": _hex_id(sp.get("spanId")),
                    "parent_span_id": parent,
                    "span_kind": int(sp.get("kind", 0) or 0),
                    "span_name": sp.get("name") or "",
                    "span_start_timestamp_nanos": start,
                    "span_end_timestamp_nanos": end,
                    "span_duration_millis": max((end - start) // 1_000_000, 0),
                    "span_attributes": _extract_attributes(sp.get("attributes", [])),
                    "span_status": (sp.get("status") or {}).get("code", 0),
                    "is_root": parent is None,
                    "events_count": len(sp.get("events", []) or []),
                    "links_count": len(sp.get("links", []) or []),
                })
    return docs


def decode_input(payload: bytes | str, input_format: str = "json"
                 ) -> list[dict[str, Any]]:
    """Source input-format decode (doc_processor.rs try_into_json_docs)."""
    if input_format in ("json", "ndjson"):
        if isinstance(payload, bytes):
            payload = payload.decode("utf-8")
        return [json.loads(ln) for ln in payload.split("\n") if ln.strip()]
    if input_format == "plain_text":
        if isinstance(payload, bytes):
            payload = payload.decode("utf-8")
        return [{PLAIN_TEXT_FIELD: ln} for ln in payload.split("\n") if ln]
    if input_format == "otlp_logs_json":
        return parse_otlp_logs_json(payload)
    if input_format == "otlp_traces_json":
        return parse_otlp_spans_json(payload)
    raise ValueError(f"unknown input format {input_format!r}")


# ---------------------------------------------------------------------------
# push ingestion into an index
# ---------------------------------------------------------------------------

def _docs_to_table(docs: list[dict[str, Any]], mapping) -> pa.Table:
    """Docs -> an Arrow table restricted to mapped columns (dynamic mode
    keeps every key). json-typed columns are re-serialized to strings."""
    keys: list[str] = []
    seen = set()
    for d in docs:
        for k in d:
            if k not in seen:
                seen.add(k)
                keys.append(k)
    if mapping.mode != "dynamic":
        mapped = {f.name for f in mapping.field_mappings}
        mapped.add(mapping.doc_id_field)

        def _known(k: str) -> bool:
            # dotted paths are legal only when rooted at a mapped json field
            return (k in mapped
                    or ("." in k and mapping.resolve_json_path(k) is not None))

        # `_id` is bulk-action metadata, never a schema violation
        unknown = [k for k in keys if not _known(k) and k != "_id"]
        if unknown and mapping.mode == "strict":
            raise ValueError(
                f"strict doc mapping: unknown fields {sorted(unknown)[:5]} "
                "(use mode=lenient to drop them, dynamic to index them)")
        keys = [k for k in keys if _known(k)]
    # Fold dotted keys rooted at a mapped json field into the parent json
    # object (expand_dots semantics, field_mapping_entry.rs:578): `props.k`
    # merges {'k': v} into the `props` column instead of becoming a
    # standalone column the split writer would silently drop. An EXPLICIT
    # mapping with the dotted name wins (mapped fields first,
    # query_builder.rs:84-141) and stays a standalone column.
    explicit = {f.name for f in mapping.field_mappings}
    dotted = [k for k in keys
              if "." in k and k not in explicit
              and mapping.resolve_json_path(k) is not None]
    if dotted:
        keys = [k for k in keys if k not in dotted]
        docs = [dict(d) for d in docs]  # don't mutate caller's docs
        for d in docs:
            for k in list(d.keys()):
                if k not in dotted:
                    continue
                fm, path = mapping.resolve_json_path(k)
                obj = d.get(fm.name)
                obj = dict(obj) if isinstance(obj, dict) else {}
                node = obj
                parts = path.split(".")
                for p in parts[:-1]:
                    nxt = node.get(p)
                    if not isinstance(nxt, dict):
                        nxt = {}
                        node[p] = nxt
                    node = nxt
                node[parts[-1]] = d.pop(k)
                d[fm.name] = obj
                if fm.name not in keys:
                    keys.append(fm.name)
    cols = {}
    json_fields = {f.name for f in mapping.field_mappings if f.type == "json"}
    for k in keys:
        vals = [d.get(k) for d in docs]
        if k in json_fields:
            vals = [json.dumps(v, separators=(",", ":"))
                    if v is not None else None for v in vals]
            cols[k] = pa.array(vals, pa.string())
        else:
            cols[k] = pa.array(vals)
    # mapped-but-absent fields become typed null columns: strict mode
    # rejects UNKNOWN doc keys, not missing ones
    typed_null = {"text": pa.string(), "i64": pa.int64(), "u64": pa.uint64(),
                  "f64": pa.float64(), "bool": pa.bool_(),
                  "datetime": pa.timestamp("us"), "bytes": pa.binary(),
                  "ip": pa.string(), "json": pa.string()}
    for f in mapping.field_mappings:
        if f.name not in cols:
            cols[f.name] = pa.nulls(len(docs), typed_null.get(f.type, pa.string()))
    return pa.table(cols)


def ingest_docs(index_dir: str, docs: list[dict[str, Any]], *,
                commit_id: Optional[str] = None) -> int:
    """Build one split from pushed docs and publish atomically. Passing a
    ``commit_id`` makes the call idempotent (replayed commit ids no-op,
    the ingest-v2 shard-position analog). Returns docs indexed."""
    from quickwit_ray.config import IndexConfig
    from quickwit_ray.index.writer import SplitBuilder
    from quickwit_ray.state.manifest import Manifest

    if not docs:
        return 0
    manifest = Manifest(index_dir)
    if manifest.index_config_json is None:
        raise FileNotFoundError(f"no index at {index_dir}")
    config = IndexConfig.from_json(manifest.index_config_json)
    partition = (f"ingest:{commit_id}" if commit_id is not None
                 else f"ingest:{time.time_ns()}")
    if manifest.is_partition_committed(partition):
        return 0
    table = _docs_to_table(docs, config.doc_mapping)
    builder = SplitBuilder(config, index_dir, partition, 0)
    builder.add_batch(table)
    sm = builder.flush()
    manifest.publish([sm] if sm else [], checkpoint_partition=partition)
    return len(docs)
