"""Native REST API — index + source management and native search.

Re-expresses the reference's non-ES REST surface
(`quickwit-serve/src/index_api/rest_handler.rs`: GET/POST /indexes,
GET/PUT/DELETE /indexes/{id}, PUT /indexes/{id}/clear, GET .../describe,
source CRUD + toggle + reset-checkpoint; and
`quickwit-serve/src/search_api/rest_handler.rs`: GET {index}/search with
query/max_hits/start_offset/sort_by/timestamps) over the same registry of
:class:`Index` objects the ES dispatcher serves. The two services SHARE
the registry dict, so an index created here is immediately searchable via
the ES endpoints too.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

from quickwit_ray.api import Index
from quickwit_ray.search.es_rest import EsApiError, _hit_source
from quickwit_ray.state.manifest import Manifest


def _assert_under_root(path: str, root: str) -> None:
    """Refuse any index directory that escapes the configured root
    (defense in depth behind config.validate_identifier: an id like
    ``..`` or ``a/../..`` must never materialize — or delete — outside
    index_root_dir)."""
    rp, rr = os.path.realpath(path), os.path.realpath(root)
    if not rp.startswith(rr + os.sep):
        raise EsApiError(400, f"index path {path!r} escapes the index "
                         "root directory")


class StreamingResponse:
    """Chunked byte-stream response: the HTTP layer sends each yielded
    chunk with ``Transfer-Encoding: chunked`` (the reference streams
    CSV/RowBinary per split leaf, search_stream/leaf.rs:51-356) — the
    export never materializes on the serving node. ``.data`` drains the
    stream for offline/service callers (tests, small results)."""

    def __init__(self, chunk_factory, content_type: str):
        self._factory = chunk_factory  # zero-arg callable -> byte iterator
        self.content_type = content_type

    def chunks(self):
        return self._factory()

    @property
    def data(self) -> bytes:
        return b"".join(self.chunks())


class RawResponse:
    """Non-JSON payload (the stream endpoint's CSV / RowBinary bytes)."""

    def __init__(self, data: bytes, content_type: str):
        self.data = data
        self.content_type = content_type


class IndexApiService:
    """Routes (method, endpoint, params, body) for the native API.

    ``indexes`` is the SHARED registry (pass the EsRestService's dict,
    not a copy). ``index_root_dir`` is where POST /indexes materializes
    new index directories (default_index_root_uri analog); creation is
    rejected when unset.
    """

    def __init__(self, indexes: dict[str, Index],
                 index_root_dir: Optional[str] = None):
        self.indexes = indexes
        self.index_root_dir = index_root_dir

    # -- entry ------------------------------------------------------------

    def request(self, method: str, endpoint: str,
                params: Optional[dict] = None,
                body: Any = None) -> tuple[int, Any]:
        try:
            return 200, self._route(method.upper(), endpoint.strip("/"),
                                    dict(params or {}), body)
        except EsApiError as e:
            return e.status, e.body()
        except (ValueError, KeyError, TypeError) as e:
            # NOTE: AttributeError/IndexError deliberately NOT caught —
            # the parse-boundary wrappers (es_dsl, body validation)
            # already convert parse-shaped failures to ValueError, so
            # those escaping here are internal bugs that must reach the
            # server's last-resort 500, not masquerade as client 400s.
            # malformed request shapes (non-dict bodies, lists where
            # objects are required) are client errors: 400, never 500
            return 400, {"status": 400,
                         "error": {"reason": f"Invalid argument: {e}"}}

    def handles(self, endpoint: str) -> bool:
        parts = endpoint.strip("/").split("/")
        return (parts[0] in ("indexes", "otlp", "version", "cluster",
                             "health", "metrics", "developer")
                or (len(parts) >= 2 and parts[1] in ("search", "search-plan",
                                                     "otlp", "jaeger",
                                                     "delete-tasks")))

    @staticmethod
    def wants_raw_body(endpoint: str) -> bool:
        """OTLP endpoints take protobuf (or JSON) BYTES — the HTTP layer
        must not pre-parse the body. Segment-exact so an index merely
        NAMED '*otlp' keeps normal JSON parsing."""
        parts = endpoint.strip("/").split("/")
        return parts[0] == "otlp" or (len(parts) >= 2 and parts[1] == "otlp")

    # -- routing ----------------------------------------------------------

    def _route(self, method: str, endpoint: str, params: dict,
               body: Any) -> Any:
        parts = endpoint.split("/")
        if parts[0] == "indexes":
            return self._route_indexes(method, parts[1:], params, body)
        if len(parts) == 2 and parts[1] == "search":
            return self._search(parts[0], params, body or {})
        if len(parts) == 3 and parts[1:] == ["search", "stream"]:
            return self._search_stream(parts[0], params)
        if len(parts) == 2 and parts[1] == "search-plan":
            return self._search_plan(parts[0], params, body or {})
        if len(parts) >= 3 and parts[1] == "jaeger" and parts[2] == "api":
            return self._jaeger(parts[0], parts[3:], params)
        if len(parts) == 2 and parts[1] == "delete-tasks":
            return self._delete_tasks(method, parts[0], body)
        if parts[0] == "version":
            return {"build": {"version": "0.8.0-quickwit-ray",
                              "commit_date": "", "commit_hash": ""}}
        if parts[0] == "cluster":
            # cluster snapshot (cluster_api/mod.rs shape subset): this
            # process is the root node; under execution="ray" the shared
            # leaf actor pool members are the live LEAF searcher nodes
            # (membership = Ray actor liveness, the chitchat analog)
            import quickwit_ray.search.engine as _eng

            leaf_nodes = []
            if _eng._SHARED_ACTOR_POOL is not None:
                leaf_nodes = [f"leaf-{i}" for i in
                              range(len(_eng._SHARED_ACTOR_POOL.actors))]
            nodes = ["node-1"] + leaf_nodes
            return {"cluster_id": "quickwit-ray", "self_node_id": "node-1",
                    "live_nodes": nodes, "ready_nodes": nodes,
                    "search_execution": _eng._DEFAULT_EXECUTION,
                    "num_indexes": len(self.indexes)}
        if parts[0] == "health" and len(parts) == 2 \
                and parts[1] in ("livez", "readyz"):
            return True  # the reference returns a bare JSON boolean
        if parts[0] == "metrics":
            return self._metrics()
        if parts[0] == "developer":
            return self._developer(parts[1:], params)
        if parts[0] == "otlp" and len(parts) == 3 and parts[1] == "v1":
            return self._otlp(None, parts[2], body, params)
        if len(parts) == 4 and parts[1] == "otlp" and parts[2] == "v1":
            return self._otlp(parts[0], parts[3], body, params)
        raise EsApiError(400, f"unsupported endpoint {endpoint!r}")

    def _route_indexes(self, method: str, parts: list[str], params: dict,
                       body: Any) -> Any:
        if not parts or parts == [""]:
            if method == "GET":
                return [self._metadata(n) for n in sorted(self.indexes)]
            if method == "POST":
                return self._create(body or {})
        elif len(parts) == 1:
            name = parts[0]
            if method == "GET":
                return self._metadata(self._name(name))
            if method == "PUT":
                idx = self._idx(name)
                idx.update_config(api_json=body or {})
                return self._metadata(name)
            if method == "DELETE":
                return self._delete(name)
        elif len(parts) == 2 and parts[1] == "clear" and method == "PUT":
            self._idx(parts[0]).clear()
            return {"acknowledged": True}
        elif len(parts) == 2 and parts[1] == "describe" and method == "GET":
            return self._idx(parts[0]).describe()
        elif len(parts) >= 2 and parts[1] == "sources":
            return self._route_sources(method, parts[0], parts[2:], body)
        elif len(parts) == 2 and parts[1] == "splits" and method == "GET":
            return self._splits(parts[0], params)
        elif len(parts) == 3 and parts[1] == "splits" \
                and parts[2] == "mark-for-deletion" and method == "PUT":
            ids = (body or {}).get("split_ids", [])
            Manifest(self._idx(parts[0]).index_dir).mark_for_deletion(ids)
            return {"acknowledged": True}
        raise EsApiError(
            400, f"unsupported endpoint indexes/{'/'.join(parts)!r}")

    def _route_sources(self, method: str, name: str, rest: list[str],
                       body: Any) -> Any:
        idx = self._idx(name)
        if not rest:
            if method == "GET":
                return idx.list_sources()
            if method == "POST":
                return idx.add_source(body or {})
        elif len(rest) == 1:
            if method == "DELETE":
                idx.delete_source(rest[0])
                return {"acknowledged": True}
            if method == "GET":
                src = Manifest(idx.index_dir).sources.get(rest[0])
                if src is None:
                    raise EsApiError(404, f"no source {rest[0]!r}")
                return src
        elif len(rest) == 2 and rest[1] == "toggle" and method == "PUT":
            idx.toggle_source(rest[0], bool((body or {}).get("enable", True)))
            return {"acknowledged": True}
        elif len(rest) == 2 and rest[1] == "reset-checkpoint" \
                and method == "PUT":
            n = idx.reset_source_checkpoint(rest[0])
            return {"acknowledged": True, "checkpoints_removed": n}
        raise EsApiError(400, "unsupported sources endpoint")

    # -- handlers ----------------------------------------------------------

    def _name(self, name: str) -> str:
        if name not in self.indexes:
            raise EsApiError(404, f"index not found: {name}",
                             type="index_not_found_exception")
        return name

    def _idx(self, name: str) -> Index:
        return self.indexes[self._name(name)]

    def _metadata(self, name: str) -> dict:
        m = Manifest(self.indexes[name].index_dir)
        return {
            "version": "0.8",
            "index_config": m.index_config_json,
            "checkpoint": m.checkpoints,
            "sources": list(m.sources.values()),
        }

    def _create(self, payload: dict) -> dict:
        from quickwit_ray.config import index_config_from_api_json

        if self.index_root_dir is None:
            raise EsApiError(400, "index creation is disabled: the server "
                             "was started without an index root dir")
        try:
            cfg = index_config_from_api_json(payload)
        except ValueError as e:
            raise EsApiError(400, str(e))
        if cfg.index_id in self.indexes:
            raise EsApiError(400, f"index {cfg.index_id!r} already exists")
        d = os.path.join(self.index_root_dir, cfg.index_id)
        _assert_under_root(d, self.index_root_dir)
        idx = Index.create(d, cfg.index_id, cfg.doc_mapping,
                           settings=cfg.settings)
        self.indexes[cfg.index_id] = idx
        return self._metadata(cfg.index_id)

    def _delete(self, name: str) -> dict:
        idx = self.indexes.pop(self._name(name))
        # never rmtree a directory that is not actually an index root
        # (metastore presence == index exists; manifest.json for the file
        # backend, metastore.db/json for the sqlite/postgres backends); a
        # registration pointing at anything else must not take the tree
        # with it
        if not any(os.path.exists(os.path.join(idx.index_dir, f))
                   for f in ("manifest.json", "metastore.db",
                             "metastore.json")):
            raise EsApiError(
                500, f"refusing to delete {idx.index_dir}: no metastore "
                "(not an index directory)")
        # purge shared-metastore rows BEFORE the dir (and its DSN
        # pointer) disappears, or a pg-backed index could never be
        # recreated at the same path
        Manifest(idx.index_dir).drop()
        shutil.rmtree(idx.index_dir, ignore_errors=True)
        return {"acknowledged": True}

    def _splits(self, name: str, params: dict) -> dict:
        """Split listing resource (index_api/split_resource.rs: optional
        split-state and timestamp-overlap filters)."""
        m = Manifest(self._idx(name).index_dir)
        states = params.get("split_states")
        wanted = ({s.strip().lower() for s in str(states).split(",")}
                  if states else None)
        lo = params.get("start_timestamp")
        hi = params.get("end_timestamp")
        lo = int(lo) if lo is not None else None
        hi = int(hi) if hi is not None else None
        if wanted is None or wanted == {"published"}:
            splits = m.list_splits(lo, hi)
        else:
            # state filter composes with the timestamp-overlap filter
            # (split_resource.rs ListSplitsQuery)
            splits = [
                s for s in m.splits.values()
                if s.split_state.lower() in wanted
                and not (lo is not None and s.time_range_end is not None
                         and s.time_range_end < lo)
                and not (hi is not None and s.time_range_start is not None
                         and s.time_range_start >= hi)]
        out = [s.to_json() for s in splits]
        return {"splits": out, "total": len(out)}

    def _search_plan(self, name: str, params: dict, body: dict) -> dict:
        """Query planning metadata (search_api search-plan handlers): how
        many splits the request would touch after time/tag pruning."""
        from quickwit_ray.search.ast import (
            extract_tags,
            extract_timestamp_bounds,
        )
        from quickwit_ray.search.engine import get_searcher

        idx = self._idx(name)
        p = {**body, **params}
        s = get_searcher(idx.index_dir)
        node = s._resolve_query(p.get("query", "*"))
        lo = int(p["start_timestamp"]) if p.get("start_timestamp") is not None else None
        hi = int(p["end_timestamp"]) if p.get("end_timestamp") is not None else None
        ts = idx.config.doc_mapping.timestamp_field
        if ts:
            qlo, qhi = extract_timestamp_bounds(node, ts)
            if qlo is not None:
                lo = qlo if lo is None else max(lo, qlo)
            if qhi is not None:
                hi = qhi if hi is None else min(hi, qhi)
        tags = extract_tags(node, idx.config.doc_mapping.tag_fields)
        all_splits = s.manifest.published_splits()
        pruned = s.manifest.list_splits(lo, hi, tags)
        return {
            "quickwit_query_ast": repr(node),
            "num_splits_total": len(all_splits),
            "num_splits_after_pruning": len(pruned),
            "split_ids": sorted(x.split_id for x in pruned),
            "start_timestamp": lo, "end_timestamp": hi,
        }

    def _delete_tasks(self, method: str, name: str, body: Any):
        """Delete-task API (delete_task_api/handler.rs: POST creates a
        stored delete query with optional search fields / timestamp
        bounds folded into the query; GET lists pending tasks)."""
        idx = self._idx(name)
        if method == "GET":
            return Manifest(idx.index_dir).delete_tasks
        if method == "POST":
            b = dict(body or {})
            q = b.get("query")
            if not q:
                raise EsApiError(400, "`query` is required")
            fields = b.get("search_fields") or []
            if fields:
                q = " OR ".join(f"{f}:({q})" for f in fields)
            ts = idx.config.doc_mapping.timestamp_field
            lo, hi = b.get("start_timestamp"), b.get("end_timestamp")
            if (lo is not None or hi is not None):
                if ts is None:
                    raise EsApiError(400, "index has no timestamp field")
                if lo is not None:
                    q = f"({q}) AND {ts}:>={int(lo)}"
                if hi is not None:
                    q = f"({q}) AND {ts}:<{int(hi)}"
            opstamp = idx.create_delete_task(q)
            return {"opstamp": opstamp, "query": q}
        raise EsApiError(400, "unsupported delete-tasks method")

    def _developer(self, parts: list[str], params: dict) -> Any:
        """Developer API (quickwit-serve/src/developer_api): `/debug`
        dumps the node's internal state; `/log-level?level=` retunes the
        process logger (single-node analog of the env-filter reload)."""
        import fnmatch
        import logging

        if parts and parts[0] == "debug":
            pat = (params.get("node_ids") or "*").split(",")
            if not any(fnmatch.fnmatchcase("node-1", p.strip().lower())
                       for p in pat):
                return {}
            from quickwit_ray.search.permits import get_permit_provider

            out: dict = {"node_id": "node-1", "indexes": {}}
            from quickwit_ray.state.manifest import Manifest

            for name, idx in sorted(self.indexes.items()):
                try:
                    m = Manifest(idx.index_dir)
                    splits = m.published_splits()
                    out["indexes"][name] = {
                        "num_splits": len(splits),
                        "num_docs": int(sum(s.num_docs for s in splits)),
                        "num_delete_tasks": len(m.delete_tasks),
                    }
                except Exception as e:  # noqa: BLE001 — debug must not 500
                    out["indexes"][name] = {"error": str(e)}
            p = get_permit_provider()
            out["search_permits"] = {
                "memory_budget": p.memory_budget,
                "peak_allocated": p.peak_allocated,
                "peak_in_flight": p.peak_in_flight}
            return out
        if parts and parts[0] == "log-level":
            level = str(params.get("level", "")).upper()
            if level not in ("DEBUG", "INFO", "WARNING", "WARN", "ERROR"):
                raise ValueError(f"unsupported log level {level!r}")
            logging.getLogger("quickwit_ray").setLevel(
                "WARNING" if level == "WARN" else level)
            return RawResponse(f"set log level to {level}\n".encode(),
                               "text/plain")
        raise KeyError(f"unsupported developer endpoint {'/'.join(parts)!r}")

    def _metrics(self) -> RawResponse:
        """Prometheus text exposition of per-index state (a pragmatic
        subset of the reference's /metrics — quickwit-common metrics)."""
        lines = [
            "# TYPE quickwit_index_num_docs gauge",
            "# TYPE quickwit_index_num_splits gauge",
            "# TYPE quickwit_index_size_bytes gauge",
        ]
        for name in sorted(self.indexes):
            m = Manifest(self.indexes[name].index_dir)
            splits = m.published_splits()
            lines.append(f'quickwit_index_num_docs{{index="{name}"}} '
                         f"{sum(s.num_docs for s in splits)}")
            lines.append(f'quickwit_index_num_splits{{index="{name}"}} '
                         f"{len(splits)}")
            lines.append(f'quickwit_index_size_bytes{{index="{name}"}} '
                         f"{sum(s.uncompressed_docs_size_in_bytes for s in splits)}")
        return RawResponse(("\n".join(lines) + "\n").encode(),
                           "text/plain; version=0.0.4")

    def _jaeger(self, name: str, rest: list[str], params: dict):
        """Jaeger HTTP query API over a traces index
        (jaeger_api/rest_handler.rs paths {index}/jaeger/api/...)."""
        from quickwit_ray.search.jaeger import JaegerService

        svc = JaegerService(self._idx(name))
        if rest == ["services"]:
            return svc.services()
        if len(rest) == 3 and rest[0] == "services" \
                and rest[2] == "operations":
            sk = params.get("spanKind")
            return svc.operations(rest[1],
                                  span_kind=int(sk) if sk is not None
                                  else None)
        if rest == ["traces"]:
            return svc.find_traces(params)
        if len(rest) == 2 and rest[0] == "traces":
            return svc.get_trace(rest[1])
        raise EsApiError(400, "unsupported jaeger endpoint")

    def _otlp(self, name: Optional[str], signal: str, body: Any,
              params: dict) -> dict:
        """OTLP HTTP ingest (otlp_api/rest_handler.rs: POST
        [{index}/]otlp/v1/logs|traces, protobuf or JSON payload; default
        index ids otel-logs-v0_9 / otel-traces-v0_9)."""
        from quickwit_ray.sources.ingest import (
            parse_otlp_logs_json,
            parse_otlp_logs_proto,
            parse_otlp_spans_json,
            parse_otlp_spans_proto,
        )

        if signal not in ("logs", "traces"):
            raise EsApiError(400, f"unknown OTLP signal {signal!r}")
        if name is None:
            name = ("otel-logs-v0_9" if signal == "logs"
                    else "otel-traces-v0_9")
        idx = self._idx(name)
        raw = body if isinstance(body, (bytes, bytearray)) else (
            json.dumps(body).encode() if body is not None else b"")
        ctype = params.get("_content_type", "")
        is_json = ("json" in ctype
                   or (not ctype and raw.lstrip()[:1] == b"{"))
        if signal == "logs":
            docs = (parse_otlp_logs_json(raw) if is_json
                    else parse_otlp_logs_proto(raw))
        else:
            docs = (parse_otlp_spans_json(raw) if is_json
                    else parse_otlp_spans_proto(raw))
        n = idx.ingest_docs(docs)
        # ExportLogsServiceResponse / ExportTraceServiceResponse: empty on
        # full success (partialSuccess omitted)
        return {"num_docs_for_processing": n}

    def _search_stream(self, name: str, params: dict) -> RawResponse:
        """Fast-field export endpoint (search_api/rest_handler.rs
        search_stream_handler: query + fast_field + output_format
        csv|click_house_row_binary + timestamp bounds). The underlying
        pipeline fans one Ray task per split and streams Arrow blocks;
        the HTTP shim drains them into the response body."""
        from quickwit_ray.pipelines.search_stream import (
            export_rowbinary,
            search_stream_index,
        )
        from quickwit_ray.search.ast import BoolQuery, RangeQuery
        from quickwit_ray.search.engine import get_searcher

        idx = self._idx(name)
        fast_field = params.get("fast_field")
        if not fast_field:
            raise EsApiError(400, "`fast_field` is required")
        searcher = get_searcher(idx.index_dir)
        node = searcher._resolve_query(params.get("query", "*"))
        lo = params.get("start_timestamp")
        hi = params.get("end_timestamp")
        if lo is not None or hi is not None:
            ts = idx.config.doc_mapping.timestamp_field
            if ts is None:
                raise EsApiError(400, "index has no timestamp field")
            rng = RangeQuery(ts,
                             gte=int(lo) if lo is not None else None,
                             lt=int(hi) if hi is not None else None)
            node = BoolQuery(must=(node,), filter=(rng,))
        fmt = params.get("output_format", "csv")
        if fmt not in ("csv", "click_house_row_binary",
                       "clickhouse_row_binary"):
            raise EsApiError(400, f"unknown output_format {fmt!r}")
        ds = search_stream_index(idx.index_dir, node, [fast_field])
        binary = fmt != "csv"

        def gen():
            # one encoded chunk per streamed Arrow block — the export is
            # never concatenated on the serving node (a 100x-scale ts
            # export previously OOMed the driver via ds.to_pandas())
            for b in ds.iter_batches(batch_size=None,
                                     batch_format="pandas"):
                if not len(b):
                    continue
                yield (export_rowbinary(b, fast_field) if binary
                       else b.to_csv(index=False, header=False).encode())

        return StreamingResponse(
            gen, "application/octet-stream" if binary else "text/csv")

    def _search(self, name: str, params: dict, body: dict) -> dict:
        """Native search endpoint (search_api/rest_handler.rs
        SearchRequestQueryString -> SearchResponseRest). GET query params
        or an equivalent JSON body."""
        idx = self._idx(name)
        p = {**body, **params}
        sort_by = p.get("sort_by") or p.get("sort_by_field")
        kw: dict[str, Any] = {
            "max_hits": int(p.get("max_hits", 20)),
            "start_offset": int(p.get("start_offset", 0)),
        }
        if sort_by:
            kw["sort_by"] = [s for s in str(sort_by).split(",") if s]
        for t in ("start_timestamp", "end_timestamp"):
            if p.get(t) is not None:
                kw[t] = int(p[t])
        if p.get("snippet_fields"):
            kw["snippet_fields"] = tuple(str(p["snippet_fields"]).split(","))
        resp = idx.search(p.get("query", "*"), **kw)
        mapping = idx.config.doc_mapping
        hits = [_hit_source(row, mapping)
                for row in resp.hits.to_dict("records")]
        out = {
            "num_hits": int(resp.num_hits),
            "hits": hits,
            "elapsed_time_micros": int(resp.elapsed_sec * 1e6),
            "errors": [str(f) for f in resp.failed_splits],
        }
        if resp.aggs is not None:
            out["aggregations"] = resp.aggs
        return out
