"""Quickwit-native REST surface (offline dispatcher).

Mirrors the reference's index-management + search handlers
(`quickwit-serve/src/index_api/rest_handler.rs` and
`search_api/rest_handler.rs`: ``POST /indexes``, ``DELETE
/indexes/{id}``, ``POST /{index}/ingest``, ``GET /{index}/search``)
minus the HTTP socket — the same (method, endpoint, params, body,
ndjson) -> (status, payload) contract as ``EsRestService``, used by the
offline replay of the reference's rest-api-tests native suites
(qw_search_api / tag_fields / default_search_fields / concat_fields).

Indexes are created on demand under a root directory from the PUBLIC
index-config JSON (`config.index_config_from_api_json`); invalid
configs surface as HTTP 400 exactly where the reference's serde /
validation layer rejects them.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional
from urllib.parse import parse_qsl, unquote

from quickwit_ray.api import Index
from quickwit_ray.config import index_config_from_api_json
from quickwit_ray.search.es_rest import EsApiError, _clean_scalar, _hit_source


class QwRestService:
    """Routes the native API over a directory-backed index registry.

    ES-shaped endpoints (`_bulk`, `{index}/_search`, `_msearch`, ...)
    fall through to an embedded :class:`EsRestService` sharing the SAME
    live registry — one service serves both API roots, exactly like the
    reference's single server mounting /api/v1 and /api/v1/_elastic."""

    def __init__(self, root_dir: Optional[str] = None,
                 extra_indexes: Optional[dict] = None):
        self.root_dir = root_dir
        if root_dir is not None:
            os.makedirs(root_dir, exist_ok=True)
        self.indexes: dict[str, Index] = dict(extra_indexes or {})
        from quickwit_ray.index_api import IndexApiService
        from quickwit_ray.search.es_rest import EsRestService

        self.es = EsRestService({})
        self.es.indexes = self.indexes  # shared live registry
        self.es.index_factory = self._auto_create
        # the wider native surface (sources, splits resource, search-plan,
        # search/stream, otlp, jaeger, delete-tasks, node endpoints) —
        # same live registry; endpoints this front doesn't route fall
        # through to it
        self.native = IndexApiService(self.indexes, index_root_dir=root_dir)
        # index templates (index_template.rs): pattern-matched configs
        # that auto-create an index on first ingest to a matching name
        self.templates: dict[str, dict] = {}

    # -- entry ----------------------------------------------------------

    def request(self, method: str, endpoint: str,
                params: Optional[dict] = None, body: Any = None,
                ndjson: Optional[list] = None) -> tuple[int, Any]:
        params = dict(params or {})
        endpoint = unquote(endpoint).strip("/")
        if "?" in endpoint:
            endpoint, qs = endpoint.split("?", 1)
            params.update(dict(parse_qsl(qs)))
        if endpoint.startswith("api/developer/"):
            # the reference mounts the developer API at /api/developer,
            # OUTSIDE the /api/v1 prefix (developer_api/mod.rs)
            endpoint = endpoint[len("api/"):]
        parts = endpoint.split("/")
        if (endpoint == "" or parts[0].startswith("_")
                or (len(parts) >= 2 and parts[1].startswith("_"))
                or (method.upper() == "DELETE" and len(parts) == 1
                    and parts[0] not in ("indexes", "templates"))):
            # ES-shaped endpoint -> the embedded ES dispatcher (its own
            # error-body format)
            return self.es.request(method, endpoint, params, body, ndjson)
        try:
            return 200, self._route(method.upper(), endpoint, params,
                                    body, ndjson)
        except EsApiError as e:
            # the native REST error body is {"message": ...}
            # (quickwit-serve rest error format)
            return e.status, {"message": e.reason}
        except (ValueError, KeyError, TypeError) as e:
            # NOTE: AttributeError/IndexError deliberately NOT caught —
            # the parse-boundary wrappers (es_dsl, body validation)
            # already convert parse-shaped failures to ValueError, so
            # those escaping here are internal bugs that must reach the
            # server's last-resort 500, not masquerade as client 400s.
            # malformed request shapes are client errors: 400, never 500
            return 400, {"message": f"Invalid argument: {e}"}

    # -- routing --------------------------------------------------------

    def _route(self, method: str, endpoint: str, params: dict, body: Any,
               ndjson: Optional[list]) -> Any:
        parts = endpoint.split("/")
        if parts[0] == "indexes":
            if method == "POST" and len(parts) == 1:
                return self._create(body or {})
            if method == "DELETE" and len(parts) == 2:
                return self._delete(parts[1])
            if method == "GET" and len(parts) == 2:
                idx = self._index(parts[1])
                return {"index_config": idx.config.to_json()}
            if method == "PUT" and len(parts) == 3 and parts[2] == "clear":
                # index_api clear handler: drop splits + checkpoints,
                # keep the config
                n = self._index(parts[1]).clear()
                return {"acknowledged": True, "num_splits_dropped": n}
            if method == "GET" and len(parts) == 3 and parts[2] == "describe":
                return self._index(parts[1]).describe()
            return self.native._route(method, endpoint, params, body)
        if parts[0] == "templates":
            if method == "GET" and len(parts) == 1:
                # list_index_templates (template_api/rest_handler.rs)
                return sorted(self.templates.values(),
                              key=lambda t: t["template_id"])
            if method == "POST" and len(parts) == 1:
                tpl = self._validate_template(body or {})
                if tpl["template_id"] in self.templates:
                    raise EsApiError(
                        400, f"index template {tpl['template_id']!r} "
                        "already exists")
                self.templates[tpl["template_id"]] = tpl
                return tpl
            if method == "PUT" and len(parts) == 2:
                # update_index_template: the path id OVERRIDES any id in
                # the body, then create-with-overwrite
                # (template_api/rest_handler.rs update_index_template)
                tpl = self._validate_template(
                    dict(body or {}, template_id=parts[1]))
                self.templates[tpl["template_id"]] = tpl
                return tpl
            if method == "DELETE" and len(parts) == 2:
                if self.templates.pop(parts[1], None) is None:
                    raise EsApiError(404,
                                     f"template not found: {parts[1]}")
                return {"acknowledged": True}
            if method == "GET" and len(parts) == 2:
                t = self.templates.get(parts[1])
                if t is None:
                    raise EsApiError(404,
                                     f"template not found: {parts[1]}")
                return t
            raise EsApiError(400, f"unsupported endpoint {endpoint!r}")
        if len(parts) == 2 and parts[1] == "ingest" and method == "POST":
            return self._ingest(parts[0], ndjson or [])
        if len(parts) == 2 and parts[1] == "search":
            return self._search(parts[0], params,
                                body if isinstance(body, dict) else {})
        # everything else (search/stream, search-plan, otlp, jaeger,
        # delete-tasks, version/cluster/health/metrics) -> wide surface
        return self.native._route(method, endpoint, params, body)

    def _index(self, name: str) -> Index:
        idx = self.indexes.get(name)
        if idx is None:
            raise EsApiError(404, f"index not found: {name}")
        return idx

    # -- index management ----------------------------------------------

    def _create(self, body: dict) -> dict:
        if self.root_dir is None:
            raise EsApiError(400, "index creation is disabled: the server "
                             "was started without an index root dir")
        try:
            cfg = index_config_from_api_json(body)
        except ValueError as e:
            raise EsApiError(400, str(e))
        if cfg.index_id in self.indexes:
            raise EsApiError(400, f"index {cfg.index_id!r} already exists")
        d = os.path.join(self.root_dir, cfg.index_id)
        from quickwit_ray.index_api import _assert_under_root
        _assert_under_root(d, self.root_dir)
        try:
            # NEVER clobber an on-disk index that merely isn't registered
            # (e.g. after a server restart): Index.create refuses
            self.indexes[cfg.index_id] = Index.create(
                d, cfg.index_id, cfg.doc_mapping, settings=cfg.settings)
        except FileExistsError:
            raise EsApiError(
                400, f"index {cfg.index_id!r} already exists on disk at "
                f"{d} — open/serve it or DELETE it first")
        return {"index_config": {"index_id": cfg.index_id}}

    def _auto_create(self, name: str) -> Optional[Index]:
        """Index-template auto-creation hook for `_bulk` to an unknown
        index: the first template whose pattern matches the name creates
        it with the template's doc mapping. An index already ON DISK at
        the target path (unregistered after a restart) is opened, never
        clobbered."""
        if self.root_dir is None:
            return None  # creation disabled: no index root dir configured
        from quickwit_ray.config import validate_identifier
        try:
            validate_identifier("index", name)
        except ValueError:
            return None  # traversal-shaped names never auto-create
        tpl = self._find_matching_template(name)
        if tpl is not None:
            cfg = index_config_from_api_json(
                {"index_id": name,
                 "doc_mapping": tpl.get("doc_mapping") or {},
                 "indexing_settings": tpl.get("indexing_settings"),
                 "retention": tpl.get("retention"),
                 "search_settings": tpl.get("search_settings")})
            d = os.path.join(self.root_dir, name)
            try:
                return Index.create(d, name, cfg.doc_mapping,
                                    settings=cfg.settings)
            except FileExistsError:
                return Index.open(d)
        return None

    def _validate_template(self, body: dict) -> dict:
        """IndexTemplate.validate (index_template/mod.rs:81-99):
        identifier-checked template_id, >= 1 pattern, every pattern
        validated with negatives allowed; priority defaults to 0."""
        from quickwit_ray.config import (validate_identifier,
                                         validate_index_id_pattern)
        tpl = dict(body)
        try:
            validate_identifier("template", tpl.get("template_id"))
            patterns = tpl.get("index_id_patterns") or []
            if not isinstance(patterns, (list, tuple)) or not patterns:
                raise ValueError("`index_id_patterns` must not be empty")
            for p in patterns:
                validate_index_id_pattern(p, allow_negative=True)
            prio = tpl.setdefault("priority", 0)
            if not isinstance(prio, int) or prio < 0:
                raise ValueError("`priority` must be a non-negative "
                                 "integer")
        except ValueError as e:
            raise EsApiError(400, f"invalid index template: {e}")
        return tpl

    def _find_matching_template(self, name: str) -> Optional[dict]:
        """First match by (-priority, template_id) order; a template
        matches when any positive pattern matches AND no negative
        (``-``-prefixed) pattern does (file_backed/index_template_matcher
        .rs + index_id_matcher.rs is_match)."""
        import fnmatch

        for tpl in sorted(self.templates.values(),
                          key=lambda t: (-t.get("priority", 0),
                                         t.get("template_id", ""))):
            pats = tpl.get("index_id_patterns", ())
            pos = [p for p in pats if not p.startswith("-")]
            neg = [p[1:] for p in pats if p.startswith("-")]
            if (any(fnmatch.fnmatchcase(name, p) for p in pos)
                    and not any(fnmatch.fnmatchcase(name, p)
                                for p in neg)):
                return tpl
        return None

    def _delete(self, name: str) -> dict:
        # shared path: purges SQL-metastore rows + the index dir itself
        # (works for extra_indexes living outside root_dir too)
        return self.native._delete(name)

    # -- ingest ---------------------------------------------------------

    def _ingest(self, name: str, docs: list) -> dict:
        idx = self._index(name)
        ts_field = idx.config.doc_mapping.timestamp_field
        valid = []
        rejected = 0
        for d in docs:
            if not isinstance(d, dict):
                rejected += 1
                continue
            # the doc processor rejects docs missing the timestamp field
            # (doc_processor.rs: a time-series index needs every doc on
            # the time axis for split pruning)
            if ts_field and d.get(ts_field) is None:
                rejected += 1
                continue
            valid.append(d)
        if valid:
            idx.ingest_docs(valid)
        return {"num_docs_for_processing": len(docs),
                "num_rejected_docs": rejected}

    # -- search ---------------------------------------------------------

    def _search(self, name: str, params: dict, body: dict) -> dict:
        idx = self._index(name)
        q = params.get("query", body.get("query", "*"))
        kw: dict[str, Any] = {}
        mh = params.get("max_hits", body.get("max_hits"))
        kw["max_hits"] = int(mh) if mh is not None else 20
        so = params.get("start_offset", body.get("start_offset"))
        if so is not None:
            kw["start_offset"] = int(so)
        # the public API takes unix SECONDS; fast columns hold micros
        for p in ("start_timestamp", "end_timestamp"):
            v = params.get(p, body.get(p))
            if v is not None:
                kw[p] = int(v) * 1_000_000
        sort = params.get("sort_by", params.get("sort_by_field",
                                                body.get("sort_by")))
        if sort:
            # "+field,-other" strings; engine._normalize_sort handles the
            # +/- prefixes with the reference's default (bare = desc)
            kw["sort_by"] = [p.strip() for p in str(sort).split(",")
                             if p.strip()]
        resp = idx.search(q, **kw)
        hits = []
        for row in resp.hits.to_dict("records"):
            src = _hit_source(row, idx.config.doc_mapping)
            hits.append({k: _clean_scalar(v) for k, v in src.items()})
        return {
            "num_hits": int(resp.num_hits),
            "hits": hits,
            "elapsed_time_micros": int(resp.elapsed_sec * 1e6),
            "errors": [],
        }
