"""ES-compatible query DSL -> AST adapter (pure Python, no Ray).

Mirrors the reference's adapter set
(`quickwit-query/src/elastic_query_dsl/*.rs`, documented in
`docs/reference/es_compatible_api.md:363-727`): query_string, bool,
range, match, match_phrase, match_phrase_prefix, match_bool_prefix,
multi_match, term, terms, exists, wildcard, regexp, match_all,
match_none, term set boosting via `boost`.
"""

from __future__ import annotations

from typing import Any, Sequence

from quickwit_ray.search.ast import (
    BoolQuery,
    BoostQuery,
    ExistsQuery,
    FullTextQuery,
    MatchAll,
    MatchNone,
    PhrasePrefixQuery,
    RangeQuery,
    RegexQuery,
    TermQuery,
    TermSetQuery,
    WildcardQuery,
)
from quickwit_ray.search.parser import parse_query


def _one_entry(body: dict) -> tuple[str, Any]:
    if len(body) != 1:
        raise ValueError(f"expected a single field object, got {list(body)}")
    return next(iter(body.items()))


def _maybe_boost(node: Any, params: Any) -> Any:
    if isinstance(params, dict) and "boost" in params:
        return BoostQuery(query=node, boost=float(params["boost"]))
    return node


def es_query_to_ast(query: dict, default_fields: Sequence[str] = ()) -> Any:
    """Convert one ES query DSL object to our AST."""
    if not query:
        return MatchAll()
    kind, body = _one_entry(query)

    if kind == "match_all":
        return MatchAll()
    if kind == "match_none":
        return MatchNone()

    if kind == "bool":
        def sub(key):
            items = body.get(key, [])
            if isinstance(items, dict):
                items = [items]
            return tuple(es_query_to_ast(i, default_fields) for i in items)

        msm = body.get("minimum_should_match")
        return BoolQuery(must=sub("must"), must_not=sub("must_not"),
                         should=sub("should"), filter=sub("filter"),
                         minimum_should_match=int(msm) if msm is not None else None)

    if kind == "query_string":
        fields = body.get("fields") or body.get("default_field") or default_fields
        if isinstance(fields, str):
            fields = [fields]
        return parse_query(body["query"], fields)

    if kind == "match":
        field, params = _one_entry(body)
        if isinstance(params, str):
            params = {"query": params}
        mode = "and" if str(params.get("operator", "or")).lower() == "and" else "or"
        node = FullTextQuery(
            field, str(params["query"]), mode=mode,
            zero_terms_match_all=params.get("zero_terms_query", "none") == "all")
        return _maybe_boost(node, params)

    if kind == "match_phrase":
        field, params = _one_entry(body)
        if isinstance(params, str):
            params = {"query": params}
        node = FullTextQuery(field, str(params["query"]), mode="phrase",
                             slop=int(params.get("slop", 0)))
        return _maybe_boost(node, params)

    if kind == "match_phrase_prefix":
        field, params = _one_entry(body)
        if isinstance(params, str):
            params = {"query": params}
        return PhrasePrefixQuery(field, str(params["query"]),
                                 max_expansions=int(params.get("max_expansions", 50)))

    if kind == "match_bool_prefix":
        field, params = _one_entry(body)
        if isinstance(params, str):
            params = {"query": params}
        return FullTextQuery(field, str(params["query"]), mode="bool_prefix")

    if kind == "multi_match":
        fields = body["fields"]
        text = str(body["query"])
        qtype = body.get("type", "most_fields")
        if qtype in ("phrase",):
            nodes = tuple(FullTextQuery(f, text, mode="phrase") for f in fields)
        else:
            nodes = tuple(FullTextQuery(f, text) for f in fields)
        return BoolQuery(should=nodes, minimum_should_match=1)

    if kind == "term":
        field, params = _one_entry(body)
        value = params["value"] if isinstance(params, dict) else params
        return _maybe_boost(TermQuery(field, str(value)), params)

    if kind == "terms":
        entries = {k: v for k, v in body.items() if k != "boost"}
        field, values = _one_entry(entries)
        return _maybe_boost(TermSetQuery(field, tuple(str(v) for v in values)), body)

    if kind == "range":
        field, params = _one_entry(body)
        return RangeQuery(field, gte=params.get("gte"), gt=params.get("gt"),
                          lte=params.get("lte"), lt=params.get("lt"))

    if kind == "exists":
        return ExistsQuery(body["field"])

    if kind == "wildcard":
        field, params = _one_entry(body)
        value = params["value"] if isinstance(params, dict) else params
        return _maybe_boost(WildcardQuery(field, str(value)), params)

    if kind == "regexp":
        field, params = _one_entry(body)
        value = params["value"] if isinstance(params, dict) else params
        return _maybe_boost(RegexQuery(field, str(value)), params)

    raise ValueError(f"unsupported ES query kind {kind!r}")


def es_search_request(body: dict, default_fields: Sequence[str] = ()) -> dict:
    """Convert an ES `_search` request body to IndexSearcher.search kwargs."""
    kwargs: dict[str, Any] = {}
    kwargs["query"] = es_query_to_ast(body.get("query", {}), default_fields)
    kwargs["max_hits"] = int(body.get("size", 10))
    kwargs["start_offset"] = int(body.get("from", 0))
    sort = body.get("sort")
    if sort:
        out = []
        for s in sort if isinstance(sort, list) else [sort]:
            if isinstance(s, str):
                # ES default: asc for fields, desc for _score — applied to
                # BOTH spellings so {"sort": ["price"]} == [{"price": {}}]
                default = "desc" if s == "_score" else "asc"
                out.append(("-" if default == "desc" else "+") + s)
            else:
                f, params = _one_entry(s)
                default = "desc" if f == "_score" else "asc"
                order = (params.get("order", default)
                         if isinstance(params, dict) else params)
                out.append(("-" if order == "desc" else "+") + f)
        kwargs["sort_by"] = out
    if body.get("aggs") or body.get("aggregations"):
        kwargs["aggs"] = body.get("aggs") or body.get("aggregations")
    if body.get("search_after"):
        kwargs["search_after"] = tuple(body["search_after"])
    return kwargs
