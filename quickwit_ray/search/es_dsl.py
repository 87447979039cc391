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


def _parse_java_date(value: str, fmt: str) -> int:
    """Range `format` override: translate the java-time pattern the
    reference accepts (range_query.rs `format`) to strptime and return
    epoch micros. Quoted runs ('T') are literals; SSS… is the fraction."""
    import re
    from datetime import datetime, timezone

    out = []
    i = 0
    mapping = [("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"), ("HH", "%H"),
               ("mm", "%M"), ("ss", "%S")]
    while i < len(fmt):
        if fmt[i] == "'":  # quoted literal
            j = fmt.index("'", i + 1)
            out.append(fmt[i + 1:j])
            i = j + 1
            continue
        m = re.match(r"S+", fmt[i:])
        if m:
            out.append("%f")
            i += m.end()
            continue
        for pat, rep in mapping:
            if fmt.startswith(pat, i):
                out.append(rep)
                i += len(pat)
                break
        else:
            out.append(fmt[i])
            i += 1
    dt = datetime.strptime(value, "".join(out))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def _mark_lenient(node: Any) -> Any:
    """Propagate query_string `lenient` down the parsed AST: full-text
    leaves on unknown fields match nothing instead of erroring."""
    from dataclasses import replace

    if isinstance(node, FullTextQuery):
        return replace(node, lenient=True)
    if isinstance(node, BoolQuery):
        return BoolQuery(
            must=tuple(_mark_lenient(n) for n in node.must),
            must_not=tuple(_mark_lenient(n) for n in node.must_not),
            should=tuple(_mark_lenient(n) for n in node.should),
            filter=tuple(_mark_lenient(n) for n in node.filter),
            minimum_should_match=node.minimum_should_match)
    if isinstance(node, BoostQuery):
        return BoostQuery(query=_mark_lenient(node.query), boost=node.boost)
    return node


def _one_entry(body: dict) -> tuple[str, Any]:
    if len(body) != 1:
        raise ValueError(f"expected a single field object, got {list(body)}")
    return next(iter(body.items()))


def _maybe_boost(node: Any, params: Any) -> Any:
    if isinstance(params, dict) and "boost" in params:
        return BoostQuery(query=node, boost=float(params["boost"]))
    return node


def es_query_to_ast(query: dict, default_fields: Sequence[str] = ()) -> Any:
    """Convert one ES query DSL object to our AST.

    This is a parse boundary for untrusted HTTP bodies: any structural
    mismatch in the DSL shape (a list where an object is required, a
    missing mandatory key, a scalar clause body) surfaces as ValueError —
    the reference answers malformed bodies with a 400
    x_content_parse_exception, never a 500 (fuzz-hardened; 30k random
    nested bodies produced 39 distinct uncontrolled exception shapes
    before this wrapper)."""
    try:
        return _es_query_to_ast(query, default_fields)
    except ValueError:
        raise
    except (AttributeError, KeyError, TypeError, IndexError) as e:
        raise ValueError(
            f"parse_exception: malformed query DSL "
            f"({type(e).__name__}: {e})") from e


def _es_query_to_ast(query: dict, default_fields: Sequence[str] = ()) -> Any:
    if not query:
        return MatchAll()
    kind, body = _one_entry(query)

    if kind == "match_all":
        return MatchAll()
    if kind == "match_none":
        return MatchNone()

    if kind == "bool":
        def sub(key):
            items = body.get(key) or []  # explicit nulls are empty clauses
            if isinstance(items, dict):
                items = [items]
            return tuple(es_query_to_ast(i, default_fields) for i in items)

        should = sub("should")
        msm = body.get("minimum_should_match")
        if msm is not None:
            # ES relative forms: "50%" of the should count, negative =
            # count minus that many (bool_query.rs minimum_should_match)
            if isinstance(msm, str) and msm.strip().endswith("%"):
                pct = float(msm.strip()[:-1])
                msm = int(len(should) * pct / 100.0)
            else:
                msm = int(msm)
                if msm < 0:
                    msm = max(len(should) + msm, 0)
        return BoolQuery(must=sub("must"), must_not=sub("must_not"),
                         should=should, filter=sub("filter"),
                         minimum_should_match=msm)

    if kind == "query_string":
        if body.get("fields") is not None and not isinstance(body["fields"], list):
            # ES/quickwit reject a bare-string `fields` (must be an array)
            raise ValueError("query_string `fields` must be an array")
        if body.get("fields") and body.get("default_field"):
            raise ValueError(
                "cannot set both `fields` and `default_field` on query_string")
        fields = body.get("fields") or body.get("default_field") or default_fields
        if isinstance(fields, str):
            fields = [fields]
        node = parse_query(body["query"], fields)
        if body.get("lenient"):
            node = _mark_lenient(node)
        return node

    if kind == "match":
        field, params = _one_entry(body)
        if not isinstance(params, dict):
            params = {"query": params}
        mode = "and" if str(params.get("operator", "or")).lower() == "and" else "or"
        node = FullTextQuery(
            field, str(params["query"]), mode=mode,
            zero_terms_match_all=params.get("zero_terms_query", "none") == "all",
            lenient=bool(params.get("lenient", False)))
        return _maybe_boost(node, params)

    if kind == "match_phrase":
        field, params = _one_entry(body)
        if not isinstance(params, dict):
            params = {"query": params}
        node = FullTextQuery(field, str(params["query"]), mode="phrase",
                             slop=int(params.get("slop", 0)))
        return _maybe_boost(node, params)

    if kind == "match_phrase_prefix":
        field, params = _one_entry(body)
        if not isinstance(params, dict):
            params = {"query": params}
        analyzer = params.get("analyzer")
        if analyzer is not None:
            # validate the analyzer exists (unknown analyzer is a 400)
            from quickwit_ray.functions.tokenizers import tokenize as _tok

            _tok("", str(analyzer))
        return PhrasePrefixQuery(field, str(params["query"]),
                                 max_expansions=int(params.get("max_expansions", 50)),
                                 analyzer=analyzer)

    if kind == "match_bool_prefix":
        field, params = _one_entry(body)
        if not isinstance(params, dict):
            params = {"query": params}
        mode = ("bool_prefix_and"
                if str(params.get("operator", "or")).lower() == "and"
                else "bool_prefix")
        return FullTextQuery(field, str(params["query"]), mode=mode)

    if kind == "multi_match":
        fields = body["fields"]
        if isinstance(fields, str):
            fields = [fields]
        if not fields:
            raise ValueError("multi_match requires a non-empty `fields` list")
        text = str(body["query"])
        # quickwit's multi_match always tolerates unmappable fields in the
        # list (multi_match.rs) — `lenient` affects only value coercion
        lenient = True
        qtype = body.get("type", "most_fields")
        if qtype == "phrase":
            nodes = tuple(FullTextQuery(f, text, mode="phrase",
                                        slop=int(body.get("slop", 0)),
                                        lenient=lenient) for f in fields)
        elif qtype == "phrase_prefix":
            nodes = tuple(PhrasePrefixQuery(f, text) for f in fields)
        elif qtype == "bool_prefix":
            nodes = tuple(FullTextQuery(f, text, mode="bool_prefix",
                                        lenient=lenient) for f in fields)
        else:  # best_fields / most_fields / cross_fields -> disjunction
            nodes = tuple(FullTextQuery(f, text, lenient=lenient)
                          for f in fields)
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
        fmt = params.get("format")
        bounds = {k: params.get(k) for k in ("gte", "gt", "lte", "lt")}
        if fmt:
            bounds = {k: (_parse_java_date(v, fmt) if isinstance(v, str)
                          else v) for k, v in bounds.items()}
        return RangeQuery(field, gte=bounds["gte"], gt=bounds["gt"],
                          lte=bounds["lte"], lt=bounds["lt"])

    if kind == "exists":
        if not isinstance(body, dict) or "field" not in body:
            # ES rejects `exists: "fieldname"` shorthand
            raise ValueError("exists query requires an object with `field`")
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
    """Convert an ES `_search` request body to IndexSearcher.search
    kwargs. Same parse-boundary contract as es_query_to_ast: malformed
    shapes raise ValueError, never leak raw Type/Attribute errors."""
    try:
        return _es_search_request(body, default_fields)
    except ValueError:
        raise
    except (AttributeError, KeyError, TypeError, IndexError) as e:
        raise ValueError(
            f"parse_exception: malformed search request "
            f"({type(e).__name__}: {e})") from e


def _es_search_request(body: dict, default_fields: Sequence[str]) -> dict:
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
        # ES coerces string cursor values to the sort field's type
        # ("search_after": ["5688"] behaves like [5688]) — int when
        # integral so u64/i64-magnitude cursors stay exact
        def _coerce_cursor(v):
            if isinstance(v, str):
                try:
                    return int(v)
                except ValueError:
                    try:
                        return float(v)
                    except ValueError:
                        return v
            return v

        kwargs["search_after"] = tuple(_coerce_cursor(v)
                                       for v in body["search_after"])
    return kwargs
