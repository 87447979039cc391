"""Query AST — mirrors the reference node set
(`quickwit-query/src/query_ast/mod.rs:53-70`): Term, FullText (match with
Bool/Phrase/BoolPrefix modes), Bool, TermSet, PhrasePrefix, Range,
Wildcard, Regex, FieldPresence, MatchAll/MatchNone/Boost."""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Optional, Sequence, Union

QueryAst = Union[
    "TermQuery", "FullTextQuery", "BoolQuery", "TermSetQuery",
    "PhrasePrefixQuery", "RangeQuery", "WildcardQuery", "RegexQuery",
    "ExistsQuery", "MatchAll", "MatchNone", "BoostQuery",
]


@dataclass(frozen=True)
class TermQuery:
    """Exact term match (post-normalization) on an indexed field."""
    field: str
    value: str


@dataclass(frozen=True)
class FullTextQuery:
    """Match query: tokenize `text` with the field's tokenizer, combine
    per-term postings with OR/AND, or as a phrase with slop
    (`query_ast/full_text_query.rs:36-150`)."""
    field: str
    text: str
    mode: str = "or"  # or | and | phrase | bool_prefix
    slop: int = 0
    zero_terms_match_all: bool = False
    # ES `lenient`: a type mismatch / unknown field matches nothing
    # instead of erroring (match_query.rs lenient)
    lenient: bool = False


@dataclass(frozen=True)
class BoolQuery:
    must: tuple = ()
    must_not: tuple = ()
    should: tuple = ()
    filter: tuple = ()
    minimum_should_match: Optional[int] = None


@dataclass(frozen=True)
class TermSetQuery:
    field: str
    values: tuple


@dataclass(frozen=True)
class PhrasePrefixQuery:
    field: str
    text: str
    max_expansions: int = 50
    # optional analyzer override (ES match_phrase_prefix `analyzer`)
    analyzer: Optional[str] = None


@dataclass(frozen=True)
class RangeQuery:
    """Range over a fast field (range_query.rs). Bounds are python values
    (numbers, ISO datetime strings, or strings)."""
    field: str
    gte: Any = None
    gt: Any = None
    lte: Any = None
    lt: Any = None


@dataclass(frozen=True)
class WildcardQuery:
    field: str
    pattern: str  # with * and ?


@dataclass(frozen=True)
class RegexQuery:
    field: str
    regex: str


@dataclass(frozen=True)
class ExistsQuery:
    field: str


@dataclass(frozen=True)
class MatchAll:
    pass


@dataclass(frozen=True)
class MatchNone:
    pass


@dataclass(frozen=True)
class BoostQuery:
    query: Any = None
    boost: float = 1.0


@dataclass(frozen=True)
class SortField:
    field: str = "_doc"  # _score | _doc | fast field name
    order: str = "desc"  # asc | desc


@dataclass(frozen=True)
class SearchRequest:
    """Mirror of the proto SearchRequest fields we support
    (`quickwit-proto/.../quickwit.search.rs:149-194`)."""
    query: Any = dc_field(default_factory=MatchAll)
    max_hits: int = 10
    start_offset: int = 0
    sort_fields: tuple = ()  # up to 2 SortField; empty = default (_doc desc)
    # time-range bounds on the doc mapping's timestamp field (µs): prune
    # splits AND filter rows within partially-overlapping splits
    start_timestamp: Optional[int] = None
    end_timestamp: Optional[int] = None
    timestamp_field: Optional[str] = None
    aggs: Optional[dict] = None
    search_after: Optional[tuple] = None
    snippet_fields: tuple = ()


def ast_to_json(node: Any) -> dict:
    from dataclasses import asdict, is_dataclass

    if not is_dataclass(node):
        return node
    d = {"type": type(node).__name__}
    for k, v in asdict(node).items():
        if isinstance(v, tuple):
            v = [ast_to_json(x) if hasattr(x, "__dataclass_fields__") else x for x in v]
        elif hasattr(v, "__dataclass_fields__"):
            v = ast_to_json(v)
        d[k] = v
    return d


def collect_term_fields(node: Any, out: Optional[set] = None) -> set:
    """Fields referenced by the query (for warmup / validation)."""
    if out is None:
        out = set()
    if hasattr(node, "field"):
        out.add(node.field)
    for attr in ("must", "must_not", "should", "filter"):
        for sub in getattr(node, attr, ()):
            collect_term_fields(sub, out)
    if getattr(node, "query", None) is not None:
        collect_term_fields(node.query, out)
    return out


def extract_timestamp_bounds(node: Any, ts_field: str) -> tuple[Optional[int], Optional[int]]:
    """Tighten split-pruning timestamp bounds from the query AST
    (root.rs:1476-1601): a top-level (or must/filter-nested) RangeQuery on
    the timestamp field yields [start, end) bounds in epoch micros."""
    import pandas as pd

    def to_us(v: Any) -> Optional[int]:
        if v is None:
            return None
        # bare numbers (including digit strings from the query parser)
        # auto-detect the epoch unit by magnitude (the reference's
        # unix_timestamp semantics) — an ES range bound of 1422748813000
        # is millis, and pruning in raw micros would wrongly discard
        # every split
        from quickwit_ray.functions.datetimes import datetime_value_to_us

        return datetime_value_to_us(v)

    if isinstance(node, RangeQuery) and node.field == ts_field:
        lo = to_us(node.gte) if node.gte is not None else (
            to_us(node.gt) + 1 if node.gt is not None else None)
        hi = to_us(node.lte) + 1 if node.lte is not None else (
            to_us(node.lt) if node.lt is not None else None)
        return lo, hi
    if isinstance(node, BoolQuery):
        lo, hi = None, None
        for sub in tuple(node.must) + tuple(node.filter):
            slo, shi = extract_timestamp_bounds(sub, ts_field)
            if slo is not None:
                lo = slo if lo is None else max(lo, slo)
            if shi is not None:
                hi = shi if hi is None else min(hi, shi)
        return lo, hi
    return None, None


def extract_tags(node: Any, tag_fields: Sequence[str]) -> dict[str, list[str]]:
    """Tag-pruning extraction (tag_pruning.rs:35-60): terms on tag fields
    in a positive position prune splits lacking those tag values."""
    if isinstance(node, TermQuery) and node.field in tag_fields:
        return {node.field: [node.value]}
    if isinstance(node, FullTextQuery) and node.field in tag_fields:
        return {node.field: [node.text]}
    if isinstance(node, TermSetQuery) and node.field in tag_fields:
        return {node.field: list(node.values)}
    if isinstance(node, BoolQuery) and not node.should and not node.must_not:
        out: dict[str, list[str]] = {}
        for sub in tuple(node.must) + tuple(node.filter):
            for k, v in extract_tags(sub, tag_fields).items():
                out.setdefault(k, []).extend(v)
        return out
    return {}
