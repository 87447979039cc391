"""Snippet generation — highlighted fragments for requested fields from
the stored doc + the query's terms (reference:
`quickwit-search/src/fetch_docs.rs:269-352`)."""

from __future__ import annotations

import re
from typing import Any

import pandas as pd

from quickwit_ray.config import DocMapping
from quickwit_ray.functions.tokenizers import tokenize
from quickwit_ray.search.ast import FullTextQuery, SearchRequest, TermQuery

MAX_FRAGMENT_CHARS = 150


def _query_terms_per_field(node: Any, mapping: DocMapping) -> dict[str, set[str]]:
    out: dict[str, set[str]] = {}
    if isinstance(node, TermQuery):
        out.setdefault(node.field, set()).add(node.value)
    elif isinstance(node, FullTextQuery):
        fm = mapping.resolve_field(node.field)
        out.setdefault(node.field, set()).update(tokenize(node.text, fm.tokenizer))
    for attr in ("must", "should", "filter"):
        for sub in getattr(node, attr, ()):
            for f, ts in _query_terms_per_field(sub, mapping).items():
                out.setdefault(f, set()).update(ts)
    if getattr(node, "query", None) is not None:
        for f, ts in _query_terms_per_field(node.query, mapping).items():
            out.setdefault(f, set()).update(ts)
    return out


def make_snippet(text: str, terms: set[str]) -> str:
    """First fragment containing a query term, with <b></b> highlights."""
    if not text or not terms:
        return ""
    pat = re.compile(r"(" + "|".join(re.escape(t) for t in sorted(terms, key=len,
                                                                  reverse=True)) + r")",
                     re.IGNORECASE)
    m = pat.search(text)
    if not m:
        return ""
    start = max(0, m.start() - MAX_FRAGMENT_CHARS // 3)
    frag = text[start: start + MAX_FRAGMENT_CHARS]
    return pat.sub(r"<b>\1</b>", frag)


def generate_snippets(hits: pd.DataFrame, request: SearchRequest,
                      mapping: DocMapping) -> pd.DataFrame:
    terms_by_field = _query_terms_per_field(request.query, mapping)
    for field in request.snippet_fields:
        terms = terms_by_field.get(field, set())
        if field in hits.columns:
            hits[f"snippet_{field}"] = [make_snippet(str(t), terms)
                                        for t in hits[field]]
    return hits
