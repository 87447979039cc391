"""Quickwit query-language parser (the user-text syntax parsed by
tantivy's query grammar in the reference, `user_input_query.rs:61-68`;
syntax documented in `docs/reference/query-language.md`).

Supported grammar (the subset exercised by the reference's own tests):

    clause   := [+|-] group
    group    := '(' query ')' | term_expr
    term_expr:= field ':' value | value            (default search fields)
    value    := word | word'*'                     (prefix/wildcard)
              | '"phrase text"' ['~' slop]
              | 'IN' '[' v1 v2 ... ']'
              | range:  '[' a 'TO' b ']' / '{' a 'TO' b '}' (incl/excl)
              | '*'                                (match-all / exists)
    query    := clause (('AND'|'OR') clause | clause)*   # bare = should

Semantics: bare clauses are `should`; `+`/`AND` force must; `-`/`NOT`
force must_not — matching the reference's bool assembly where
"title:one nofreq:two" sums both clause scores (tests.rs golden).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

from quickwit_ray.search.ast import (
    BoolQuery,
    ExistsQuery,
    FullTextQuery,
    MatchAll,
    PhrasePrefixQuery,
    RangeQuery,
    TermSetQuery,
    WildcardQuery,
)

_TOKEN_RE = re.compile(r"""
    \s*(
        \( | \) | \[ | \] | \{ | \} |
        "(?:[^"\\]|\\.)*"(?:~\d+)? |
        '(?:[^'\\]|\\.)*'(?:~\d+)? |
        AND\b | OR\b | NOT\b | TO\b | IN\b |
        [+\-] |
        [^\s()\[\]{}:]+ (?: : (?: "(?:[^"\\]|\\.)*"(?:~\d+)?
                                | '(?:[^'\\]|\\.)*'(?:~\d+)?
                                | \[ | \{ | [^\s()\[\]{}]* ) )?
    )""", re.VERBOSE)


class _Tokens:
    def __init__(self, text: str):
        self.toks: list[str] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m or m.end() == pos:
                raise ValueError(f"cannot parse query at: {text[pos:]!r}")
            self.toks.append(m.group(1))
            pos = m.end()
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of query")
        self.i += 1
        return t


def parse_query(text: str, default_fields: Sequence[str] = ()) -> Any:
    text = text.strip()
    if not text or text == "*":
        return MatchAll()
    toks = _Tokens(text)
    node = _parse_bool(toks, default_fields)
    if toks.peek() is not None:
        raise ValueError(f"trailing tokens: {toks.toks[toks.i:]}")
    return node


def _parse_bool(toks: _Tokens, dfields) -> Any:
    must: list = []
    must_not: list = []
    should: list = []
    pending_op: Optional[str] = None
    last_sink = None

    while True:
        t = toks.peek()
        if t is None or t == ")":
            if pending_op is not None:
                # `type:PushEvent OR` — a dangling operator is a syntax
                # error (the reference parser rejects it with 400)
                raise ValueError(f"dangling operator {pending_op!r}")
            break
        if t in ("AND", "OR"):
            toks.next()
            pending_op = t
            continue
        occur = None
        if t in ("+", "-"):
            toks.next()
            occur = t
            t = toks.peek()
        if t == "NOT":
            toks.next()
            occur = "-"
        clause = _parse_group(toks, dfields)
        # an explicit occur prefix wins over the pending operator:
        # `a AND -b` / `NOT a AND NOT b` put b (and a) in must_not —
        # a pure-negative query implicitly matches everything else
        # (qw_search_api/0002_negative_search.yaml)
        if occur == "+":
            must.append(clause)
            last_sink = must
        elif occur == "-":
            must_not.append(clause)
            last_sink = must_not
        elif pending_op == "AND":
            # promote the previous bare clause to must as well
            if last_sink is should and should:
                must.append(should.pop())
            must.append(clause)
            last_sink = must
        elif pending_op == "OR":
            if last_sink is must and must:
                should.append(must.pop())
            should.append(clause)
            last_sink = should
        else:
            should.append(clause)
            last_sink = should
        pending_op = None

    if len(should) == 1 and not must and not must_not:
        return should[0]
    if len(must) == 1 and not should and not must_not:
        return must[0]
    return BoolQuery(must=tuple(must), must_not=tuple(must_not), should=tuple(should))


def _parse_group(toks: _Tokens, dfields) -> Any:
    t = toks.next()
    if t == "(":
        node = _parse_bool(toks, dfields)
        closing = toks.next()
        if closing != ")":
            raise ValueError("expected ')'")
        return node
    return _parse_term_expr(t, toks, dfields)


def _strip_quotes(v: str) -> tuple[str, int]:
    # both "..." and '...' delimit phrases (tantivy query grammar)
    slop = 0
    m = re.match(r'^"((?:[^"\\]|\\.)*)"(?:~(\d+))?$', v)
    if m:
        slop = int(m.group(2) or 0)
        return m.group(1).replace('\\"', '"'), slop
    m = re.match(r"^'((?:[^'\\]|\\.)*)'(?:~(\d+))?$", v)
    if m:
        slop = int(m.group(2) or 0)
        return m.group(1).replace("\\'", "'"), slop
    return v, slop


def _parse_term_expr(tok: str, toks: _Tokens, dfields) -> Any:
    if ":" in tok and not tok.startswith(('"', "'")):
        field, _, value = tok.partition(":")
    else:
        field, value = None, tok

    def mk(field_name: str, value: str) -> Any:
        if value == "*":
            return ExistsQuery(field_name)
        if value == "IN" or (value == "" and toks.peek() == "IN"):
            if value == "":
                toks.next()
            if toks.next() != "[":
                raise ValueError("expected '[' after IN")
            vals = []
            while toks.peek() not in ("]", None):
                vals.append(toks.next())
            toks.next()
            return TermSetQuery(field_name, tuple(vals))
        if value in ("[", "{"):
            lower_inclusive = value == "["

            def bound() -> str:
                t = toks.next()
                if t in ("+", "-"):  # signed numeric bound tokenizes apart
                    return t + toks.next()
                return t

            lo = bound()
            if toks.next() != "TO":
                raise ValueError("expected TO in range")
            hi = bound()
            close = toks.next()
            if close not in ("]", "}"):
                raise ValueError("expected range close")
            hi_inclusive = close == "]"
            kw: dict[str, Any] = {}
            if lo != "*":
                kw["gte" if lower_inclusive else "gt"] = lo
            if hi != "*":
                kw["lte" if hi_inclusive else "lt"] = hi
            return RangeQuery(field_name, **kw)
        m = re.match(r"^(<=|>=|<|>)(.+)$", value)
        if m:
            # comparison shorthand `field:>=v` etc.
            # (docs/reference/query-language.md:167-185)
            op, v = m.groups()
            key = {"<": "lt", "<=": "lte", ">": "gt", ">=": "gte"}[op]
            return RangeQuery(field_name, **{key: v})
        if value.startswith(('"', "'")):
            phrase, slop = _strip_quotes(value)
            if phrase.endswith("*"):
                return PhrasePrefixQuery(field_name, phrase[:-1])
            return FullTextQuery(field_name, phrase, mode="phrase", slop=slop)
        if ("*" in value[:-1]) or ("?" in value):
            return WildcardQuery(field_name, value)
        if value.endswith("*"):
            return WildcardQuery(field_name, value)
        return FullTextQuery(field_name, value, mode="or")

    if field is not None:
        if value == "" and toks.peek() == "(":
            # field-scoped group `title:(foo AND bar)` (query-language.md):
            # the group parses with the field as its only default field
            toks.next()
            node = _parse_bool(toks, [field])
            if toks.next() != ")":
                raise ValueError("expected ')' closing field group")
            return node
        if value in ("[", "{") or value == "":
            # `field:[a TO b]` tokenizes as `field:[` — or `field:` then bracket
            nxt = value if value in ("[", "{") else toks.next()
            return mk(field, nxt)
        return mk(field, value)
    # no explicit field: OR over default search fields
    if not dfields:
        raise ValueError(f"no default search fields for bare term {value!r}")
    if len(dfields) == 1:
        return mk(dfields[0], value)
    return BoolQuery(should=tuple(mk(f, value) for f in dfields), minimum_should_match=1)
