"""VRL (Vector Remap Language) subset interpreter for ingest transforms.

The reference compiles ``transform.vrl_script`` from a source config and
runs it per document inside the indexing pipeline
(`quickwit-indexing/src/actors/vrl_processing.rs:50-76`,
`quickwit-config/src/source_config/mod.rs` TransformConfig — e.g.
``.message = downcase(string!(.message))``). Earlier rounds stood in a
Python ``transform=fn(batch)`` hook; this module runs the actual VRL
scripts of the common shape, so a user's existing source config works
unchanged.

Supported subset (the constructs quickwit's docs and tests use):

* statements: ``.path.to.field = expr``, ``del(.path)``, ``#`` comments,
  separated by newlines or ``;``; ``if expr { ... } else if ... { ... }
  else { ... }`` statement blocks;
* expressions: string/number/bool/null literals, ``r'...'`` regex
  literals, field paths, ``+`` (string concat / numeric add), ``-``
  (numeric), comparisons (``== != < <= > >=``), logical ``&& || !``,
  error-coalescing ``??``. A missing field path reads as null inside
  ``==``/``!=`` (VRL path semantics) and as a recoverable error
  elsewhere (caught by ``??``/the plain-call null rule);
* functions, each with the fallible/infallible split VRL mandates —
  a ``!`` suffix aborts the DOCUMENT on error (the reference routes such
  docs to the failed set), the plain form turns errors into ``null`` so
  a surrounding ``??`` can supply a default: ``downcase upcase string
  to_string to_int to_float to_bool parse_json now length trim replace
  contains starts_with ends_with exists is_null abs floor ceil round
  split join match parse_regex parse_timestamp format_timestamp
  to_unix_timestamp``. ``replace`` accepts a regex pattern;
  ``parse_timestamp``/``format_timestamp``/``to_unix_timestamp`` take
  VRL's named arguments (``format:``, ``unit:``) with chrono-style
  strftime codes (``%+`` = RFC 3339).

Unsupported VRL (documented divergence, scripts using them are rejected
at COMPILE time, never silently mis-run): closures/iteration, ``if`` as
an EXPRESSION (statement blocks only), metadata paths (``%``/``@``),
array indexing.
"""

from __future__ import annotations

import json
import re
import time
from typing import Any, Callable, Optional

import pyarrow as pa


class VrlCompileError(ValueError):
    pass


class VrlAbort(Exception):
    """A `fn!(...)` call failed: the document is aborted (failed set)."""


class _Err:
    """A recoverable VRL runtime error value (caught by ``??``)."""

    def __init__(self, msg: str):
        self.msg = msg


_TOKEN_RE = re.compile(r"""
    (?P<ws>[^\S\n]+)
  | (?P<comment>\#[^\n]*)
  | (?P<nl>[\n;])
  | (?P<regex>r'(?:[^'\\]|\\.)*')
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<number>-?\d+(?:\.\d+)?)
  | (?P<coalesce>\?\?)
  | (?P<cmp>==|!=|>=|<=|>|<)
  | (?P<and>&&)
  | (?P<or>\|\|)
  | (?P<assign>=)
  | (?P<bang>!(?!=))
  | (?P<op>[+\-])
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<lbrace>\{)
  | (?P<rbrace>\})
  | (?P<comma>,)
  | (?P<colon>:)
  | (?P<path>\.[A-Za-z_][\w]*(?:\.[A-Za-z_][\w]*)*)
  | (?P<name>[A-Za-z_][\w]*!?)
""", re.VERBOSE)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if m is None:
            raise VrlCompileError(
                f"VRL: unsupported syntax at {src[i:i+20]!r} (this engine "
                "runs the documented VRL subset; see functions/vrl.py)")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


# -- stdlib -----------------------------------------------------------------

def _need_str(v) -> str:
    if isinstance(v, str):
        return v
    raise TypeError(f"expected string, got {type(v).__name__}")


def _to_datetime(v):
    """Coerce a VRL timestamp-ish value (datetime | epoch seconds) to an
    aware UTC datetime."""
    from datetime import datetime, timezone

    if isinstance(v, datetime):
        return v if v.tzinfo else v.replace(tzinfo=timezone.utc)
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return datetime.fromtimestamp(float(v), tz=timezone.utc)
    raise TypeError(f"expected timestamp, got {type(v).__name__}")


def _parse_timestamp(v, fmt):
    """chrono strftime parse; `%+` is RFC 3339 / ISO 8601."""
    from datetime import datetime, timezone

    s, f = _need_str(v), _need_str(fmt)
    if f == "%+":
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    else:
        dt = datetime.strptime(s, f)
    return dt if dt.tzinfo else dt.replace(tzinfo=timezone.utc)


def _format_timestamp(v, fmt):
    f = _need_str(fmt)
    dt = _to_datetime(v)
    return dt.isoformat() if f == "%+" else dt.strftime(f)


_UNIX_UNITS = {"seconds": 1, "milliseconds": 10 ** 3,
               "nanoseconds": 10 ** 9}


def _to_unix_timestamp(v, unit="seconds"):
    mult = _UNIX_UNITS.get(_need_str(unit))
    if mult is None:
        raise ValueError(f"unknown unit {unit!r}")
    return int(_to_datetime(v).timestamp() * mult)


def _replace(v, pat, to):
    if isinstance(pat, re.Pattern):
        return pat.sub(_need_str(to), _need_str(v))
    return _need_str(v).replace(_need_str(pat), _need_str(to))


def _match(v, pat):
    if not isinstance(pat, re.Pattern):
        raise TypeError("match() needs a regex (r'...') pattern")
    return pat.search(_need_str(v)) is not None


def _parse_regex(v, pat):
    """Named + numbered capture groups of the first match; errors (the
    fallible path) when the pattern does not match."""
    if not isinstance(pat, re.Pattern):
        raise TypeError("parse_regex() needs a regex (r'...') pattern")
    m = pat.search(_need_str(v))
    if m is None:
        raise ValueError("regex did not match")
    out = {str(i): g for i, g in enumerate(m.groups(), start=1)
           if g is not None}
    out.update({k: g for k, g in m.groupdict().items() if g is not None})
    return out


def _split(v, sep, limit=None):
    s = _need_str(v)
    if isinstance(sep, re.Pattern):
        return sep.split(s, maxsplit=0 if limit is None else int(limit) - 1)
    return s.split(_need_str(sep),
                   -1 if limit is None else int(limit) - 1)


import math as _math  # noqa: E402 — stdlib-only helper group

_FUNCS: dict[str, Callable] = {
    "downcase": lambda v: _need_str(v).lower(),
    "upcase": lambda v: _need_str(v).upper(),
    "string": _need_str,
    "to_string": lambda v: v if isinstance(v, str) else
        json.dumps(v) if isinstance(v, (dict, list)) else
        ("true" if v is True else "false" if v is False else str(v)),
    "to_int": lambda v: int(v),
    "to_float": lambda v: float(v),
    "to_bool": lambda v: (v if isinstance(v, bool) else
                          {"true": True, "false": False}[str(v).lower()]),
    "parse_json": lambda v: json.loads(_need_str(v)),
    "now": lambda: time.time(),
    "length": lambda v: len(v),
    "trim": lambda v: _need_str(v).strip(),
    "replace": _replace,
    "contains": lambda v, sub: _need_str(sub) in _need_str(v),
    "starts_with": lambda v, p: _need_str(v).startswith(_need_str(p)),
    "ends_with": lambda v, s: _need_str(v).endswith(_need_str(s)),
    "is_null": lambda v: v is None,
    "abs": lambda v: abs(v),
    "floor": lambda v: _math.floor(v),
    "ceil": lambda v: _math.ceil(v),
    "round": lambda v: round(v),
    "split": _split,
    "join": lambda v, sep="": _need_str(sep).join(_need_str(x) for x in v),
    "match": _match,
    "parse_regex": _parse_regex,
    "parse_timestamp": _parse_timestamp,
    "format_timestamp": _format_timestamp,
    "to_unix_timestamp": _to_unix_timestamp,
}
_FUNC_ARITY = {"now": (0, 0), "replace": (3, 3), "contains": (2, 2),
               "starts_with": (2, 2), "ends_with": (2, 2),
               "split": (2, 3), "join": (1, 2), "match": (2, 2),
               "parse_regex": (2, 2), "parse_timestamp": (2, 2),
               "format_timestamp": (2, 2), "to_unix_timestamp": (1, 2)}
# VRL named arguments, mapped positionally in declared order
_FUNC_KWARGS = {"parse_timestamp": ("format",),
                "format_timestamp": ("format",),
                "to_unix_timestamp": ("unit",),
                "split": ("limit",)}


# -- parser -> closures ------------------------------------------------------

class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str) -> str:
        k, v = self.next()
        if k != kind:
            raise VrlCompileError(f"VRL: expected {kind}, got {v!r}")
        return v

    # expressions ---------------------------------------------------------

    def expr(self):
        left = self.logic_or()
        while self.peek()[0] == "coalesce":
            self.next()
            right = self.logic_or()
            left = _mk_coalesce(left, right)
        return left

    def logic_or(self):
        left = self.logic_and()
        while self.peek()[0] == "or":
            self.next()
            left = _mk_logic(left, self.logic_and(), "or")
        return left

    def logic_and(self):
        left = self.comparison()
        while self.peek()[0] == "and":
            self.next()
            left = _mk_logic(left, self.comparison(), "and")
        return left

    def comparison(self):
        left = self.additive()
        while self.peek()[0] == "cmp":
            op = self.next()[1]
            left = _mk_cmp(left, self.additive(), op)
        return left

    def additive(self):
        left = self.unary()
        while self.peek()[0] == "op":
            op = self.next()[1]
            right = self.unary()
            left = _mk_arith(left, right, op)
        return left

    def unary(self):
        k, v = self.peek()
        if k == "bang":
            self.next()
            return _mk_not(self.unary())
        if k == "string":
            self.next()
            s = v[1:-1]
            s = re.sub(r"\\(.)", lambda m: {"n": "\n", "t": "\t"}.get(
                m.group(1), m.group(1)), s)
            return lambda doc: s
        if k == "number":
            self.next()
            n = float(v) if "." in v else int(v)
            return lambda doc: n
        if k == "regex":
            self.next()
            try:
                pat = re.compile(v[2:-1])
            except re.error as e:
                raise VrlCompileError(f"VRL: bad regex {v!r}: {e}") from e
            return lambda doc: pat
        if k == "path":
            self.next()
            parts = v[1:].split(".")
            return _mk_path(parts)
        if k == "lparen":
            self.next()
            e = self.expr()
            self.expect("rparen")
            return e
        if k == "name":
            self.next()
            if v == "true":
                return lambda doc: True
            if v == "false":
                return lambda doc: False
            if v == "null":
                return lambda doc: None
            return self.call(v)
        raise VrlCompileError(f"VRL: unexpected token {v!r}")

    def call(self, name: str):
        abort = name.endswith("!")
        fname = name[:-1] if abort else name
        if fname == "exists":
            # exists(.path) — true when the path resolves (null counts
            # as present, like VRL); compile-checked to take one path
            self.expect("lparen")
            getter = _mk_path(self.expect("path")[1:].split("."))
            self.expect("rparen")
            return lambda doc: not isinstance(getter(doc), _Err)
        fn = _FUNCS.get(fname)
        if fn is None:
            raise VrlCompileError(
                f"VRL: function {fname!r} is outside the supported subset")
        args = []
        kw_names = _FUNC_KWARGS.get(fname, ())
        self.expect("lparen")
        while self.peek()[0] != "rparen":
            if args:
                self.expect("comma")
            # VRL named argument: `name: expr`
            if (self.peek()[0] == "name"
                    and self.toks[self.i + 1][0] == "colon"):
                kw = self.next()[1]
                self.next()  # colon
                if kw not in kw_names:
                    raise VrlCompileError(
                        f"VRL: {fname} has no argument named {kw!r}")
                args.append(self.expr())
            else:
                args.append(self.expr())
        self.expect("rparen")
        lo, hi = _FUNC_ARITY.get(fname, (1, 1))
        if not lo <= len(args) <= hi:
            raise VrlCompileError(f"VRL: {fname} takes {lo}..{hi} args")
        return _mk_call(fname, fn, args, abort)

    # statements ----------------------------------------------------------

    def statements(self, in_block: bool = False):
        stmts = []
        while True:
            k, v = self.peek()
            if k == "eof":
                if in_block:
                    raise VrlCompileError("VRL: unterminated block ('}')")
                return stmts
            if k == "rbrace":
                if not in_block:
                    raise VrlCompileError("VRL: unexpected '}'")
                return stmts
            if k == "nl":
                self.next()
                continue
            if k == "name" and v == "del":
                self.next()
                self.expect("lparen")
                path = self.expect("path")[1:].split(".")
                self.expect("rparen")
                stmts.append(_mk_del(path))
                continue
            if k == "name" and v == "if":
                stmts.append(self.if_stmt())
                continue
            if k == "path":
                path = self.next()[1][1:].split(".")
                self.expect("assign")
                rhs = self.expr()
                stmts.append(_mk_assign(path, rhs))
                continue
            raise VrlCompileError(
                f"VRL: unsupported statement at {v!r} (only assignments, "
                "del() and if blocks are in the supported subset)")

    def block(self):
        self.expect("lbrace")
        stmts = self.statements(in_block=True)
        self.expect("rbrace")
        return stmts

    def if_stmt(self):
        """``if expr { ... } else if ... { ... } else { ... }`` as a
        STATEMENT (VRL's if-as-expression stays compile-rejected)."""
        self.next()  # 'if'
        cond = self.expr()
        then = self.block()
        other: list = []
        # skip newlines between '}' and 'else'
        j = self.i
        while self.toks[j][0] == "nl":
            j += 1
        if self.toks[j][:2] == ("name", "else"):
            self.i = j + 1
            nk, nv = self.peek()
            if nk == "name" and nv == "if":
                other = [self.if_stmt()]
            else:
                other = self.block()
        return _mk_if(cond, then, other)


def _mk_path(parts):
    def get(doc):
        cur: Any = doc
        for p in parts:
            if not isinstance(cur, dict) or p not in cur:
                return _Err(f"undefined path .{'.'.join(parts)}")
            cur = cur[p]
        return cur
    return get


def _mk_call(name, fn, args, abort):
    def call(doc):
        vals = []
        for a in args:
            v = a(doc)
            if isinstance(v, _Err):
                if abort:
                    raise VrlAbort(f"{name}!: {v.msg}")
                return v
            vals.append(v)
        try:
            return fn(*vals)
        except VrlAbort:
            raise
        except Exception as e:  # noqa: BLE001 — VRL fallible call
            if abort:
                raise VrlAbort(f"{name}!({vals!r}): {e}")
            return _Err(str(e))
    return call


def _mk_coalesce(left, right):
    def co(doc):
        v = left(doc)
        if isinstance(v, _Err) or v is None:
            return right(doc)
        return v
    return co


def _mk_not(inner):
    def neg(doc):
        v = inner(doc)
        if isinstance(v, _Err):
            return v
        if not isinstance(v, bool):
            return _Err(f"! needs a boolean, got {type(v).__name__}")
        return not v
    return neg


def _mk_logic(left, right, op):
    def logic(doc):
        a = left(doc)
        if isinstance(a, _Err):
            return a
        if not isinstance(a, bool):
            return _Err(f"{op} needs booleans, got {type(a).__name__}")
        # short-circuit like VRL
        if op == "and" and not a:
            return False
        if op == "or" and a:
            return True
        b = right(doc)
        if isinstance(b, _Err):
            return b
        if not isinstance(b, bool):
            return _Err(f"{op} needs booleans, got {type(b).__name__}")
        return b
    return logic


_CMP_OPS: dict[str, Callable[[Any, Any], bool]] = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b,
    "<=": lambda a, b: a <= b,
}


def _mk_cmp(left, right, op):
    fn = _CMP_OPS[op]
    eq = op in ("==", "!=")

    def cmp(doc):
        a, b = left(doc), right(doc)
        if eq:
            # VRL paths read as null: a missing field equals null, not
            # an error — `.status == "ok"` is simply false when absent
            if isinstance(a, _Err):
                a = None
            if isinstance(b, _Err):
                b = None
            if type(a) is bool or type(b) is bool:
                if (type(a) is bool) != (type(b) is bool):
                    return op == "!="
            return fn(a, b)
        if isinstance(a, _Err):
            return a
        if isinstance(b, _Err):
            return b
        try:
            return fn(a, b)
        except TypeError as e:
            return _Err(str(e))
    return cmp


def _mk_if(cond, then_stmts, else_stmts):
    def run_if(doc):
        v = cond(doc)
        if isinstance(v, _Err):
            raise VrlAbort(f"if condition errored: {v.msg}")
        if not isinstance(v, bool):
            raise VrlAbort(
                f"if condition must be boolean, got {type(v).__name__}")
        for st in (then_stmts if v else else_stmts):
            st(doc)
    return run_if


def _mk_arith(left, right, op):
    def ar(doc):
        a, b = left(doc), right(doc)
        if isinstance(a, _Err):
            return a
        if isinstance(b, _Err):
            return b
        try:
            if op == "+":
                if isinstance(a, str) or isinstance(b, str):
                    return _need_str(a) + _need_str(b)
                return a + b
            return a - b
        except Exception as e:  # noqa: BLE001
            return _Err(str(e))
    return ar


def _mk_assign(path, rhs):
    def assign(doc):
        v = rhs(doc)
        if isinstance(v, _Err):
            # VRL rejects compiling unhandled fallible assignments; at
            # runtime the remaining error class is undefined paths —
            # assign null (VRL's `.a = .missing` compiles to null-ish)
            v = None
        cur = doc
        for p in path[:-1]:
            nxt = cur.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
                cur[p] = nxt
            cur = nxt
        cur[path[-1]] = v
    return assign


def _mk_del(path):
    def delete(doc):
        cur = doc
        for p in path[:-1]:
            cur = cur.get(p)
            if not isinstance(cur, dict):
                return
        cur.pop(path[-1], None)
    return delete


class VrlProgram:
    def __init__(self, script: str):
        self.script = script
        self._stmts = _Parser(_tokenize(script)).statements()

    def transform_doc(self, doc: dict) -> Optional[dict]:
        """Run the program over one document (mutated copy). Returns None
        when a `fn!` abort fires — the reference routes the doc to the
        failed set (vrl_processing.rs transform error handling)."""
        out = dict(doc)
        try:
            for st in self._stmts:
                st(out)
        except VrlAbort:
            return None
        return out


def compile_vrl(script: str) -> VrlProgram:
    return VrlProgram(script)


def vrl_table_transform(script: str) -> Callable[[pa.Table], pa.Table]:
    """``transform=`` hook for build_index / sources: applies the VRL
    program per document of each Arrow batch. VRL is inherently
    per-document (the reference also evaluates doc-by-doc inside the
    indexing actor); callers needing vectorized transforms keep passing
    plain Python batch functions."""
    prog = compile_vrl(script)

    def transform(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = [r2 for r in rows if (r2 := prog.transform_doc(r)) is not None]
        if not out:
            return batch.slice(0, 0)
        # preserve input column order, append script-added columns
        keys = list(batch.column_names)
        seen = set(keys)
        for r in out:
            for k in r:
                if k not in seen:
                    seen.add(k)
                    keys.append(k)
        return pa.table({k: [r.get(k) for r in out] for k in keys})

    return transform
