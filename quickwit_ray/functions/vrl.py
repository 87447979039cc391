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
  separated by newlines or ``;``;
* expressions: string/number/bool/null literals, field paths, ``+`` (string
  concat / numeric add), ``-`` (numeric), error-coalescing ``??``;
* functions, each with the fallible/infallible split VRL mandates —
  a ``!`` suffix aborts the DOCUMENT on error (the reference routes such
  docs to the failed set), the plain form turns errors into ``null`` so
  a surrounding ``??`` can supply a default: ``downcase upcase string
  to_string to_int to_float to_bool parse_json now length trim replace
  contains starts_with ends_with``.

Unsupported VRL (documented divergence, scripts using them are rejected
at COMPILE time, never silently mis-run): closures/iteration, ``if``
expressions, regexes, timestamp coercion functions, metadata paths
(``%``/``@``), array indexing.
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
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<number>-?\d+(?:\.\d+)?)
  | (?P<coalesce>\?\?)
  | (?P<assign>=)
  | (?P<op>[+\-])
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<comma>,)
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
    "replace": lambda v, frm, to: _need_str(v).replace(_need_str(frm),
                                                       _need_str(to)),
    "contains": lambda v, sub: _need_str(sub) in _need_str(v),
    "starts_with": lambda v, p: _need_str(v).startswith(_need_str(p)),
    "ends_with": lambda v, s: _need_str(v).endswith(_need_str(s)),
}
_FUNC_ARITY = {"now": (0, 0), "replace": (3, 3), "contains": (2, 2),
               "starts_with": (2, 2), "ends_with": (2, 2)}


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
        left = self.additive()
        while self.peek()[0] == "coalesce":
            self.next()
            right = self.additive()
            left = _mk_coalesce(left, right)
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
        fn = _FUNCS.get(fname)
        if fn is None:
            raise VrlCompileError(
                f"VRL: function {fname!r} is outside the supported subset")
        self.expect("lparen")
        args = []
        if self.peek()[0] != "rparen":
            args.append(self.expr())
            while self.peek()[0] == "comma":
                self.next()
                args.append(self.expr())
        self.expect("rparen")
        lo, hi = _FUNC_ARITY.get(fname, (1, 1))
        if not lo <= len(args) <= hi:
            raise VrlCompileError(f"VRL: {fname} takes {lo}..{hi} args")
        return _mk_call(fname, fn, args, abort)

    # statements ----------------------------------------------------------

    def statements(self):
        stmts = []
        while True:
            k, v = self.peek()
            if k == "eof":
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
            if k == "path":
                path = self.next()[1][1:].split(".")
                self.expect("assign")
                rhs = self.expr()
                stmts.append(_mk_assign(path, rhs))
                continue
            raise VrlCompileError(
                f"VRL: unsupported statement at {v!r} (only assignments "
                "and del() are in the supported subset)")


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
