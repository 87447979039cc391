"""Exact typed sort keys.

The reference sorts by `SortValue` enums (u64/i64/f64/bool) compared by
VALUE across types (quickwit-proto sort_by_value / tantivy's u64
monotone mapping), so i64::MAX and 18e18-range u64 values order and
round-trip exactly. A float64 sort key cannot represent those (the
search_after edge-case rest scenario exists precisely for this), so:

- per split, ordering runs VECTORIZED over a uint64 monotone encoding of
  the column's native type (tantivy `common::u64_lex` scheme: i64 sign
  flip, IEEE-754 order trick for f64, dense ranks for strings);
- cursor (search_after) filtering compares the cursor against the NATIVE
  column with floor/ceil bounds, so a cursor of one numeric type applies
  exactly to a column of another (u64 cursor on an i64 column, f64
  cursor on a u64 column — collector.rs search-after coercion);
- only the per-split top-k rows materialize EXACT Python scalars
  (int/float/str/None), and the cross-split merge comparator runs on
  those Python values, where int/float comparisons are exact.

Nulls sort LAST in both directions (the reference comparator's
None-last rule).
"""

from __future__ import annotations

import math
from functools import cmp_to_key
from typing import Any, Optional

import numpy as np
import pyarrow as pa

_SIGN = np.uint64(1 << 63)
_U64_MAX = (1 << 64) - 1
_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def py_scalar(v) -> Any:
    """Normalize one sort value to an exact Python scalar (None for
    null/NaN; numpy scalars unboxed via .item() which is exact)."""
    if v is None:
        return None
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


class SortColumn:
    """One sort key over a fixed doc subset: uint64 order encoding +
    null mask + exact value extraction + cursor comparison masks."""

    __slots__ = ("kind", "vals", "null", "enc", "_uniq")

    def __init__(self, kind: str, vals, null: np.ndarray,
                 enc: np.ndarray, uniq: Optional[np.ndarray] = None):
        self.kind = kind          # int | uint | float | str
        self.vals = vals          # native numpy values (nulls filled)
        self.null = null          # bool[n]
        self.enc = enc            # uint64[n], monotone within the column
        self._uniq = uniq         # sorted uniques (str kind only)

    # -- construction ---------------------------------------------------

    @staticmethod
    def from_numpy(vals: np.ndarray) -> "SortColumn":
        """From a plain numeric numpy array with NO nulls (_score/_doc)."""
        null = np.zeros(len(vals), bool)
        if vals.dtype.kind == "u":
            return SortColumn("uint", vals, null, vals.astype(np.uint64))
        if vals.dtype.kind in "ib":
            v = vals.astype(np.int64)
            return SortColumn("int", v, null, v.view(np.uint64) ^ _SIGN)
        v = vals.astype(np.float64)
        nan = np.isnan(v)
        enc = _float_enc(np.where(nan, 0.0, v))
        return SortColumn("float", v, nan, enc)

    @staticmethod
    def from_arrow(arr: Optional[pa.Array], docs: np.ndarray) -> "SortColumn":
        n = len(docs)
        if arr is None:
            z = np.zeros(n, np.uint64)
            return SortColumn("int", np.zeros(n, np.int64),
                              np.ones(n, bool), z)
        sub = arr.take(pa.array(docs, pa.int64()))
        null = ~np.asarray(sub.is_valid())
        t = sub.type
        if pa.types.is_timestamp(t):
            sub = sub.cast(pa.int64())
            t = sub.type
        if pa.types.is_boolean(t):
            v = sub.cast(pa.int64()).fill_null(0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            return SortColumn("bool", v, null, v.view(np.uint64) ^ _SIGN)
        if pa.types.is_unsigned_integer(t):
            v = sub.cast(pa.uint64()).fill_null(0).to_numpy(
                zero_copy_only=False).astype(np.uint64)
            return SortColumn("uint", v, null, v.copy())
        if pa.types.is_integer(t):
            v = sub.cast(pa.int64()).fill_null(0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            return SortColumn("int", v, null, v.view(np.uint64) ^ _SIGN)
        if pa.types.is_floating(t):
            v = sub.cast(pa.float64()).fill_null(0.0).to_numpy(
                zero_copy_only=False).astype(np.float64)
            nan = np.isnan(v)
            null = null | nan
            return SortColumn("float", np.where(nan, 0.0, v), null,
                              _float_enc(np.where(nan, 0.0, v)))
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            v = np.asarray(sub.fill_null("").to_pylist(), object)
            uniq = np.unique(v[~null]) if (~null).any() else np.empty(0, object)
            enc = (np.searchsorted(uniq, v).astype(np.uint64)
                   if len(uniq) else np.zeros(len(v), np.uint64))
            return SortColumn("str", v, null, enc, uniq)
        raise TypeError(f"unsortable fast-field type {t}")

    def subset(self, sel: np.ndarray) -> "SortColumn":
        return SortColumn(self.kind, self.vals[sel], self.null[sel],
                          self.enc[sel], self._uniq)

    # -- ordering -------------------------------------------------------

    def order_enc(self, desc: bool) -> np.ndarray:
        """uint64 key ascending-sortable for the requested direction,
        nulls forced LAST in either direction."""
        e = (~self.enc) if desc else self.enc
        return np.where(self.null, np.uint64(_U64_MAX), e)

    # -- exact extraction ----------------------------------------------

    def exact(self, idx: np.ndarray) -> np.ndarray:
        """Exact Python scalars (object ndarray, None for null) for the
        selected positions."""
        if self.kind == "float" and not self.null.any():
            # pure float keys (e.g. BM25 scores) stay a float64 ndarray —
            # exact already, and callers np.allclose them
            return self.vals[idx]
        out = np.empty(len(idx), object)
        vals = self.vals
        null = self.null
        as_bool = self.kind == "bool"
        for j, i in enumerate(idx):
            v = None if null[i] else py_scalar(vals[i])
            out[j] = bool(v) if (as_bool and v is not None) else v
        return out

    # -- cursor comparison ---------------------------------------------

    def after_eq(self, cursor, desc: bool) -> tuple[np.ndarray, np.ndarray]:
        """(strictly-after mask, equal mask) vs one cursor value, with the
        reference's cross-type coercion (floor/ceil + saturation) and
        None-last semantics."""
        n = len(self.enc)
        cursor = py_scalar(cursor)
        if cursor is None:
            # the cursor hit had a null key: nulls tie, nothing is after
            return np.zeros(n, bool), self.null.copy()
        nn = ~self.null
        # a non-null cursor always precedes the null region
        after = self.null.copy()
        eq = np.zeros(n, bool)
        if self.kind == "str":
            c = str(cursor)
            pos = int(np.searchsorted(self._uniq, c, side="left"))
            exact = pos < len(self._uniq) and self._uniq[pos] == c
            if exact:
                eq = nn & (self.enc == np.uint64(pos))
            if desc:
                # values < c  <=>  code < pos
                after |= nn & (self.enc < np.uint64(pos))
            else:
                # values > c  <=>  code >= pos, minus the equal bucket
                m = nn & (self.enc >= np.uint64(pos))
                if exact:
                    m &= ~eq
                after |= m
            return after, eq
        kind = "int" if self.kind == "bool" else self.kind
        gt, lt, eqm = _numeric_cmp_masks(kind, self.vals, cursor)
        eq = nn & eqm
        after |= nn & (lt if desc else gt)
        return after, eq


def _float_enc(v: np.ndarray) -> np.ndarray:
    bits = v.astype(np.float64).view(np.uint64)
    neg = (bits >> np.uint64(63)) == 1
    return np.where(neg, ~bits, bits | _SIGN)


def _numeric_cmp_masks(kind: str, vals: np.ndarray, c):
    """(vals > c, vals < c, vals == c) EXACTLY, for a Python int/float/
    bool cursor against an int64/uint64/float64 column."""
    if isinstance(c, bool):
        c = int(c)
    n = len(vals)
    ones = np.ones(n, bool)
    zeros = np.zeros(n, bool)
    if kind in ("int", "uint"):
        lo, hi = (0, _U64_MAX) if kind == "uint" else (_I64_MIN, _I64_MAX)
        mk = (lambda x: np.uint64(x)) if kind == "uint" else (
            lambda x: np.int64(x))
        if isinstance(c, float):
            if math.isinf(c):
                return (zeros, ones, zeros) if c > 0 else (ones, zeros, zeros)
            cf, cc = math.floor(c), math.ceil(c)
            integral = cf == c
        else:
            cf = cc = c
            integral = True
        # for integer values: v > c <=> v > floor(c); v < c <=> v < ceil(c)
        # — with saturation when the cursor falls outside the domain
        if cf < lo:
            gt = ones.copy()
        elif cf > hi:
            gt = zeros.copy()
        else:
            gt = vals > mk(cf)
        if cc > hi:
            lt = ones.copy()
        elif cc < lo:
            lt = zeros.copy()
        else:
            lt = vals < mk(cc)
        eq = (vals == mk(cf)) if integral and lo <= cf <= hi else zeros
        return gt, lt, eq
    # float column: snap the cursor onto the float grid from both sides
    cf = float(c)
    if cf == c:  # exactly representable (all floats; small ints)
        return vals > cf, vals < cf, vals == cf
    # c is an int between two floats: no equality possible
    hi_t = cf if cf > c else float(np.nextafter(cf, np.inf))
    lo_t = cf if cf < c else float(np.nextafter(cf, -np.inf))
    return vals >= hi_t, vals <= lo_t, zeros


def _cmp_values(a, b) -> int:
    """Exact three-way compare of two non-null sort scalars; numbers
    compare by value (int/float mixed is exact in CPython), strings with
    strings; mixed string/number falls back to type-name order."""
    try:
        if a < b:
            return -1
        if a > b:
            return 1
        return 0
    except TypeError:
        ta, tb = type(a).__name__, type(b).__name__
        return -1 if ta < tb else (1 if ta > tb else 0)


def exact_hit_sort(df, sort_fields, start_offset: int, max_hits: int):
    """Cross-split/-index merge comparator over EXACT Python sort keys
    (collector.rs:1086-1184): sort keys in direction with None last, then
    (split_id, doc_id) in the PRIMARY direction. Runs on the merged
    top-k candidate rows only (len <= splits * k), so an O(n log n)
    Python sort is fine."""
    if not len(df):
        return df.iloc[0:0]
    sfs = list(sort_fields)[:2]
    orders = [sf.order for sf in sfs] or ["desc"]
    asc = [o == "asc" for o in orders]
    if len(asc) == 1:
        asc.append(asc[0])
    k0 = [py_scalar(v) for v in df["sort_key0"].tolist()]
    k1 = [py_scalar(v) for v in df["sort_key1"].tolist()]
    sid = df["_split_id"].tolist()
    did = df["_doc_id"].tolist()
    prim_sign = 1 if asc[0] else -1

    def cmp(i: int, j: int) -> int:
        for keys, a in ((k0, asc[0]), (k1, asc[1]))[: len(sfs)]:
            va, vb = keys[i], keys[j]
            if va is None or vb is None:
                if va is not None:
                    return -1  # None last in both directions
                if vb is not None:
                    return 1
                continue
            c = _cmp_values(va, vb)
            if c:
                return c if a else -c
        c = _cmp_values(sid[i], sid[j])
        if c:
            return c * prim_sign
        c = _cmp_values(did[i], did[j])
        return c * prim_sign

    order = sorted(range(len(df)), key=cmp_to_key(cmp))
    order = order[start_offset: start_offset + max_hits]
    return df.iloc[order].reset_index(drop=True)
