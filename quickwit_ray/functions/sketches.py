"""Mergeable sketches for approximate aggregations:

  * HyperLogLog (p=14, 16384 uint8 registers) for `cardinality`
    (reference delegates to tantivy's HLL++-style cardinality agg,
    docs/reference/aggregation.md:1016) — per-split sketch, driver merge.
  * A compressed quantile sketch (t-digest-style bounded centroid list)
    for `percentiles` (docs/reference/aggregation.md:952).

Both are plain numpy, serializable via their state arrays, and merge by
simple elementwise ops — the partial+final pattern over splits.
"""

from __future__ import annotations

import numpy as np

HLL_P = 14
HLL_M = 1 << HLL_P


def _alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def hash64(values: np.ndarray) -> np.ndarray:
    """Stable 64-bit hash of an arbitrary value array — pinned vendored
    qhash1 (functions/stablehash.py), never pandas."""
    from quickwit_ray.functions.stablehash import hash64 as _h64

    return _h64(values)


HLL_SPARSE_MAX = 4096  # distinct hashes kept exactly before densifying


class HyperLogLog:
    """HLL++-style: a sparse EXACT hash set below HLL_SPARSE_MAX distinct
    values (small cardinalities come out integer-exact, matching the
    reference's sparse mode), densifying to the register array above it."""

    __slots__ = ("registers", "sparse")

    def __init__(self, registers: np.ndarray | None = None,
                 sparse: np.ndarray | None = None):
        if registers is None and sparse is None:
            sparse = np.empty(0, np.uint64)
        self.registers = registers
        self.sparse = sparse  # sorted unique uint64 hashes, or None

    def _densify(self) -> None:
        h = self.sparse
        self.sparse = None
        self.registers = np.zeros(HLL_M, np.uint8)
        if len(h):
            self._add_dense(h)

    def _add_dense(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
        rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
        # rank = leading zeros of remaining bits + 1
        lz = np.zeros(len(h), np.uint8)
        bits = rest
        # count leading zeros via float trick is lossy; do it with log2
        nz = bits != 0
        lz[nz] = (63 - np.floor(np.log2(bits[nz].astype(np.float64))).astype(np.int64)).astype(np.uint8)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def add_hashes(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        h = h.astype(np.uint64, copy=False)
        if self.sparse is not None:
            merged = np.union1d(self.sparse, h)
            if len(merged) <= HLL_SPARSE_MAX:
                self.sparse = merged
                return
            self.sparse = merged
            self._densify()
            return
        self._add_dense(h)

    def add(self, values: np.ndarray) -> None:
        self.add_hashes(hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if self.sparse is not None and other.sparse is not None:
            merged = np.union1d(self.sparse, other.sparse)
            if len(merged) <= HLL_SPARSE_MAX:
                return HyperLogLog(sparse=merged)
            out = HyperLogLog(sparse=merged)
            out._densify()
            return out
        a, b = self, other
        if a.sparse is not None:
            a = HyperLogLog(sparse=a.sparse.copy())
            a._densify()
        if b.sparse is not None:
            b = HyperLogLog(sparse=b.sparse.copy())
            b._densify()
        return HyperLogLog(np.maximum(a.registers, b.registers))

    def estimate(self) -> float:
        if self.sparse is not None:
            return float(len(self.sparse))  # exact below the sparse cap
        m = HLL_M
        regs = self.registers.astype(np.float64)
        raw = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        zeros = int(np.count_nonzero(self.registers == 0))
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting for small n
        return raw

    def to_bytes(self) -> bytes:
        if self.sparse is not None:
            return b"S" + self.sparse.tobytes()
        return b"D" + self.registers.tobytes()

    @staticmethod
    def from_bytes(b: bytes) -> "HyperLogLog":
        if b[:1] == b"S":
            return HyperLogLog(sparse=np.frombuffer(b[1:], np.uint64).copy())
        if b[:1] == b"D":
            return HyperLogLog(np.frombuffer(b[1:], np.uint8).copy())
        # legacy untagged register dump
        return HyperLogLog(np.frombuffer(b, np.uint8).copy())


class QuantileSketch:
    """Bounded centroid list: (value, weight) pairs kept sorted; when over
    capacity, adjacent centroids are pairwise-merged (weighted mean).
    Mergeable; percentile() interpolates the weighted CDF."""

    __slots__ = ("values", "weights", "capacity")

    def __init__(self, values: np.ndarray | None = None,
                 weights: np.ndarray | None = None, capacity: int = 2048):
        self.values = values if values is not None else np.empty(0, np.float64)
        self.weights = weights if weights is not None else np.empty(0, np.float64)
        self.capacity = capacity

    def add(self, vals: np.ndarray) -> None:
        v = np.asarray(vals, np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        sv, cnt = np.unique(v, return_counts=True)
        self.values = np.concatenate([self.values, sv])
        self.weights = np.concatenate([self.weights, cnt.astype(np.float64)])
        self._compress()

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        out = QuantileSketch(np.concatenate([self.values, other.values]),
                             np.concatenate([self.weights, other.weights]),
                             self.capacity)
        out._compress()
        return out

    def _compress(self) -> None:
        if len(self.values) == 0:
            return
        order = np.argsort(self.values, kind="stable")
        v, w = self.values[order], self.weights[order]
        while len(v) > self.capacity:
            # merge every other adjacent pair (halves the size)
            n = len(v) - (len(v) % 2)
            v2 = v[:n].reshape(-1, 2)
            w2 = w[:n].reshape(-1, 2)
            wsum = w2.sum(1)
            vm = (v2 * w2).sum(1) / wsum
            if len(v) % 2:
                v = np.concatenate([vm, v[-1:]])
                w = np.concatenate([wsum, w[-1:]])
            else:
                v, w = vm, wsum
        self.values, self.weights = v, w

    def percentile(self, q: float) -> float:
        if len(self.values) == 0:
            return float("nan")
        cw = np.cumsum(self.weights)
        total = cw[-1]
        target = q / 100.0 * total
        i = int(np.searchsorted(cw, target))
        return float(self.values[min(i, len(self.values) - 1)])

    def state(self) -> tuple[bytes, bytes]:
        return self.values.tobytes(), self.weights.tobytes()

    @staticmethod
    def from_state(vb: bytes, wb: bytes) -> "QuantileSketch":
        return QuantileSketch(np.frombuffer(vb, np.float64).copy(),
                              np.frombuffer(wb, np.float64).copy())
