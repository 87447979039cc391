"""Unit tests for the distributed dedup building blocks
(quickwit_ray.pipelines.components)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from quickwit_ray.pipelines.components import (
    connected_components,
    distinct_pairs,
    duplicate_ids,
    pair_nodes,
    semi_join_ids,
)


@pytest.fixture()
def rd(ray_session):
    import ray.data

    return ray.data


def test_distinct_pairs_and_nodes(rd):
    pairs = rd.from_arrow(pa.table({"a": [1, 1, 2, 2], "b": [2, 2, 3, 3]}))
    dp = distinct_pairs(pairs).to_pandas().sort_values(["a", "b"])
    assert list(zip(dp["a"], dp["b"])) == [(1, 2), (2, 3)]
    nodes = sorted(pair_nodes(pairs).to_pandas()["id"])
    assert nodes == [1, 2, 3]


@pytest.mark.parametrize("force_distributed", [False, True])
def test_connected_components_chain(rd, force_distributed, monkeypatch):
    """A 6-node chain needs multiple propagation rounds — every node must
    still land on the component min (0). Runs BOTH the bounded driver
    fast path and the distributed label-propagation path."""
    import quickwit_ray.pipelines.components as comp_mod

    if force_distributed:
        monkeypatch.setattr(comp_mod, "SMALL_CC_EDGES", 0)
    pairs = rd.from_arrow(pa.table({"a": [0, 1, 2, 3, 4, 10],
                                    "b": [1, 2, 3, 4, 5, 11]}))
    comps = connected_components(pairs, id_dtype=pa.int64()).to_pandas()
    got = dict(zip(comps["id"], comps["root"]))
    assert {k: got[k] for k in range(6)} == {i: 0 for i in range(6)}
    assert got[10] == 10 and got[11] == 10
    dups = duplicate_ids(
        connected_components(pairs, id_dtype=pa.int64())).to_pandas()
    assert sorted(dups["id"]) == [1, 2, 3, 4, 5, 11]


def test_connected_components_long_chain_pointer_doubling(rd, monkeypatch):
    """A 70-hop path exceeds any plausible per-hop round budget — pointer
    doubling must converge in O(log diameter) rounds (~8 for 70 hops),
    and the stats out-param must report convergence."""
    import quickwit_ray.pipelines.components as comp_mod

    monkeypatch.setattr(comp_mod, "SMALL_CC_EDGES", 0)  # force distributed
    n = 71
    pairs = rd.from_arrow(pa.table({"a": list(range(n - 1)),
                                    "b": list(range(1, n))}))
    stats = {}
    comps = connected_components(pairs, id_dtype=pa.int64(),
                                 stats=stats).to_pandas()
    got = dict(zip(comps["id"], comps["root"]))
    assert got == {i: 0 for i in range(n)}
    assert stats["converged"] and stats["rounds"] <= 10


def test_semi_join_broadcast_and_shuffle_paths(rd):
    ds = rd.from_arrow(pa.table({"k": list(range(20)),
                                 "v": [f"v{i}" for i in range(20)]}))
    ids = rd.from_arrow(pa.table({"id": [3, 7, 11]}))
    # broadcast path
    kept = semi_join_ids(ds, ids, "k", keep=True).to_pandas()
    assert sorted(kept["k"]) == [3, 7, 11]
    dropped = semi_join_ids(ds, ids, "k", keep=False).to_pandas()
    assert sorted(dropped["k"]) == sorted(set(range(20)) - {3, 7, 11})
    # force the shuffle-join path with a zero broadcast limit
    kept2 = semi_join_ids(ds, ids, "k", keep=True,
                          broadcast_limit=0).to_pandas()
    assert sorted(kept2["k"]) == [3, 7, 11]
    dropped2 = semi_join_ids(ds, ids, "k", keep=False,
                             broadcast_limit=0).to_pandas()
    assert sorted(dropped2["k"]) == sorted(set(range(20)) - {3, 7, 11})
    # empty id set
    assert semi_join_ids(ds, ids.limit(0), "k", keep=False).count() == 20


def test_simhash64_vectorized_matches_reference_loop():
    """The round-2 vectorized simhash must equal the per-row definition."""
    from quickwit_ray.pipelines.dedup import simhash64

    texts = ["the quick brown fox", "", None, "a b a b a",
             "Zz yy xx " * 20, "single"]
    got = simhash64(texts)

    def slow_one(t):
        words = (t or "").lower().split()
        if not words:
            return np.uint64(0)
        from quickwit_ray.functions.stablehash import hash_strings

        h = hash_strings(np.asarray(words, object))
        bit_cols = np.arange(64, dtype=np.uint64)
        bits = ((h[:, None] >> bit_cols) & np.uint64(1)).astype(np.int64)
        v = bits.sum(0) * 2 - len(h)
        return np.uint64(((v > 0).astype(np.uint64) << bit_cols).sum())

    assert list(got) == [slow_one(t) for t in texts]
