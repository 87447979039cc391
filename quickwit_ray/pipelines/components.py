"""Distributed building blocks for the near-dup pipelines.

Round 1 kept the candidate-pair set, the verification texts, the
union-find, and the final duplicate-id set on the driver (and shipped the
dup set to every task inside a closure) — an O(corpus) driver object at
Common-Crawl dup rates. This module replaces all of that with Ray-Data
primitives:

  * ``distinct_pairs``        — pair dedup as a groupby, not a driver set
  * ``pair_nodes``            — distinct endpoint ids as a Dataset
  * ``attach_pair_texts``     — reduce-side hash join of the doc texts onto
                                the candidate pairs (both sides stay
                                distributed; the small side is semi-joined
                                first so only candidate texts shuffle)
  * ``connected_components``  — min-label propagation over the verified
                                pair set, iterated as groupby/join rounds
                                to a fixpoint (root = min id of the
                                component, identical to the keep-first
                                union-find it replaces)
  * ``semi_join_ids``         — keep/drop rows by id against an id Dataset:
                                broadcast the ids once via ``ray.put`` when
                                provably small (count() <= limit), else a
                                shuffle hash join. Never a closure-captured
                                Python set.

Driver-side state is bounded: scalars (counts, label checksums) and — only
below ``BROADCAST_LIMIT`` — one Arrow id array placed in the object store.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

log = logging.getLogger(__name__)

# ids below this count are broadcast (one ray.put, read zero-copy from the
# local object store by every task); above it the drop becomes a shuffle
# hash join. 2M int64 ids ~= 16 MB.
BROADCAST_LIMIT = 2_000_000
# pair graphs below this edge count run union-find on the driver (bounded:
# <= ~16 MB of edges, same provably-small doctrine as the broadcast path);
# larger graphs use distributed min-label propagation. The fixed cost of
# the iterated join/groupby rounds (~10 s of stage latency) only pays off
# when the edge set itself is too big to hold anywhere.
SMALL_CC_EDGES = 1_000_000
SMALL_CC_BYTES = 32 << 20  # and at most ~32 MB of edge data on the driver


def default_num_partitions() -> int:
    """Hash-join partition count: each partition is an aggregator ACTOR
    holding a CPU, so the count must leave headroom for the map tasks
    feeding it — cpus//2 (min 2) avoids the scheduling deadlock seen when
    partitions >= cluster CPUs. On a real multi-node cluster this scales
    with total CPUs; callers can override per join."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    return max(2, min(256, cpus // 2))


def _empty_ids_table(dtype: pa.DataType) -> pa.Table:
    return pa.table({"id": pa.array([], dtype), "root": pa.array([], dtype)})


def collect_arrow_blocks(ds, cols=None) -> list[pa.Table]:
    """Materialize a (small, pre-counted) Dataset's blocks as Arrow tables
    on the driver: skips zero-column blocks from all-empty map_groups
    outputs and converts pandas-backed blocks (Ray hands them back
    unconverted, incl. pickled-object columns for uint64 overflow keys).
    ONE place for this edge-case handling — three call sites."""
    import pandas as _pd

    import ray

    out = []
    for r in ds.to_arrow_refs():
        t = ray.get(r)
        if isinstance(t, _pd.DataFrame):
            if t.shape[1] == 0:
                continue
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_columns == 0:
            continue
        out.append(t.select(cols) if cols is not None else t)
    return out


def distinct_pairs(pairs_ds):
    """Distinct (a, b) rows via groupby — replaces driver-side
    ``drop_duplicates`` on a materialized pair DataFrame."""
    return pairs_ds.groupby(["a", "b"]).count().drop_columns(["count()"])


def pair_nodes(pairs_ds):
    """Distinct endpoint ids of a pair Dataset, as a Dataset (id)."""

    def explode(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays([batch["a"].combine_chunks().cast(batch["a"].type),
                                 batch["b"].combine_chunks().cast(batch["a"].type)])
        return pa.table({"id": both})

    return (pairs_ds.map_batches(explode, batch_format="pyarrow")
            .groupby("id").count().drop_columns(["count()"]))


def semi_join_ids(ds, ids_ds, id_col: str, *, keep: bool,
                  num_partitions: int | None = None,
                  broadcast_limit: int = BROADCAST_LIMIT,
                  n_ids: int | None = None):
    """Keep (semi-join) or drop (anti-join) rows of ``ds`` whose ``id_col``
    appears in ``ids_ds`` (a Dataset with column "id").

    Small id sets broadcast once through the object store and filter
    map-side with ``pyarrow.compute.is_in`` (Arrow-native, zero row
    iteration); large ones run a left-outer shuffle join on the id.
    """
    import ray

    if num_partitions is None:
        num_partitions = default_num_partitions()
    if n_ids is None:
        n_ids = ids_ds.count()
    if n_ids == 0:
        return ds if not keep else ds.limit(0)
    if n_ids <= broadcast_limit:
        tbls = collect_arrow_blocks(ids_ds)
        if not tbls:
            return ds if not keep else ds.limit(0)
        id_tbl = pa.concat_tables(tbls, promote_options="default")
        ref = ray.put(id_tbl["id"].combine_chunks())

        def filt(batch: pa.Table) -> pa.Table:
            vals = ray.get(ref)  # zero-copy read from the local object store
            m = pc.fill_null(
                pc.is_in(batch[id_col], value_set=vals.cast(batch[id_col].type)),
                False)
            if not keep:
                m = pc.invert(m)
            return batch.filter(m)

        return ds.map_batches(filt, batch_format="pyarrow")
    # shuffle path: mark + left-outer join + filter on the marker. The id
    # set is made DISTINCT first: duplicate right-side ids in an outer
    # join would duplicate matching left rows (callers may pass encoded
    # keys where distinct buckets fold to one value)
    distinct = ids_ds.groupby("id").count().drop_columns(["count()"])
    marked = distinct.map_batches(
        lambda b: b.append_column("__dup_marker",
                                  pa.array(np.ones(b.num_rows, np.int8))),
        batch_format="pyarrow")
    joined = ds.join(marked, "left_outer", num_partitions,
                     on=(id_col,), right_on=("id",), right_suffix="_r")

    def strip(batch: pa.Table) -> pa.Table:
        m = pc.is_valid(batch["__dup_marker"])
        if not keep:
            m = pc.invert(m)
        return batch.filter(m).drop_columns(["__dup_marker"])

    return joined.map_batches(strip, batch_format="pyarrow")


def attach_pair_texts(pairs_ds, ds, id_col: str, text_col: str, *,
                      num_partitions: int | None = None,
                      broadcast_limit: int = BROADCAST_LIMIT):
    """Join the candidate texts onto (a, b) pairs → columns
    (a, b, text, text_rb). The doc table is first pruned to the candidate
    ids (map-side when the candidate set is small) so only candidate texts
    enter the pair join."""
    if num_partitions is None:
        num_partitions = default_num_partitions()
    cands = pair_nodes(pairs_ds)
    texts = semi_join_ids(ds.select_columns([id_col, text_col]), cands,
                          id_col, keep=True, num_partitions=num_partitions,
                          broadcast_limit=broadcast_limit)
    texts = texts.materialize()  # joined twice below; avoid re-reading source
    j = pairs_ds.join(texts, "inner", num_partitions,
                      on=("a",), right_on=(id_col,), right_suffix="_ra")
    return j.join(texts, "inner", num_partitions,
                  on=("b",), right_on=(id_col,), right_suffix="_rb")


def connected_components(pairs_ds, *, id_dtype: pa.DataType,
                         num_partitions: int | None = None,
                         max_rounds: int = 64,
                         stats: dict | None = None):
    """Connected components of the (a, b) pair graph by distributed
    min-label propagation + pointer doubling — returns a Dataset
    (id, root) where root is the minimum id of the component (exactly the
    keep-first union-find result).

    Each round (1) joins current labels onto the symmetric edge list and
    takes the per-node min over neighbor labels and the node's own label
    (hooking), then (2) shortcuts label(node) <- label(label(node))
    (pointer jumping). The jump halves remaining chain depth every round,
    so convergence is O(log diameter) — max_rounds=64 covers any graph
    that fits in an int64 id space. Labels only decrease, so an unchanged
    label checksum (driver scalar) is a fixpoint. Pass ``stats`` (a dict)
    to receive {"rounds": n, "converged": bool}; non-convergence also
    raises RuntimeError since it would silently keep duplicates.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Min, Sum

    if num_partitions is None:
        num_partitions = default_num_partitions()
    pairs_ds = pairs_ds.materialize()  # consumed twice (edges + node list)
    n_edges = pairs_ds.count()
    if n_edges <= SMALL_CC_EDGES and pairs_ds.size_bytes() <= SMALL_CC_BYTES:
        # provably-small graph (count AND bytes — string ids would blow the
        # edge-count bound alone): bounded driver union-find beats ~10 s of
        # distributed round latency; never an O(corpus) set
        parts = collect_arrow_blocks(pairs_ds, cols=["a", "b"])
        if not parts:
            return ray.data.from_arrow(_empty_ids_table(id_dtype))
        edges_tbl = pa.concat_tables(parts, promote_options="default")
        from quickwit_ray.pipelines.dedup import UnionFind

        uf = UnionFind()
        for a_v, b_v in zip(edges_tbl["a"].to_pylist(),
                            edges_tbl["b"].to_pylist()):
            uf.union(a_v, b_v)
        nodes = list(uf.parent)
        roots = [uf.find(x) for x in nodes]
        return ray.data.from_arrow(pa.table({
            "id": pa.array(nodes, id_dtype),
            "root": pa.array(roots, id_dtype)}))

    def symmetric(batch: pa.Table) -> pa.Table:
        a = batch["a"].combine_chunks().cast(id_dtype)
        b = batch["b"].combine_chunks().cast(id_dtype)
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a])})

    edges = pairs_ds.map_batches(symmetric, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(_empty_ids_table(id_dtype))

    labels = (pair_nodes(pairs_ds)
              .map_batches(lambda b: pa.table({
                  "node": b["id"].combine_chunks().cast(id_dtype),
                  "label": b["id"].combine_chunks().cast(id_dtype)}),
                  batch_format="pyarrow")
              .materialize())
    prev_sum = labels.aggregate(Sum("label"))["sum(label)"]
    converged = False
    rounds = 0
    for rnd in range(max_rounds):
        rounds = rnd + 1
        msgs = edges.join(labels, "inner", num_partitions,
                          on=("u",), right_on=("node",))
        # candidate labels for each node: its own + every neighbor's
        nbr = msgs.map_batches(
            lambda b: pa.table({"node": b["v"].combine_chunks(),
                                "label": b["label"].combine_chunks()}),
            batch_format="pyarrow")
        labels = (nbr.union(labels)
                  .groupby("node").aggregate(Min("label"))
                  .map_batches(lambda b: pa.table({
                      "node": b["node"].combine_chunks(),
                      "label": b["min(label)"].combine_chunks()}),
                      batch_format="pyarrow"))
        # pointer jumping: label(node) <- label(label(node)). Every label
        # value is itself a node (labels start as ids and min() only picks
        # existing ids), so the inner self-join is total. label(y) <= y,
        # so the jumped label can only improve — take it directly.
        labels = labels.materialize()
        jumped = labels.join(labels, "inner", num_partitions,
                             on=("label",), right_on=("node",),
                             right_suffix="_r")
        labels = (jumped.map_batches(
            lambda b: pa.table({
                "node": b["node"].combine_chunks(),
                "label": pc.min_element_wise(
                    b["label"].combine_chunks(),
                    b["label_r"].combine_chunks())}),
            batch_format="pyarrow")
            .materialize())
        cur_sum = labels.aggregate(Sum("label"))["sum(label)"]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_rounds} rounds "
            f"(components would be under-merged)")
    return labels.map_batches(
        lambda b: pa.table({"id": b["node"].combine_chunks(),
                            "root": b["label"].combine_chunks()}),
        batch_format="pyarrow")


def duplicate_ids(components_ds):
    """Rows of a components Dataset whose id is not its component root —
    the ids to drop under keep-first semantics."""

    def non_roots(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.equal(batch["id"], batch["root"])))

    return components_ds.map_batches(non_roots, batch_format="pyarrow")
