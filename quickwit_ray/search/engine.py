"""Root search — driver-side orchestration
(`quickwit-search/src/root.rs` re-expressed Ray-Data-first):

  1. prune the split manifest by time range + tags (driver-side semi-join,
     root.rs:1108-1154)
  2. count-only fast path answered from manifest num_docs sums
     (root.rs:638-695)
  3. fan out per-split leaf search: `from_items(split_jobs)` ->
     `map_batches(SearchSplitStage actor pool)` -> per-split top-k partial
     hits (an actor holds an LRU of open SplitReaders — the searcher's
     split/footer cache, node_config/mod.rs:206-278). A local in-process
     executor covers low-latency / test paths.
  4. driver merges partial hits with the reference comparator (sort keys
     in sort direction, trailing (split_id, doc_id) tie-break compared in
     the same direction, `collector.rs:834-991`)
  5. fetch-docs phase: group hits by split, point-lookup the doc store
     rows (fetch_docs.rs:41-267), optional snippets.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from dataclasses import dataclass, field as dc_field
from typing import Any, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from quickwit_ray.config import DocMapping, IndexConfig
from quickwit_ray.index.format import SplitReader
from quickwit_ray.search.ast import (
    MatchAll,
    SearchRequest,
    SortField,
    extract_tags,
    extract_timestamp_bounds,
)
from quickwit_ray.search.parser import parse_query
from quickwit_ray.search.split_search import SplitSearcher
from quickwit_ray.state.manifest import Manifest


@dataclass
class SearchResponse:
    num_hits: int
    hits: pd.DataFrame  # columns: split_id, doc_id, sort_key0, sort_key1, _score? + stored fields
    elapsed_sec: float = 0.0
    aggs: Optional[dict] = None
    failed_splits: list = dc_field(default_factory=list)
    # False when time-sorted split skipping pruned splits whose docs cannot
    # appear in the top-k (leaf.rs CanSplitDoBetter): num_hits is then a
    # lower bound, the ES "gte" relation
    num_hits_exact: bool = True
    # raw per-split agg partial states (only when the caller asked to keep
    # them — federated search merges partials ACROSS indexes)
    agg_partials: Optional[list] = None

    @property
    def scroll_cursor(self) -> Optional[tuple]:
        """search_after cursor = last hit's sort tuple (root.rs:342-441)."""
        if self.hits is None or not len(self.hits):
            return None
        from quickwit_ray.search.sortkeys import py_scalar

        last = self.hits.iloc[-1]
        return (py_scalar(last["sort_key0"]), py_scalar(last["sort_key1"]),
                str(last["_split_id"]), int(last["_doc_id"]))


def _split_stamp(split_dir: str) -> int:
    """Identity stamp of a split's artifacts. Split ids are derived from
    the source partition, NOT content — `clear()` + re-ingest under the
    same commit id recreates the same split_dir with different docs, so
    caches must key on the artifact generation too (footer.json is
    rewritten whenever the split is rebuilt)."""
    try:
        st = os.stat(os.path.join(split_dir, "footer.json"))
        return st.st_mtime_ns ^ (st.st_size << 1) ^ st.st_ino
    except OSError:
        return -1


class _ReaderCache:
    """Byte-bounded LRU of open SplitReaders (per process / per actor);
    thread-safe (HTTP handler threads share it) and generation-checked (a
    rebuilt split_dir gets a fresh reader, see _split_stamp).

    The budget bounds the readers' RETAINED bytes (dict columns, cached
    row groups, decoded postings, fieldnorms, fastfields) — the analog of
    the reference's byte-bound fast-field (1 GB) + footer (500 MB) caches
    (node_config/mod.rs:261-266). Readers grow lazily after insertion, so
    the budget is enforced on every access, not only on insert; the most
    recently used reader always survives (progress)."""

    def __init__(self, capacity: int = 64,
                 byte_budget: int = 1536 * 1024 * 1024):
        import threading

        self.capacity = capacity
        self.byte_budget = int(byte_budget)
        self._cache: OrderedDict[str, tuple[int, SplitReader]] = OrderedDict()
        self._lock = threading.Lock()
        self.evictions = 0
        self._gets = 0

    def _enforce_budget_locked(self) -> None:
        while len(self._cache) > self.capacity:
            self._cache.popitem(last=False)
            self.evictions += 1
        while len(self._cache) > 1 and self.retained_bytes_locked() \
                > self.byte_budget:
            self._cache.popitem(last=False)
            self.evictions += 1

    def retained_bytes_locked(self) -> int:
        return sum(r.retained_bytes for _, r in self._cache.values())

    @property
    def retained_bytes(self) -> int:
        with self._lock:
            return self.retained_bytes_locked()

    def get(self, split_dir: str) -> SplitReader:
        stamp = _split_stamp(split_dir)
        with self._lock:
            ent = self._cache.get(split_dir)
            if ent is not None and ent[0] == stamp:
                self._cache.move_to_end(split_dir)
                # readers grow lazily after insertion, so the budget is
                # re-checked on hits too — but only every 64th get (the
                # sweep sums every cached reader under the lock; doing it
                # per hit serializes the threaded leaf fan-out)
                self._gets += 1
                if self._gets % 64 == 0:
                    self._enforce_budget_locked()
                return ent[1]
        r = SplitReader(split_dir)
        with self._lock:
            self._cache[split_dir] = (stamp, r)
            self._enforce_budget_locked()
        return r

    def peek_bytes_read(self, split_dir: str) -> Optional[int]:
        """Cumulative materialized bytes of the cached reader, or None if
        no reader is open (permit accounting — never opens one)."""
        with self._lock:
            ent = self._cache.get(split_dir)
            return ent[1].bytes_read if ent is not None else None


_GLOBAL_READER_CACHE = _ReaderCache()

# MaxScore pruning for scored disjunctions (set False to force the naive
# full-scoring path — used by the equivalence tests)
ENABLE_MAXSCORE = True


class _LeafCache:
    """Thread-safe LRU of leaf-search partial results keyed by
    (split artifacts generation, request) — leaf_cache.rs
    LeafSearchCache analog.

    Entries are ``{"t": theta_pruned_under, "v": partial}`` and serve a
    lookup only when the REQUESTED theta dominates the stored one
    (requested >= stored, theta-None = fully exact, serves anything): a
    theta-pruned partial encodes an assumption about the OTHER splits of
    that execution (docs below theta were skipped because splits
    elsewhere already beat them) — if the split set later shrinks
    (retention, mark-for-deletion), the same request derives SMALLER
    thetas, fails the dominance test, and re-evaluates instead of
    reusing partials pruned against deleted competition. One key per
    (split, request) means timing-wobbly theta values never fragment
    the repeat-query hit rate. The artifact stamp (_split_stamp)
    catches split dirs rebuilt in place by clear()+re-ingest."""

    def __init__(self, capacity: int = 512,
                 byte_budget: int = 64 * 1024 * 1024):
        import threading

        self.capacity = capacity
        # the reference's LeafSearchCache is byte-bound at 64 MB
        # (node_config/mod.rs:266 partial_request_cache_capacity): one
        # giant agg partial must not hold entry-count-many budgets
        self.byte_budget = int(byte_budget)
        self._cache: OrderedDict[tuple, tuple[dict, int]] = OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    @property
    def retained_bytes(self) -> int:
        return self._bytes

    def get(self, key: tuple) -> Optional[dict]:
        with self._lock:
            ent = self._cache.get(key)
            if ent is None:
                self.misses += 1
                return None
            self._cache.move_to_end(key)
            self.hits += 1
            return ent[0]

    def put(self, key: tuple, val: dict, keep_old_if=None) -> None:
        """Insert/replace. ``keep_old_if(old_val)`` — checked UNDER the
        lock — skips the write when the existing entry should win (the
        dominance store uses it so a theta-pruned entry can never clobber
        a concurrently stored exact one)."""
        size = _approx_nbytes(val)
        if size > self.byte_budget:
            return  # larger than the whole cache: never stored
        with self._lock:
            if keep_old_if is not None:
                ent = self._cache.get(key)
                if ent is not None and keep_old_if(ent[0]):
                    return
            old = self._cache.pop(key, None)
            if old is not None:
                self._bytes -= old[1]
            self._cache[key] = (val, size)
            self._bytes += size
            while self._cache and (len(self._cache) > self.capacity
                                   or self._bytes > self.byte_budget):
                _, (_, sz) = self._cache.popitem(last=False)
                self._bytes -= sz

    def clear(self) -> None:
        with self._lock:
            self._cache.clear()
            self._bytes = 0


def _approx_nbytes(obj) -> int:
    """Recursive retained-size estimate for cached leaf partials (numpy
    arrays dominate; containers add per-slot overhead). Over-estimating
    is safe (earlier eviction), under-estimating is not."""
    if isinstance(obj, np.ndarray):
        return obj.nbytes + 96
    if isinstance(obj, (bytes, bytearray)):
        return len(obj) + 48
    if isinstance(obj, str):
        return len(obj) + 56
    if isinstance(obj, dict):
        return 64 + sum(_approx_nbytes(k) + _approx_nbytes(v)
                        for k, v in obj.items())
    if isinstance(obj, (list, tuple, set, frozenset)):
        return 56 + sum(_approx_nbytes(v) + 8 for v in obj)
    return 32  # numbers, None, bools, small scalars


_GLOBAL_LEAF_CACHE = _LeafCache()
ENABLE_LEAF_CACHE = True


def _manifest_stamp(index_dir: str) -> Optional[tuple]:
    """Freshness stamp for FILE-backend manifests: every mutation appends
    to manifest.log or atomically replaces manifest.json, so (mtime_ns,
    size, inode) over both catches all of them. SQL backends return None
    (uncacheable): sqlite's WAL can be overwritten in place at identical
    size within one mtime granule, which would serve stale state forever."""
    from quickwit_ray import storage

    if storage.is_object_uri(index_dir):
        # object roots: no inode identity to stamp; re-read the manifest
        # (one small GET) so read-your-writes holds across processes
        return None
    if os.path.exists(os.path.join(index_dir, "metastore.db")) \
            or os.path.exists(os.path.join(index_dir, "metastore.json")):
        return None
    parts = []
    for fn in ("manifest.json", "manifest.log"):
        try:
            stv = os.stat(os.path.join(index_dir, fn))
            parts.append((fn, stv.st_mtime_ns, stv.st_size, stv.st_ino))
        except OSError:
            parts.append((fn, -1, -1, -1))
    return tuple(parts)


import threading as _threading  # noqa: E402 — eager lock, no init race

_LEAF_POOL = None
_LEAF_POOL_LOCK = _threading.Lock()


def _leaf_thread_pool():
    """Process-wide persistent leaf-search thread pool (the reference's
    long-lived searcher runtime): queries share it instead of paying
    thread spawn per search. Leaf tasks never re-enter the pool, so no
    nesting deadlock; concurrency ACROSS queries is governed by the
    permit provider's byte budget + warmup slots, not pool width."""
    global _LEAF_POOL
    if _LEAF_POOL is None:
        with _LEAF_POOL_LOCK:
            if _LEAF_POOL is None:
                from concurrent.futures import ThreadPoolExecutor

                _LEAF_POOL = ThreadPoolExecutor(
                    max_workers=min(32, (os.cpu_count() or 8)),
                    thread_name_prefix="leaf-search")
    return _LEAF_POOL


_SEARCHER_CACHE: OrderedDict = OrderedDict()
_SEARCHER_CACHE_LOCK = _threading.Lock()
_SEARCHER_CACHE_CAP = 64

# process-wide default execution for get_searcher(execution=None). The
# HTTP serving tier sets this to "ray" (`SearchServer(search_execution=
# "ray")` / `serve --search-execution ray`): the server process becomes
# the reference's ROOT searcher node and leaf searches fan out to the
# persistent rendezvous-routed actor pool — long-lived LEAF searcher
# processes with split-affine caches (cluster_client.rs root/leaf model,
# Ray actors instead of gRPC peers).
_DEFAULT_EXECUTION = "local"


def set_default_search_execution(mode: str) -> None:
    if mode not in ("local", "ray", "ray-data"):
        raise ValueError(f"unknown search execution {mode!r}")
    global _DEFAULT_EXECUTION
    _DEFAULT_EXECUTION = mode


def get_searcher(index_dir: str, execution: Optional[str] = None) -> "IndexSearcher":
    """Process-wide LRU of searchers with manifest-freshness validation:
    a fresh ``IndexSearcher`` re-reads the whole manifest (O(state) at
    10^5+ splits), which is wasteful once per HTTP request. The stamp
    preserves read-your-writes: any file-backend manifest mutation
    touches a stamped file and rebuilds the searcher. SQL-backed indexes
    and "ray-data" executions construct fresh (no reliable stamp / batch
    one-shot semantics); "ray" searchers ARE cached, and the leaf actor
    pool is process-global + mapping-agnostic, so leaf actors (and their
    split-affine reader caches) survive split publishes and searcher
    rebuilds by construction."""
    if execution is None:
        execution = _DEFAULT_EXECUTION
    stamp = _manifest_stamp(index_dir)
    if execution == "ray-data" or stamp is None:
        return IndexSearcher(index_dir, execution=execution)
    key = (index_dir, execution)
    with _SEARCHER_CACHE_LOCK:
        ent = _SEARCHER_CACHE.get(key)
        if ent is not None and ent[0] == stamp:
            _SEARCHER_CACHE.move_to_end(key)
            return ent[1]
    s = IndexSearcher(index_dir, execution=execution)
    with _SEARCHER_CACHE_LOCK:
        ent = _SEARCHER_CACHE.get(key)
        if ent is not None and ent[0] == stamp:  # lost the build race
            _SEARCHER_CACHE.move_to_end(key)
            return ent[1]
        _SEARCHER_CACHE[key] = (stamp, s)
        _SEARCHER_CACHE.move_to_end(key)
        while len(_SEARCHER_CACHE) > _SEARCHER_CACHE_CAP:
            _SEARCHER_CACHE.popitem(last=False)
    return s


def leaf_search_one(split_dir: str, mapping: DocMapping, request: SearchRequest,
                    cache: Optional[_ReaderCache] = None,
                    theta0: Optional[float] = None,
                    request_key: Optional[tuple] = None) -> dict:
    """Leaf search over one split -> partial result dict (memoized in the
    process-wide :class:`_LeafCache`; the repeated-dashboard-query case
    skips the split read entirely).

    ``theta0`` is the cross-split kth-score threshold hint (leaf.rs
    CanSplitDoBetter sharing): the pruned scoring paths start from it
    instead of -inf, so later splits skip scoring docs that provably
    cannot enter the global top-k. The match mask (num_hits) stays exact;
    only sub-threshold scoring work is skipped. The cached entry records
    the theta it was pruned under and serves any request whose theta
    DOMINATES it (requested >= stored) — a partial pruned at t contains
    every doc scoring >= t, which is a superset of what any threshold
    >= t needs (see _LeafCache)."""
    import copy

    key = None
    if ENABLE_LEAF_CACHE:
        # ENABLE_MAXSCORE is in the key so the pruned-vs-naive
        # equivalence tests compare real evaluations, not cache hits;
        # the artifact stamp guards the rebuilt-split-dir staleness
        # case (see _LeafCache). Callers iterating many splits pass
        # request_key (repr(request), str(mapping)) computed ONCE per
        # query instead of per split.
        if request_key is None:
            request_key = (repr(request), str(mapping))
        key = (split_dir, _split_stamp(split_dir)) + request_key \
            + (ENABLE_MAXSCORE,)
        ent = _GLOBAL_LEAF_CACHE.get(key)
        if ent is not None:
            t_stored = ent["t"]
            # dominance rule: theta-None entries are fully exact; a
            # pruned entry serves only thresholds >= its own. A shrunken
            # split set (retention, deletes) derives SMALLER thetas, so
            # partials pruned against deleted competition fail this test
            # and re-evaluate — same safety the old theta-in-key
            # encoding gave, but repeat queries with timing-wobbly
            # thetas now hit instead of fragmenting the key space.
            if t_stored is None or (theta0 is not None
                                    and theta0 >= t_stored):
                hit = ent["v"]
                if "agg_partial" in hit:
                    # deep copy: the agg merge folds partials in place
                    return copy.deepcopy(hit)
                return dict(hit)  # hit/sort arrays consumed read-only
    # memory-budgeted admission (search_permit_provider.rs): reserve a
    # pessimistic warmup allocation before touching the split, report the
    # reader's actual materialized bytes after, release on completion.
    # FIFO + byte budget: concurrent fat queries degrade to sequential
    # under pressure instead of OOMing the process.
    from quickwit_ray.search.permits import get_permit_provider

    provider = get_permit_provider()
    rc = cache or _GLOBAL_READER_CACHE
    with provider.acquire_for_split(split_dir) as permit:
        b0 = rc.peek_bytes_read(split_dir) or 0
        out = _leaf_search_impl(split_dir, mapping, request, cache, theta0)
        b1 = rc.peek_bytes_read(split_dir)
        if b1 is not None:
            # post-warmup correction: hold the MEASURED bytes (cache-warm
            # repeats free their pessimistic reservation immediately)
            permit.set_actual_memory(b1 - b0)
    # store under the single (split, request) key, tagged with the theta
    # this evaluation was pruned under. keep_old_if runs UNDER the cache
    # lock: a concurrent thread's MORE complete entry (smaller / None
    # theta) always survives — a pruned result can never clobber it.
    if key is not None:
        _GLOBAL_LEAF_CACHE.put(
            key, {"t": theta0, "v": copy.deepcopy(out)
                  if "agg_partial" in out else dict(out)},
            keep_old_if=lambda old: old["t"] is None or (
                theta0 is not None and old["t"] <= theta0))
    return out


def _leaf_search_impl(split_dir: str, mapping: DocMapping,
                      request: SearchRequest,
                      cache: Optional[_ReaderCache] = None,
                      theta0: Optional[float] = None) -> dict:
    from quickwit_ray.functions.tokenizers import tokenize
    from quickwit_ray.search.ast import FullTextQuery

    reader = (cache or _GLOBAL_READER_CACHE).get(split_dir)
    searcher = SplitSearcher(reader, mapping)
    scoring = any(sf.field == "_score" for sf in request.sort_fields)
    k_hint = request.start_offset + request.max_hits
    node = request.query

    # Block-Max fast path: single scored term, plain desc-_score sort, no
    # aggs / timestamp filter / cursor -> decode only the posting blocks
    # whose block_max_tf upper bound can reach the top-k
    if (ENABLE_MAXSCORE and scoring and k_hint > 0 and request.aggs is None
            and request.search_after is None and request.timestamp_field is None
            and len(request.sort_fields) == 1
            and request.sort_fields[0].order == "desc"):
        single = None
        if isinstance(node, FullTextQuery) and node.mode in ("or", "and") \
                and mapping.resolve_json_path(node.field) is None:
            try:
                fm = mapping.resolve_field(node.field)
            except KeyError:
                fm = None
            if fm is not None and fm.type == "text":
                ts = tokenize(node.text, fm.tokenizer)
                if len(ts) == 1:
                    single = (node.field, ts[0])
        if single is not None:
            res = searcher.term_topk_blockmax(single[0], single[1], k_hint,
                                              theta0=theta0)
            if res is not None:
                docs, scores_sub, df = res
                if len(docs) > 4 * k_hint + 64:
                    # preselect by score, keeping all boundary ties for the
                    # exact doc-id tie-break
                    kth = np.partition(-scores_sub, k_hint - 1)[k_hint - 1]
                    keep = -scores_sub <= kth
                    docs, scores_sub = docs[keep], scores_sub[keep]
                order = np.lexsort((-docs, -scores_sub))[:k_hint]
                return {
                    "num_hits": int(df), "split_dir": split_dir,
                    "doc_ids": docs[order].astype(np.int64),
                    "sort_key0": scores_sub[order].astype(np.float64),
                    "sort_key1": np.zeros(len(order)),
                }

    pruned = None
    # NOTE: gated on timestamp_field is None — the timestamp row-filter is
    # applied after scoring, so a pruned evaluation (partial scores below
    # theta) would surface wrongly-scored docs once out-of-window top docs
    # are masked away. With a window, score fully.
    if (ENABLE_MAXSCORE and scoring and k_hint > 0
            and request.timestamp_field is None
            and request.search_after is None and len(request.sort_fields) == 1
            and request.sort_fields[0].field == "_score"
            and request.sort_fields[0].order == "desc"
            and isinstance(node, FullTextQuery) and node.mode == "or"
            and mapping.resolve_json_path(node.field) is None):
        try:
            fm = mapping.resolve_field(node.field)
        except KeyError:
            fm = None
        if fm is not None and fm.type == "text":
            terms = tokenize(node.text, fm.tokenizer)
            if len(terms) > 1:
                pruned = searcher.eval_or_topk_pruned(node.field, terms, k_hint,
                                                      theta0=theta0)
    if pruned is not None:
        mask, scores = pruned
    else:
        mask, scores = searcher.eval(request.query, scoring)
    # apply the request's timestamp window within the split (split pruning
    # only removes fully-disjoint splits; boundary splits need a row filter)
    if request.timestamp_field and (request.start_timestamp is not None
                                    or request.end_timestamp is not None):
        ts = reader.fast_field(request.timestamp_field)
        if request.start_timestamp is not None:
            mask = mask & (ts >= request.start_timestamp)
        if request.end_timestamp is not None:
            mask = mask & (ts < request.end_timestamp)
    num_hits = int(mask.sum())
    out: dict[str, Any] = {"num_hits": num_hits, "split_dir": split_dir}
    k = request.start_offset + request.max_hits
    if k > 0 and num_hits:
        docs, k0, k1 = searcher.collect_top_k(
            mask, scores, request.sort_fields, k, request.search_after,
            split_id=os.path.basename(split_dir))
        out["doc_ids"] = docs.astype(np.int64)
        out["sort_key0"] = k0
        out["sort_key1"] = k1
    else:
        out["doc_ids"] = np.empty(0, np.int64)
        out["sort_key0"] = np.empty(0)
        out["sort_key1"] = np.empty(0)
    if request.aggs:
        from quickwit_ray.search.aggs import compute_partial_aggs

        out["agg_partial"] = compute_partial_aggs(request.aggs, searcher, mask)
    return out


def _warm_arrow() -> None:
    """One tiny in-memory zstd parquet round-trip. A fresh worker process
    pays ~270 ms of one-time Arrow/zstd/thread-pool initialization on its
    FIRST parquet read (measured: first split open 270-410 ms vs 35-60 ms
    for every later one, independent of the split). Calling this in actor
    __init__ moves that cost to pool construction — concurrent across
    actors, before any query — instead of query 1's critical path."""
    import io

    import pyarrow.parquet as pq

    try:
        buf = io.BytesIO()
        pq.write_table(pa.table({"a": [1, 2], "b": ["x", "y"]}), buf,
                       compression="zstd")
        buf.seek(0)
        pq.read_table(buf)
    except Exception:  # noqa: BLE001 — warmup is best-effort
        pass


class SearchSplitStage:
    """Ray Data actor-pool stage: one call = leaf searches for a batch of
    split work items. Holds the split reader LRU across batches. Used for
    BATCH search jobs (one-shot fan-outs over many splits)."""

    def __init__(self, mapping_json: dict, request: SearchRequest, cache_size: int = 64):
        from quickwit_ray.config import IndexConfig as _IC

        self.mapping = _IC.from_json(
            {"index_id": "x", "doc_mapping": mapping_json}).doc_mapping
        self.request = request
        self.cache = _ReaderCache(cache_size)
        _warm_arrow()

    def __call__(self, batch: dict[str, np.ndarray]) -> dict[str, list]:
        import pickle

        results = []
        for split_dir in [str(p) for p in batch["split_dir"]]:
            results.append(pickle.dumps(
                leaf_search_one(split_dir, self.mapping, self.request, self.cache)))
        return {"partial": results}


class _SearchActorPool:
    """Persistent MAPPING-AGNOSTIC leaf-search actor pool — the
    reference's long-lived searcher processes with split-affinity routing
    (rendezvous hashing of split -> searcher so each split's
    footer/posting caches live on one actor, search_job_placer.rs
    semantics). As in the reference, leaf requests CARRY the doc mapping
    (LeafSearchRequest ships the serialized doc mapper), so one pool
    serves every index; actors cache parsed mappings by key, and callers
    broadcast the mapping JSON once via ``ray.put`` instead of pickling
    it per leaf call. Actors reserve FRACTIONAL CPUs (0.25): leaf servers
    sit idle between queries, and a full-CPU logical reservation starves
    concurrent Ray Data build jobs (observed scheduling deadlock on small
    clusters — N cached pools x num_cpus=1 pins every logical CPU)."""

    ACTOR_NUM_CPUS = 0.25

    def __init__(self, size: int):
        import ray

        @ray.remote(num_cpus=self.ACTOR_NUM_CPUS)
        class _SearchActor:
            def __init__(self):
                self._mappings: dict = {}  # mapping_key -> DocMapping
                self.cache = _ReaderCache(64)
                _warm_arrow()  # pay one-time Arrow init here, not on query 1

            def _mapping(self, key: str, mapping_json: dict):
                m = self._mappings.get(key)
                if m is None:
                    from quickwit_ray.config import IndexConfig as _IC

                    m = _IC.from_json({"index_id": "x",
                                       "doc_mapping": mapping_json}).doc_mapping
                    self._mappings[key] = m
                return m

            def leaf(self, split_dir: str, mapping_key: str,
                     mapping_json: dict, request_blob: bytes,
                     theta0: Optional[float] = None) -> bytes:
                import pickle

                request = pickle.loads(request_blob)
                return pickle.dumps(leaf_search_one(
                    split_dir, self._mapping(mapping_key, mapping_json),
                    request, self.cache, theta0=theta0))

        self._factory = _SearchActor
        self.actors = [_SearchActor.remote() for _ in range(size)]
        self.retries = 0  # observability: leaf retries after actor failure

    def _route(self, split_dir: str) -> int:
        import hashlib

        h = int(hashlib.md5(os.path.basename(split_dir).encode()).hexdigest()[:8], 16)
        return h % len(self.actors)

    def submit(self, split_dir: str, mapping_key: str, mapping_ref,
               request_blob: bytes, theta0: Optional[float] = None):
        """One leaf search future, affinity-routed. ``mapping_ref`` is the
        ``ray.put`` ObjectRef of the doc-mapping JSON (auto-dereferenced
        actor-side from the local object store)."""
        return self.actors[self._route(split_dir)].leaf.remote(
            split_dir, mapping_key, mapping_ref, request_blob, theta0)

    def retry_leaf(self, split_dir: str, mapping_key: str, mapping_ref,
                   request_blob: bytes, theta0: Optional[float],
                   error: Exception) -> dict:
        """One retry on a DIFFERENT actor after a leaf failure (the
        reference retries a failed leaf on another searcher node,
        cluster_client.rs / retry/*). A dead primary is replaced in its
        slot so subsequent queries regain the affinity route instead of
        failing forever."""
        import pickle

        import ray

        self.retries += 1
        i = self._route(split_dir)
        try:
            # probe-free revival: dead actors raise RayActorError on use
            if isinstance(error, ray.exceptions.RayActorError):
                self.actors[i] = self._factory.remote()
        except Exception:  # noqa: BLE001 — revival is best-effort
            pass
        alt = self.actors[(i + 1) % len(self.actors)] \
            if len(self.actors) > 1 else self.actors[i]
        try:
            return pickle.loads(ray.get(alt.leaf.remote(
                split_dir, mapping_key, mapping_ref, request_blob, theta0)))
        except Exception as exc:  # noqa: BLE001 — one retry, then report
            return {"failed": os.path.basename(split_dir),
                    "error": f"{error}; retry: {exc}"}

    def search(self, split_dirs: list[str], mapping_key: str, mapping_ref,
               request: SearchRequest,
               theta0: Optional[float] = None) -> list[dict]:
        import pickle

        import ray

        blob = pickle.dumps(request)
        futs = [(d, self.submit(d, mapping_key, mapping_ref, blob, theta0))
                for d in split_dirs]
        out = []
        for d, f in futs:
            try:
                out.append(pickle.loads(ray.get(f)))
            except Exception as exc:  # noqa: BLE001
                out.append(self.retry_leaf(d, mapping_key, mapping_ref,
                                           blob, theta0, exc))
        return out

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a, no_restart=True)
        self.actors = []


_SHARED_ACTOR_POOL: Optional[_SearchActorPool] = None
_SHARED_ACTOR_POOL_LOCK = _threading.Lock()


def _shared_actor_pool() -> _SearchActorPool:
    """The process-global leaf tier: every ``execution="ray"`` searcher
    without an explicit ``concurrency`` shares ONE pool (the reference's
    cluster-wide set of searcher nodes — leaf processes are shared by all
    indexes, not per-index). Sized to the cluster CPUs once, at first use."""
    global _SHARED_ACTOR_POOL
    if _SHARED_ACTOR_POOL is None or not _SHARED_ACTOR_POOL.actors:
        with _SHARED_ACTOR_POOL_LOCK:
            if _SHARED_ACTOR_POOL is None or not _SHARED_ACTOR_POOL.actors:
                import ray

                size = max(2, min(64, int(
                    ray.cluster_resources().get("CPU", 8))))
                _SHARED_ACTOR_POOL = _SearchActorPool(size)
    return _SHARED_ACTOR_POOL


def shutdown_shared_actor_pool() -> None:
    global _SHARED_ACTOR_POOL
    with _SHARED_ACTOR_POOL_LOCK:
        if _SHARED_ACTOR_POOL is not None:
            _SHARED_ACTOR_POOL.shutdown()
            _SHARED_ACTOR_POOL = None


def _score_theta_mode(request: SearchRequest) -> bool:
    """Queries eligible for cross-split kth-SCORE sharing: single-key
    descending _score sort with a top-k and no cursor (the pruned leaf
    paths apply their own stricter guards)."""
    return (request.max_hits > 0 and request.search_after is None
            and len(request.sort_fields) == 1
            and request.sort_fields[0].field == "_score"
            and request.sort_fields[0].order == "desc")


def merge_partial_hits(partials: list[dict], request: SearchRequest,
                       split_ids: dict[str, str]) -> pd.DataFrame:
    """Merge per-split top-k lists with the reference comparator
    (collector.rs:1086-1184): compare sort keys in sort direction, then
    GlobalDocAddress (split_id, doc_id) in the SAME direction."""
    parts = [p for p in partials if len(p["doc_ids"])]
    if not parts:
        return pd.DataFrame(columns=["_split_id", "_split_dir", "_doc_id",
                                     "sort_key0", "sort_key1"])
    counts = [len(p["doc_ids"]) for p in parts]
    # one frame from concatenated arrays (candidate set is <= splits * k)
    df = pd.DataFrame({
        "_split_id": np.repeat(np.asarray(
            [split_ids[p["split_dir"]] for p in parts], object), counts),
        "_split_dir": np.repeat(np.asarray(
            [p["split_dir"] for p in parts], object), counts),
        "_doc_id": np.concatenate(
            [np.asarray(p["doc_ids"]) for p in parts]),
        # dtype follows the parts: pure-float score keys stay float64
        # (callers np.allclose them), int/str exact keys are object
        "sort_key0": np.concatenate(
            [np.asarray(p["sort_key0"]) for p in parts]),
        "sort_key1": np.concatenate(
            [np.asarray(p["sort_key1"]) for p in parts]),
    })
    sfs = (list(request.sort_fields) or [SortField("_doc", "desc")])[:2]
    # exact comparator over Python scalars — float64 would corrupt
    # i64/u64 sort keys beyond 2^53 (sortkeys.py)
    from quickwit_ray.search.sortkeys import exact_hit_sort

    return exact_hit_sort(df, sfs, request.start_offset, request.max_hits)


class IndexSearcher:
    """User-facing search entry for one index directory."""

    def __init__(self, index_dir: str, execution: str = "local",
                 concurrency: Optional[int] = None):
        self.index_dir = index_dir
        self.manifest = Manifest(index_dir)
        if self.manifest.index_config_json is None:
            raise FileNotFoundError(f"no index at {index_dir}")
        self.config = IndexConfig.from_json(self.manifest.index_config_json)
        self.mapping = self.config.doc_mapping
        self.execution = execution
        self.concurrency = concurrency
        self._actor_pool: Optional[_SearchActorPool] = None
        self._mapping_key: Optional[str] = None  # sha1 of canonical mapping
        self._mapping_ref = None  # ray.put broadcast of the mapping JSON

    # ------------------------------------------------------------------

    def _resolve_query(self, query: Any) -> Any:
        if isinstance(query, str):
            return parse_query(query, self.mapping.default_search_fields)
        return query

    def search(self, query: Any = None, *, max_hits: int = 10, start_offset: int = 0,
               sort_by: Any = None, aggs: Optional[dict] = None,
               start_timestamp: Optional[int] = None,
               end_timestamp: Optional[int] = None,
               search_after: Optional[tuple] = None,
               fetch_fields: Optional[list[str]] = None,
               snippet_fields: tuple = (),
               keep_agg_partials: bool = False) -> SearchResponse:
        import time as _time

        t0 = _time.time()
        if aggs:
            from quickwit_ray.search.aggs import validate_aggs
            validate_aggs(aggs, self.mapping)
        node = self._resolve_query(query if query is not None else MatchAll())
        sort_fields = _normalize_sort(sort_by)
        # ---- split pruning (time range from args AND query AST, + tags)
        ts_field = self.mapping.timestamp_field
        lo, hi = start_timestamp, end_timestamp
        if ts_field:
            qlo, qhi = extract_timestamp_bounds(node, ts_field)
            if qlo is not None:
                lo = qlo if lo is None else max(lo, qlo)
            if qhi is not None:
                hi = qhi if hi is None else min(hi, qhi)
        request = SearchRequest(query=node, max_hits=max_hits,
                                start_offset=start_offset,
                                sort_fields=tuple(sort_fields), aggs=aggs,
                                search_after=search_after,
                                snippet_fields=tuple(snippet_fields),
                                start_timestamp=start_timestamp,
                                end_timestamp=end_timestamp,
                                timestamp_field=ts_field if (
                                    start_timestamp is not None
                                    or end_timestamp is not None) else None)
        tags = extract_tags(node, self.mapping.tag_fields)
        splits = self.manifest.list_splits(lo, hi, tags)

        # ---- count-only fast path: match-all + no aggs answered from metadata
        if max_hits == 0 and aggs is None and isinstance(node, MatchAll) \
                and lo is None and hi is None:
            total = sum(s.num_docs for s in splits)
            return SearchResponse(num_hits=total, hits=_empty_hits(),
                                  elapsed_sec=_time.time() - t0)

        split_dirs = [os.path.join(self.index_dir, "splits", s.split_id) for s in splits]
        split_ids = dict(zip(split_dirs, [s.split_id for s in splits]))
        # CanSplitDoBetter (leaf.rs:958-1326): for a single-key sort on the
        # timestamp field, order splits most-promising-first by their time
        # range and SKIP splits whose whole range cannot beat the running
        # kth value. Otherwise: longest-first (straggler hiding).
        ts_sort_dir = None
        if (ts_field and len(sort_fields) == 1
                and sort_fields[0].field == ts_field
                and request.max_hits > 0 and aggs is None
                and request.search_after is None):
            ts_sort_dir = sort_fields[0].order
        if ts_sort_dir == "desc":
            order = np.argsort(
                [-(s.time_range_end if s.time_range_end is not None else 2**62)
                 for s in splits], kind="stable")
        elif ts_sort_dir == "asc":
            order = np.argsort(
                [(s.time_range_start if s.time_range_start is not None else -2**62)
                 for s in splits], kind="stable")
        else:
            order = np.argsort([-s.num_docs for s in splits], kind="stable")
        split_dirs = [split_dirs[i] for i in order]
        bounds = None
        if ts_sort_dir is not None:
            bounds = [(splits[i].time_range_start, splits[i].time_range_end)
                      for i in order]

        partials, skipped = self._execute(split_dirs, request, bounds,
                                          ts_sort_dir)
        failed = [p for p in partials if "failed" in p]
        partials = [p for p in partials if "failed" not in p]
        for f in failed:
            # REQUEST errors (agg limits) must surface as a rejection,
            # not hide inside failed_splits as an empty-looking result
            # (same class as the round-3 `missing` advice finding)
            if "aggregation bucket limit" in str(f.get("error", "")):
                raise ValueError(f["error"])

        num_hits = sum(p["num_hits"] for p in partials)
        hits = merge_partial_hits(partials, request, split_ids)
        merged_aggs = None
        agg_partials = None
        if aggs:
            from quickwit_ray.search.aggs import merge_partial_aggs

            agg_partials = [p["agg_partial"] for p in partials]
            merged_aggs = merge_partial_aggs(aggs, agg_partials)
        if len(hits) and (fetch_fields is None or fetch_fields):
            hits = self._fetch_docs(hits, fetch_fields, request)
        return SearchResponse(num_hits=num_hits, hits=hits, aggs=merged_aggs,
                              failed_splits=failed,
                              elapsed_sec=_time.time() - t0,
                              num_hits_exact=skipped == 0,
                              agg_partials=(agg_partials if keep_agg_partials
                                            else None))

    # ------------------------------------------------------------------

    @staticmethod
    def _kth_threshold(partials: list[dict], k: int, desc: bool) -> Optional[float]:
        """Current kth-best primary sort value across collected partials."""
        keys = np.concatenate([p["sort_key0"] for p in partials
                               if "failed" not in p and len(p["sort_key0"])]
                              or [np.empty(0)])
        if len(keys) < k:
            return None
        keys = np.sort(keys)
        return float(keys[len(keys) - k] if desc else keys[k - 1])

    @staticmethod
    def _split_can_do_better(bound: tuple, theta: Optional[float],
                             desc: bool) -> bool:
        if theta is None:
            return True
        lo, hi = bound
        if desc:
            return hi is None or float(hi) >= theta
        return lo is None or float(lo) <= theta

    def _execute(self, split_dirs: list[str], request: SearchRequest,
                 bounds: Optional[list[tuple]] = None,
                 ts_sort_dir: Optional[str] = None) -> tuple[list[dict], int]:
        if not split_dirs:
            return [], 0
        if self.execution == "ray" and len(split_dirs) > 1:
            return self._execute_ray(split_dirs, request, bounds, ts_sort_dir)
        if self.execution == "ray-data" and len(split_dirs) > 1:
            return self._execute_ray_data(split_dirs, request), 0
        k = request.start_offset + request.max_hits
        desc = ts_sort_dir == "desc"
        score_mode = _score_theta_mode(request)
        # threaded local fan-out (the reference searches leaves
        # CONCURRENTLY with a shared kth score, leaf.rs): numpy + Arrow
        # decompression release the GIL, so threads overlap real work.
        # The sequential path stays for time-sorted skipping, where split
        # order IS the pruning structure.
        if bounds is None and len(split_dirs) > 1 and self.execution == "local":
            return self._execute_threads(split_dirs, request, score_mode,
                                         k), 0
        out: list[dict] = []
        skipped = 0
        rkey = (repr(request), str(self.mapping))  # once, not per split
        for i, d in enumerate(split_dirs):
            if bounds is not None:
                theta = self._kth_threshold(out, k, desc)
                if not self._split_can_do_better(bounds[i], theta, desc):
                    # splits are ordered by the same criterion: everything
                    # after this one is provably no better either
                    skipped = len(split_dirs) - i
                    break
            # cross-split kth-score sharing: later splits start their
            # pruned scoring at the running global kth score
            theta0 = (self._kth_threshold(out, k, True)
                      if score_mode else None)
            try:
                out.append(leaf_search_one(d, self.mapping, request,
                                           theta0=theta0, request_key=rkey))
            except Exception as exc:  # noqa: BLE001 — report, don't fail the query
                out.append({"failed": os.path.basename(d), "error": str(exc)})
        return out, skipped

    def _execute_threads(self, split_dirs: list[str],
                         request: SearchRequest, score_mode: bool,
                         k: int) -> list[dict]:
        """Concurrent leaf search on the process-wide PERSISTENT thread
        pool (creating a pool per query cost ~5 thread spawns / several
        ms per search) with a shared running kth-score threshold: a leaf
        starting later reads the threshold the finished leaves
        established (approximate — timing-dependent — but pruning only
        ever skips provably sub-kth docs, so results are exact either
        way)."""
        import threading

        done: list[dict] = []  # theta source only (completion order)
        lock = threading.Lock()
        rkey = (repr(request), str(self.mapping))  # once, not per split

        def run(d: str) -> dict:
            theta0 = None
            if score_mode:
                with lock:
                    theta0 = self._kth_threshold(done, k, True)
            try:
                r = leaf_search_one(d, self.mapping, request, theta0=theta0,
                                    request_key=rkey)
            except Exception as exc:  # noqa: BLE001 — report, don't fail
                r = {"failed": os.path.basename(d), "error": str(exc)}
            with lock:
                done.append(r)
            return r

        # SUBMISSION order, not completion order: agg merges fold float
        # sums / sketches in list order and must stay deterministic
        # run-to-run
        return list(_leaf_thread_pool().map(run, split_dirs))

    def _execute_ray_data(self, split_dirs: list[str],
                          request: SearchRequest) -> list[dict]:
        """Dataset-API leaf fan-out: from_items(split jobs) ->
        map_batches(SearchSplitStage actor pool). One-shot BATCH search
        jobs over many splits (e.g. offline evaluation sweeps) — the
        streaming executor schedules/pipelines the pool; the persistent
        rendezvous-routed pool (execution="ray") stays the low-latency
        path because it keeps reader caches split-affine across queries."""
        import pickle

        import ray
        import ray.data

        conc = self.concurrency or max(
            1, min(len(split_dirs), int(ray.cluster_resources().get("CPU", 8))))
        ds = ray.data.from_items([{"split_dir": d} for d in split_dirs])
        out = ds.map_batches(
            SearchSplitStage,
            fn_constructor_kwargs=dict(
                mapping_json=self.config.to_json()["doc_mapping"],
                request=request),
            concurrency=min(conc, len(split_dirs)), batch_size=4,
            num_cpus=1)
        results = []
        for batch in out.iter_batches(batch_size=None, batch_format="pandas"):
            for blob in batch["partial"]:
                results.append(pickle.loads(blob))
        return results

    def _execute_ray(self, split_dirs: list[str], request: SearchRequest,
                     bounds: Optional[list[tuple]] = None,
                     ts_sort_dir: Optional[str] = None) -> tuple[list[dict], int]:
        import ray

        if self.concurrency:
            # explicit concurrency -> PRIVATE pool (isolation for tests /
            # embedders); the default path shares the process-global tier
            if self._actor_pool is None or not self._actor_pool.actors:
                self._actor_pool = _SearchActorPool(self.concurrency)
            pool = self._actor_pool
        else:
            pool = _shared_actor_pool()
            self._actor_pool = pool  # observability (cluster endpoint, tests)
        if self._mapping_ref is None:
            import hashlib
            import json as _json

            mj = self.config.to_json()["doc_mapping"]
            self._mapping_key = hashlib.sha1(
                _json.dumps(mj, sort_keys=True).encode()).hexdigest()
            self._mapping_ref = ray.put(mj)  # broadcast once, not per leaf
        mkey, mref = self._mapping_key, self._mapping_ref
        score_mode = _score_theta_mode(request)
        if bounds is None and not score_mode:
            return pool.search(split_dirs, mkey, mref, request), 0
        # SLIDING-WINDOW dispatch (no wave barrier): keep up to 2x pool
        # width in flight; as each leaf completes, refresh the running kth
        # threshold — a split-skip bound for time-sorted queries, a scoring
        # theta hint for scored ones — and dispatch the next global split.
        # Global dispatch order is preserved, so the time-sorted skip keeps
        # its prefix semantics; affinity routing keeps reader caches warm.
        import pickle

        import ray

        k = request.start_offset + request.max_hits
        desc = ts_sort_dir == "desc"
        window = 2 * max(len(pool.actors), 1)
        blob = pickle.dumps(request)
        out: list[dict] = []
        skipped = 0
        pending: dict = {}
        i = 0
        while i < len(split_dirs) or pending:
            while i < len(split_dirs) and len(pending) < window:
                if bounds is not None:
                    theta = self._kth_threshold(out, k, desc)
                    if not self._split_can_do_better(bounds[i], theta, desc):
                        skipped = len(split_dirs) - i
                        i = len(split_dirs)
                        break
                theta0 = (self._kth_threshold(out, k, True)
                          if score_mode else None)
                fut = pool.submit(split_dirs[i], mkey, mref, blob, theta0)
                pending[fut] = split_dirs[i]
                i += 1
            if not pending:
                break
            done, _ = ray.wait(list(pending), num_returns=1)
            for f in done:
                d = pending.pop(f)
                try:
                    out.append(pickle.loads(ray.get(f)))
                except Exception as exc:  # noqa: BLE001
                    # retry once on a different actor (theta0=None: a
                    # full evaluation is exact under any competition)
                    out.append(pool.retry_leaf(d, mkey, mref, blob, None,
                                               exc))
        return out, skipped

    # ------------------------------------------------------------------

    def _fetch_docs(self, hits: pd.DataFrame, fetch_fields: Optional[list[str]],
                    request: SearchRequest) -> pd.DataFrame:
        """fetch_docs phase: group top hits by split, point-lookup doc-store
        rows, keep the merged order."""
        dynamic_extra = fetch_fields is None and self.mapping.mode == "dynamic"
        if fetch_fields is None:
            fetch_fields = [f.name for f in self.mapping.stored_fields
                            if f.type != "bytes"]
        mapped = {f.name for f in self.mapping.field_mappings}
        pieces = []
        for split_dir, grp in hits.groupby("_split_dir", sort=False):
            reader = _GLOBAL_READER_CACHE.get(str(split_dir))
            cols = [c for c in fetch_fields]
            if dynamic_extra:
                # dynamic-mode hits render their catch-all columns too
                # (the doc store keeps unmapped fields; doc_mapper.rs
                # dynamic field)
                cols += [c for c in reader.docstore_columns()
                         if c not in mapped and c not in cols]
            tbl = reader.fetch_docs(grp["_doc_id"].to_numpy(), columns=cols)
            sub = tbl.to_pandas()
            sub.index = grp.index
            pieces.append(sub)
        if pieces:
            docs = pd.concat(pieces).sort_index()
            hits = pd.concat([hits, docs], axis=1)
        if request.snippet_fields:
            from quickwit_ray.search.snippets import generate_snippets

            hits = generate_snippets(hits, request, self.mapping)
        return hits


def _normalize_sort(sort_by: Any) -> list[SortField]:
    if sort_by is None:
        return []
    if isinstance(sort_by, str):
        sort_by = [sort_by]
    out = []
    for s in sort_by:
        if isinstance(s, SortField):
            out.append(s)
            continue
        s = s.strip()
        if s.startswith("-"):
            out.append(SortField(s[1:], "desc"))
        elif s.startswith("+"):
            out.append(SortField(s[1:], "asc"))
        else:
            # reference default order for explicit sort fields is desc
            out.append(SortField(s, "desc"))
    return out


def _empty_hits() -> pd.DataFrame:
    return pd.DataFrame(columns=["_split_id", "_split_dir", "_doc_id",
                                 "sort_key0", "sort_key1"])
