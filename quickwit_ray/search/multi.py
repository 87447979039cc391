"""Multi-index (federated) search — the reference's root search resolves
index-id patterns and fans the same request over every matching index's
splits, merging leaves with one comparator (`quickwit-search/src/root.rs`
multi-index resolution; ES comma/wildcard index targets).

Each index searches with its own mapping/tokenizers; partial hits merge
with the standard comparator (sort keys in sort direction, then the
(split_id, doc_id) address); start_offset applies AFTER the cross-index
merge (each index contributes its full top offset+k); aggregations merge
from the per-split PARTIAL states across indexes (same agg tree
required); the fetch phase routes every hit back to its own index."""

from __future__ import annotations

import os
from typing import Any, Optional

import pandas as pd

from quickwit_ray.search.engine import (
    SearchResponse,
    _empty_hits,
    _normalize_sort,
    get_searcher,
)


def search_indexes(index_dirs: list[str], query: Any = None, *,
                   max_hits: int = 10, start_offset: int = 0,
                   sort_by: Any = None, aggs: Optional[dict] = None,
                   fetch_fields: Optional[list[str]] = None,
                   **kw) -> SearchResponse:
    """Search several indexes with one request and merge the results."""
    if not index_dirs:
        return SearchResponse(num_hits=0, hits=_empty_hits())
    searchers = [get_searcher(d) for d in index_dirs]
    # every index contributes its full top offset+k; the offset is applied
    # once, AFTER the cross-index merge (root.rs applies offset at root)
    k = start_offset + max_hits
    partial_resps = [s.search(query, max_hits=k, start_offset=0,
                              sort_by=sort_by, aggs=aggs, fetch_fields=[],
                              keep_agg_partials=aggs is not None, **kw)
                     for s in searchers]
    num_hits = sum(r.num_hits for r in partial_resps)
    failed = [f for r in partial_resps for f in r.failed_splits]
    merged_aggs = None
    if aggs is not None:
        from quickwit_ray.search.aggs import merge_partial_aggs

        all_partials = [p for r in partial_resps
                        for p in (r.agg_partials or [])]
        merged_aggs = merge_partial_aggs(aggs, all_partials)
    frames = [r.hits for r in partial_resps if len(r.hits)]
    if frames:
        df = pd.concat(frames, ignore_index=True)
        # comparator: sort keys in direction, then (split_id, doc_id) in
        # the primary direction (collector.rs:1086-1184) — exact Python
        # scalars, not float64 (sortkeys.py)
        from quickwit_ray.search.ast import SortField
        from quickwit_ray.search.sortkeys import exact_hit_sort

        sfs = (_normalize_sort(sort_by) or [SortField("_doc", "desc")])[:2]
        df = exact_hit_sort(df, sfs, start_offset, max_hits)
    else:
        df = _empty_hits()
    # fetch phase: route each hit to its OWN index by its split directory
    # (exact "<index_dir>/splits/" prefix — a plain prefix match would
    # double-route when one index dir is a path prefix of another)
    if len(df) and (fetch_fields is None or fetch_fields):
        pieces = []
        for s in searchers:
            prefix = os.path.join(s.index_dir, "splits") + os.sep
            sel = df["_split_dir"].astype(str).str.startswith(prefix)
            if not sel.any():
                continue
            sub = df[sel]
            from quickwit_ray.search.ast import SearchRequest

            req = SearchRequest(query=None, max_hits=max_hits,
                                sort_fields=())
            pieces.append(s._fetch_docs(sub, fetch_fields, req))
        if pieces:
            df = pd.concat(pieces).sort_index().reset_index(drop=True)
    exact = all(r.num_hits_exact for r in partial_resps)
    return SearchResponse(num_hits=num_hits, hits=df, aggs=merged_aggs,
                          failed_splits=failed, num_hits_exact=exact)
