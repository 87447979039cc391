"""Multi-index (federated) search — the reference's root search resolves
index-id patterns and fans the same request over every matching index's
splits, merging leaves with one comparator (`quickwit-search/src/root.rs`
multi-index resolution; ES comma/wildcard index targets).

Each index searches with its own mapping/tokenizers; partial hits merge
with the standard comparator (sort keys in sort direction, then the
(split_id, doc_id) address). Split ids are content-addressed and distinct
across indexes; `_split_dir` keeps every hit routable back to its own
index for the fetch phase."""

from __future__ import annotations

from typing import Any, Optional

import pandas as pd

from quickwit_ray.search.engine import IndexSearcher, SearchResponse, _empty_hits


def search_indexes(index_dirs: list[str], query: Any = None, *,
                   max_hits: int = 10, sort_by: Any = None,
                   fetch_fields: Optional[list[str]] = None,
                   **kw) -> SearchResponse:
    """Search several indexes with one request and merge the results.

    Aggregations merge by summation only when every index returns them
    (same agg tree); counts sum; hits re-merge under the comparator of the
    first index's sort spec.
    """
    if not index_dirs:
        return SearchResponse(num_hits=0, hits=_empty_hits())
    searchers = [IndexSearcher(d) for d in index_dirs]
    partial_resps = [s.search(query, max_hits=max_hits, sort_by=sort_by,
                              fetch_fields=[], **kw)
                     for s in searchers]
    num_hits = sum(r.num_hits for r in partial_resps)
    failed = [f for r in partial_resps for f in r.failed_splits]
    frames = [r.hits for r in partial_resps if len(r.hits)]
    if frames:
        df = pd.concat(frames, ignore_index=True)
        # comparator: sort keys in direction, then (split_id, doc_id) in
        # the primary direction (collector.rs:1086-1184)
        from quickwit_ray.search.engine import _normalize_sort

        sfs = _normalize_sort(sort_by)
        asc0 = bool(sfs) and sfs[0].order == "asc"  # default sort: desc doc id
        asc1 = (sfs[1].order == "asc") if len(sfs) > 1 else asc0
        df = (df.sort_values(by=["sort_key0", "sort_key1",
                                 "_split_id", "_doc_id"],
                             ascending=[asc0, asc1, asc0, asc0],
                             kind="mergesort")
                .head(max_hits).reset_index(drop=True))
    else:
        df = _empty_hits()
    # fetch phase: route each hit to its own index (mapping-aware)
    if len(df) and (fetch_fields is None or fetch_fields):
        pieces = []
        for s in searchers:
            prefix = s.index_dir
            sel = df["_split_dir"].str.startswith(prefix)
            if not sel.any():
                continue
            sub = df[sel]
            from quickwit_ray.search.ast import SearchRequest

            req = SearchRequest(query=None, max_hits=max_hits,
                                sort_fields=())
            pieces.append(s._fetch_docs(sub, fetch_fields, req))
        if pieces:
            df = pd.concat(pieces).sort_index()
            # re-apply the merged order after per-index fetch
            df = df.reset_index(drop=True)
    exact = all(r.num_hits_exact for r in partial_resps)
    return SearchResponse(num_hits=num_hits, hits=df, failed_splits=failed,
                          num_hits_exact=exact)
