"""Scroll contexts — TTL'd server-side cursors over `search_after`
(reference `quickwit-search/src/scroll_context.rs:1-260` and the root
handlers `root.rs:342-441`; ES `_search?scroll=...` + `_scroll`).

A scroll context stores the normalized search kwargs and the
`search_after` cursor of the last page served. `scroll_id` is an opaque
token; its state lives in a bounded in-process cache with TTL eviction
(the reference stores contexts in the searcher's LRU keyed by a ULID and
expires them after the scroll TTL). Fetching a page RENEWS the TTL, like
the reference's `scroll` parameter on `_scroll` calls. An expired or
unknown id raises KeyError (the 404 analog)."""

from __future__ import annotations

import re
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Optional

DEFAULT_TTL_SEC = 60.0
MAX_TTL_SEC = 1800.0  # reference cap (root.rs): "scroll TTL period up to 1800 secs"
MAX_CONTEXTS = 1024
_TTL_RE = re.compile(r"^(\d+)(ms|s|m|h)?$")


def parse_ttl(ttl: Any) -> float:
    """ES duration shorthand: '30s', '1m', '500ms', int seconds."""
    if ttl is None:
        return DEFAULT_TTL_SEC
    if isinstance(ttl, (int, float)):
        sec = float(ttl)
    else:
        m = _TTL_RE.match(str(ttl).strip())
        if not m:
            raise ValueError(f"bad scroll TTL {ttl!r}")
        n, unit = int(m.group(1)), m.group(2) or "s"
        sec = n * {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0}[unit]
    if sec > MAX_TTL_SEC:
        raise ValueError(
            f"Quickwit only supports scroll TTL period up to {int(MAX_TTL_SEC)} secs")
    return sec


@dataclass
class _ScrollState:
    expire_at: float
    ttl_sec: float
    search_kwargs: dict[str, Any]
    cursor: Optional[tuple]
    served: int = 0
    total_hits: int = 0
    exhausted: bool = False
    extra: dict = field(default_factory=dict)


class ScrollManager:
    """Bounded TTL cache of scroll contexts for one searcher."""

    def __init__(self, searcher, max_contexts: int = MAX_CONTEXTS):
        self.searcher = searcher
        self.max_contexts = max_contexts
        self._ctx: dict[str, _ScrollState] = {}

    # ------------------------------------------------------------------

    def _evict(self) -> None:
        now = time.time()
        dead = [k for k, st in self._ctx.items() if st.expire_at <= now]
        for k in dead:
            del self._ctx[k]
        while len(self._ctx) > self.max_contexts:
            # drop the context closest to expiry (reference LRU analog)
            k = min(self._ctx, key=lambda x: self._ctx[x].expire_at)
            del self._ctx[k]

    def start(self, query: Any = None, *, scroll: Any = "1m",
              **search_kwargs):
        """First page + a scroll_id for the rest. Accepts the same kwargs
        as IndexSearcher.search (max_hits = the page size)."""
        self._evict()
        ttl = parse_ttl(scroll)
        resp = self.searcher.search(query, **search_kwargs)
        sid = uuid.uuid4().hex
        st = _ScrollState(
            expire_at=time.time() + ttl,
            ttl_sec=ttl,
            search_kwargs={"query": query, **search_kwargs},
            cursor=resp.scroll_cursor,
            served=len(resp.hits),
            total_hits=resp.num_hits,
            exhausted=len(resp.hits) == 0,
        )
        self._ctx[sid] = st
        return resp, sid

    def next(self, scroll_id: str, scroll: Any = None):
        """Next page; renews the TTL (with the new value when given)."""
        self._evict()
        st = self._ctx.get(scroll_id)
        if st is None:
            raise KeyError(f"scroll context {scroll_id!r} expired or unknown")
        # renew with the given TTL, else the TTL the context was CREATED
        # with (ES clients commonly omit scroll on continuation calls; the
        # reference keeps the context's own TTL, not a global default)
        if scroll is not None:
            st.ttl_sec = parse_ttl(scroll)
        st.expire_at = time.time() + st.ttl_sec
        if st.exhausted or st.cursor is None:
            from quickwit_ray.search.engine import SearchResponse, _empty_hits

            return SearchResponse(num_hits=st.total_hits,
                                  hits=_empty_hits()), scroll_id
        kw = dict(st.search_kwargs)
        query = kw.pop("query", None)
        # ES computes aggregations once, on the initial page only —
        # continuations return hits alone (root.rs scroll handling)
        kw.pop("aggs", None)
        kw["search_after"] = st.cursor
        resp = self.searcher.search(query, **kw)
        st.cursor = resp.scroll_cursor or st.cursor
        st.served += len(resp.hits)
        st.exhausted = len(resp.hits) == 0
        return resp, scroll_id

    def clear(self, scroll_id: str) -> bool:
        """ES DELETE `_search/scroll` analog."""
        return self._ctx.pop(scroll_id, None) is not None

    def __len__(self) -> int:
        self._evict()
        return len(self._ctx)
