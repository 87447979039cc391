"""list_terms / list_fields — dictionary and schema introspection
(`quickwit-search/src/list_terms.rs:47-330`, `list_fields.rs`)."""

from __future__ import annotations

import os
from typing import Optional

import pandas as pd

from quickwit_ray.search.engine import IndexSearcher, _GLOBAL_READER_CACHE


def list_terms(index_dir: str, field: str, start: Optional[str] = None,
               end: Optional[str] = None, prefix: Optional[str] = None,
               limit: int = 100) -> pd.DataFrame:
    """Merged term-dictionary range scan across splits -> (term, doc_freq),
    sorted ascending, capped at `limit` distinct terms."""
    s = IndexSearcher(index_dir)
    acc: dict[str, int] = {}
    for sm in s.manifest.published_splits():
        reader = _GLOBAL_READER_CACHE.get(
            os.path.join(index_dir, "splits", sm.split_id))
        rows = reader.term_range_rows(field, start, end, prefix=prefix)
        for r in rows:
            _, term = reader.term_at(int(r))
            acc[term] = acc.get(term, 0) + int(reader.df[r])
    terms = sorted(acc)[:limit]
    return pd.DataFrame({"term": terms,
                         "doc_freq": pd.Series([acc[t] for t in terms],
                                               dtype="int64")})


def list_fields(index_dir: str) -> pd.DataFrame:
    """Cluster-wide field listing: union of per-split schemas + config
    (field_caps analog)."""
    s = IndexSearcher(index_dir)
    rows = []
    for fm in s.mapping.field_mappings:
        rows.append({
            "field": fm.name, "type": fm.type, "tokenizer": fm.tokenizer,
            "indexed": fm.indexed, "stored": fm.stored, "fast": fm.fast,
            "record": fm.record, "fieldnorms": fm.fieldnorms, "tag": fm.tag,
        })
    return pd.DataFrame(rows).sort_values("field").reset_index(drop=True)
