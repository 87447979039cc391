"""Search-stream: export fast-field values of ALL matching docs
(reference `quickwit-search/src/search_stream/leaf.rs:51-356`, used for
OLAP joins). Re-expressed as a plain Ray Data pipeline over the source
table (filter -> select -> write/iter), plus an index-backed variant that
streams from built splits."""

from __future__ import annotations

from typing import Optional

import pandas as pd
import pyarrow as pa


def search_stream_table(ds, predicate, columns: list[str],
                        output_path: Optional[str] = None):
    """Filter with a vectorized Arrow predicate and project the requested
    columns; write CSV/Parquet if a path is given, else return the Dataset.

    `predicate(table) -> BooleanArray` runs inside map_batches.
    """
    def fil(batch: pa.Table) -> pa.Table:
        return batch.filter(predicate(batch)).select(columns)

    out = ds.map_batches(fil, batch_format="pyarrow")
    if output_path:
        if output_path.endswith(".csv") or output_path.endswith("csv"):
            out.write_csv(output_path)
        else:
            out.write_parquet(output_path)
        return None
    return out


def search_stream_index(index_dir: str, query, columns: list[str]) -> pd.DataFrame:
    """Index-backed export: evaluate the query per split and dump the fast
    fields of every matching doc (the ClickHouse-join path)."""
    import os

    from quickwit_ray.search.engine import IndexSearcher, _GLOBAL_READER_CACHE
    from quickwit_ray.search.split_search import SplitSearcher

    s = IndexSearcher(index_dir)
    node = s._resolve_query(query)
    frames = []
    for sm in s.manifest.published_splits():
        split_dir = os.path.join(index_dir, "splits", sm.split_id)
        reader = _GLOBAL_READER_CACHE.get(split_dir)
        searcher = SplitSearcher(reader, s.mapping)
        mask, _ = searcher.eval(node, False)
        if not mask.any():
            continue
        cols = {}
        for c in columns:
            cols[c] = reader.fast_field(c)[mask]
        frames.append(pd.DataFrame(cols))
    return (pd.concat(frames, ignore_index=True) if frames
            else pd.DataFrame(columns=columns))


def export_rowbinary(df: pd.DataFrame, column: str) -> bytes:
    """ClickHouseRowBinary-style export of one numeric column (the OLAP
    join feed, quickwit-proto OutputFormat::ClickHouseRowBinary): packed
    little-endian fixed-width values, no header."""
    import numpy as np

    vals = df[column].to_numpy()
    if vals.dtype.kind == "f":
        return vals.astype("<f8").tobytes()
    return vals.astype("<i8").tobytes()


def export_csv(df: pd.DataFrame) -> str:
    return df.to_csv(index=False)
