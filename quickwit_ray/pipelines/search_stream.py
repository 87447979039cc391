"""Search-stream: export fast-field values of ALL matching docs
(reference `quickwit-search/src/search_stream/leaf.rs:51-356`, used for
OLAP joins). Re-expressed as a plain Ray Data pipeline over the source
table (filter -> select -> write/iter), plus an index-backed variant that
fans out one task per split and streams blocks to the sink (the reference
streams CSV/RowBinary per leaf) — no driver-side concat."""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np
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


def _export_split_batch(item_batch: dict[str, np.ndarray], *,
                        mapping_json: dict, node_blob: bytes,
                        columns: list[str]) -> pa.Table:
    """One task = leaf export for a batch of splits: evaluate the query,
    gather the projected fast fields of every matching doc. Zero-length
    outputs keep their numpy dtypes, so the block schema stays stable."""
    from quickwit_ray.config import IndexConfig as _IC
    from quickwit_ray.search.engine import _GLOBAL_READER_CACHE
    from quickwit_ray.search.split_search import SplitSearcher

    mapping = _IC.from_json(
        {"index_id": "x", "doc_mapping": mapping_json}).doc_mapping
    node = pickle.loads(node_blob)
    tables = []
    for split_dir in [str(p) for p in item_batch["split_dir"]]:
        reader = _GLOBAL_READER_CACHE.get(split_dir)
        searcher = SplitSearcher(reader, mapping)
        mask, _ = searcher.eval(node, False)
        tables.append(pa.table({c: reader.fast_field(c)[mask]
                                for c in columns}))
    return pa.concat_tables(tables, promote_options="default")


def search_stream_index(index_dir: str, query, columns: list[str],
                        output_path: Optional[str] = None):
    """Index-backed export: fan out one Ray task per split, each evaluating
    the query and emitting the fast fields of its matching docs as an Arrow
    block. Returns a streaming Ray Dataset (or writes it when
    ``output_path`` is given) — the 100 TB path never concatenates on the
    driver."""
    import ray
    import ray.data

    from quickwit_ray.search.engine import IndexSearcher

    s = IndexSearcher(index_dir)
    node = s._resolve_query(query)
    splits = s.manifest.published_splits()
    if not splits:
        # type the empty columns from the doc mapping's fast-field types so
        # empty and non-empty exports share a schema (datetime fast fields
        # surface as int64 — SplitReader.fast_field casts them on read)
        arrow_t = {"i64": pa.int64(), "u64": pa.uint64(), "f64": pa.float64(),
                   "bool": pa.bool_(), "datetime": pa.int64(),
                   "bytes": pa.binary()}

        def _col_type(name: str) -> pa.DataType:
            try:
                fm = s.config.doc_mapping.resolve_field(name)
            except KeyError:
                return pa.string()
            return arrow_t.get(fm.type, pa.string())

        out = ray.data.from_arrow(
            pa.table({c: pa.array([], _col_type(c)) for c in columns}))
    else:
        items = [{"split_dir": os.path.join(index_dir, "splits", sm.split_id)}
                 for sm in splits]
        out = ray.data.from_items(items).map_batches(
            _export_split_batch,
            fn_kwargs={"mapping_json": s.config.to_json()["doc_mapping"],
                       "node_blob": pickle.dumps(node),
                       "columns": list(columns)},
            batch_size=1, batch_format="numpy")
    if output_path:
        if output_path.endswith("csv"):
            out.write_csv(output_path)
        else:
            out.write_parquet(output_path)
        return None
    return out


def export_rowbinary(df: pd.DataFrame, column: str) -> bytes:
    """ClickHouseRowBinary-style export of one numeric column (the OLAP
    join feed, quickwit-proto OutputFormat::ClickHouseRowBinary): packed
    little-endian fixed-width values, no header."""
    vals = df[column].to_numpy()
    if vals.dtype.kind == "f":
        return vals.astype("<f8").tobytes()
    return vals.astype("<i8").tobytes()


def export_csv(df: pd.DataFrame) -> str:
    return df.to_csv(index=False)
