"""find-trace-ids analog (`quickwit-search/src/find_trace_ids_collector.rs`):
top-N distinct keys ordered by their max timestamp — generalized to any
(key, order) column pair. Partial-before-shuffle: per-batch groupby-max
first, then the keyed groupby; the driver only ever sees <= n rows per
OUTPUT BLOCK (per-block partial top-N), never the full distinct-key set —
on a 100 TB trace corpus distinct trace ids are billions."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def top_n_distinct_by_max(ds, key_col: str, order_col: str, n: int = 10
                          ) -> pd.DataFrame:
    """Returns DataFrame(key_col, max_<order_col>) of the n distinct keys
    with the largest max(order_col); ties break on descending key."""
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, order_col]).to_pandas()
        g = df.groupby(key_col, as_index=False)[order_col].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(key_col).max(order_col))

    def block_topn(batch: pd.DataFrame) -> pd.DataFrame:
        # every shuffled block keeps only its own top-n: the driver-side
        # merge below sees <= n rows per block instead of every distinct key
        mc = [c for c in batch.columns if c != key_col][0]
        return batch.sort_values([mc, key_col], ascending=[False, False]).head(n)

    small = agg.map_batches(block_topn, batch_format="pandas").to_pandas()
    if small.empty:
        return pd.DataFrame({key_col: [], f"max_{order_col}": []})
    max_col = [c for c in small.columns if c != key_col][0]
    small = small.rename(columns={max_col: f"max_{order_col}"})
    return (small.sort_values([f"max_{order_col}", key_col],
                              ascending=[False, False])
            .head(n).reset_index(drop=True))
