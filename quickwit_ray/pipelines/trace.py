"""find-trace-ids analog (`quickwit-search/src/find_trace_ids_collector.rs`):
top-N distinct keys ordered by their max timestamp — generalized to any
(key, order) column pair. Partial-before-shuffle: per-batch groupby-max
first, then the small groupby + driver top-N."""

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

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(key_col).max(order_col))
    pdf = out.to_pandas()
    max_col = [c for c in pdf.columns if c != key_col][0]
    pdf = pdf.rename(columns={max_col: f"max_{order_col}"})
    return (pdf.sort_values([f"max_{order_col}", key_col],
                            ascending=[False, False])
            .head(n).reset_index(drop=True))
