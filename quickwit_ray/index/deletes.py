"""Delete tasks — stored queries applied as an anti-join at compaction
time (reference: delete_task_planner.rs plans, merge_executor.rs:342-460
applies the queries while rewriting a split).

`apply_delete_tasks` finds published splits whose `delete_opstamp` lags
the latest task, evaluates the pending delete queries against each,
and rewrites the split WITHOUT the matching docs (rebuilding from the
doc store — which requires the indexed fields to be stored, true for
our standard mappings). Splits with no matches just get their
delete_opstamp bumped (no rewrite)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from quickwit_ray.config import IndexConfig
from quickwit_ray.index.format import DOCSTORE_FILE, SplitReader
from quickwit_ray.index.writer import SplitBuilder
from quickwit_ray.search.parser import parse_query
from quickwit_ray.search.split_search import SplitSearcher
from quickwit_ray.state.manifest import (Manifest, SplitMetadata,
                                          StaleReplaceError)


def _rewrite_split_without(index_dir: str, config: IndexConfig,
                           split: SplitMetadata, keep_mask: np.ndarray,
                           opstamp: int) -> SplitMetadata:
    split_dir = os.path.join(index_dir, "splits", split.split_id)
    # merged splits may store docs as stacked segments + blob columns
    docstore = SplitReader(split_dir).read_docstore_table()
    kept = docstore.filter(pa.array(keep_mask))
    builder = SplitBuilder(config, index_dir,
                           source_partition_id=f"delete:{split.split_id}",
                           seq=opstamp, partition_id=split.partition_id)
    if kept.num_rows:
        builder.add_batch(kept)
    sm = builder.flush()
    if sm is None:  # every doc deleted -> no replacement split
        return None
    sm.num_merge_ops = split.num_merge_ops
    sm.delete_opstamp = opstamp
    return sm


def apply_delete_tasks(index_dir: str) -> int:
    """Apply pending delete tasks to lagging splits. Returns number of
    splits rewritten or dropped."""
    manifest = Manifest(index_dir)
    config = IndexConfig.from_json(manifest.index_config_json)
    last = manifest.last_delete_opstamp
    if last == 0:
        return 0
    changed = 0
    for split in list(manifest.published_splits()):
        if split.delete_opstamp >= last:
            continue
        pending = [t for t in manifest.delete_tasks
                   if t["opstamp"] > split.delete_opstamp]
        split_dir = os.path.join(index_dir, "splits", split.split_id)
        reader = SplitReader(split_dir)
        searcher = SplitSearcher(reader, config.doc_mapping)
        delete_mask = np.zeros(reader.num_docs, bool)
        for t in pending:
            node = parse_query(t["query"],
                               config.doc_mapping.default_search_fields)
            m, _ = searcher.eval(node, False)
            delete_mask |= m
        if not delete_mask.any():
            split.delete_opstamp = last
            try:
                # metadata-only opstamp bump — CAS-guarded: republishing
                # a split a concurrent merge already replaced would
                # RESURRECT its docs next to the merged copy's
                manifest.publish([split],
                                 require_published=[split.split_id])
            except StaleReplaceError:
                pass  # merged away; the replacement lags and re-checks
            continue
        new_sm = _rewrite_split_without(index_dir, config, split,
                                        ~delete_mask, last)
        if new_sm is None:
            manifest.mark_for_deletion([split.split_id])
            changed += 1
        else:
            try:
                manifest.publish([new_sm],
                                 replaced_split_ids=[split.split_id])
                changed += 1
            except StaleReplaceError:
                # a concurrent merge replaced this split: its docs live
                # in the merged output, whose delete_opstamp lags — the
                # next apply pass (or delete-at-merge) rewrites THAT
                pass
    return changed
