"""quickwit_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch rebuild of the query / data-processing capabilities of
quickwit-inc/quickwit (reference at /root/reference), expressed as
``ray.data.Dataset`` pipelines: ``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages (segment writers, split
search), and explicit partitioning for the wide steps.

Layout:
  functions/   pure vectorized kernels (tokenizers, BM25 math, sketches,
               text statistics, hashing) — no Ray dependency
  index/       split artifact format, index build pipeline, merge pipeline
  search/      query AST + parsers, per-split scorer, distributed search,
               aggregations
  state/       manifest (split metadata), checkpoints, atomic commits,
               SQL metastore dialects
  sources/     ingestion fronts: file/queue/mq/WAL readers, push decode,
               broker client adapters, fixtures
  pipelines/   training-data pipelines (dedup, ANN, text analysis,
               multimodal plumbing)
"""

__version__ = "0.1.0"

from quickwit_ray.config import (  # noqa: F401
    DocMapping,
    FieldMapping,
    IndexConfig,
    IndexSettings,
    MergePolicyConfig,
)


def __getattr__(name):  # lazy: keep `import quickwit_ray` Ray-free
    if name == "Index":
        from quickwit_ray.api import Index

        return Index
    if name == "IndexSearcher":
        from quickwit_ray.search.engine import IndexSearcher

        return IndexSearcher
    raise AttributeError(f"module 'quickwit_ray' has no attribute {name!r}")
