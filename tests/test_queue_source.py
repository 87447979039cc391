"""Kafka-shaped streaming source: offset checkpoints, micro-batch splits,
kill-mid-stream exactly-once resume (reference semantics:
quickwit-indexing/src/source/kafka_source.rs + checkpoint.rs:170-188)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from quickwit_ray.config import IndexConfig, IndexSettings, documents_doc_mapping
from quickwit_ray.index.build import build_index
from quickwit_ray.search.engine import IndexSearcher
from quickwit_ray.sources.queue import (
    PartitionedQueue,
    ingest_queue,
    queue_from_parquet,
)
from quickwit_ray.state.manifest import Manifest

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _cfg():
    return IndexConfig("documents", documents_doc_mapping(),
                       IndexSettings(split_num_docs_target=10_000))


def test_queue_roundtrip_offsets(tmp_path):
    import pyarrow as pa

    q = PartitionedQueue.create(str(tmp_path / "q"), 2)
    t1 = pa.table({"doc_id": [1, 2, 3], "text": ["a", "b", "c"]})
    t2 = pa.table({"doc_id": [4, 5], "text": ["d", "e"]})
    assert q.append(0, t1) == (0, 3)
    assert q.append(0, t2) == (3, 5)
    assert q.end_offset(0) == 5 and q.end_offset(1) == 0
    got = q.read(0, 1, 4)
    assert got["doc_id"].to_pylist() == [2, 3, 4]
    # byte-budget batching covers the backlog contiguously
    ranges = q.estimate_batch_ranges(0, 1, max_batch_bytes=1)
    assert ranges[0][0] == 1 and ranges[-1][1] == 5
    assert all(a2 == b1 for (_, b1), (a2, _) in zip(ranges, ranges[1:]))


def test_queue_ingest_matches_batch_build(tmp_path):
    qdir = str(tmp_path / "q")
    queue_from_parquet(DOCS, qdir, num_partitions=4, partition_col="doc_id")
    stream_dir = str(tmp_path / "stream_idx")
    ingest_queue(qdir, stream_dir, _cfg(), execution="local",
                 max_batch_bytes=64 << 10)
    batch_dir = str(tmp_path / "batch_idx")
    build_index(DOCS, batch_dir, _cfg(), execution="local")

    s_stream, s_batch = IndexSearcher(stream_dir), IndexSearcher(batch_dir)
    assert s_stream.search("*", max_hits=0).num_hits == 500
    for query in ("text:scan", "text:scan OR text:merge", "lang: IN [de fr]"):
        a = s_stream.search(query, max_hits=600, fetch_fields=["doc_id"])
        b = s_batch.search(query, max_hits=600, fetch_fields=["doc_id"])
        assert a.num_hits == b.num_hits
        assert sorted(a.hits["doc_id"]) == sorted(b.hits["doc_id"])
    # more than one split & partition committed with offsets
    m = Manifest(stream_dir)
    assert len(m.published_splits()) >= 4
    for p in range(4):
        assert m.source_offset(f"queue:{p}") == \
            PartitionedQueue(qdir).end_offset(p)


def test_queue_kill_mid_stream_resumes_exactly_once(tmp_path):
    qdir = str(tmp_path / "q")
    queue_from_parquet(DOCS, qdir, num_partitions=4, partition_col="doc_id")
    idx = str(tmp_path / "idx")
    # wave cap of 2 micro-batches -> several commit waves needed; kill after 1
    with pytest.raises(RuntimeError, match="injected fault"):
        ingest_queue(qdir, idx, _cfg(), execution="local",
                     max_batch_bytes=16 << 10, max_batches_per_wave=2,
                     poll_rounds=100, fault_after_commits=1)
    m = Manifest(idx)
    partial_docs = sum(s.num_docs for s in m.published_splits())
    assert 0 < partial_docs < 500  # genuinely mid-stream
    # resume: drains the rest; nothing is duplicated
    ingest_queue(qdir, idx, _cfg(), execution="local",
                 max_batch_bytes=16 << 10, max_batches_per_wave=2,
                 poll_rounds=100)
    s = IndexSearcher(idx)
    r = s.search("*", max_hits=600, fetch_fields=["doc_id"])
    assert r.num_hits == 500
    assert sorted(r.hits["doc_id"]) == list(range(500))
    # idempotent re-poll: no new splits, no offset movement
    m1 = Manifest(idx)
    before = sorted(s.split_id for s in m1.published_splits())
    ingest_queue(qdir, idx, _cfg(), execution="local",
                 max_batch_bytes=16 << 10, poll_rounds=2)
    m2 = Manifest(idx)
    assert sorted(s.split_id for s in m2.published_splits()) == before


def test_checkpoint_contiguity_enforced(tmp_path):
    from quickwit_ray.state.manifest import SplitMetadata

    idx = str(tmp_path / "idx")
    m = Manifest(idx)
    m.create({"index_id": "x"})
    sm = SplitMetadata("s1", "x", 10, 100)
    m.publish_stream({"queue:0": ([sm], 0, 10)})
    assert m.source_offset("queue:0") == 10
    # duplicate replay: no-op
    m.publish_stream({"queue:0": ([SplitMetadata("sdup", "x", 10, 100)], 0, 10)})
    assert "sdup" not in m.splits
    # gap: refused
    with pytest.raises(ValueError, match="not contiguous"):
        m.publish_stream({"queue:0": ([SplitMetadata("s2", "x", 5, 50)], 15, 20)})
    # contiguous: accepted
    m.publish_stream({"queue:0": ([SplitMetadata("s3", "x", 5, 50)], 10, 15)})
    assert m.source_offset("queue:0") == 15


def test_queue_ingest_ray_execution(tmp_path, ray_session):
    """Same path through Ray task fan-out; appended data in a second poll
    round is picked up from the committed offsets."""
    import pyarrow as pa

    qdir = str(tmp_path / "q")
    q = PartitionedQueue.create(qdir, 2)
    tbl = pq.read_table(DOCS)
    q.append(0, tbl.slice(0, 100))
    q.append(1, tbl.slice(100, 100))
    idx = str(tmp_path / "idx")
    st = ingest_queue(qdir, idx, _cfg(), execution="ray",
                      max_batch_bytes=64 << 10)
    assert st.num_docs == 200
    # stream more records, poll again
    q.append(0, tbl.slice(200, 50))
    st2 = ingest_queue(qdir, idx, _cfg(), execution="ray")
    assert st2.num_docs == 50
    s = IndexSearcher(idx)
    r = s.search("*", max_hits=300, fetch_fields=["doc_id"])
    assert sorted(r.hits["doc_id"]) == list(range(250))


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.lists(st.integers(1, 500), min_size=1, max_size=12),
       st.integers(0, 100), st.integers(1, 1 << 20))
@settings(max_examples=40, deadline=None)
def test_batch_ranges_cover_backlog(tmp_path_factory, appends, from_off, max_bytes):
    """Property: micro-batch ranges are contiguous, non-empty, start at the
    committed offset and end at the queue head — for any segment layout,
    resume point and byte budget."""
    import pyarrow as pa

    q = PartitionedQueue.create(str(tmp_path_factory.mktemp("qprop")), 1)
    for n in appends:
        q.append(0, pa.table({"doc_id": pa.array(range(n), pa.int64()),
                              "text": ["x" * 50] * n}))
    end = q.end_offset(0)
    frm = min(from_off, end)
    ranges = q.estimate_batch_ranges(0, frm, max_bytes)
    if frm >= end:
        assert ranges == []
        return
    assert ranges[0][0] == frm and ranges[-1][1] == end
    assert all(a < b for a, b in ranges)
    assert all(r1[1] == r2[0] for r1, r2 in zip(ranges, ranges[1:]))
