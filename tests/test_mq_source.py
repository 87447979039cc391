"""Message-ack queue source (sources/mq.py): shard-tracked exactly-once
over an at-least-once broker with visibility timeouts — the reference's
queue_sources/ design (SQS/PubSub model) re-expressed."""

import json
import time

import pytest

from quickwit_ray.config import DocMapping, FieldMapping, IndexConfig, IndexSettings
from quickwit_ray.search.engine import IndexSearcher
from quickwit_ray.sources.mq import LocalMessageQueue, ingest_message_queue
from quickwit_ray.state.manifest import Manifest


def _config():
    mapping = DocMapping(
        field_mappings=(
            FieldMapping(name="body", type="text", record="freq",
                         fieldnorms=True, stored=True),
            FieldMapping(name="doc_id", type="i64", stored=True, fast=True)),
        doc_id_field="doc_id", default_search_fields=("body",))
    return IndexConfig("mq", mapping,
                       IndexSettings(split_num_docs_target=100_000))


def _send_batch(q, msg_id, ids):
    payload = "\n".join(json.dumps({"body": f"notify doc {i}", "doc_id": i})
                        for i in ids).encode()
    q.send(msg_id, payload, "ndjson")


def test_local_queue_visibility_and_ack(tmp_path):
    q = LocalMessageQueue(str(tmp_path / "q"))
    _send_batch(q, "m1", [1, 2])
    _send_batch(q, "m2", [3])
    got = q.receive(10, visibility_sec=0.1)
    assert sorted(m.msg_id for m in got) == ["m1", "m2"]
    # invisible while leased
    assert q.receive(10) == []
    time.sleep(0.15)
    # lease expired -> redelivered (at-least-once)
    again = q.receive(10, visibility_sec=30)
    assert sorted(m.msg_id for m in again) == ["m1", "m2"]
    q.ack(again[0].handle)
    q.ack(again[1].handle)
    assert q.size() == 0


def test_mq_ingest_exactly_once_with_duplicates(tmp_path):
    q = LocalMessageQueue(str(tmp_path / "q"))
    for k in range(4):
        _send_batch(q, f"file-{k}", list(range(k * 10, k * 10 + 5)))
    d = str(tmp_path / "idx")
    st = ingest_message_queue(q, d, _config(), token="pipeA")
    assert st.indexed == 4 and st.num_docs == 20
    assert q.size() == 0
    s = IndexSearcher(d)
    assert s.search("*", max_hits=0).num_hits == 20
    # broker redelivers a duplicate of an already-finished message
    _send_batch(q, "file-1", list(range(10, 15)))
    st2 = ingest_message_queue(q, d, _config(), token="pipeA")
    assert st2.acked_duplicates == 1 and st2.indexed == 0
    assert IndexSearcher(d).search("*", max_hits=0).num_hits == 20


def test_mq_crash_between_publish_and_ack(tmp_path):
    """The poison window: split published + shard EOF committed, then the
    coordinator dies before acking. The redelivered message must be acked
    without reindexing."""
    q = LocalMessageQueue(str(tmp_path / "q"))
    _send_batch(q, "f1", [1, 2, 3])
    d = str(tmp_path / "idx")
    with pytest.raises(RuntimeError, match="injected fault"):
        ingest_message_queue(q, d, _config(), token="pipeA",
                             visibility_sec=0.05, fault_before_ack=True)
    assert IndexSearcher(d).search("*", max_hits=0).num_hits == 3
    assert q.size() == 1  # un-acked
    time.sleep(0.15)  # let the lease expire -> redelivery
    st = ingest_message_queue(q, d, _config(), token="pipeB")
    assert st.acked_duplicates == 1 and st.indexed == 0
    assert q.size() == 0
    assert IndexSearcher(d).search("*", max_hits=0).num_hits == 3


def test_mq_ownership_and_stale_acquire(tmp_path):
    q = LocalMessageQueue(str(tmp_path / "q"))
    _send_batch(q, "f1", [1, 2])
    d = str(tmp_path / "idx")
    m = Manifest(d)
    m.create(_config().to_json())
    # another pipeline claimed the shard RECENTLY -> we must drop it
    m.open_shard("f1", "other-pipe")
    st = ingest_message_queue(q, d, _config(), token="me",
                              stale_after_sec=3600)
    assert st.skipped_in_progress == 1 and st.indexed == 0
    assert q.size() == 1
    # ...but a STALE claim (owner died) is acquired and processed
    time.sleep(0.1)
    q.send_duplicate("f1")  # make it visible again
    st2 = ingest_message_queue(q, d, _config(), token="me",
                               stale_after_sec=0.05)
    assert st2.acquired_stale == 1 and st2.indexed == 1
    assert IndexSearcher(d).search("*", max_hits=0).num_hits == 2


def test_mq_shard_pruning(tmp_path):
    q = LocalMessageQueue(str(tmp_path / "q"))
    _send_batch(q, "old", [1])
    d = str(tmp_path / "idx")
    ingest_message_queue(q, d, _config(), token="t")
    m = Manifest(d)
    assert m.shard_info("old") is not None and m.is_shard_completed("old")
    time.sleep(0.1)
    assert m.prune_shards(0.05) == 1
    assert m.shard_info("old") is None and not m.is_shard_completed("old")
    # pruned state survives reload (log replay)
    m2 = Manifest(d)
    assert m2.shard_info("old") is None
