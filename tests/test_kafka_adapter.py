"""Kafka adapter (sources/kafka.py) behind the queue-source contract,
run against a mock broker: the UNCHANGED ingest_queue poller +
kill-mid-stream exactly-once semantics over KafkaQueueClient."""

import json

import pytest

from quickwit_ray.config import DocMapping, FieldMapping, IndexConfig, IndexSettings
from quickwit_ray.search.engine import IndexSearcher
from quickwit_ray.sources.kafka import KafkaQueueClient
from quickwit_ray.sources.queue import ingest_queue
from quickwit_ray.state.manifest import Manifest


class MockMessage:
    def __init__(self, offset, value):
        self._o, self._v = offset, value

    def error(self):
        return None

    def offset(self):
        return self._o

    def value(self):
        return self._v


class MockConsumer:
    """In-memory broker: dict partition -> list[bytes]. Implements the
    consumer surface KafkaQueueClient uses (watermarks / manual assign /
    poll / close)."""

    def __init__(self, data):
        self.data = data
        self._p = None
        self._pos = 0
        self.closed = False

    def get_watermark_offsets(self, tp):
        if tp.partition not in self.data:
            raise KeyError(tp.partition)
        return 0, len(self.data[tp.partition])

    def assign(self, tps):
        tp = tps[0]
        self._p, self._pos = tp.partition, tp.offset

    def poll(self, timeout):
        msgs = self.data.get(self._p, [])
        if self._pos >= len(msgs):
            return None
        m = MockMessage(self._pos, msgs[self._pos])
        self._pos += 1
        return m

    def close(self):
        self.closed = True


def _broker(n_per_partition=(7, 5)):
    data = {}
    i = 0
    for p, n in enumerate(n_per_partition):
        msgs = []
        for _ in range(n):
            msgs.append(json.dumps(
                {"body": f"kafka doc {i} stream", "doc_id": i}).encode())
            i += 1
        data[p] = msgs
    return data


def _config():
    mapping = DocMapping(
        field_mappings=(
            FieldMapping(name="body", type="text", record="freq",
                         fieldnorms=True, stored=True),
            FieldMapping(name="doc_id", type="i64", stored=True, fast=True)),
        doc_id_field="doc_id", default_search_fields=("body",))
    return IndexConfig("kq", mapping,
                       IndexSettings(split_num_docs_target=100_000))


def _client_factory(data):
    return lambda: KafkaQueueClient(
        "events", consumer_factory=lambda: MockConsumer(data),
        records_per_batch=3)


def test_kafka_client_contract():
    data = _broker()
    c = _client_factory(data)()
    assert c.num_partitions == 2
    assert c.end_offset(0) == 7 and c.end_offset(1) == 5
    assert c.estimate_batch_ranges(0, 0, 1 << 20) == [(0, 3), (3, 6), (6, 7)]
    assert c.estimate_batch_ranges(0, 6, 1 << 20) == [(6, 7)]
    t = c.read(0, 2, 5)
    assert t.num_rows == 3 and t.column("doc_id").to_pylist() == [2, 3, 4]


def test_kafka_ingest_end_to_end(tmp_path):
    data = _broker()
    d = str(tmp_path / "idx")
    stats = ingest_queue(str(tmp_path / "unused"), d, _config(),
                         execution="local",
                         client_factory=_client_factory(data))
    assert stats.num_docs == 12
    s = IndexSearcher(d)
    assert s.search("body:stream", max_hits=0).num_hits == 12
    m = Manifest(d)
    assert m.source_offset("queue:0") == 7 and m.source_offset("queue:1") == 5
    # re-poll: nothing new, no duplicate docs
    stats2 = ingest_queue(str(tmp_path / "unused"), d, _config(),
                          execution="local",
                          client_factory=_client_factory(data))
    assert stats2.num_docs == 0
    assert IndexSearcher(d).search("*", max_hits=0).num_hits == 12


def test_kafka_kill_mid_stream_exactly_once(tmp_path):
    data = _broker((9, 6))
    d = str(tmp_path / "idx")
    factory = _client_factory(data)
    with pytest.raises(RuntimeError, match="injected fault"):
        ingest_queue(str(tmp_path / "unused"), d, _config(),
                     execution="local", client_factory=factory,
                     poll_rounds=5, max_batches_per_wave=1,
                     fault_after_commits=1)
    n_mid = IndexSearcher(d).search("*", max_hits=0).num_hits
    assert 0 < n_mid < 15
    # resume: the committed prefix is never re-read, the rest lands once
    ingest_queue(str(tmp_path / "unused"), d, _config(),
                 execution="local", client_factory=factory)
    s = IndexSearcher(d)
    assert s.search("*", max_hits=0).num_hits == 15
    ids = sorted(s.search("*", max_hits=100,
                          fetch_fields=["doc_id"]).hits["doc_id"].astype(int))
    assert ids == list(range(15))
