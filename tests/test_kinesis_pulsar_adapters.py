"""Kinesis + Pulsar adapters (sources/kinesis.py, sources/pulsar.py)
behind the queue-source contract, run against mock brokers: the
UNCHANGED ingest_queue poller over OPAQUE ordered positions (sequence
numbers / message ids), duplicate-poll no-ops, kill-mid-stream resume."""

import json

import pytest

from quickwit_ray.config import DocMapping, FieldMapping, IndexConfig, IndexSettings
from quickwit_ray.search.engine import IndexSearcher
from quickwit_ray.sources.kinesis import KinesisQueueClient, pad_seq
from quickwit_ray.sources.pulsar import PulsarQueueClient, msg_id_to_position
from quickwit_ray.sources.queue import ingest_queue
from quickwit_ray.state.manifest import Manifest


def _config():
    mapping = DocMapping(
        field_mappings=(
            FieldMapping(name="body", type="text", record="freq",
                         fieldnorms=True, stored=True),
            FieldMapping(name="doc_id", type="i64", stored=True, fast=True)),
        doc_id_field="doc_id", default_search_fields=("body",))
    return IndexConfig("kq", mapping,
                       IndexSettings(split_num_docs_target=100_000))


# ---------------------------------------------------------------------------
# Kinesis
# ---------------------------------------------------------------------------

# realistic 56-digit non-contiguous sequence numbers: opacity matters
_SEQ_BASE = 49590338271490256608559692538361571095921575989136588000


def _seq(i: int) -> str:
    return str(_SEQ_BASE + 10 * i + 3)


class FakeKinesis:
    """boto3-kinesis call shapes over dict shard -> [(seq, data)]."""

    def __init__(self, data):
        self.data = data  # {shard_id: [(seq_str, bytes), ...]}

    def list_shards(self, **kw):
        return {"Shards": [{"ShardId": s} for s in sorted(self.data)]}

    def get_shard_iterator(self, StreamName, ShardId, ShardIteratorType,
                           StartingSequenceNumber=None):
        recs = self.data[ShardId]
        if ShardIteratorType == "TRIM_HORIZON":
            idx = 0
        else:
            assert ShardIteratorType == "AFTER_SEQUENCE_NUMBER"
            idx = next(i + 1 for i, (s, _) in enumerate(recs)
                       if s == StartingSequenceNumber)
        return {"ShardIterator": f"{ShardId}:{idx}"}

    def get_records(self, ShardIterator, Limit=10_000):
        shard, idx = ShardIterator.rsplit(":", 1)
        idx = int(idx)
        recs = self.data[shard][idx: idx + min(Limit, 2)]  # small pages
        nxt = idx + len(recs)
        behind = len(self.data[shard]) - nxt
        return {"Records": [{"SequenceNumber": s, "Data": d}
                            for s, d in recs],
                "NextShardIterator": f"{shard}:{nxt}",
                "MillisBehindLatest": behind * 1000}


def _kinesis_broker(n_per_shard=(7, 5)):
    data, i = {}, 0
    for p, n in enumerate(n_per_shard):
        recs = []
        for _ in range(n):
            recs.append((_seq(i), json.dumps(
                {"body": f"kinesis doc {i} stream", "doc_id": i}).encode()))
            i += 1
        data[f"shardId-{p:012d}"] = recs
    return data


def _kinesis_factory(data):
    return lambda: KinesisQueueClient(
        "events", client_factory=lambda: FakeKinesis(data),
        records_per_batch=3)


def test_kinesis_client_contract():
    data = _kinesis_broker()
    c = _kinesis_factory(data)()
    assert c.num_partitions == 2
    ranges = c.estimate_batch_ranges(0, 0, 1 << 20)
    # record-budget cuts of 3: [0, seq2], (seq2, seq5], (seq5, seq6]
    assert ranges == [(0, pad_seq(_seq(2))),
                      (pad_seq(_seq(2)), pad_seq(_seq(5))),
                      (pad_seq(_seq(5)), pad_seq(_seq(6)))]
    # ranges chain exactly from the committed position
    assert c.estimate_batch_ranges(0, pad_seq(_seq(5)), 1 << 20) == [
        (pad_seq(_seq(5)), pad_seq(_seq(6)))]
    t = c.read(0, pad_seq(_seq(1)), pad_seq(_seq(4)))
    assert t.column("doc_id").to_pylist() == [2, 3, 4]
    # byte budget cuts too
    assert len(c.estimate_batch_ranges(0, 0, 1)) == 7


def test_kinesis_ingest_end_to_end(tmp_path):
    data = _kinesis_broker()
    d = str(tmp_path / "idx")
    stats = ingest_queue(str(tmp_path / "unused"), d, _config(),
                         execution="local",
                         client_factory=_kinesis_factory(data))
    assert stats.num_docs == 12
    s = IndexSearcher(d)
    assert s.search("body:stream", max_hits=0).num_hits == 12
    m = Manifest(d)
    assert m.source_offset("queue:0") == pad_seq(_seq(6))
    assert m.source_offset("queue:1") == pad_seq(_seq(11))
    # re-poll: nothing new, no duplicate docs
    stats2 = ingest_queue(str(tmp_path / "unused"), d, _config(),
                          execution="local",
                          client_factory=_kinesis_factory(data))
    assert stats2.num_docs == 0
    assert IndexSearcher(d).search("*", max_hits=0).num_hits == 12


def test_kinesis_kill_mid_stream_resume(tmp_path):
    data = _kinesis_broker()
    d = str(tmp_path / "idx")
    with pytest.raises(RuntimeError, match="injected fault"):
        ingest_queue(str(tmp_path / "unused"), d, _config(),
                     execution="local", poll_rounds=10,
                     max_batches_per_wave=1, fault_after_commits=2,
                     client_factory=_kinesis_factory(data))
    # resume: exactly-once across the crash
    ingest_queue(str(tmp_path / "unused"), d, _config(),
                 execution="local",
                 client_factory=_kinesis_factory(data))
    assert IndexSearcher(d).search("*", max_hits=0).num_hits == 12


# ---------------------------------------------------------------------------
# Pulsar
# ---------------------------------------------------------------------------


class FakeMessageId:
    def __init__(self, partition, ledger, entry, batch):
        self._t = (partition, ledger, entry, batch)

    def ledger_id(self):
        return self._t[1]

    def entry_id(self):
        return self._t[2]

    def batch_index(self):
        return self._t[3]


class FakeMessage:
    def __init__(self, mid, data):
        self._mid, self._data = mid, data

    def message_id(self):
        return self._mid

    def data(self):
        return self._data


class FakeReader:
    def __init__(self, msgs, start_after):
        # start_after = (ledger, entry, batch) exclusive; (-1,..) = earliest
        self._msgs = [m for m in msgs
                      if (m.message_id().ledger_id(), m.message_id().entry_id(),
                          m.message_id().batch_index()) > start_after]
        self._i = 0

    def has_message_available(self):
        return self._i < len(self._msgs)

    def read_next(self, timeout_millis):
        m = self._msgs[self._i]
        self._i += 1
        return m

    def close(self):
        pass


class FakePulsar:
    """pulsar-client call shapes over dict partition-topic -> [messages]."""

    def __init__(self, data):
        self.data = data

    def get_topic_partitions(self, topic):
        return sorted(self.data)

    def create_reader(self, topic, start_message_id,
                      start_message_id_inclusive=False):
        assert not start_message_id_inclusive
        t = start_message_id._t
        return FakeReader(self.data[topic], (t[1], t[2], t[3]))


def _pulsar_broker(n_per_partition=(7, 5)):
    data, i = {}, 0
    for p, n in enumerate(n_per_partition):
        msgs = []
        for j in range(n):
            # two entries per ledger, alternating batch indexes (-1 = not
            # batched) — exercises the full MessageId encoding
            mid = FakeMessageId(p, 1000 + j // 2, j % 2, -1 if j % 3 else 0)
            msgs.append(FakeMessage(mid, json.dumps(
                {"body": f"pulsar doc {i} stream", "doc_id": i}).encode()))
            i += 1
        data[f"events-partition-{p}"] = msgs
    return data


def _pulsar_factory(data):
    return lambda: PulsarQueueClient(
        "events", client_factory=lambda: FakePulsar(data),
        message_id_factory=FakeMessageId, records_per_batch=3)


def test_pulsar_client_contract():
    data = _pulsar_broker()
    c = _pulsar_factory(data)()
    assert c.num_partitions == 2
    ranges = c.estimate_batch_ranges(0, 0, 1 << 20)
    assert len(ranges) == 3 and ranges[0][0] == 0
    # chained: each range starts where the previous ended
    assert ranges[1][0] == ranges[0][1] and ranges[2][0] == ranges[1][1]
    assert ranges[2][1] == msg_id_to_position(1003, 0, 0)
    t = c.read(0, ranges[0][1], ranges[1][1])
    assert t.column("doc_id").to_pylist() == [3, 4, 5]


def test_pulsar_ingest_end_to_end(tmp_path):
    data = _pulsar_broker()
    d = str(tmp_path / "idx")
    stats = ingest_queue(str(tmp_path / "unused"), d, _config(),
                         execution="local",
                         client_factory=_pulsar_factory(data))
    assert stats.num_docs == 12
    assert IndexSearcher(d).search("body:stream", max_hits=0).num_hits == 12
    m = Manifest(d)
    assert m.source_offset("queue:0") == msg_id_to_position(1003, 0, 0)
    stats2 = ingest_queue(str(tmp_path / "unused"), d, _config(),
                          execution="local",
                          client_factory=_pulsar_factory(data))
    assert stats2.num_docs == 0
    assert IndexSearcher(d).search("*", max_hits=0).num_hits == 12


def test_pulsar_kill_mid_stream_resume(tmp_path):
    data = _pulsar_broker()
    d = str(tmp_path / "idx")
    with pytest.raises(RuntimeError, match="injected fault"):
        ingest_queue(str(tmp_path / "unused"), d, _config(),
                     execution="local", poll_rounds=10,
                     max_batches_per_wave=1, fault_after_commits=2,
                     client_factory=_pulsar_factory(data))
    ingest_queue(str(tmp_path / "unused"), d, _config(),
                 execution="local",
                 client_factory=_pulsar_factory(data))
    assert IndexSearcher(d).search("*", max_hits=0).num_hits == 12
