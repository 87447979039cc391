"""SQS / Pub/Sub adapters (sources/mq_adapters.py) drive the SAME
message-queue coordinator: fakes reproduce the public client call shapes
(boto3 receive_message/change_message_visibility/delete_message,
pubsub pull/modify_ack_deadline/acknowledge) including visibility
expiry, so the exactly-once contract is exercised over both."""

import json
import time
import uuid

import pytest

from quickwit_ray.config import DocMapping, FieldMapping, IndexConfig, IndexSettings
from quickwit_ray.search.engine import IndexSearcher
from quickwit_ray.sources.mq import ingest_message_queue
from quickwit_ray.sources.mq_adapters import (PubSubMessageQueue,
                                              SqsMessageQueue,
                                              s3_notification_msg_id)


def _config():
    mapping = DocMapping(
        field_mappings=(
            FieldMapping(name="body", type="text", record="freq",
                         fieldnorms=True, stored=True),
            FieldMapping(name="doc_id", type="i64", stored=True, fast=True)),
        doc_id_field="doc_id", default_search_fields=("body",))
    return IndexConfig("mqa", mapping,
                       IndexSettings(split_num_docs_target=100_000))


def _ndjson(ids):
    return "\n".join(json.dumps({"body": f"notify doc {i}", "doc_id": i})
                     for i in ids)


class FakeSqsClient:
    """In-memory boto3-SQS shape: per-delivery receipt handles, real
    visibility timers, MessageId stable per send."""

    def __init__(self):
        self.msgs = {}  # message_id -> {body, attrs, visible_at}
        self.handles = {}  # receipt_handle -> message_id

    def send(self, body, attrs=None, message_id=None):
        mid = message_id or uuid.uuid4().hex
        self.msgs[mid] = {"body": body, "attrs": attrs or {},
                          "visible_at": 0.0}
        return mid

    def receive_message(self, QueueUrl, MaxNumberOfMessages=10,
                        VisibilityTimeout=30, MessageAttributeNames=(),
                        WaitTimeSeconds=0):
        now = time.time()
        out = []
        for mid, m in list(self.msgs.items()):
            if m["visible_at"] > now:
                continue
            m["visible_at"] = now + VisibilityTimeout
            h = uuid.uuid4().hex
            self.handles[h] = mid
            out.append({
                "MessageId": mid, "ReceiptHandle": h, "Body": m["body"],
                "MessageAttributes": {
                    k: {"DataType": "String", "StringValue": v}
                    for k, v in m["attrs"].items()}})
            if len(out) >= MaxNumberOfMessages:
                break
        return {"Messages": out}

    def change_message_visibility(self, QueueUrl, ReceiptHandle,
                                  VisibilityTimeout):
        mid = self.handles[ReceiptHandle]
        if mid in self.msgs:
            self.msgs[mid]["visible_at"] = time.time() + VisibilityTimeout

    def delete_message(self, QueueUrl, ReceiptHandle):
        self.msgs.pop(self.handles[ReceiptHandle], None)


class FakePubSubSubscriber:
    """In-memory pubsub v1 subscriber shape (dict-style messages)."""

    def __init__(self):
        self.msgs = {}  # message_id -> {data, attrs, deadline_at}
        self.acks = {}  # ack_id -> message_id

    def publish(self, data: bytes, attrs=None, message_id=None):
        mid = message_id or uuid.uuid4().hex
        self.msgs[mid] = {"data": data, "attrs": attrs or {},
                          "deadline_at": 0.0}
        return mid

    def pull(self, subscription, max_messages=10, return_immediately=True):
        now = time.time()
        received = []
        for mid, m in list(self.msgs.items()):
            if m["deadline_at"] > now:
                continue
            # pull leases at a 10 s default deadline; the adapter stretches
            # it right after via modify_ack_deadline
            m["deadline_at"] = now + 10.0
            ack_id = uuid.uuid4().hex
            self.acks[ack_id] = mid
            received.append({"ack_id": ack_id, "message": {
                "data": m["data"], "attributes": m["attrs"],
                "message_id": mid}})
            if len(received) >= max_messages:
                break
        return {"received_messages": received}

    def modify_ack_deadline(self, subscription, ack_ids,
                            ack_deadline_seconds):
        for a in ack_ids:
            mid = self.acks[a]
            if mid in self.msgs:
                self.msgs[mid]["deadline_at"] = (time.time()
                                                 + ack_deadline_seconds)

    def acknowledge(self, subscription, ack_ids):
        for a in ack_ids:
            self.msgs.pop(self.acks[a], None)


def test_sqs_adapter_exactly_once_with_crash(tmp_path):
    client = FakeSqsClient()
    for k in range(3):
        client.send(_ndjson(range(k * 10, k * 10 + 4)),
                    attrs={"qw_msg_id": f"file-{k}"})
    q = SqsMessageQueue(client, "https://sqs/q")
    d = str(tmp_path / "idx")
    with pytest.raises(RuntimeError, match="injected fault"):
        ingest_message_queue(q, d, _config(), token="A",
                             visibility_sec=1, fault_before_ack=True)
    # crash after publish of the first message: force redelivery now
    for m in client.msgs.values():
        m["visible_at"] = 0.0
    st = ingest_message_queue(q, d, _config(), token="B", visibility_sec=1)
    assert st.acked_duplicates == 1 and st.indexed == 2
    assert client.msgs == {}
    assert IndexSearcher(d).search("*", max_hits=0).num_hits == 12


def test_sqs_producer_retry_dedups_via_attribute(tmp_path):
    """Two sends with different MessageIds but the same qw_msg_id content
    id collapse onto one shard — the second delivery is acked unindexed."""
    client = FakeSqsClient()
    client.send(_ndjson([1, 2]), attrs={"qw_msg_id": "same"})
    d = str(tmp_path / "idx")
    st = ingest_message_queue(SqsMessageQueue(client, "u"), d, _config(),
                              token="A", visibility_sec=1)
    assert st.indexed == 1
    client.send(_ndjson([1, 2]), attrs={"qw_msg_id": "same"})
    st2 = ingest_message_queue(SqsMessageQueue(client, "u"), d, _config(),
                               token="A", visibility_sec=1)
    assert st2.acked_duplicates == 1 and st2.indexed == 0
    assert IndexSearcher(d).search("*", max_hits=0).num_hits == 2


def test_s3_notification_shard_identity():
    body = json.dumps({"Records": [{"s3": {
        "bucket": {"name": "b"}, "object": {"key": "data/x.ndjson"}}}]})
    assert (s3_notification_msg_id(body.encode(), {}, "mid-1")
            == "s3://b/data/x.ndjson")
    # non-S3 body falls back to the broker id / attribute override
    assert s3_notification_msg_id(b"not json", {}, "mid-2") == "mid-2"
    assert (s3_notification_msg_id(b"not json", {"qw_msg_id": "c"}, "m")
            == "c")


def test_pubsub_adapter_roundtrip(tmp_path):
    sub = FakePubSubSubscriber()
    for k in range(2):
        sub.publish(_ndjson(range(k * 5, k * 5 + 3)).encode(),
                    attrs={"qw_msg_id": f"obj-{k}"})
    q = PubSubMessageQueue(sub, "projects/p/subscriptions/s")
    d = str(tmp_path / "idx")
    st = ingest_message_queue(q, d, _config(), token="A", visibility_sec=5)
    assert st.indexed == 2 and sub.msgs == {}
    assert IndexSearcher(d).search("*", max_hits=0).num_hits == 6
    # redelivered duplicate (e.g. deadline raced): acked without reindex
    sub.publish(_ndjson([0, 1, 2]).encode(), attrs={"qw_msg_id": "obj-0"})
    st2 = ingest_message_queue(q, d, _config(), token="A", visibility_sec=5)
    assert st2.acked_duplicates == 1 and st2.indexed == 0
    assert IndexSearcher(d).search("*", max_hits=0).num_hits == 6
