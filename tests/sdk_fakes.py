"""Protocol-level strict SDK fakes (round-3 verdict item: adapter tests
must fail if the SDK call signatures drift).

Each fake mimics the REAL SDK's public call shapes and validates them
the way the real client library does:

* ``StrictSqsClient`` / ``StrictKinesisClient`` — botocore-style:
  keyword-only operation parameters validated against the service
  model's member list (unknown parameter -> ParamValidationError-like
  ``TypeError``; any positional argument -> ``TypeError``), responses in
  the exact botocore response dict shape.
* ``StrictKafkaConsumer`` — confluent-kafka C-binding style:
  ``get_watermark_offsets(TopicPartition, timeout, cached)`` /
  ``assign(list[TopicPartition])`` / ``poll(timeout)``; Message exposes
  METHODS (``error()/value()/offset()/partition()/topic()``), KafkaError
  exposes ``code()`` with ``_PARTITION_EOF == -191``.
* ``StrictPubSubSubscriber`` — google-cloud-pubsub v1: flattened
  keyword params or ``request=`` dict (never both), field names
  validated against the proto request messages; responses expose
  ``received_messages`` with ``ack_id`` / ``message.data`` attributes.
* ``StrictPulsarClient`` — pulsar-client style: ``create_reader(topic,
  start_message_id, **conf)``; Reader has ``has_message_available()`` /
  ``read_next(timeout_millis)``; Message exposes ``message_id()`` /
  ``data()``; MessageId exposes ``ledger_id()/entry_id()/batch_index()``.
"""

from __future__ import annotations

import json
from typing import Any, Optional


def _kwargs_only(op: str, args: tuple) -> None:
    if args:
        raise TypeError(f"{op}() only accepts keyword arguments "
                        f"(botocore operations are kwargs-only)")


def _validate_params(op: str, kwargs: dict, allowed: set, required: set):
    unknown = set(kwargs) - allowed
    if unknown:
        raise TypeError(  # botocore: ParamValidationError
            f"Parameter validation failed: Unknown parameter(s) in input: "
            f"{sorted(unknown)} for {op}, must be one of: {sorted(allowed)}")
    missing = required - set(kwargs)
    if missing:
        raise TypeError(f"Parameter validation failed: Missing required "
                        f"parameter(s) {sorted(missing)} for {op}")


# ---------------------------------------------------------------------------
# SQS (botocore shapes from the sqs-2012-11-05 service model)
# ---------------------------------------------------------------------------

class StrictSqsClient:
    def __init__(self, queue_url: str):
        self.queue_url = queue_url
        self._queue: list[dict] = []       # pending messages
        self._invisible: dict[str, dict] = {}  # receipt handle -> message
        self._next = 0
        self.calls: list[str] = []

    # -- producer-side test helper (not an SDK surface) -------------------
    def push(self, body: str, attributes: Optional[dict] = None) -> str:
        mid = f"mid-{self._next}"
        self._next += 1
        self._queue.append({
            "MessageId": mid, "Body": body,
            "MessageAttributes": {
                k: {"StringValue": str(v), "DataType": "String"}
                for k, v in (attributes or {}).items()}})
        return mid

    def requeue_invisible(self) -> None:
        """Visibility timeout expiry: redeliver unacked messages."""
        for m in self._invisible.values():
            self._queue.append(m)
        self._invisible.clear()

    # -- SDK surface -------------------------------------------------------
    def receive_message(self, *args, **kwargs):
        self.calls.append("receive_message")
        _kwargs_only("receive_message", args)
        _validate_params(
            "receive_message", kwargs,
            allowed={"QueueUrl", "AttributeNames", "MessageAttributeNames",
                     "MaxNumberOfMessages", "VisibilityTimeout",
                     "WaitTimeSeconds", "ReceiveRequestAttemptId",
                     "MessageSystemAttributeNames"},
            required={"QueueUrl"})
        assert kwargs["QueueUrl"] == self.queue_url
        n = kwargs.get("MaxNumberOfMessages", 1)
        if not isinstance(n, int) or not 1 <= n <= 10:
            raise TypeError("MaxNumberOfMessages must be an int in 1..10")
        vt = kwargs.get("VisibilityTimeout", 30)
        if not isinstance(vt, int) or not 0 <= vt <= 43200:
            raise TypeError("VisibilityTimeout must be an int in 0..43200")
        wt = kwargs.get("WaitTimeSeconds", 0)
        if not isinstance(wt, int) or not 0 <= wt <= 20:
            raise TypeError("WaitTimeSeconds must be an int in 0..20")
        man = kwargs.get("MessageAttributeNames", [])
        if not isinstance(man, list) or not all(isinstance(x, str)
                                                for x in man):
            raise TypeError("MessageAttributeNames must be a list of str")
        out = []
        while self._queue and len(out) < n:
            m = self._queue.pop(0)
            handle = f"rh-{m['MessageId']}-{len(self._invisible)}"
            self._invisible[handle] = m
            out.append({**m, "ReceiptHandle": handle})
        resp = {"ResponseMetadata": {"HTTPStatusCode": 200}}
        if out:
            resp["Messages"] = out
        return resp

    def change_message_visibility(self, *args, **kwargs):
        self.calls.append("change_message_visibility")
        _kwargs_only("change_message_visibility", args)
        _validate_params(
            "change_message_visibility", kwargs,
            allowed={"QueueUrl", "ReceiptHandle", "VisibilityTimeout"},
            required={"QueueUrl", "ReceiptHandle", "VisibilityTimeout"})
        if kwargs["ReceiptHandle"] not in self._invisible:
            raise RuntimeError("ReceiptHandleIsInvalid")  # SQS error class
        if not isinstance(kwargs["VisibilityTimeout"], int):
            raise TypeError("VisibilityTimeout must be an int")
        return {"ResponseMetadata": {"HTTPStatusCode": 200}}

    def delete_message(self, *args, **kwargs):
        self.calls.append("delete_message")
        _kwargs_only("delete_message", args)
        _validate_params("delete_message", kwargs,
                         allowed={"QueueUrl", "ReceiptHandle"},
                         required={"QueueUrl", "ReceiptHandle"})
        if kwargs["ReceiptHandle"] not in self._invisible:
            raise RuntimeError("ReceiptHandleIsInvalid")
        del self._invisible[kwargs["ReceiptHandle"]]
        return {"ResponseMetadata": {"HTTPStatusCode": 200}}


# ---------------------------------------------------------------------------
# Kinesis (botocore shapes from the kinesis-2013-12-02 service model)
# ---------------------------------------------------------------------------

class StrictKinesisClient:
    def __init__(self, stream_name: str, num_shards: int = 2):
        self.stream_name = stream_name
        self._shards = {f"shardId-{i:012d}": [] for i in range(num_shards)}
        self._seq = 1000

    def push(self, shard: int, data: bytes) -> str:
        sid = sorted(self._shards)[shard]
        seq = str(self._seq)
        self._seq += 7
        self._shards[sid].append({"SequenceNumber": seq, "Data": data,
                                  "PartitionKey": "pk",
                                  "ApproximateArrivalTimestamp": 0})
        return seq

    def list_shards(self, *args, **kwargs):
        _kwargs_only("list_shards", args)
        _validate_params(
            "list_shards", kwargs,
            allowed={"StreamName", "NextToken", "ExclusiveStartShardId",
                     "MaxResults", "StreamCreationTimestamp", "ShardFilter",
                     "StreamARN"},
            required=set())
        if "NextToken" in kwargs and "StreamName" in kwargs:
            raise TypeError("InvalidArgumentException: NextToken and "
                            "StreamName cannot both be provided")
        if "NextToken" not in kwargs:
            assert kwargs.get("StreamName") == self.stream_name
        return {"Shards": [{"ShardId": sid,
                            "HashKeyRange": {"StartingHashKey": "0",
                                             "EndingHashKey": "1"},
                            "SequenceNumberRange":
                                {"StartingSequenceNumber": "0"}}
                           for sid in sorted(self._shards)]}

    def get_shard_iterator(self, *args, **kwargs):
        _kwargs_only("get_shard_iterator", args)
        _validate_params(
            "get_shard_iterator", kwargs,
            allowed={"StreamName", "ShardId", "ShardIteratorType",
                     "StartingSequenceNumber", "Timestamp", "StreamARN"},
            required={"ShardId", "ShardIteratorType"})
        t = kwargs["ShardIteratorType"]
        if t not in ("AT_SEQUENCE_NUMBER", "AFTER_SEQUENCE_NUMBER",
                     "TRIM_HORIZON", "LATEST", "AT_TIMESTAMP"):
            raise TypeError(f"invalid ShardIteratorType {t!r}")
        if t.endswith("SEQUENCE_NUMBER") and \
                "StartingSequenceNumber" not in kwargs:
            raise TypeError("StartingSequenceNumber required for "
                            "AT/AFTER_SEQUENCE_NUMBER")
        sid = kwargs["ShardId"]
        if sid not in self._shards:
            raise RuntimeError("ResourceNotFoundException")
        after = (kwargs["StartingSequenceNumber"]
                 if t == "AFTER_SEQUENCE_NUMBER" else None)
        return {"ShardIterator": json.dumps({"shard": sid, "after": after})}

    def get_records(self, *args, **kwargs):
        _kwargs_only("get_records", args)
        _validate_params("get_records", kwargs,
                         allowed={"ShardIterator", "Limit", "StreamARN"},
                         required={"ShardIterator"})
        limit = kwargs.get("Limit", 10_000)
        if not isinstance(limit, int) or not 1 <= limit <= 10_000:
            raise TypeError("Limit must be an int in 1..10000")
        it = json.loads(kwargs["ShardIterator"])
        recs = self._shards[it["shard"]]
        if it["after"] is not None:
            recs = [r for r in recs
                    if int(r["SequenceNumber"]) > int(it["after"])]
        out = recs[:limit]
        nxt = None
        if out:
            nxt = json.dumps({"shard": it["shard"],
                              "after": out[-1]["SequenceNumber"]})
        return {"Records": out, "NextShardIterator": nxt,
                "MillisBehindLatest": 0}


# ---------------------------------------------------------------------------
# confluent-kafka
# ---------------------------------------------------------------------------

class _KafkaError:
    _PARTITION_EOF = -191

    def __init__(self, code: int):
        self._code = code

    def code(self) -> int:
        return self._code


class _KafkaMessage:
    def __init__(self, topic, partition, offset, value, error=None):
        self._t, self._p, self._o, self._v = topic, partition, offset, value
        self._e = error

    def topic(self):
        return self._t

    def partition(self):
        return self._p

    def offset(self):
        return self._o

    def value(self):
        return self._v

    def error(self):
        return self._e


class StrictKafkaConsumer:
    """confluent_kafka.Consumer facade over an in-memory topic."""

    def __init__(self, topic: str, partitions: list[list[bytes]]):
        self.topic = topic
        self._parts = partitions
        self._assigned = None
        self._cursor = 0
        self._eof_sent = False
        self.closed = False

    @staticmethod
    def _check_tp(tp) -> None:
        # the C binding requires a TopicPartition instance: duck-validate
        # the exact attribute surface the binding reads
        for attr in ("topic", "partition"):
            if not hasattr(tp, attr):
                raise TypeError("expected TopicPartition, got "
                                f"{type(tp).__name__}")
        if not isinstance(tp.partition, int):
            raise TypeError("TopicPartition.partition must be int")

    def get_watermark_offsets(self, partition, timeout=None, cached=False):
        self._check_tp(partition)
        if partition.topic != self.topic \
                or partition.partition >= len(self._parts):
            raise RuntimeError("KafkaException: Unknown partition")
        return 0, len(self._parts[partition.partition])

    def assign(self, partitions):
        if not isinstance(partitions, list):
            raise TypeError("assign() expects a list of TopicPartition")
        for tp in partitions:
            self._check_tp(tp)
            if not isinstance(tp.offset, int):
                raise TypeError("TopicPartition.offset must be int")
        self._assigned = partitions[0]
        self._cursor = max(0, int(partitions[0].offset))
        self._eof_sent = False

    def poll(self, timeout=None):
        if timeout is not None and not isinstance(timeout, (int, float)):
            raise TypeError("poll() timeout must be a number")
        if self._assigned is None:
            return None
        part = self._assigned.partition
        data = self._parts[part]
        if self._cursor >= len(data):
            if not self._eof_sent:
                self._eof_sent = True
                return _KafkaMessage(
                    self.topic, part, self._cursor, None,
                    error=_KafkaError(_KafkaError._PARTITION_EOF))
            return None
        msg = _KafkaMessage(self.topic, part, self._cursor,
                            data[self._cursor])
        self._cursor += 1
        return msg

    def close(self):
        self.closed = True


# ---------------------------------------------------------------------------
# google-cloud-pubsub v1 subscriber
# ---------------------------------------------------------------------------

class _Obj:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class StrictPubSubSubscriber:
    _PULL_FIELDS = {"subscription", "max_messages", "return_immediately"}
    _MAD_FIELDS = {"subscription", "ack_ids", "ack_deadline_seconds"}
    _ACK_FIELDS = {"subscription", "ack_ids"}

    def __init__(self, subscription: str):
        self.subscription = subscription
        self._queue: list[_Obj] = []
        self._unacked: dict[str, _Obj] = {}
        self._n = 0

    def push(self, data: bytes, attributes: Optional[dict] = None) -> str:
        mid = f"pm-{self._n}"
        self._n += 1
        self._queue.append(_Obj(data=data, attributes=dict(attributes or {}),
                                message_id=mid))
        return mid

    def requeue_unacked(self) -> None:
        for m in self._unacked.values():
            self._queue.append(m)
        self._unacked.clear()

    @classmethod
    def _merge_request(cls, name, fields, request, kwargs):
        # google api core: request= and flattened params are exclusive
        if request is not None and kwargs:
            raise ValueError(f"{name}: cannot pass both request and "
                             "flattened parameters")
        params = dict(request) if request is not None else dict(kwargs)
        unknown = set(params) - fields
        if unknown:
            raise TypeError(f"{name}: unknown fields {sorted(unknown)}")
        if "subscription" not in params:
            raise TypeError(f"{name}: subscription is required")
        return params

    def pull(self, request=None, **kwargs):
        p = self._merge_request("pull", self._PULL_FIELDS, request, kwargs)
        assert p["subscription"] == self.subscription
        n = p.get("max_messages")
        if not isinstance(n, int) or n < 1:
            raise TypeError("pull: max_messages must be a positive int")
        out = []
        while self._queue and len(out) < n:
            m = self._queue.pop(0)
            ack_id = f"ack-{m.message_id}-{len(self._unacked)}"
            self._unacked[ack_id] = m
            out.append(_Obj(ack_id=ack_id, message=m))
        return _Obj(received_messages=out)

    def modify_ack_deadline(self, request=None, **kwargs):
        p = self._merge_request("modify_ack_deadline", self._MAD_FIELDS,
                                request, kwargs)
        if not isinstance(p.get("ack_ids"), list):
            raise TypeError("modify_ack_deadline: ack_ids must be a list")
        if not isinstance(p.get("ack_deadline_seconds"), int):
            raise TypeError("modify_ack_deadline: ack_deadline_seconds "
                            "must be an int")
        for a in p["ack_ids"]:
            if a not in self._unacked:
                raise RuntimeError("INVALID_ARGUMENT: unknown ack id")

    def acknowledge(self, request=None, **kwargs):
        p = self._merge_request("acknowledge", self._ACK_FIELDS,
                                request, kwargs)
        for a in p.get("ack_ids", ()):
            if a not in self._unacked:
                raise RuntimeError("INVALID_ARGUMENT: unknown ack id")
            del self._unacked[a]


# ---------------------------------------------------------------------------
# pulsar-client
# ---------------------------------------------------------------------------

class _PulsarMessageId:
    def __init__(self, partition, ledger, entry, batch):
        self._p, self._l, self._e, self._b = partition, ledger, entry, batch

    def ledger_id(self):
        return self._l

    def entry_id(self):
        return self._e

    def batch_index(self):
        return self._b

    def partition(self):
        return self._p


class _PulsarMessage:
    def __init__(self, mid: _PulsarMessageId, data: bytes):
        self._mid, self._data = mid, data

    def message_id(self):
        return self._mid

    def data(self):
        return self._data


class _PulsarReader:
    def __init__(self, msgs: list[_PulsarMessage], start, inclusive: bool):
        def key(m):
            mid = m.message_id()
            return (mid.ledger_id(), mid.entry_id(), mid.batch_index())

        if getattr(start, "ledger_id", None) is not None \
                and not isinstance(start, str):
            sk = (start.ledger_id(), start.entry_id(), start.batch_index())
            msgs = [m for m in msgs
                    if (key(m) >= sk if inclusive else key(m) > sk)]
        self._msgs = list(msgs)
        self.closed = False

    def has_message_available(self):
        return bool(self._msgs)

    def read_next(self, timeout_millis=None):
        if timeout_millis is not None and not isinstance(timeout_millis, int):
            raise TypeError("read_next: timeout_millis must be an int")
        if not self._msgs:
            raise RuntimeError("Pulsar error: TimeOut")
        return self._msgs.pop(0)

    def close(self):
        self.closed = True


class StrictPulsarClient:
    """pulsar.Client facade over in-memory partitioned topics."""

    class MessageId:
        earliest = _PulsarMessageId(-1, -1, -1, -1)

        def __new__(cls, partition=-1, ledger_id=-1, entry_id=-1,
                    batch_index=-1):
            return _PulsarMessageId(partition, ledger_id, entry_id,
                                    batch_index)

    def __init__(self, topic: str, num_partitions: int = 2):
        self.topic = topic
        self._parts: list[list[_PulsarMessage]] = \
            [[] for _ in range(num_partitions)]
        self._ledger = 7

    def push(self, partition: int, data: bytes) -> None:
        entry = len(self._parts[partition])
        self._parts[partition].append(_PulsarMessage(
            _PulsarMessageId(partition, self._ledger, entry, -1), data))

    def get_topic_partitions(self, topic):
        if topic != self.topic:
            raise RuntimeError("Pulsar error: TopicNotFound")
        return [f"{self.topic}-partition-{i}"
                for i in range(len(self._parts))]

    def create_reader(self, topic, start_message_id, **conf):
        unknown = set(conf) - {"start_message_id_inclusive", "reader_name",
                               "receiver_queue_size", "schema",
                               "crypto_key_reader"}
        if unknown:
            raise TypeError(f"create_reader: unknown config {sorted(unknown)}")
        if "-partition-" not in topic:
            raise RuntimeError("expected a partition topic name")
        p = int(topic.rsplit("-", 1)[1])
        return _PulsarReader(self._parts[p], start_message_id,
                             bool(conf.get("start_message_id_inclusive",
                                           False)))
