"""SQS / Pub/Sub client adapters behind the message-queue contract.

The coordinator in `sources/mq.py` (`ingest_message_queue`) consumes any
object with the 3-call broker surface from the reference's
`quickwit-indexing/src/source/queue_sources/design.md`:
``receive(max_messages, visibility_sec)`` / ``extend_visibility(handle,
sec)`` / ``ack(handle)``. This module maps that surface onto the two
real brokers the reference ships queue sources for:

* ``SqsMessageQueue`` — the boto3 SQS client surface
  (``receive_message`` / ``change_message_visibility`` /
  ``delete_message``, mirroring `queue_sources/sqs_queue.rs`);
* ``PubSubMessageQueue`` — the google-cloud-pubsub v1 subscriber
  surface (``pull`` / ``modify_ack_deadline`` / ``acknowledge``,
  mirroring `queue_sources/gcp_pubsub.rs` in the reference's GCP
  source).

Neither SDK is installed in this environment, so construction takes the
client object directly (or a factory) — tests inject fakes with the same
public call shapes; a production deployment passes
``boto3.client("sqs")`` / ``SubscriberClient()`` unchanged. Exactly-once
stays entirely in the coordinator + metastore shard state: these
adapters only translate deliveries.

Shard identity: the reference keys shards by the notified FILE URI, not
the broker's delivery id (`queue_sources/message.rs`:
``PreProcessedPayload::ObjectUri``). ``s3_notification_msg_id`` extracts
that URI from a standard S3 event notification body; by default the
broker's stable message id is used (attribute ``qw_msg_id`` overrides —
producers that retry sends should set it to a content id).
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional

from quickwit_ray.sources.mq import Message

# msg_id extractor: (body_bytes, attributes, broker_message_id) -> shard id
MsgIdFn = Callable[[bytes, dict, str], str]


def _default_msg_id(body: bytes, attrs: dict, message_id: str) -> str:
    return str(attrs.get("qw_msg_id", message_id))


def s3_notification_msg_id(body: bytes, attrs: dict, message_id: str) -> str:
    """Shard id = ``s3://bucket/key`` of the FIRST record of a standard S3
    event notification (the reference's ObjectUri shard identity) —
    duplicate notifications for the same object dedup regardless of the
    broker's delivery ids. Falls back to the broker id for non-S3 bodies."""
    try:
        evt = json.loads(body)
        rec = evt["Records"][0]["s3"]
        return f"s3://{rec['bucket']['name']}/{rec['object']['key']}"
    except (ValueError, KeyError, IndexError, TypeError):
        return _default_msg_id(body, attrs, message_id)


class SqsMessageQueue:
    """MessageQueue over a boto3-shaped SQS client.

    The delivery handle is the SQS ReceiptHandle verbatim; visibility is
    SQS's native visibility timeout. ``input_format`` comes from the
    ``qw_format`` message attribute (default ndjson)."""

    # SQS caps ReceiveMessage at 10 messages per call
    _MAX_BATCH = 10

    def __init__(self, client: Any, queue_url: str, *,
                 msg_id_fn: Optional[MsgIdFn] = None):
        self.client = client
        self.queue_url = queue_url
        self.msg_id_fn = msg_id_fn or _default_msg_id

    def receive(self, max_messages: int = 10,
                visibility_sec: float = 30.0) -> list[Message]:
        out: list[Message] = []
        while len(out) < max_messages:
            resp = self.client.receive_message(
                QueueUrl=self.queue_url,
                MaxNumberOfMessages=min(max_messages - len(out),
                                        self._MAX_BATCH),
                VisibilityTimeout=max(1, int(visibility_sec)),
                MessageAttributeNames=["All"],
                WaitTimeSeconds=0)
            batch = resp.get("Messages", [])
            if not batch:
                break
            for m in batch:
                attrs = {k: v.get("StringValue")
                         for k, v in (m.get("MessageAttributes") or {}).items()}
                body = m["Body"].encode() if isinstance(m["Body"], str) \
                    else m["Body"]
                out.append(Message(
                    msg_id=self.msg_id_fn(body, attrs, m["MessageId"]),
                    handle=m["ReceiptHandle"],
                    payload=body,
                    input_format=attrs.get("qw_format", "ndjson")))
        return out

    def extend_visibility(self, handle: str, visibility_sec: float) -> None:
        self.client.change_message_visibility(
            QueueUrl=self.queue_url, ReceiptHandle=handle,
            VisibilityTimeout=max(1, int(visibility_sec)))

    def ack(self, handle: str) -> None:
        self.client.delete_message(QueueUrl=self.queue_url,
                                   ReceiptHandle=handle)


class PubSubMessageQueue:
    """MessageQueue over a google-cloud-pubsub-shaped v1 subscriber.

    The delivery handle is the Pub/Sub ack_id; visibility maps onto the
    ack deadline (``pull`` delivers at the subscription's default
    deadline, then ``modify_ack_deadline`` stretches it to the requested
    window — Pub/Sub has no per-pull deadline)."""

    def __init__(self, subscriber: Any, subscription: str, *,
                 msg_id_fn: Optional[MsgIdFn] = None):
        self.subscriber = subscriber
        self.subscription = subscription
        self.msg_id_fn = msg_id_fn or _default_msg_id

    def receive(self, max_messages: int = 10,
                visibility_sec: float = 30.0) -> list[Message]:
        resp = self.subscriber.pull(subscription=self.subscription,
                                    max_messages=max_messages,
                                    return_immediately=True)
        received = getattr(resp, "received_messages", None)
        if received is None:
            received = resp.get("received_messages", [])
        out: list[Message] = []
        ack_ids = []
        for rm in received:
            msg = rm["message"] if isinstance(rm, dict) else rm.message
            ack_id = rm["ack_id"] if isinstance(rm, dict) else rm.ack_id
            data = msg["data"] if isinstance(msg, dict) else msg.data
            attrs = dict(msg["attributes"] if isinstance(msg, dict)
                         else msg.attributes)
            mid = msg["message_id"] if isinstance(msg, dict) \
                else msg.message_id
            out.append(Message(
                msg_id=self.msg_id_fn(data, attrs, mid),
                handle=ack_id,
                payload=data,
                input_format=attrs.get("qw_format", "ndjson")))
            ack_ids.append(ack_id)
        if ack_ids:
            self.subscriber.modify_ack_deadline(
                subscription=self.subscription, ack_ids=ack_ids,
                ack_deadline_seconds=max(1, int(visibility_sec)))
        return out

    def extend_visibility(self, handle: str, visibility_sec: float) -> None:
        self.subscriber.modify_ack_deadline(
            subscription=self.subscription, ack_ids=[handle],
            ack_deadline_seconds=max(1, int(visibility_sec)))

    def ack(self, handle: str) -> None:
        self.subscriber.acknowledge(subscription=self.subscription,
                                    ack_ids=[handle])
