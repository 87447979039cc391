"""OPTIONAL live-wire integration tests (VERDICT r4 #8).

The broker / metastore adapters normally run against strict protocol
fakes (tests/sdk_fakes.py). These tests run the SAME adapters against
REAL endpoints the day a wire is available — set the matching
``QW_LIVE_*`` env var (and have the SDK installed) to enable one:

  QW_LIVE_KAFKA_BOOTSTRAP=broker:9092        (confluent-kafka)
  QW_LIVE_SQS_QUEUE_URL=https://sqs...       (boto3; creds from env)
  QW_LIVE_PUBSUB_SUBSCRIPTION=projects/...   (+ QW_LIVE_PUBSUB_TOPIC)
  QW_LIVE_PG_DSN=postgresql://user:pw@host/db  (psycopg2)

In this sandbox every test SKIPS (no network, SDKs not installed) —
they exist so the strict fakes get a truth check against live wires
without any code change. Each test drains through the same
ingest_queue / ingest_message_queue / SqlStore machinery the fakes
exercise, so call-shape drift against a real SDK fails here first."""

import json
import os
import uuid

import pytest

from quickwit_ray.api import Index
from quickwit_ray.config import (
    DocMapping,
    FieldMapping,
    IndexConfig,
    IndexSettings,
)
from quickwit_ray.search.engine import IndexSearcher
from quickwit_ray.state.manifest import Manifest

pytestmark = pytest.mark.live


def _need(env: str, sdk: str) -> str:
    val = os.environ.get(env)
    if not val:
        pytest.skip(f"live wire disabled: set {env} (needs {sdk})")
    pytest.importorskip(sdk.replace("-", "_"))
    return val


def _config(index_id: str) -> IndexConfig:
    mapping = DocMapping(
        field_mappings=(
            FieldMapping(name="body", type="text", record="freq",
                         fieldnorms=True, stored=True),
            FieldMapping(name="doc_id", type="i64", stored=True, fast=True)),
        doc_id_field="doc_id", default_search_fields=("body",))
    return IndexConfig(index_id, mapping,
                       IndexSettings(split_num_docs_target=100_000))


def _docs(n: int, tag: str) -> list[dict]:
    return [{"body": f"live {tag} doc {i} wire", "doc_id": i}
            for i in range(n)]


def test_live_kafka_ingest(tmp_path):
    """Produce to a fresh topic, drain it through the UNCHANGED
    ingest_queue poller + KafkaQueueClient, re-poll = exactly-once."""
    bootstrap = _need("QW_LIVE_KAFKA_BOOTSTRAP", "confluent-kafka")
    from confluent_kafka import Producer

    from quickwit_ray.sources.kafka import KafkaQueueClient
    from quickwit_ray.sources.queue import ingest_queue

    topic = os.environ.get("QW_LIVE_KAFKA_TOPIC",
                           f"qw-ray-live-{uuid.uuid4().hex[:8]}")
    prod = Producer({"bootstrap.servers": bootstrap})
    docs = _docs(12, "kafka")
    for d in docs:
        prod.produce(topic, json.dumps(d).encode())
    assert prod.flush(30) == 0, "undelivered kafka messages"

    idx_dir = str(tmp_path / "kafka-idx")
    factory = lambda: KafkaQueueClient(topic, bootstrap)  # noqa: E731
    stats = ingest_queue(str(tmp_path / "unused"), idx_dir,
                         _config("kafka-live"), execution="local",
                         client_factory=factory)
    assert stats.num_docs == len(docs)
    s = IndexSearcher(idx_dir)
    assert s.search("body:wire", max_hits=0).num_hits == len(docs)
    # second poll from the committed checkpoint: nothing new
    stats2 = ingest_queue(str(tmp_path / "unused"), idx_dir,
                          _config("kafka-live"), execution="local",
                          client_factory=factory)
    assert stats2.num_docs == 0


def test_live_sqs_ingest(tmp_path):
    """Send ndjson messages to a real SQS queue, drain them through the
    message-ack coordinator; duplicates (if SQS redelivers) must ack
    without re-indexing."""
    queue_url = _need("QW_LIVE_SQS_QUEUE_URL", "boto3")
    import boto3

    from quickwit_ray.sources.mq import ingest_message_queue
    from quickwit_ray.sources.mq_adapters import SqsMessageQueue

    client = boto3.client("sqs")
    docs = _docs(6, "sqs")
    # 2 messages x 3 docs, each with a stable qw_msg_id (shard identity)
    for i in range(2):
        body = "\n".join(json.dumps(d) for d in docs[i * 3:(i + 1) * 3])
        client.send_message(
            QueueUrl=queue_url, MessageBody=body,
            MessageAttributes={"qw_msg_id": {
                "DataType": "String",
                "StringValue": f"live-sqs-{uuid.uuid4().hex[:8]}-{i}"}})

    idx_dir = str(tmp_path / "sqs-idx")
    total = 0
    # SQS delivery is eventually-consistent: poll until both land
    for _ in range(10):
        st = ingest_message_queue(
            SqsMessageQueue(client, queue_url), idx_dir,
            _config("sqs-live"), visibility_sec=30)
        total += st.num_docs
        if total >= len(docs):
            break
    assert total == len(docs)
    assert IndexSearcher(idx_dir).search("body:wire",
                                         max_hits=0).num_hits == len(docs)


def test_live_pubsub_ingest(tmp_path):
    """Publish to a real Pub/Sub topic, drain through the SAME
    coordinator via PubSubMessageQueue."""
    subscription = _need("QW_LIVE_PUBSUB_SUBSCRIPTION", "google-cloud-pubsub")
    topic = os.environ.get("QW_LIVE_PUBSUB_TOPIC")
    if not topic:
        pytest.skip("set QW_LIVE_PUBSUB_TOPIC to publish test messages")
    from google.cloud import pubsub_v1  # type: ignore

    from quickwit_ray.sources.mq import ingest_message_queue
    from quickwit_ray.sources.mq_adapters import PubSubMessageQueue

    docs = _docs(4, "pubsub")
    publisher = pubsub_v1.PublisherClient()
    body = "\n".join(json.dumps(d) for d in docs).encode()
    publisher.publish(topic, body,
                      qw_msg_id=f"live-ps-{uuid.uuid4().hex[:8]}").result(30)

    idx_dir = str(tmp_path / "ps-idx")
    sub = pubsub_v1.SubscriberClient()
    total = 0
    for _ in range(10):
        st = ingest_message_queue(
            PubSubMessageQueue(sub, subscription), idx_dir,
            _config("pubsub-live"), visibility_sec=30)
        total += st.num_docs
        if total >= len(docs):
            break
    assert total == len(docs)


def test_live_postgres_metastore(tmp_path):
    """Create an index on a REAL shared PostgreSQL metastore through the
    stock psycopg2 driver path (state/sql.py _default_postgres): publish,
    reopen, search — the dialect must emit %s params + ON CONFLICT
    against a genuine server, not just the strict fake."""
    dsn = _need("QW_LIVE_PG_DSN", "psycopg2")

    index_id = f"live-pg-{uuid.uuid4().hex[:8]}"
    idx = Index.create(str(tmp_path / index_id), index_id,
                       _config(index_id).doc_mapping,
                       settings=IndexSettings(split_num_docs_target=10_000),
                       metastore="postgres", metastore_dsn=dsn)
    idx.ingest_docs(_docs(20, "pg"), commit_id="c1")
    # duplicate commit id: exactly-once through the ACID metastore
    idx.ingest_docs(_docs(20, "pg"), commit_id="c1")
    assert idx.search("body:wire", max_hits=0).num_hits == 20
    # a FRESH handle resolves the metastore.json pointer -> live server
    again = Index.open(idx.index_dir)
    assert again.search("body:wire", max_hits=0).num_hits == 20
    assert len(Manifest(idx.index_dir).published_splits()) >= 1
