"""Message-ack queue sources (SQS / Pub/Sub model).

Re-expresses the reference's `quickwit-indexing/src/source/queue_sources/`
(design.md + coordinator.rs + shared_state.rs + visibility.rs): queues
that deliver at-least-once MESSAGES with visibility timeouts and
acknowledgments — a different exactly-once contract from the
offset-stream sources in `sources/queue.py`:

  * each message's CONTENT ID becomes a SHARD tracked in the metastore
    (`Manifest.open_shard`, shard id = message id / file URI);
  * ownership is first-caller-wins via a pipeline publish TOKEN; stale
    shards (owner died) are re-acquired after ``stale_after_sec``
    (2x commit timeout in the reference);
  * completion (EOF) is the ``mq:{shard_id}`` checkpoint committed in the
    SAME atomic manifest append as the split publish — a crash between
    publish and ack redelivers the message, the coordinator sees the
    completed shard and just acks it (no duplicate docs);
  * shards older than the deduplication window are pruned
    (`Manifest.prune_shards`).

``MessageQueue`` is the 3-call broker abstraction from design.md
(receive / extend visibility / acknowledge). ``LocalMessageQueue`` is a
durable on-disk implementation with real visibility timeouts — the
sandbox broker (memory_queue.rs analog) AND a usable local-notification
queue; an SQS client would implement the same three calls over boto3
(receive_message / change_message_visibility / delete_message,
sqs_queue.rs) and plug into the SAME coordinator unchanged.

Per design.md, this path tracks every message in the metastore and is
meant for LARGE message payloads (file notifications), not per-event
messages — the offset-stream source covers the high-rate case.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Any, Optional

from quickwit_ray.config import IndexConfig
from quickwit_ray.state.manifest import Manifest


@dataclass
class Message:
    """One delivery: ``msg_id`` is the stable CONTENT id (shard id);
    ``handle`` identifies THIS delivery (SQS receipt handle analog)."""

    msg_id: str
    handle: str
    payload: bytes
    input_format: str = "ndjson"


class LocalMessageQueue:
    """Durable at-least-once message queue on disk with visibility
    timeouts. One file per message under ``ready/``; receiving a message
    writes an ``invisible-until`` lease next to it; acking deletes both.
    A crashed consumer's lease simply expires — redelivery, like SQS."""

    def __init__(self, queue_dir: str):
        self.queue_dir = queue_dir
        os.makedirs(os.path.join(queue_dir, "ready"), exist_ok=True)

    # -- producer --------------------------------------------------------

    def send(self, msg_id: str, payload: bytes,
             input_format: str = "ndjson") -> None:
        p = os.path.join(self.queue_dir, "ready", f"{msg_id}.msg")
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(json.dumps({"format": input_format}).encode() + b"\n")
            f.write(payload)
        os.replace(tmp, p)

    def send_duplicate(self, msg_id: str) -> None:
        """Simulate the broker's at-least-once duplicate delivery: clear
        the lease so the same message is received again."""
        lease = os.path.join(self.queue_dir, "ready", f"{msg_id}.lease")
        if os.path.exists(lease):
            os.unlink(lease)

    # -- consumer (the 3 calls from design.md) ---------------------------

    def receive(self, max_messages: int = 10,
                visibility_sec: float = 30.0) -> list[Message]:
        now = time.time()
        out: list[Message] = []
        ready = os.path.join(self.queue_dir, "ready")
        for name in sorted(os.listdir(ready)):
            if not name.endswith(".msg"):
                continue
            msg_id = name[:-4]
            lease = os.path.join(ready, f"{msg_id}.lease")
            if os.path.exists(lease):
                try:
                    with open(lease) as f:
                        if float(f.read().strip() or 0) > now:
                            continue  # still invisible
                except (OSError, ValueError):
                    pass
            handle = f"{msg_id}:{uuid.uuid4().hex[:8]}"
            with open(lease, "w") as f:
                f.write(str(now + visibility_sec))
            with open(os.path.join(ready, name), "rb") as f:
                header = json.loads(f.readline())
                payload = f.read()
            out.append(Message(msg_id=msg_id, handle=handle, payload=payload,
                               input_format=header.get("format", "ndjson")))
            if len(out) >= max_messages:
                break
        return out

    def extend_visibility(self, handle: str, visibility_sec: float) -> None:
        msg_id = handle.split(":", 1)[0]
        lease = os.path.join(self.queue_dir, "ready", f"{msg_id}.lease")
        with open(lease, "w") as f:
            f.write(str(time.time() + visibility_sec))

    def ack(self, handle: str) -> None:
        msg_id = handle.split(":", 1)[0]
        ready = os.path.join(self.queue_dir, "ready")
        for suffix in (".msg", ".lease"):
            p = os.path.join(ready, f"{msg_id}{suffix}")
            if os.path.exists(p):
                os.unlink(p)

    def size(self) -> int:
        return sum(1 for n in os.listdir(os.path.join(self.queue_dir, "ready"))
                   if n.endswith(".msg"))


@dataclass
class MqStats:
    received: int = 0
    indexed: int = 0
    acked_duplicates: int = 0
    skipped_in_progress: int = 0
    acquired_stale: int = 0
    num_docs: int = 0


def ingest_message_queue(queue, index_dir: str, config: IndexConfig, *,
                         token: Optional[str] = None,
                         max_messages: int = 10,
                         visibility_sec: float = 120.0,
                         stale_after_sec: float = 240.0,
                         poll_rounds: int = 1,
                         dedup_window_sec: Optional[float] = None,
                         fault_before_ack: bool = False) -> MqStats:
    """QueueCoordinator analog (coordinator.rs): drain ready messages,
    claim their shards, index each message as one split, commit the shard
    EOF transactionally with the publish, then ack.

    Flow per message (design.md "The QueueSharedState"):
      owner = open_shard(id, token)
      owner == token      -> index it
      shard completed     -> duplicate delivery: just ack
      shard stale         -> acquire + index (commit no-ops if we lose
                             the documented acquire race)
      else                -> in progress elsewhere: drop, let visibility
                             timeout redeliver

    ``fault_before_ack`` kills the coordinator after publish but BEFORE
    ack — the crash window that must NOT duplicate docs on redelivery.
    """
    from quickwit_ray.index.writer import SplitBuilder
    from quickwit_ray.sources.ingest import _docs_to_table, decode_input

    token = token or uuid.uuid4().hex
    manifest = Manifest(index_dir)
    if manifest.index_config_json is None:
        manifest.create(config.to_json())
    stats = MqStats()
    for _ in range(poll_rounds):
        for msg in queue.receive(max_messages, visibility_sec):
            stats.received += 1
            sid = msg.msg_id
            if manifest.is_shard_completed(sid):
                queue.ack(msg.handle)  # duplicate delivery of finished work
                stats.acked_duplicates += 1
                continue
            owner = manifest.open_shard(sid, token)
            if owner != token:
                info = manifest.shard_info(sid) or {}
                if time.time() - float(info.get("ts", 0)) < stale_after_sec:
                    stats.skipped_in_progress += 1
                    continue  # another live pipeline owns it
                manifest.acquire_shard(sid, token)
                stats.acquired_stale += 1
            # last visibility extension before the indexing work
            # (visibility.rs: give the commit 2x its timeout)
            queue.extend_visibility(msg.handle, 2 * visibility_sec)
            docs = decode_input(msg.payload, msg.input_format)
            table = _docs_to_table(docs, config.doc_mapping) if docs else None
            builder = SplitBuilder(config, index_dir, f"mq:{sid}", 0)
            if table is not None and table.num_rows:
                builder.add_batch(table)
            sm = builder.flush()
            # EOF checkpoint + split publish: ONE atomic manifest append
            manifest.publish([sm] if sm else [],
                             checkpoint_partition=f"mq:{sid}")
            stats.indexed += 1
            stats.num_docs += len(docs)
            if fault_before_ack:
                raise RuntimeError("injected fault between publish and ack")
            queue.ack(msg.handle)
    if dedup_window_sec is not None:
        manifest.prune_shards(dedup_window_sec)
    return stats
