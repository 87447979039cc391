"""Ingest-v2 WAL: persist->ack durability, torn-tail repair, exactly-once
indexing, truncate-after-publish GC (reference semantics:
quickwit-ingest/src/ingest_v2/ingester.rs + mrecordlog)."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from quickwit_ray.config import IndexConfig, IndexSettings, documents_doc_mapping
from quickwit_ray.search.engine import IndexSearcher
from quickwit_ray.sources.wal import IngestWal, RecordLog, index_wal
from quickwit_ray.state.manifest import Manifest

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _cfg():
    return IndexConfig("documents", documents_doc_mapping(),
                       IndexSettings(split_num_docs_target=10_000))


def _make_index(path: str) -> str:
    m = Manifest(path)
    m.create(_cfg().to_json())
    return path


def _doc_rows(n=500):
    t = pq.read_table(DOCS).slice(0, n)
    return [dict(zip(t.column_names, row))
            for row in zip(*(c.to_pylist() for c in t.columns))]


# -- RecordLog -------------------------------------------------------------

def test_recordlog_roundtrip_and_rotation(tmp_path):
    log = RecordLog(str(tmp_path / "l"), segment_bytes=64)
    payloads = [f"rec-{i}".encode() * (i + 1) for i in range(20)]
    for i, p in enumerate(payloads):
        assert log.append(p) == i
    log.sync()
    assert log.end_pos() == 20
    # rotation produced multiple segments (64-byte budget)
    assert len(glob.glob(str(tmp_path / "l" / "seg-*.log"))) > 1
    got = list(log.read_from(0))
    assert [p for _, p in got] == payloads
    assert [pos for pos, _ in got] == list(range(20))
    # ranged read
    assert [p for _, p in log.read_from(5, 9)] == payloads[5:9]
    # header-only size walk matches payload lengths
    sizes = dict(log.frame_sizes_from(3))
    assert sizes[7] == len(payloads[7])
    log.close()
    # reopen: positions continue
    log2 = RecordLog(str(tmp_path / "l"), segment_bytes=64)
    assert log2.end_pos() == 20
    assert log2.append(b"after-restart") == 20


def test_recordlog_torn_tail_repaired(tmp_path):
    log = RecordLog(str(tmp_path / "l"))
    for i in range(5):
        log.append(f"record-{i}".encode())
    log.close()
    path = glob.glob(str(tmp_path / "l" / "seg-*.log"))[0]
    # simulate a crash mid-append: chop the last frame in half
    size = os.path.getsize(path)
    with open(path, "r+b") as f:
        f.truncate(size - 4)
    # a READER (repair=False) sees only the intact frames and never
    # mutates the file — the torn tail stays on disk for the writer
    reader = RecordLog(str(tmp_path / "l"))
    assert reader.end_pos() == 4
    assert os.path.getsize(path) == size - 4  # untouched
    log2 = RecordLog(str(tmp_path / "l"), repair=True)
    assert log2.end_pos() == 4  # torn record dropped by writer repair
    assert os.path.getsize(path) < size - 4  # truncated to the last frame
    assert [p for _, p in log2.read_from(0)] == \
        [f"record-{i}".encode() for i in range(4)]
    # the position is reused for the next append (it was never acked)
    assert log2.append(b"replacement") == 4


def test_recordlog_truncate_upto(tmp_path):
    log = RecordLog(str(tmp_path / "l"), segment_bytes=32)
    for i in range(12):
        log.append(f"payload-{i:02d}".encode())
    log.sync()
    removed = log.truncate_upto(7)
    assert removed >= 1
    # records >= the first kept segment's start survive; none below are lost
    remaining = [pos for pos, _ in log.read_from(0)]
    assert remaining[-1] == 11 and min(remaining) <= 7
    # full truncation keeps position continuity via the marker
    log.truncate_upto(12)
    assert log.end_pos() == 12
    assert log.append(b"x") == 12
    log.close()
    assert RecordLog(str(tmp_path / "l")).end_pos() == 13


def test_truncate_keeps_live_segment_under_writer(tmp_path):
    """GC must never unlink the segment a live writer holds open: a batch
    fsync-acked between the consumer's scan and os.remove would land on
    an unlinked inode (round-3 ADVICE medium finding)."""
    d = str(tmp_path / "l")
    writer = RecordLog(d, segment_bytes=64, repair=True)
    for i in range(6):
        writer.append(f"payload-{i:02d}".encode())
    writer.sync()
    # a consumer scans and truncates everything it saw — while the
    # writer is still live
    consumer = RecordLog(d)
    consumer.truncate_upto(consumer.end_pos())
    # the writer's live segment survived; an ack after truncation is
    # durable and visible to the next consumer
    writer.append(b"acked-after-truncate")
    writer.sync()
    writer.close()
    got = dict(RecordLog(d).read_from(0))
    assert got[6] == b"acked-after-truncate"
    # once the writer is gone, the same truncation fully GCs
    log = RecordLog(d)
    log.truncate_upto(log.end_pos())
    assert glob.glob(os.path.join(d, "seg-*.log")) == []
    assert RecordLog(d).end_pos() == 7
    # two concurrent writers on one shard are refused
    w1 = RecordLog(d, repair=True)
    with pytest.raises(RuntimeError, match="another writer"):
        RecordLog(d, repair=True)
    w1.close()


# -- IngestWal + index_wal ---------------------------------------------------

def test_wal_persist_index_search(tmp_path):
    idx = _make_index(str(tmp_path / "idx"))
    wal = IngestWal(idx, num_shards=3)
    rows = _doc_rows(500)
    for i in range(0, 500, 40):  # 13 small acked batches
        shard, pos = wal.persist(rows[i:i + 40])
        assert 0 <= shard < 3 and pos >= 0
    wal.close()
    st = index_wal(idx, execution="local", max_batch_bytes=32 << 10)
    assert st.num_docs == 500
    s = IndexSearcher(idx)
    r = s.search("*", max_hits=600, fetch_fields=["doc_id"])
    assert sorted(r.hits["doc_id"]) == list(range(500))
    # published positions reached each shard's head; WAL segments GCed
    m = Manifest(idx)
    for p in range(3):
        assert m.source_offset(f"wal._ingest-api:{p}") > 0
    assert glob.glob(os.path.join(idx, "wal", "_ingest-api",
                                  "shard-*", "seg-*.log")) == []
    # re-consume after truncation: no new docs, no new splits
    before = sorted(x.split_id for x in m.published_splits())
    st2 = index_wal(idx, execution="local")
    assert st2.num_docs == 0
    assert sorted(x.split_id for x in Manifest(idx).published_splits()) == before


def test_wal_replay_after_crash_exactly_once(tmp_path):
    """Acked batches survive a 'crash' (fresh IngestWal), and a consumer
    killed mid-wave resumes without loss or duplication."""
    idx = _make_index(str(tmp_path / "idx"))
    rows = _doc_rows(500)
    wal = IngestWal(idx, num_shards=2)
    for i in range(0, 300, 30):
        wal.persist(rows[i:i + 30])
    del wal  # crash: acked records must be durable (fsynced)
    # restart the ingester, keep pushing
    wal2 = IngestWal(idx, num_shards=2)
    for i in range(300, 500, 30):
        wal2.persist(rows[i:i + 30])
    wal2.close()
    # consumer killed after the first commit wave
    with pytest.raises(RuntimeError, match="injected fault"):
        index_wal(idx, execution="local", max_batch_bytes=4 << 10,
                  max_batches_per_wave=2, fault_after_commits=1)
    partial = sum(s.num_docs for s in Manifest(idx).published_splits())
    assert 0 < partial < 500
    # resume drains the rest exactly once
    while True:
        st = index_wal(idx, execution="local", max_batch_bytes=4 << 10)
        if st.num_docs == 0:
            break
    s = IndexSearcher(idx)
    r = s.search("*", max_hits=600, fetch_fields=["doc_id"])
    assert sorted(r.hits["doc_id"]) == list(range(500))


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=40),
       st.integers(16, 256), st.integers(0, 40), st.integers(0, 2))
@settings(max_examples=40, deadline=None)
def test_recordlog_roundtrip_property(tmp_path_factory, payloads,
                                      segment_bytes, trunc_at, reopens):
    """Property: for any payload sizes, rotation budget, truncation point
    and reopen count — positions are dense ordinals, every surviving
    record reads back byte-identical, and end_pos never regresses."""
    d = str(tmp_path_factory.mktemp("rlprop"))
    log = RecordLog(d, segment_bytes=segment_bytes)
    for i, p in enumerate(payloads):
        assert log.append(p) == i
    log.sync()
    for _ in range(reopens):
        log.close()
        log = RecordLog(d, segment_bytes=segment_bytes)
    assert log.end_pos() == len(payloads)
    trunc = min(trunc_at, len(payloads))
    log.truncate_upto(trunc)
    got = dict(log.read_from(0))
    # whole-segment truncation may keep records below trunc, but never
    # loses one at-or-after it, and never fabricates or corrupts
    for pos, payload in got.items():
        assert payload == payloads[pos]
    for pos in range(trunc, len(payloads)):
        assert got[pos] == payloads[pos]
    assert log.end_pos() == len(payloads)
    assert log.append(b"next") == len(payloads)
    log.close()


def test_wal_ray_execution_matches_batch(tmp_path, ray_session):
    from quickwit_ray.index.build import build_index

    idx = _make_index(str(tmp_path / "idx"))
    wal = IngestWal(idx, num_shards=2)
    rows = _doc_rows(400)
    for i in range(0, 400, 100):
        wal.persist(rows[i:i + 100])
    wal.close()
    index_wal(idx, execution="ray", max_batch_bytes=64 << 10)
    batch_dir = str(tmp_path / "batch")
    build_index(DOCS, batch_dir, _cfg(), execution="local")
    s_wal, s_batch = IndexSearcher(idx), IndexSearcher(batch_dir)
    for q in ("text:scan", "lang: IN [de fr]"):
        a = s_wal.search(q, max_hits=600, fetch_fields=["doc_id"])
        b = s_batch.search(q, max_hits=600, fetch_fields=["doc_id"])
        got = sorted(a.hits["doc_id"])
        want = sorted(d for d in b.hits["doc_id"] if d < 400)
        assert got == want


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(1, 4), st.lists(st.integers(1, 60), min_size=1,
                                   max_size=8),
       st.integers(1, 3), st.integers(1, 4))
@settings(max_examples=15, deadline=None)
def test_wal_random_kill_points_exactly_once(tmp_path_factory, shards,
                                             batch_sizes, kill_after,
                                             max_per_wave):
    """Property: for any shard count, batch layout and consumer kill
    point, resume indexes every acked doc exactly once."""
    d = str(tmp_path_factory.mktemp("walprop"))
    _make_index(d)
    wal = IngestWal(d, num_shards=shards)
    rows, next_id = [], 0
    for n in batch_sizes:
        batch = [{"doc_id": next_id + j, "text": f"tok{(next_id + j) % 7}",
                  "lang": "en", "source": "w", "n_chars": 5}
                 for j in range(n)]
        rows.extend(batch)
        wal.persist(batch)
        next_id += n
    wal.close()
    try:
        index_wal(d, execution="local", max_batch_bytes=2 << 10,
                  max_batches_per_wave=max_per_wave,
                  fault_after_commits=kill_after)
    except RuntimeError:
        pass  # injected kill (may also finish before the fault point)
    while index_wal(d, execution="local", max_batch_bytes=2 << 10).num_docs:
        pass
    from quickwit_ray.search.engine import IndexSearcher

    r = IndexSearcher(d).search("*", max_hits=10_000,
                                fetch_fields=["doc_id"])
    assert sorted(r.hits["doc_id"]) == list(range(len(rows)))


def test_wal_relocated_shard_root(tmp_path):
    """WAL shards living OUTSIDE the index dir (shared storage / ingester
    node disk) persist, drain and truncate through the same path."""
    idx = _make_index(str(tmp_path / "idx"))
    root = str(tmp_path / "shared-wal")
    wal = IngestWal(idx, num_shards=2, wal_root=root)
    rows = _doc_rows(120)
    for i in range(0, 120, 40):
        wal.persist(rows[i:i + 40])
    wal.close()
    # shards live under the relocated root, not the index dir
    assert glob.glob(os.path.join(root, "_ingest-api", "shard-*")) != []
    assert not os.path.exists(os.path.join(idx, "wal"))
    st = index_wal(idx, execution="local", wal_root=root)
    assert st.num_docs == 120
    s = IndexSearcher(idx)
    assert s.search("*", max_hits=0).num_hits == 120
    # truncation GC'd the relocated segments
    assert glob.glob(os.path.join(root, "_ingest-api", "shard-*",
                                  "seg-*.log")) == []


def test_wal_rf2_replication_failover(tmp_path):
    """RF-2 ingestion (reference ingest_v2/replication.rs semantics): an
    ack means BOTH the leader and follower WALs hold the batch; losing
    the leader loses nothing — the replica drains exactly-once through
    the same checkpoints (positions agree by construction)."""
    import shutil

    idx = _make_index(str(tmp_path / "idx"))
    replica = str(tmp_path / "follower-disk")
    rows = _doc_rows(300)
    wal = IngestWal(idx, num_shards=2, replica_root=replica)
    for i in range(0, 180, 30):
        wal.persist(rows[i:i + 30])
    # partial drain from the PRIMARY (some batches already indexed)
    st = index_wal(idx, execution="local", truncate=False)
    assert st.num_docs == 180
    for i in range(180, 300, 30):
        wal.persist(rows[i:i + 30])
    wal.close()
    # leader dies: primary WAL gone entirely
    shutil.rmtree(os.path.join(idx, "wal"))
    # failover: drain the follower root — already-indexed positions are
    # skipped by the shared checkpoint, the rest index exactly once
    st2 = index_wal(idx, execution="local", wal_root=replica)
    assert st2.num_docs == 120
    s = IndexSearcher(idx)
    r = s.search("*", max_hits=400, fetch_fields=["doc_id"])
    assert sorted(r.hits["doc_id"]) == list(range(300))
    # acked-but-never-indexed data was durable on the replica
    assert glob.glob(os.path.join(replica, "_ingest-api", "shard-*",
                                  "seg-*.log")) == []  # GC'd after publish


def test_wal_rf2_follower_catchup_and_ahead_guard(tmp_path):
    idx = _make_index(str(tmp_path / "idx"))
    replica = str(tmp_path / "rep")
    rows = _doc_rows(60)
    # RF-1 first: follower attaches later and must catch up (initial sync)
    w1 = IngestWal(idx, num_shards=1)
    w1.persist(rows[:30])
    w1.close()
    w2 = IngestWal(idx, num_shards=1, replica_root=replica)
    w2.persist(rows[30:60])
    w2.close()
    from quickwit_ray.sources.wal import RecordLog, _shard_dir
    rl = RecordLog(_shard_dir(idx, "_ingest-api", 0, replica))
    assert rl.end_pos() == 2  # both batches, including the pre-attach one
    # a follower AHEAD of the leader = leader lost acked data: refuse
    import shutil
    shutil.rmtree(os.path.join(idx, "wal"))
    with pytest.raises(RuntimeError, match="ahead of the leader"):
        IngestWal(idx, num_shards=1, replica_root=replica)
