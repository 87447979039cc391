"""Object-store (pyarrow.fs) split storage — quickwit's compute/storage
separation (round-4 VERDICT top item).

The suite runs the engine's build/merge/search/resume flows over
``mock-s3://`` — a pyarrow.fs filesystem with object-store SEMANTICS
(whole-object atomic PUT, no rename, no append, no hardlinks, prefix
listing) backed by a local dir — so green tests PROVE the artifact path
never relies on POSIX rename/link/append. Reference:
quickwit-storage/src/object_storage/s3_compatible_storage.rs, uploader
semantics actors/uploader.rs:465-506.
"""

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quickwit_ray import storage
from quickwit_ray.api import Index
from quickwit_ray.config import DocMapping, FieldMapping, IndexSettings
from quickwit_ray.state.manifest import Manifest, SplitMetadata


def _bucket(tag: str) -> str:
    return f"mock-s3://{tag}-{uuid.uuid4().hex[:10]}/indexes/docs"


def _mapping() -> DocMapping:
    return DocMapping(
        field_mappings=(
            FieldMapping(name="body", type="text", record="position",
                         fieldnorms=True, stored=True),
            FieldMapping(name="lang", type="text", tokenizer="raw",
                         stored=True, fast=True),
            FieldMapping(name="doc_id", type="i64", stored=True, fast=True)),
        doc_id_field="doc_id", default_search_fields=("body",))


def _docs(lo: int, hi: int) -> list[dict]:
    rows = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text", "lang"]).to_pylist()
    return [{"body": r["text"], "lang": r["lang"], "doc_id": r["doc_id"]}
            for r in rows[lo:hi]]


@pytest.fixture
def obj_root():
    root = _bucket("t")
    yield root
    storage.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Semantics of the mock itself
# ---------------------------------------------------------------------------

def test_mock_s3_enforces_object_store_semantics(obj_root):
    p = storage.join(obj_root, "a/b.bin")
    storage.write_bytes(p, b"payload")
    assert storage.read_bytes(p) == b"payload"
    assert storage.file_size(p) == 7
    fs, fp = storage.get_fs(p)
    with pytest.raises(NotImplementedError, match="rename"):
        fs.move(fp, fp + ".x")
    with pytest.raises(NotImplementedError, match="append"):
        fs.open_append_stream(fp)
    # whole-object PUT is atomic: an in-flight write is invisible
    q = storage.join(obj_root, "a/c.bin")
    fs2, qp = storage.get_fs(q)
    stream = fs2.open_output_stream(qp)
    stream.write(b"half")
    assert not storage.exists(q)      # not visible until close
    stream.close()
    assert storage.read_bytes(q) == b"half"


def test_local_paths_keep_plain_os_fast_path(tmp_path):
    p = str(tmp_path / "x.bin")
    assert not storage.is_object_uri(p)
    storage.write_bytes(p, b"z")
    assert open(p, "rb").read() == b"z"
    assert storage.join(str(tmp_path), "a", "b") == os.path.join(
        str(tmp_path), "a", "b")


# ---------------------------------------------------------------------------
# Manifest object backend (snapshot-per-op whole-object PUT)
# ---------------------------------------------------------------------------

def test_object_manifest_backend_roundtrip(obj_root):
    m = Manifest(obj_root)
    assert m._backend == "object"
    m.create({"index_id": "docs"})
    m.publish([SplitMetadata("s1", "docs", 10, 100)],
              checkpoint_partition="p0")
    # fresh reader sees everything (read-your-writes across processes)
    m2 = Manifest(obj_root)
    assert [s.split_id for s in m2.published_splits()] == ["s1"]
    assert m2.is_partition_committed("p0")
    # duplicate publish = no-op (exactly-once)
    m2.publish([SplitMetadata("s2", "docs", 5, 50)],
               checkpoint_partition="p0")
    assert len(Manifest(obj_root).published_splits()) == 1
    # streaming offsets + delete tasks persist through PUTs too
    m2.publish_stream({"q:0": ([SplitMetadata("s3", "docs", 1, 10)], 0, 7)})
    assert Manifest(obj_root).source_offset("q:0") == 7
    with pytest.raises(ValueError, match="not contiguous"):
        m2.publish_stream({"q:0": ([], 9, 12)})


def test_sqlite_backend_rejected_on_object_root(obj_root):
    with pytest.raises(ValueError, match="sqlite"):
        Index.create(obj_root, "docs", _mapping(), metastore="sqlite")


# ---------------------------------------------------------------------------
# Build -> search -> merge -> GC, all artifacts on the object store
# ---------------------------------------------------------------------------

def test_ingest_search_merge_gc_on_object_store(obj_root, tmp_path):
    idx = Index.create(obj_root, "docs", _mapping(),
                       IndexSettings(split_num_docs_target=1_000_000))
    for k in range(0, 500, 25):          # 20 splits -> triggers a merge
        idx.ingest_docs(_docs(k, k + 25), commit_id=f"c{k}")
    pre = idx.search('body:"the"', max_hits=10)
    assert pre.num_hits > 0

    # identical run on local disk: the object path must not change ANY
    # search/merge result
    local = Index.create(str(tmp_path / "idx"), "docs", _mapping(),
                         IndexSettings(split_num_docs_target=1_000_000))
    for k in range(0, 500, 25):
        local.ingest_docs(_docs(k, k + 25), commit_id=f"c{k}")
    lpre = local.search('body:"the"', max_hits=10)
    assert pre.num_hits == lpre.num_hits
    assert list(pre.hits["doc_id"]) == list(lpre.hits["doc_id"])

    assert idx.merge(execution="local") >= 1
    assert local.merge(execution="local") >= 1
    post = Index.open(obj_root).search('body:"the"', max_hits=10)
    lpost = Index.open(str(tmp_path / "idx")).search('body:"the"',
                                                     max_hits=10)
    assert post.num_hits == lpost.num_hits == pre.num_hits
    assert list(post.hits["doc_id"]) == list(lpost.hits["doc_id"])

    # GC drops the merged-away source dirs from the object store
    from quickwit_ray.index.build import garbage_collect

    removed = garbage_collect(obj_root)
    assert removed
    final = Index.open(obj_root).search('body:"the"', max_hits=10)
    assert final.num_hits == pre.num_hits
    live = {s.split_id
            for s in Manifest(obj_root).published_splits()}
    on_store = set(storage.listdir(storage.join(obj_root, "splits")))
    assert live <= on_store and not (on_store - live)


def test_exactly_once_resume_on_object_store(obj_root):
    idx = Index.create(obj_root, "docs", _mapping())
    n1 = idx.ingest_docs(_docs(0, 100), commit_id="wave-1")
    assert n1 == 100
    # replay of the same commit id is a no-op: checkpoints live in the
    # object manifest
    n2 = Index.open(obj_root).ingest_docs(_docs(0, 100), commit_id="wave-1")
    assert n2 == 0
    assert Index.open(obj_root).describe()["num_published_splits"] == 1

    # a torn upload (files present, manifest not updated) stays INVISIBLE
    orphan = storage.join(obj_root, "splits", "orphan-split")
    storage.write_bytes(storage.join(orphan, "footer.json"),
                        json.dumps({"num_docs": 7}).encode())
    assert Index.open(obj_root).describe()["num_published_splits"] == 1
    from quickwit_ray.index.build import garbage_collect

    assert "orphan-split" in garbage_collect(obj_root)


def test_delete_then_search_on_object_store(obj_root):
    idx = Index.create(obj_root, "docs", _mapping())
    idx.ingest_docs(_docs(0, 120), commit_id="c0")
    before = idx.search("lang:de", max_hits=0).num_hits
    assert before > 0
    idx.create_delete_task("lang:de")
    assert idx.apply_deletes() >= 1
    idx2 = Index.open(obj_root)
    assert idx2.search("lang:de", max_hits=0).num_hits == 0
    assert idx2.search('body:"the"', max_hits=0).num_hits > 0


def test_read_amplification_per_query(obj_root):
    """BASELINE read-amplification probe: a cold top-10 BM25 query opens
    footer + postings metadata + the touched row groups only — bound the
    GET count so a regression to whole-file reads is caught."""
    idx = Index.create(obj_root, "docs", _mapping(),
                       IndexSettings(split_num_docs_target=1_000_000))
    idx.ingest_docs(_docs(0, 500), commit_id="c0")
    h = storage.mock_s3_handler(obj_root)
    from quickwit_ray.search.engine import IndexSearcher

    searcher = IndexSearcher(obj_root)
    g0 = h.get_count
    r = searcher.search('body:"the"', max_hits=10)
    cold = h.get_count - g0
    assert r.num_hits > 0
    # footer GET + parquet footer/metadata reads + dictionary row groups
    # + posting row groups + fieldnorms + fetch-doc row groups; whole-
    # file scans would be hundreds of GETs on this layout
    assert cold < 120, cold
    g1 = h.get_count
    searcher.search('body:"the"', max_hits=10)
    warm = h.get_count - g1
    assert warm <= max(4, cold // 4), (cold, warm)


def test_object_manifest_concurrent_writer_threads_lose_nothing():
    """Round-5 review fix: the object backend's snapshot-per-op PUT is a
    read-modify-write — two same-process writer threads (serve: ingest
    handlers + the janitor) interleaving load->PUT used to lose updates.
    `_append` now reloads + folds the op under a per-root lock: every op
    from both threads must survive."""
    import threading

    root = _bucket("concurrent")
    m0 = Manifest(root)
    m0.create(json.dumps({"index_id": "docs", "version": "0.8"}))

    N = 25
    errs: list = []

    def publisher():
        try:
            for i in range(N):
                Manifest(root).publish(
                    [SplitMetadata(f"pub-{i}", "docs", 1, 10)],
                    checkpoint_partition=f"p{i}")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def deleter():
        try:
            for i in range(N):
                Manifest(root).create_delete_task(f"body:junk{i}")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=publisher), threading.Thread(target=deleter)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs[0]
    final = Manifest(root)
    assert len(final.published_splits()) == N
    assert len(final.delete_tasks) == N
    assert len(final.checkpoints) == N


def test_object_manifest_concurrent_value_derivation_races():
    """Round-5 review fixes: state-DERIVED op values must be computed
    under the write lock — two concurrent delete-task creators must get
    DISTINCT opstamps (both queries stored), and two concurrent shard
    claimants must agree on ONE owner (the loser gets the winner's
    token back, not its own)."""
    import threading

    root = _bucket("rmw")
    Manifest(root).create({"index_id": "docs", "version": "0.8"})

    N = 12
    stamps: list[int] = []
    owners: dict[str, str] = {}
    errs: list = []

    def deleter(tag: str):
        try:
            for i in range(N):
                stamps.append(
                    Manifest(root).create_delete_task(f"body:{tag}{i}"))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def claimant(tok: str):
        try:
            for i in range(N):
                owners[f"{tok}-{i}"] = \
                    Manifest(root).open_shard(f"shard-{i}", tok)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=deleter, args=("a",)),
          threading.Thread(target=deleter, args=("b",)),
          threading.Thread(target=claimant, args=("tokA",)),
          threading.Thread(target=claimant, args=("tokB",))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs[0]
    # every creator got a unique opstamp and every query survived
    assert len(set(stamps)) == 2 * N
    final = Manifest(root)
    assert len(final.delete_tasks) == 2 * N
    # both claimants of shard-i returned the SAME owning token, and it
    # matches the committed owner
    for i in range(N):
        a, b = owners[f"tokA-{i}"], owners[f"tokB-{i}"]
        assert a == b == final.shards[f"shard-{i}"]["token"]


def test_object_gc_grace_protects_unpublished_upload():
    """Round-5 review fix: S3 directory prefixes carry no mtime (the
    mock now mirrors that), so GC must age an uploaded-but-not-yet-
    published split dir by its newest contained OBJECT — before the fix
    it looked infinitely old and was reaped in the upload->publish
    window."""
    from quickwit_ray.index.build import garbage_collect

    root = _bucket("gcage")
    idx = Index.create(root, "docs", _mapping(),
                       settings=IndexSettings(split_num_docs_target=10_000))
    idx.ingest_docs(_docs(0, 30), commit_id="a")
    # simulate the upload->publish window: copy a published split's
    # artifacts under an unpublished id (finalize_dir output, no
    # manifest row yet)
    sid = Manifest(root).published_splits()[0].split_id
    src = storage.join(root, "splits", sid)
    dst = storage.join(root, "splits", "in-flight-upload")
    for f in storage.listdir(src):
        storage.write_bytes(storage.join(dst, f),
                            storage.read_bytes(storage.join(src, f)))
    # graced GC must NOT reap the fresh in-flight dir
    assert garbage_collect(root, grace_period_secs=3600) == []
    assert storage.isdir(dst)
    # grace 0: reaped (it is genuinely unreferenced)
    assert "in-flight-upload" in garbage_collect(root,
                                                 grace_period_secs=0.0)
