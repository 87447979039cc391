"""Cross-process root/leaf serving smoke (VERDICT r4 #5): a BUILDER
process publishes splits while a SEPARATE serve process (spawned
``python -m quickwit_ray.cli serve``) answers ``{index}/search`` over
the same index dir — read-your-writes through the stamped manifest, no
restart, no shared memory. This is the two-process shape quickwit runs
in production (indexer node + searcher node over shared storage)."""

import json
import os
import subprocess
import sys
import time
import urllib.request

import pytest

from quickwit_ray.api import Index
from quickwit_ray.config import IndexSettings, documents_doc_mapping

DOCS_ROWS = [
    {"doc_id": i, "text": f"cross process doc {i} probe", "lang": "en",
     "source": "w", "n_chars": 30}
    for i in range(40)
]


def _get_json(url: str) -> dict:
    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.loads(resp.read())


@pytest.fixture()
def serve_proc(tmp_path):
    """Builder creates + seeds the index in THIS process, then a fresh
    python process serves it (search-execution local: the serve process
    owns no Ray session — pure shared-storage coupling)."""
    idx = Index.create(str(tmp_path / "xp"), "xp", documents_doc_mapping(),
                       settings=IndexSettings(split_num_docs_target=10_000))
    idx.ingest_docs(DOCS_ROWS[:25], commit_id="c1")

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = repo_root + (os.pathsep + os.environ["PYTHONPATH"]
                          if os.environ.get("PYTHONPATH") else "")
    env = dict(os.environ, PYTHONPATH=pypath)
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "quickwit_ray.cli", "serve",
         idx.index_dir, "--port", "0", "--search-execution", "local"],
        cwd=repo_root, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    port = None
    deadline = time.time() + 30
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        if "serving" in line and "http://" in line:
            port = int(line.split("http://127.0.0.1:")[1].split("/")[0])
            break
    if port is None:
        proc.kill()
        pytest.fail("serve process never announced its port")
    try:
        yield idx, port
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_builder_publishes_searcher_reads_its_writes(serve_proc):
    idx, port = serve_proc
    base = f"http://127.0.0.1:{port}/api/v1/xp/search"
    assert _get_json(f"{base}?query=probe&max_hits=0")["num_hits"] == 25

    # the BUILDER process publishes more splits; the serve process must
    # observe them on its next manifest resolve — no restart, no signal
    idx.ingest_docs(DOCS_ROWS[25:], commit_id="c2")
    deadline = time.time() + 15
    hits = None
    while time.time() < deadline:
        hits = _get_json(f"{base}?query=probe&max_hits=0")["num_hits"]
        if hits == 40:
            break
        time.sleep(0.1)
    assert hits == 40

    # delete-then-read-your-deletes through the same wire
    idx.create_delete_task("text:probe AND doc_id:[0 TO 9]")
    idx.apply_deletes()
    deadline = time.time() + 15
    while time.time() < deadline:
        hits = _get_json(f"{base}?query=probe&max_hits=0")["num_hits"]
        if hits == 30:
            break
        time.sleep(0.1)
    assert hits == 30

    # the ES-compatible surface of the serve process sees the same state
    es = _get_json(f"http://127.0.0.1:{port}/api/v1/_elastic/xp/_search"
                   "?q=text:probe&size=0")
    assert es["hits"]["total"]["value"] == 30
