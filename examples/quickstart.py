"""quickwit_ray end-to-end tour — run with `python examples/quickstart.py`.

Walks the full user surface on the bundled test corpus: index creation,
batch + push + WAL ingestion, declarative sources, query language + ES
DSL + aggregations, merges/deletes/retention, and the HTTP serving tier
(ES API, native API, OTLP ingest, Jaeger queries). Everything runs
single-node; the same code fans out on a Ray cluster.
"""

import json
import os
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import ray  # noqa: E402

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")

from quickwit_ray import Index, IndexSettings  # noqa: E402
from quickwit_ray.config import documents_doc_mapping  # noqa: E402

DOCS = os.environ.get("QW_QUICKSTART_DOCS",
                      "/root/testdata/sf0.001/documents.parquet")
if not os.path.exists(DOCS):
    raise SystemExit(f"corpus not found: {DOCS} — point QW_QUICKSTART_DOCS "
                     "at any parquet with (doc_id, text, lang, source, "
                     "n_chars) columns")
work = tempfile.mkdtemp(prefix="qw_quickstart_")

# -- create + batch ingest (Ray fan-out: one task per parquet partition) --
idx = Index.create(f"{work}/docs", "docs", documents_doc_mapping(),
                   settings=IndexSettings(split_num_docs_target=100_000))
stats = idx.ingest(DOCS)
print(f"built {stats.num_splits} split(s), {stats.num_docs} docs "
      f"({stats.docs_per_sec:,.0f} docs/s)")

# -- query language + sort + aggs ----------------------------------------
r = idx.search('text:scan AND lang:en', max_hits=3, sort_by="_score",
               fetch_fields=["doc_id", "lang"])
print("query-language hits:", r.num_hits, list(r.hits["doc_id"][:3]))

r = idx.search("*", max_hits=0, aggs={
    "by_lang": {"terms": {"field": "lang"},
                "aggs": {"avg_len": {"avg": {"field": "n_chars"}}}}})
print("top langs:", [(b["key"], b["doc_count"])
                     for b in r.aggs["by_lang"]["buckets"]][:3])

# -- ES DSL ---------------------------------------------------------------
es = idx.es_search({"query": {"bool": {
    "must": [{"match": {"text": "merge"}}],
    "filter": [{"term": {"lang": "de"}}]}}, "size": 2})
print("ES DSL hits:", es.num_hits)

# -- push ingestion: _bulk workbench and the durable ingest-v2 WAL ---------
with idx.open_ingest_workbench(commit_docs_threshold=500) as wb:
    wb.bulk(b'{"create": {}}\n'
            b'{"doc_id": 9001, "text": "pushed via bulk", "lang": "en",'
            b' "source": "api", "n_chars": 15}\n')
wal = idx.open_wal(num_shards=2)
wal.persist([{"doc_id": 9002, "text": "durably acked before indexing",
              "lang": "en", "source": "wal", "n_chars": 29}])
wal.close()
idx.index_wal(execution="local")  # drain + truncate, exactly-once
print("after pushes:", idx.search("*", max_hits=0).num_hits, "docs")

# -- declarative sources ----------------------------------------------------
idx.add_source({"source_id": "drop-dir", "source_type": "file",
                "params": {"filepath": DOCS}})
print("sources:", [s["source_id"] for s in idx.list_sources()])

# -- maintenance: merge, delete query, retention ----------------------------
idx.merge()
idx.create_delete_task("text:pushed")
idx.apply_deletes()
print("after delete task:", idx.search("*", max_hits=0).num_hits, "docs")

# -- HTTP serving tier -------------------------------------------------------
from quickwit_ray.server import SearchServer  # noqa: E402

with SearchServer({"docs": idx}, index_root_dir=f"{work}/root") as srv:
    base = f"http://127.0.0.1:{srv.port}/api/v1"
    with urllib.request.urlopen(
            f"{base}/_elastic/docs/_search?q=text:scan&size=1") as resp:
        print("HTTP ES search total:",
              json.loads(resp.read())["hits"]["total"]["value"])
    with urllib.request.urlopen(f"{base}/docs/search-plan?query=lang:fr") as resp:
        plan = json.loads(resp.read())
        print("search-plan:", plan["num_splits_after_pruning"], "of",
              plan["num_splits_total"], "splits")
    with urllib.request.urlopen(f"{base}/metrics") as resp:
        print("metrics lines:", len(resp.read().splitlines()))

ray.shutdown()
print("done —", work)
