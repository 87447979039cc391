"""Native REST API: index + source management and native search
(reference quickwit-serve/src/index_api/rest_handler.rs and
search_api/rest_handler.rs), served over HTTP and exercised offline."""

import json
import urllib.request

import pyarrow.parquet as pq
import pytest

from quickwit_ray.api import Index
from quickwit_ray.config import IndexSettings, documents_doc_mapping
from quickwit_ray.index_api import IndexApiService
from quickwit_ray.server import SearchServer

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _mk(tmp_path, name="docs"):
    idx = Index.create(str(tmp_path / name), name, documents_doc_mapping(),
                       settings=IndexSettings(split_num_docs_target=10_000))
    idx.ingest_docs(pq.read_table(DOCS).slice(0, 100).to_pylist(),
                    commit_id="seed")
    return idx


# -- offline service ---------------------------------------------------------

def test_index_lifecycle_via_service(tmp_path):
    svc = IndexApiService({}, index_root_dir=str(tmp_path / "root"))
    payload = {
        "version": "0.8", "index_id": "logs",
        "doc_mapping": {"field_mappings": [
            {"name": "msg", "type": "text"},
            {"name": "level", "type": "text", "tokenizer": "raw",
             "fast": True},
        ], "mode": "dynamic"},
    }
    st, meta = svc.request("POST", "indexes", body=payload)
    assert st == 200 and meta["index_config"]["index_id"] == "logs"
    # duplicate create rejected
    st, _ = svc.request("POST", "indexes", body=payload)
    assert st == 400
    # listed + readable
    st, lst = svc.request("GET", "indexes")
    assert st == 200 and len(lst) == 1
    st, got = svc.request("GET", "indexes/logs")
    assert st == 200 and got["index_config"]["index_id"] == "logs"
    # update via PUT (add a field)
    payload["doc_mapping"]["field_mappings"].append(
        {"name": "svc", "type": "text", "tokenizer": "raw"})
    st, upd = svc.request("PUT", "indexes/logs", body=payload)
    assert st == 200
    names = [f["name"] for f in
             upd["index_config"]["doc_mapping"]["field_mappings"]]
    assert "svc" in names
    # ingest + native search
    svc.indexes["logs"].ingest_docs(
        [{"msg": "boot ok", "level": "info"},
         {"msg": "disk failing", "level": "error"}], commit_id="x")
    st, resp = svc.request("GET", "logs/search",
                           params={"query": "level:error"})
    assert st == 200 and resp["num_hits"] == 1
    assert resp["hits"][0]["msg"] == "disk failing"
    # clear keeps config, drops docs
    st, _ = svc.request("PUT", "indexes/logs/clear")
    assert st == 200
    st, resp = svc.request("GET", "logs/search", params={"query": "*"})
    assert resp["num_hits"] == 0
    # delete removes registry + artifacts
    st, _ = svc.request("DELETE", "indexes/logs")
    assert st == 200
    st, _ = svc.request("GET", "indexes/logs")
    assert st == 404


def test_index_id_traversal_rejected(tmp_path):
    """A traversal-shaped index_id must neither create outside the root
    nor delete the root's parent (quickwit-config validate_identifier;
    round-3 ADVICE high finding)."""
    root = tmp_path / "victim" / "root"
    root.mkdir(parents=True)
    (tmp_path / "victim" / "precious.txt").write_text("keep me")
    svc = IndexApiService({}, index_root_dir=str(root))
    for bad in ("..", "../evil", "a/../../evil", "/abs", ".hidden", ""):
        st, err = svc.request("POST", "indexes", body={
            "version": "0.8", "index_id": bad, "doc_mapping": {}})
        assert st == 400, (bad, err)
    assert (tmp_path / "victim" / "precious.txt").exists()
    assert not (tmp_path / "victim" / "manifest.json").exists()
    # a registration pointing at a non-index dir must never be rmtree'd
    class FakeIdx:
        index_dir = str(tmp_path / "victim")
    svc.indexes[".."] = FakeIdx()
    st, _ = svc.request("DELETE", "indexes/..")
    assert st == 500
    assert (tmp_path / "victim" / "precious.txt").exists()
    # validate_identifier accepts normal ids (incl. 1-char dev names)
    from quickwit_ray.config import validate_identifier
    for ok in ("x", "otel-logs-v0_9", "a.b-c_d"):
        validate_identifier("index", ok)


def test_native_search_params(tmp_path):
    idx = _mk(tmp_path)
    svc = IndexApiService({"docs": idx})
    st, r = svc.request("GET", "docs/search", params={
        "query": "*", "max_hits": "5", "sort_by": "-n_chars"})
    assert st == 200 and len(r["hits"]) == 5 and r["num_hits"] == 100
    lens = [h["n_chars"] for h in r["hits"]]
    assert lens == sorted(lens, reverse=True)
    st2, r2 = svc.request("GET", "docs/search", params={
        "query": "*", "max_hits": "5", "start_offset": "5",
        "sort_by": "-n_chars"})
    assert max(h["n_chars"] for h in r2["hits"]) <= min(lens)


# -- sources ------------------------------------------------------------------

def test_source_crud_and_reset_checkpoint(tmp_path):
    from quickwit_ray.sources.queue import PartitionedQueue
    import pyarrow as pa

    idx = _mk(tmp_path, "src")
    qdir = str(tmp_path / "q")
    q = PartitionedQueue.create(qdir, 2)
    tbl = pq.read_table(DOCS).slice(100, 80)
    q.append(0, tbl.slice(0, 40))
    q.append(1, tbl.slice(40, 40))
    cfg = idx.add_source({"source_id": "broker-a", "source_type": "queue",
                          "params": {"queue_dir": qdir}})
    assert cfg["enabled"] is True
    # duplicates / reserved / unknown types rejected
    with pytest.raises(ValueError):
        idx.add_source({"source_id": "broker-a", "source_type": "queue"})
    with pytest.raises(ValueError):
        idx.add_source({"source_id": "_ingest-api", "source_type": "queue"})
    with pytest.raises(ValueError):
        idx.add_source({"source_id": "x", "source_type": "carrier-pigeon"})
    # drain the backlog through the configured source
    st = idx.ingest_source("broker-a", execution="local")
    assert st.num_docs == 80
    assert idx.search("*", max_hits=500).num_hits == 180
    # checkpoints live under the source-scoped prefix; re-poll no-ops
    assert idx.ingest_source("broker-a", execution="local").num_docs == 0
    # disabled source does not run
    idx.toggle_source("broker-a", False)
    assert idx.ingest_source("broker-a", execution="local") is None
    idx.toggle_source("broker-a", True)
    # reset-checkpoint -> the backlog replays (duplicate docs expected:
    # the reference semantics re-read the source from the beginning)
    n = idx.reset_source_checkpoint("broker-a")
    assert n == 2
    assert idx.ingest_source("broker-a", execution="local").num_docs == 80
    # delete
    idx.delete_source("broker-a")
    assert idx.list_sources() == []
    with pytest.raises(KeyError):
        idx.ingest_source("broker-a")


def test_source_config_survives_reopen_and_clear(tmp_path):
    idx = _mk(tmp_path, "persist")
    idx.add_source({"source_id": "s1", "source_type": "file",
                    "params": {"filepath": DOCS}})
    idx.clear()
    got = Index.open(idx.index_dir).list_sources()
    assert [s["source_id"] for s in got] == ["s1"]


def test_file_source_ingest(tmp_path):
    idx = Index.create(str(tmp_path / "f"), "f", documents_doc_mapping(),
                       settings=IndexSettings(split_num_docs_target=10_000))
    idx.add_source({"source_id": "drop-dir", "source_type": "file",
                    "params": {"filepath": DOCS}})
    idx.ingest_source("drop-dir", execution="local")
    assert idx.search("*", max_hits=0).num_hits == 500


def test_search_stream_endpoint(tmp_path, ray_session):
    import struct

    idx = _mk(tmp_path, "stream")
    svc = IndexApiService({"stream": idx})
    st, raw = svc.request("GET", "stream/search/stream", params={
        "query": "text:scan", "fast_field": "doc_id"})
    assert st == 200 and raw.content_type == "text/csv"
    got = sorted(int(x) for x in raw.data.decode().split())
    want = sorted(idx.search("text:scan", max_hits=1000,
                             fetch_fields=["doc_id"]).hits["doc_id"])
    assert got == want
    # ClickHouse RowBinary: packed little-endian i64, no header
    st, rb = svc.request("GET", "stream/search/stream", params={
        "query": "text:scan", "fast_field": "doc_id",
        "output_format": "click_house_row_binary"})
    assert st == 200 and rb.content_type == "application/octet-stream"
    vals = struct.unpack(f"<{len(rb.data) // 8}q", rb.data)
    assert sorted(vals) == want
    # required param + unknown format are 400s
    st, _ = svc.request("GET", "stream/search/stream", params={"query": "*"})
    assert st == 400
    st, _ = svc.request("GET", "stream/search/stream", params={
        "fast_field": "doc_id", "output_format": "xml"})
    assert st == 400


def test_search_plan_and_splits_resource(tmp_path):
    idx = _mk(tmp_path, "plan")
    # second split with disjoint tags (lang is a tag field)
    idx.ingest_docs([{"doc_id": 900, "text": "tagged doc", "lang": "zz",
                      "source": "web", "n_chars": 10}], commit_id="b")
    svc = IndexApiService({"plan": idx})
    st, plan = svc.request("GET", "plan/search-plan",
                           params={"query": "lang:zz AND text:tagged"})
    assert st == 200
    assert plan["num_splits_total"] == 2
    assert plan["num_splits_after_pruning"] == 1  # tag semi-join pruned
    st, plan_all = svc.request("GET", "plan/search-plan",
                               params={"query": "*"})
    assert plan_all["num_splits_after_pruning"] == 2
    # splits resource
    st, lst = svc.request("GET", "indexes/plan/splits")
    assert st == 200 and lst["total"] == 2
    victim = plan["split_ids"][0]
    st, _ = svc.request("PUT", "indexes/plan/splits/mark-for-deletion",
                        body={"split_ids": [victim]})
    assert st == 200
    st, pub = svc.request("GET", "indexes/plan/splits",
                          params={"split_states": "published"})
    assert pub["total"] == 1
    st, marked = svc.request("GET", "indexes/plan/splits",
                             params={"split_states": "marked_for_deletion"})
    assert marked["total"] == 1 and marked["splits"][0]["split_id"] == victim


def test_otlp_http_ingest(tmp_path):
    from quickwit_ray.config import DocMapping, FieldMapping
    from quickwit_ray.sources.ingest import (
        encode_otlp_logs_request,
        parse_otlp_logs_json,
    )

    dyn = DocMapping(field_mappings=(
        FieldMapping(name="body", type="text"),), mode="dynamic",
        doc_id_field="body")
    logs_idx = Index.create(str(tmp_path / "otel"), "otel-logs-v0_9", dyn)
    svc = IndexApiService({"otel-logs-v0_9": logs_idx})
    json_payload = json.dumps({"resourceLogs": [{
        "resource": {"attributes": [
            {"key": "service.name",
             "value": {"stringValue": "checkout"}}]},
        "scopeLogs": [{"logRecords": [
            {"timeUnixNano": "1700000000000000000",
             "severityText": "ERROR",
             "body": {"stringValue": "payment failed"}},
            {"timeUnixNano": "1700000001000000000",
             "severityText": "INFO",
             "body": {"stringValue": "retry scheduled"}},
        ]}]}]}).encode()
    # default-index route, JSON payload
    st, r = svc.request("POST", "otlp/v1/logs", body=json_payload,
                        params={"_content_type": "application/json"})
    assert st == 200 and r["num_docs_for_processing"] == 2
    assert logs_idx.search("body:payment", max_hits=5).num_hits == 1
    # explicit-index route, protobuf payload (fixture encoder round-trip)
    docs = parse_otlp_logs_json(json_payload)
    proto = encode_otlp_logs_request(docs)
    st, r = svc.request("POST", "otel-logs-v0_9/otlp/v1/logs", body=proto,
                        params={"_content_type": "application/x-protobuf"})
    assert st == 200 and r["num_docs_for_processing"] == 2
    assert logs_idx.search("body:payment", max_hits=5).num_hits == 2


def test_delete_tasks_api_and_node_endpoints(tmp_path):
    from quickwit_ray.config import index_config_from_api_json

    cfg = index_config_from_api_json({
        "version": "0.8", "index_id": "logsdel",
        "doc_mapping": {"field_mappings": [
            {"name": "msg", "type": "text"},
            {"name": "ts", "type": "datetime", "fast": True},
        ], "timestamp_field": "ts", "mode": "dynamic"}})
    idx = Index.create(str(tmp_path / "ld"), cfg.index_id, cfg.doc_mapping)
    t0 = 1_700_000_000
    idx.ingest_docs([{"msg": "stale noise", "ts": t0 - 5000},
                     {"msg": "stale keeper", "ts": t0 + 5000},
                     {"msg": "fresh noise", "ts": t0 + 5000}], commit_id="a")
    svc = IndexApiService({"logsdel": idx})
    st, task = svc.request("POST", "logsdel/delete-tasks", body={
        "query": "noise", "search_fields": ["msg"],
        "end_timestamp": t0})
    assert st == 200 and "msg:(noise)" in task["query"]
    st, tasks = svc.request("GET", "logsdel/delete-tasks")
    assert st == 200 and len(tasks) == 1
    idx.apply_deletes()
    r = idx.search("*", max_hits=10, fetch_fields=["msg"])
    assert sorted(r.hits["msg"]) == ["fresh noise", "stale keeper"]
    # node endpoints
    st, v = svc.request("GET", "version")
    assert st == 200 and "version" in v["build"]
    st, c = svc.request("GET", "cluster")
    assert c["num_indexes"] == 1 and c["live_nodes"] == ["node-1"]
    st, ok = svc.request("GET", "health/livez")
    assert st == 200 and ok is True
    st, metrics = svc.request("GET", "metrics")
    assert st == 200
    text = metrics.data.decode()
    assert 'quickwit_index_num_docs{index="logsdel"} 2' in text
    assert "quickwit_index_num_splits" in text


def test_raw_body_segment_exact_and_splits_filters(tmp_path):
    """Review regressions: an index NAMED '*otlp' keeps JSON body parsing,
    and the splits state filter composes with timestamp bounds."""
    from quickwit_ray.index_api import IndexApiService as S

    assert S.wants_raw_body("otlp/v1/logs")
    assert S.wants_raw_body("myindex/otlp/v1/traces")
    assert not S.wants_raw_body("myotlp/search")
    assert not S.wants_raw_body("indexes/otlp-ish/splits")
    # state+timestamp composition
    from quickwit_ray.config import index_config_from_api_json

    cfg = index_config_from_api_json({
        "version": "0.8", "index_id": "tw",
        "doc_mapping": {"field_mappings": [
            {"name": "msg", "type": "text"},
            {"name": "ts", "type": "datetime", "fast": True}],
            "timestamp_field": "ts", "mode": "dynamic"}})
    idx = Index.create(str(tmp_path / "tw"), "tw", cfg.doc_mapping)
    idx.ingest_docs([{"msg": "early", "ts": 1_000}], commit_id="a")
    idx.ingest_docs([{"msg": "late", "ts": 2_000_000}], commit_id="b")
    svc = IndexApiService({"tw": idx})
    st, all_marked = svc.request("GET", "indexes/tw/splits")
    sid_early = next(s["split_id"] for s in all_marked["splits"]
                     if s["time_range_start"] == 1_000 * 1_000_000)
    svc.request("PUT", "indexes/tw/splits/mark-for-deletion",
                body={"split_ids": [sid_early]})
    st, r = svc.request("GET", "indexes/tw/splits", params={
        "split_states": "marked_for_deletion",
        "end_timestamp": str(10_000 * 1_000_000)})
    assert r["total"] == 1 and r["splits"][0]["split_id"] == sid_early
    st, r2 = svc.request("GET", "indexes/tw/splits", params={
        "split_states": "marked_for_deletion",
        "start_timestamp": str(1_000_000 * 1_000_000)})
    assert r2["total"] == 0  # marked split is OUTSIDE the window


# -- over HTTP ----------------------------------------------------------------

def _http(method, url, payload=None):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_native_api_over_http(tmp_path):
    idx = _mk(tmp_path, "webdocs")
    with SearchServer({"webdocs": idx},
                      index_root_dir=str(tmp_path / "root")) as srv:
        base = f"http://127.0.0.1:{srv.port}/api/v1"
        st, lst = _http("GET", f"{base}/indexes")
        assert st == 200 and lst[0]["index_config"]["index_id"] == "webdocs"
        st, r = _http("GET", f"{base}/webdocs/search?query=*&max_hits=3")
        assert st == 200 and len(r["hits"]) == 3
        # source CRUD over HTTP
        st, src = _http("POST", f"{base}/indexes/webdocs/sources",
                        {"source_id": "api-src", "source_type": "ingest-api"})
        assert st == 200 and src["source_id"] == "api-src"
        st, got = _http("GET", f"{base}/indexes/webdocs/sources")
        assert [s["source_id"] for s in got] == ["api-src"]
        st, _ = _http("PUT",
                      f"{base}/indexes/webdocs/sources/api-src/toggle",
                      {"enable": False})
        assert st == 200
        st, one = _http("GET", f"{base}/indexes/webdocs/sources/api-src")
        assert one["enabled"] is False
        st, _ = _http("DELETE", f"{base}/indexes/webdocs/sources/api-src")
        assert st == 200
        # create an index over HTTP, then ES-search it (shared registry)
        st, _ = _http("POST", f"{base}/indexes", {
            "version": "0.8", "index_id": "fresh",
            "doc_mapping": {"field_mappings": [
                {"name": "t", "type": "text"}], "mode": "dynamic"}})
        assert st == 200
        st, es = _http("POST", f"{base}/_elastic/fresh/_search",
                       {"query": {"match_all": {}}})
        assert st == 200 and es["hits"]["total"]["value"] == 0
        # ES surface still routes (regression guard for dispatch order)
        st, es2 = _http("POST", f"{base}/_elastic/webdocs/_search",
                        {"query": {"match_all": {}}, "size": 1})
        assert st == 200 and es2["hits"]["total"]["value"] == 100


def test_recreate_after_restart_never_clobbers(tmp_path):
    """Review regression: POST /indexes for an index that exists ON DISK
    but not in the (restarted) registry must 400, not rmtree the data;
    template auto-create opens such an index instead of recreating it."""
    from quickwit_ray.search.qw_rest import QwRestService

    root = str(tmp_path / "root")
    payload = {"version": "0.8", "index_id": "persist",
               "doc_mapping": {"field_mappings": [
                   {"name": "msg", "type": "text"}], "mode": "dynamic"}}
    svc1 = QwRestService(root)
    st, _ = svc1.request("POST", "indexes", body=payload)
    assert st == 200
    svc1.indexes["persist"].ingest_docs([{"msg": "precious data"}],
                                        commit_id="a")
    # restart: fresh registry over the same root
    svc2 = QwRestService(root)
    st, err = svc2.request("POST", "indexes", body=payload)
    assert st == 400 and "exists" in err["message"]
    assert Index.open(f"{root}/persist").search(
        "msg:precious", max_hits=5).num_hits == 1
    # template auto-create to the unregistered on-disk index: opened
    svc2.request("POST", "templates", body={
        "template_id": "t", "index_id_patterns": ["persist"],
        "doc_mapping": payload["doc_mapping"]})
    st, out = svc2.request("POST", "persist/_bulk", body=None,
                           ndjson=[{"create": {}}, {"msg": "more data"}])
    assert st == 200
    assert Index.open(f"{root}/persist").search(
        "msg:precious", max_hits=5).num_hits == 1  # survived
    # auto-create with no root dir configured: no crash, clean 404
    svc3 = QwRestService(None)
    svc3.templates["t"] = {"index_id_patterns": ["anything-*"],
                           "doc_mapping": payload["doc_mapping"]}
    st, out3 = svc3.request("POST", "anything-1/_bulk", body=None,
                            ndjson=[{"create": {}}, {"msg": "x"}])
    # ES bulk semantics: 200 with per-item failures; nothing was created
    assert st == 200 and out3["errors"] is True
    assert "anything-1" not in svc3.indexes


def test_template_matching_and_crud(tmp_path):
    """Reference template semantics (index_template/mod.rs +
    file_backed/index_template_matcher.rs): priority-desc then
    template-id ordering picks the match; `-`-prefixed patterns
    exclude; patterns are validated (`**`, short literals, charset);
    GET lists, PUT upserts with the path id, POST refuses overwrite."""
    from quickwit_ray.search.qw_rest import QwRestService

    dm = {"field_mappings": [{"name": "msg", "type": "text"}],
          "mode": "dynamic"}
    svc = QwRestService(str(tmp_path / "root"))

    def post(tpl):
        return svc.request("POST", "templates", body=tpl)

    # validation rejections (validate_index_id_pattern rules)
    assert post({"template_id": "bad1", "index_id_patterns": [],
                 "doc_mapping": dm})[0] == 400
    assert post({"template_id": "bad2", "index_id_patterns": ["a**b"],
                 "doc_mapping": dm})[0] == 400
    assert post({"template_id": "bad3", "index_id_patterns": ["ab"],
                 "doc_mapping": dm})[0] == 400  # literal < 3 chars
    assert post({"template_id": "bad4", "index_id_patterns": ["/etc/*"],
                 "doc_mapping": dm})[0] == 400
    assert post({"template_id": "..", "index_id_patterns": ["logs-*"],
                 "doc_mapping": dm})[0] == 400  # id itself validated

    # priority: higher wins regardless of insertion order; ties break
    # on template_id; negative patterns exclude
    lo = {"template_id": "generic", "index_id_patterns": ["logs-*"],
          "priority": 0, "doc_mapping": dm}
    hi = {"template_id": "special", "priority": 100,
          "index_id_patterns": ["logs-special-*", "-logs-special-skip*"],
          "doc_mapping": dm}
    assert post(lo)[0] == 200 and post(hi)[0] == 200
    assert post(lo)[0] == 400  # create refuses overwrite
    assert svc._find_matching_template(
        "logs-special-1")["template_id"] == "special"
    assert svc._find_matching_template(
        "logs-special-skip-1")["template_id"] == "generic"  # negated
    assert svc._find_matching_template("logs-app")["template_id"] \
        == "generic"
    assert svc._find_matching_template("metrics-app") is None

    # list is id-sorted; PUT updates in place with the path id
    st, lst = svc.request("GET", "templates")
    assert st == 200 and [t["template_id"] for t in lst] \
        == ["generic", "special"]
    st, upd = svc.request("PUT", "templates/special", body={
        "index_id_patterns": ["logs-special-*"], "priority": 7,
        "doc_mapping": dm})
    assert st == 200 and upd["priority"] == 7
    assert svc.templates["special"]["priority"] == 7
    assert svc._find_matching_template(
        "logs-special-skip-1")["template_id"] == "special"  # un-negated

    # auto-create uses the matcher: the high-priority template's mapping
    st, out = svc.request("POST", "logs-special-9/_bulk", body=None,
                          ndjson=[{"create": {}}, {"msg": "hi"}])
    assert st == 200 and out["errors"] is False
    assert "logs-special-9" in svc.indexes


def test_template_autocreate_over_http(tmp_path):
    """The unified server front exposes index templates: _bulk to an
    unknown index matching a template pattern auto-creates it."""
    with SearchServer({}, index_root_dir=str(tmp_path / "root")) as srv:
        base = f"http://127.0.0.1:{srv.port}/api/v1"
        st, _ = _http("POST", f"{base}/templates", {
            "template_id": "logs-tpl", "index_id_patterns": ["applogs-*"],
            "doc_mapping": {"field_mappings": [
                {"name": "msg", "type": "text"}], "mode": "dynamic"}})
        assert st == 200
        bulk = ('{"create": {}}\n{"msg": "hello from bulk"}\n').encode()
        req = urllib.request.Request(
            f"{base}/_elastic/applogs-2026/_bulk", data=bulk, method="POST")
        req.add_header("Content-Type", "application/x-ndjson")
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["errors"] is False
        st, es = _http("POST", f"{base}/_elastic/applogs-2026/_search",
                       {"query": {"match": {"msg": "hello"}}})
        assert es["hits"]["total"]["value"] == 1


def test_otlp_protobuf_over_http(tmp_path):
    """Protobuf bytes must reach the OTLP handler unparsed (raw-body
    passthrough in the HTTP layer)."""
    from quickwit_ray.config import DocMapping, FieldMapping
    from quickwit_ray.sources.ingest import encode_otlp_logs_request

    dyn = DocMapping(field_mappings=(
        FieldMapping(name="body", type="text"),), mode="dynamic",
        doc_id_field="body")
    logs_idx = Index.create(str(tmp_path / "otel"), "otel-logs-v0_9", dyn)
    proto = encode_otlp_logs_request([
        {"body": "disk pressure rising", "severity_text": "WARN",
         "timestamp_nanos": 1_700_000_000_000_000_000,
         "service_name": "nodeagent", "attributes": {},
         "resource_attributes": {}}])
    with SearchServer({"otel-logs-v0_9": logs_idx}) as srv:
        url = f"http://127.0.0.1:{srv.port}/api/v1/otlp/v1/logs"
        req = urllib.request.Request(url, data=proto, method="POST")
        req.add_header("Content-Type", "application/x-protobuf")
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
    assert out["num_docs_for_processing"] == 1
    assert logs_idx.search("body:disk", max_hits=5).num_hits == 1


def test_developer_api(tmp_path):
    """Developer API (developer_api/): /api/developer/debug dumps node
    state (node_ids glob filter honored), /api/developer/log-level
    retunes the process logger; both reachable through the HTTP front
    outside the /api/v1 prefix."""
    import logging

    from quickwit_ray.search.qw_rest import QwRestService

    svc = QwRestService(str(tmp_path / "root"))
    svc.request("POST", "indexes", body={
        "version": "0.8", "index_id": "dbg",
        "doc_mapping": {"field_mappings": [
            {"name": "msg", "type": "text"}], "mode": "dynamic"}})
    svc.indexes["dbg"].ingest_docs([{"msg": "hello"}], commit_id="a")
    st, out = svc.request("GET", "api/developer/debug")
    assert st == 200 and out["node_id"] == "node-1"
    assert out["indexes"]["dbg"]["num_docs"] == 1
    assert out["indexes"]["dbg"]["num_splits"] == 1
    assert "memory_budget" in out["search_permits"]
    # node_ids glob filter: no match -> empty
    st, out2 = svc.request("GET", "api/developer/debug",
                           params={"node_ids": "other-*"})
    assert st == 200 and out2 == {}
    # log-level
    st, _ = svc.request("GET", "api/developer/log-level",
                        params={"level": "debug"})
    assert st == 200
    assert logging.getLogger("quickwit_ray").level == logging.DEBUG
    st, _ = svc.request("GET", "api/developer/log-level",
                        params={"level": "warning"})
    assert logging.getLogger("quickwit_ray").level == logging.WARNING
    st, err = svc.request("GET", "api/developer/log-level",
                          params={"level": "nope"})
    assert st == 400
    # over HTTP, outside /api/v1
    with SearchServer({}, index_root_dir=str(tmp_path / "root2")) as srv:
        st, out = _http("GET",
                        f"http://127.0.0.1:{srv.port}/api/developer/debug")
        assert st == 200 and out["node_id"] == "node-1"
