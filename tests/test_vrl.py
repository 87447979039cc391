"""VRL transform subset (reference actors/vrl_processing.rs:50-76 +
TransformConfig, source_config/mod.rs:625): the documented script shapes
run unchanged; unsupported VRL is rejected at compile time."""

import pyarrow as pa
import pytest

from quickwit_ray.functions.vrl import (
    VrlCompileError,
    compile_vrl,
    vrl_table_transform,
)


def test_reference_doc_example():
    # the script from the reference's own TransformConfig example
    p = compile_vrl('.message = downcase(string!(.message))')
    assert p.transform_doc({"message": "Hello World"}) == \
        {"message": "hello world"}
    # string!() on a non-string ABORTS the doc (failed set)
    assert p.transform_doc({"message": 42}) is None
    assert p.transform_doc({}) is None


def test_assign_del_coalesce_concat():
    p = compile_vrl("""
        # normalize + enrich (typical source-config transform)
        .tenant = .tenant ?? "default"
        .level = upcase(string(.level) ?? "info")
        .full = string!(.svc) + "/" + string!(.op)
        del(.internal)
        .meta.source = "vrl"
    """)
    out = p.transform_doc({"svc": "api", "op": "read", "level": "warn",
                           "internal": "x"})
    assert out == {"svc": "api", "op": "read", "level": "WARN",
                   "tenant": "default", "full": "api/read",
                   "meta": {"source": "vrl"}}
    out2 = p.transform_doc({"svc": "api", "op": "w", "tenant": "t1"})
    assert out2["tenant"] == "t1" and out2["level"] == "INFO"


def test_functions_and_numbers():
    p = compile_vrl("""
        .n = to_int!(.raw) + 1
        .ratio = to_float!(.num) - 0.5
        .ok = starts_with(string!(.path), "/api")
        .len = length(string!(.path))
        .clean = replace(trim(string!(.name)), "  ", " ")
        .parsed = parse_json!(.blob)
    """)
    out = p.transform_doc({"raw": "41", "num": "2", "path": "/api/x",
                           "name": "  a  b ", "blob": '{"k": [1, 2]}'})
    assert out["n"] == 42 and out["ratio"] == 1.5
    assert out["ok"] is True and out["len"] == 6
    assert out["clean"] == "a b"
    assert out["parsed"] == {"k": [1, 2]}
    # fallible non-! turns errors into null, coalesce supplies defaults
    p2 = compile_vrl('.n = to_int(.raw) ?? -1')
    assert p2.transform_doc({"raw": "nope"})["n"] == -1


def test_unsupported_vrl_rejected_at_compile():
    for bad in [".x = if .a == 1 { 1 } else { 2 }",  # if-as-EXPRESSION
                ".x = map_values(.y) -> |v| { v }",
                ".x = .arr[0]",
                ".x = %kafka.topic",
                ".x = unknown_fn(.y)",
                "if .a == 1 { .b = 2 ",            # unterminated block
                ".x = parse_timestamp(.ts, fmt: \"%+\")"]:  # bad kwarg
        with pytest.raises(VrlCompileError):
            compile_vrl(bad)


def test_if_blocks_and_comparisons():
    p = compile_vrl("""
        if .status == "error" || .retries > 2 {
          .level = "bad"
        } else if exists(.warn) {
          .level = "warn"
        } else {
          .level = "ok"
        }
        .neg = !(.status == "error")
    """)
    assert p.transform_doc({"status": "error", "retries": 0})["level"] == \
        "bad"
    assert p.transform_doc({"status": "x", "retries": 3})["level"] == "bad"
    out = p.transform_doc({"status": "x", "retries": 0, "warn": None})
    assert out["level"] == "warn" and out["neg"] is True
    assert p.transform_doc({"status": "x", "retries": 0})["level"] == "ok"
    # == against a MISSING path reads as null (VRL path semantics)
    p2 = compile_vrl('if .missing == null { .hit = true }')
    assert p2.transform_doc({})["hit"] is True
    # non-boolean condition aborts the document, never silently coerces
    p3 = compile_vrl('if .n { .x = 1 }')
    assert p3.transform_doc({"n": 5}) is None


def test_regex_split_join_math():
    p = compile_vrl("""
        .m = parse_regex!(.line, r'user=(?P<user>\\w+) code=(?P<code>\\d+)')
        .user = downcase(string!(.m.user))
        .masked = replace(.line, r'\\d+', "N")
        .hit = match(.line, r'code=\\d+')
        .parts = split(.line, " ")
        .joined = join(split(.line, " "), "|")
        .f = floor(to_float!(.v)) + ceil(to_float!(.v)) + round(to_float!(.v))
        .a = abs(to_int!(.neg))
    """)
    out = p.transform_doc({"line": "user=Bob code=42", "v": "2.5",
                           "neg": "-3"})
    assert out["m"] == {"1": "Bob", "2": "42", "user": "Bob", "code": "42"}
    assert out["user"] == "bob" and out["masked"] == "user=Bob code=N"
    assert out["hit"] is True
    assert out["parts"] == ["user=Bob", "code=42"]
    assert out["joined"] == "user=Bob|code=42"
    assert out["f"] == 2 + 3 + 2 and out["a"] == 3
    # parse_regex (plain) + ?? default when the pattern misses
    p2 = compile_vrl(".m = parse_regex(.line, r'x=(\\d+)') ?? null")
    assert p2.transform_doc({"line": "nope"})["m"] is None


def test_timestamp_functions():
    p = compile_vrl("""
        .dt = parse_timestamp!(.ts, format: "%+")
        .day = format_timestamp(.dt, format: "%Y-%m-%d")
        .unix = to_unix_timestamp(.dt)
        .unix_ms = to_unix_timestamp(.dt, unit: "milliseconds")
        .custom = parse_timestamp!(.us_date, format: "%m/%d/%Y")
    """)
    out = p.transform_doc({"ts": "2026-08-18T05:00:00Z",
                           "us_date": "08/18/2026"})
    assert out["day"] == "2026-08-18"
    assert out["unix"] == 1787029200
    assert out["unix_ms"] == 1787029200000
    # bad input aborts through the ! path
    assert p.transform_doc({"ts": "nope", "us_date": "08/18/2026"}) is None


def test_table_transform_and_aborts():
    tf = vrl_table_transform(
        '.body = downcase(string!(.body))\n.src = "web"')
    t = pa.table({"body": ["AAA", "BBB"], "doc_id": [1, 2]})
    out = tf(t)
    assert out.column("body").to_pylist() == ["aaa", "bbb"]
    assert out.column("src").to_pylist() == ["web", "web"]
    assert out.column_names[:2] == ["body", "doc_id"]  # order kept
    # aborted docs drop from the batch
    t2 = pa.table({"body": ["ok", None], "doc_id": [1, 2]})
    assert vrl_table_transform('.body = downcase(string!(.body))')(
        t2).column("doc_id").to_pylist() == [1]


def test_vrl_through_file_source_and_build(tmp_path):
    import pyarrow.parquet as pq

    from quickwit_ray.api import Index
    from quickwit_ray.config import DocMapping, FieldMapping

    pq.write_table(pa.table({
        "body": ["Alpha BETA", "Gamma DELTA", "x"],
        "doc_id": pa.array([1, 2, 3], pa.int64())}),
        str(tmp_path / "in.parquet"))
    mapping = DocMapping(
        field_mappings=(
            FieldMapping(name="body", type="text", stored=True),
            FieldMapping(name="tenant", type="text", tokenizer="raw",
                         fast=True),
            FieldMapping(name="doc_id", type="i64", stored=True)),
        mode="lenient", doc_id_field="doc_id",
        default_search_fields=("body",))
    idx = Index.create(str(tmp_path / "i"), "vrl", mapping)
    idx.add_source({"source_id": "drop", "source_type": "file",
                    "params": {"filepath": str(tmp_path / "in.parquet")},
                    "transform": {
                        "vrl_script":
                            '.body = downcase(string!(.body))\n'
                            '.tenant = .tenant ?? "acme"'}})
    idx.ingest_source("drop", execution="local")
    r = idx.search("body:beta", max_hits=10, fetch_fields=["body"])
    assert r.num_hits == 1 and r.hits["body"].iloc[0] == "alpha beta"
    assert idx.search('tenant:acme', max_hits=0).num_hits == 3
    # a bad script is rejected when the source is CONFIGURED
    with pytest.raises(ValueError):
        idx.add_source({"source_id": "bad", "source_type": "file",
                        "params": {"filepath": "x"},
                        "transform": {"vrl_script": ".x = .arr[0]"}})
