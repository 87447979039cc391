"""Index config update (`quickwit index update` / PUT /api/v1/indexes/{id};
reference rules in quickwit-config/src/index_config/serialize.rs:73-151)
and config-driven retention."""

from dataclasses import replace

import pyarrow.parquet as pq
import pytest

from quickwit_ray.api import Index
from quickwit_ray.config import (
    DocMapping,
    FieldMapping,
    IndexConfig,
    IndexSettings,
    MergePolicyConfig,
    documents_doc_mapping,
    parse_period_secs,
    validate_config_update,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _mk(tmp_path, name="idx", metastore="file"):
    return Index.create(str(tmp_path / name), "docs",
                        documents_doc_mapping(),
                        settings=IndexSettings(split_num_docs_target=10_000),
                        metastore=metastore)


def test_parse_period_secs():
    assert parse_period_secs(90) == 90
    assert parse_period_secs("30 seconds") == 30
    assert parse_period_secs("5 min") == 300
    assert parse_period_secs("2 hours") == 7200
    assert parse_period_secs("7 days") == 7 * 86400
    assert parse_period_secs("1 week") == 7 * 86400
    with pytest.raises(ValueError):
        parse_period_secs("3 fortnights")


@pytest.mark.parametrize("metastore", ["file", "sqlite"])
def test_update_settings_persists(tmp_path, metastore):
    idx = _mk(tmp_path, f"i-{metastore}", metastore)
    cfg = idx.config
    new = replace(cfg, settings=replace(
        cfg.settings, merge_policy=MergePolicyConfig(merge_factor=4),
        retention_secs=3600))
    idx.update_config(new)
    got = Index.open(idx.index_dir).config
    assert got.settings.merge_policy.merge_factor == 4
    assert got.settings.retention_secs == 3600
    # doc mapping untouched
    assert got.doc_mapping == cfg.doc_mapping


def test_update_add_field_and_search_across_old_and_new_splits(tmp_path):
    idx = _mk(tmp_path)
    rows = pq.read_table(DOCS).slice(0, 50).to_pylist()
    idx.ingest_docs(rows[:25], commit_id="old")
    # strict mode: unknown key rejected before the update
    with pytest.raises(ValueError):
        idx.ingest_docs([dict(rows[30], category="spam")])
    cfg = idx.config
    new_mapping = DocMapping(
        field_mappings=cfg.doc_mapping.field_mappings + (
            FieldMapping(name="category", type="text", tokenizer="raw",
                         record="basic", stored=True, fast=True),),
        mode=cfg.doc_mapping.mode,
        timestamp_field=cfg.doc_mapping.timestamp_field,
        tag_fields=cfg.doc_mapping.tag_fields,
        doc_id_field=cfg.doc_mapping.doc_id_field,
        default_search_fields=cfg.doc_mapping.default_search_fields,
    )
    idx.update_config(doc_mapping=new_mapping)
    idx2 = Index.open(idx.index_dir)
    idx2.ingest_docs([dict(r, category="spam") for r in rows[25:50]],
                     commit_id="new")
    # old splits lack the column; new ones index it
    r = idx2.search("category:spam", max_hits=100, fetch_fields=["doc_id"])
    assert sorted(r.hits["doc_id"]) == [x["doc_id"] for x in rows[25:50]]
    r_all = idx2.search("*", max_hits=100)
    assert r_all.num_hits == 50


def test_update_rejections(tmp_path):
    idx = _mk(tmp_path)
    cfg = idx.config
    with pytest.raises(ValueError, match="index_id"):
        idx.update_config(replace(cfg, index_id="other"))
    with pytest.raises(ValueError, match="timestamp_field"):
        bad = DocMapping(field_mappings=cfg.doc_mapping.field_mappings,
                         mode="strict", timestamp_field="n_chars",
                         doc_id_field="doc_id")
        idx.update_config(replace(cfg, doc_mapping=bad))
    with pytest.raises(ValueError, match="change type"):
        fms = tuple(f if f.name != "n_chars" else
                    FieldMapping(name="n_chars", type="f64", fast=True)
                    for f in cfg.doc_mapping.field_mappings)
        bad = DocMapping(field_mappings=fms, mode="strict",
                         doc_id_field="doc_id")
        idx.update_config(replace(cfg, doc_mapping=bad))
    # tokenizer superset rule
    tok = ({"name": "custom", "type": "ngram", "min_gram": 2, "max_gram": 3},)
    with_tok = DocMapping(field_mappings=cfg.doc_mapping.field_mappings,
                          mode="strict", doc_id_field="doc_id",
                          tokenizers=tok)
    idx.update_config(replace(cfg, doc_mapping=with_tok))
    without = DocMapping(field_mappings=cfg.doc_mapping.field_mappings,
                         mode="strict", doc_id_field="doc_id")
    with pytest.raises(ValueError, match="superset"):
        Index.open(idx.index_dir).update_config(
            replace(cfg, doc_mapping=without))


def test_update_via_api_json_sets_retention(tmp_path):
    import time

    from quickwit_ray.config import index_config_from_api_json

    payload = {
        "version": "0.8", "index_id": "events-api",
        "doc_mapping": {
            "field_mappings": [
                {"name": "msg", "type": "text"},
                {"name": "ts", "type": "datetime", "fast": True},
            ],
            "timestamp_field": "ts", "mode": "dynamic",
        },
        "retention": {"period": "1 hours"},
    }
    cfg = index_config_from_api_json(payload)
    assert cfg.settings.retention_secs == 3600
    idx = Index.create(str(tmp_path / "e"), cfg.index_id, cfg.doc_mapping,
                       settings=cfg.settings)
    now = time.time()
    old_ts = now - 7200
    idx.ingest_docs([{"msg": "ancient log", "ts": old_ts}], commit_id="a")
    idx.ingest_docs([{"msg": "fresh log", "ts": now}], commit_id="b")
    dropped = idx.apply_retention(now=now)
    assert len(dropped) == 1
    assert idx.search("*", max_hits=10).num_hits == 1
    # config-free call no-ops when retention unset
    plain = _mk(tmp_path, "plain")
    assert plain.apply_retention() == []


def test_api_json_update_preserves_inexpressible_settings(tmp_path):
    """PUT with a config payload must not reset indexing settings the
    public payload cannot express (review regression)."""
    idx = Index.create(
        str(tmp_path / "p"), "docs", documents_doc_mapping(),
        settings=IndexSettings(split_num_docs_target=10_000,
                               batch_size=1234,
                               merge_policy=MergePolicyConfig(merge_factor=4),
                               retention_secs=3600))
    payload = {"version": "0.8", "index_id": "docs",
               "doc_mapping": {"field_mappings": [
                   {"name": "text", "type": "text"}], "mode": "dynamic"}}
    idx.update_config(api_json=payload)
    got = Index.open(idx.index_dir).config.settings
    assert got.split_num_docs_target == 10_000
    assert got.batch_size == 1234
    assert got.merge_policy.merge_factor == 4
    # retention IS expressible: absent in the payload -> removed
    # (reference full-replace semantics)
    assert got.retention_secs is None
    # explicit indexing_settings apply with replace semantics
    idx.update_config(api_json={**payload, "indexing_settings": {
        "split_num_docs_target": 777,
        "merge_policy": {"type": "limit_merge", "max_merge_ops": 2,
                         "maturation_period": "2 hours"}}})
    got2 = Index.open(idx.index_dir).config.settings
    assert got2.split_num_docs_target == 777
    assert got2.merge_policy.kind == "const_write_amplification"
    assert got2.merge_policy.max_merge_ops == 2
    assert got2.merge_policy.maturation_period_secs == 7200
    assert got2.batch_size == 1234  # still inexpressible, still kept


def test_validate_config_update_allows_field_removal():
    cfg = IndexConfig("x", documents_doc_mapping())
    fms = tuple(f for f in cfg.doc_mapping.field_mappings
                if f.name != "source")
    slim = DocMapping(field_mappings=fms, mode="strict",
                      doc_id_field="doc_id", tag_fields=("lang",))
    validate_config_update(cfg, replace(cfg, doc_mapping=slim))
