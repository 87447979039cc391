"""Cross-split skipping for time-sorted top-k queries
(leaf.rs:958-1326 CanSplitDoBetter): splits ordered by time range, whole
splits skipped once the kth value proves they cannot contribute."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quickwit_ray.config import DocMapping, FieldMapping, IndexConfig, IndexSettings
from quickwit_ray.index.build import build_index
from quickwit_ray.search.engine import IndexSearcher


@pytest.fixture(scope="module")
def time_idx(tmp_path_factory):
    """8 input files = 8 splits with DISJOINT ascending time ranges."""
    tmp = tmp_path_factory.mktemp("tsskip")
    indir = tmp / "in"
    indir.mkdir()
    base = 1_700_000_000_000_000
    rows_per = 200
    for f in range(8):
        start = base + f * rows_per * 1_000_000
        pq.write_table(pa.table({
            "event_id": pa.array(range(f * rows_per, (f + 1) * rows_per), pa.int64()),
            "ts": pa.array([start + i * 1_000_000 for i in range(rows_per)],
                           pa.timestamp("us")),
            "msg": [f"alpha beta w{f}_{i}" for i in range(rows_per)],
        }), str(indir / f"f{f}.parquet"))
    mapping = DocMapping(
        field_mappings=(
            FieldMapping(name="msg", type="text", record="freq", fieldnorms=True),
            FieldMapping(name="ts", type="datetime", stored=True, fast=True),
            FieldMapping(name="event_id", type="i64", stored=True, fast=True)),
        timestamp_field="ts", doc_id_field="event_id",
        default_search_fields=("msg",))
    d = str(tmp / "idx")
    build_index(str(indir), d, IndexConfig("tsk", mapping), execution="local")
    return d


def test_desc_skip_matches_full_and_marks_inexact(time_idx):
    s = IndexSearcher(time_idx)
    assert len(s.manifest.published_splits()) == 8
    r = s.search("msg:alpha", max_hits=10, sort_by="-ts",
                 fetch_fields=["event_id"])
    # newest 10 docs overall — only the newest split can contribute
    assert list(r.hits["event_id"]) == list(range(1599, 1589, -1))
    assert not r.num_hits_exact          # 7 splits were skipped
    assert r.num_hits == 200             # lower bound: the searched split
    # ascending: oldest split wins
    r2 = s.search("msg:alpha", max_hits=10, sort_by="+ts",
                  fetch_fields=["event_id"])
    assert list(r2.hits["event_id"]) == list(range(10))
    assert not r2.num_hits_exact


def test_no_skip_when_every_split_needed(time_idx):
    s = IndexSearcher(time_idx)
    # k spans all splits -> nothing can be skipped, count exact
    r = s.search("msg:alpha", max_hits=1600, sort_by="-ts", fetch_fields=[])
    assert r.num_hits == 1600 and r.num_hits_exact
    # count-only and agg queries never skip
    r2 = s.search("msg:alpha", max_hits=0)
    assert r2.num_hits == 1600 and r2.num_hits_exact
    r3 = s.search("msg:alpha", max_hits=5, sort_by="-ts",
                  aggs={"n": {"value_count": {"field": "event_id"}}})
    assert r3.num_hits_exact and r3.aggs["n"]["value"] == 1600.0


def test_skip_results_equal_non_time_sort_path(time_idx):
    """The skipped result set must equal what a full evaluation returns:
    compare against sorting by the same fast field under its non-timestamp
    alias path (event_id mirrors ts order in this fixture)."""
    s = IndexSearcher(time_idx)
    r_ts = s.search("msg:alpha", max_hits=25, sort_by="-ts",
                    fetch_fields=["event_id"])
    r_id = s.search("msg:alpha", max_hits=25, sort_by="-event_id",
                    fetch_fields=["event_id"])
    assert list(r_ts.hits["event_id"]) == list(r_id.hits["event_id"])
    assert r_id.num_hits_exact  # non-timestamp sort: no skipping


def test_ray_wave_dispatch_skips(time_idx, ray_session):
    s = IndexSearcher(time_idx, execution="ray", concurrency=2)
    r = s.search("msg:alpha", max_hits=10, sort_by="-ts",
                 fetch_fields=["event_id"])
    assert list(r.hits["event_id"]) == list(range(1599, 1589, -1))
    assert not r.num_hits_exact
    if s._actor_pool is not None:
        s._actor_pool.shutdown()
