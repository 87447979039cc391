"""Training-data pipeline tests: dedup variants on corpora with PLANTED
duplicates, ANN recall, sketches accuracy, multimodal plumbing,
search-stream export, text analysis."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from quickwit_ray.pipelines.dedup import (
    UnionFind,
    exact_dedup,
    embedding_dedup,
    jaccard,
    minhash_dedup,
    minhash_signatures,
    simhash64,
    simhash_dedup,
)


def _docs_with_dups():
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest to find some food for the night")
    rows = []
    for i in range(40):
        rows.append({"doc_id": i, "text": f"unique document number {i} with "
                                          f"totally different content {i * 7} "
                                          f"and filler words galore {i * 13}"})
    # exact dups
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base})
    # near dup (one word changed)
    rows.append({"doc_id": 102, "text": base.replace("lazy", "sleepy")})
    # unrelated long doc
    rows.append({"doc_id": 103, "text": " ".join(f"w{j}" for j in range(100))})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def dup_ds(ray_session):
    import ray.data

    return ray.data.from_pandas(_docs_with_dups())


def test_exact_dedup(dup_ds):
    kept = exact_dedup(dup_ds, "text", "doc_id").to_pandas()
    ids = set(kept["doc_id"])
    assert 100 in ids and 101 not in ids  # keep-first by min id
    assert 102 in ids and len(ids) == 43


def test_minhash_dedup_catches_near_dup(dup_ds):
    kept, clusters = minhash_dedup(dup_ds, "text", "doc_id", threshold=0.5)
    ids = set(kept.to_pandas()["doc_id"])
    assert 100 in ids
    assert 101 not in ids and 102 not in ids  # exact + near dup both drop
    assert 103 in ids
    # clusters is a Dataset (id, root): every dropped dup -> kept root
    cl = {int(r["id"]): int(r["root"]) for r in clusters.take_all()}
    assert cl.get(101) == 100 and cl.get(102) == 100


def test_minhash_signature_similarity():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = "the quick brown fox jumps over the sleepy dog " * 5
    c = " ".join(f"z{i}" for i in range(50))
    sa, sb, sc = minhash_signatures([a, b, c])
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    assert sim_ab > 0.15 > sim_ac
    assert abs(sim_ab - jaccard(a, b)) < 0.25


def test_simhash_dedup(dup_ds):
    kept, clusters = simhash_dedup(dup_ds, "text", "doc_id", max_hamming=3)
    ids = set(kept.to_pandas()["doc_id"])
    assert 101 not in ids  # exact dup has identical simhash
    assert 100 in ids


def test_simhash_hamming_property():
    a = simhash64(["the quick brown fox jumps over the lazy dog"] * 2)
    assert a[0] == a[1]


def test_embedding_dedup(ray_session):
    import ray.data

    rng = np.random.Generator(np.random.PCG64(3))
    vecs = rng.standard_normal((30, 16)).astype(np.float32)
    vecs[11] = vecs[10] + 1e-4  # planted near-dup
    vecs[12] = vecs[10] * 2.0   # same direction -> cosine 1
    df = pd.DataFrame({"vec_id": range(30), "embedding": list(vecs)})
    ds = ray.data.from_pandas(df)
    kept, clusters = embedding_dedup(ds, "embedding", "vec_id", threshold=0.999)
    ids = set(kept.to_pandas()["vec_id"])
    assert 10 in ids and 11 not in ids and 12 not in ids


def test_union_find_keeps_min():
    uf = UnionFind()
    uf.union(5, 3)
    uf.union(3, 9)
    assert uf.find(5) == uf.find(9) == 3


def test_ann_brute_force_exact(ray_session):
    import ray.data

    from quickwit_ray.pipelines.ann import brute_force_topk, ivf_topk

    rng = np.random.Generator(np.random.PCG64(4))
    vecs = rng.standard_normal((200, 8)).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(200), "embedding": list(vecs)})
    ds = ray.data.from_pandas(df)
    q = vecs[:2]
    out = brute_force_topk(ds, q, k=5, vec_col="embedding", id_col="vec_id")
    # ground truth by plain numpy
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = vn @ qn.T
    for qi in range(2):
        truth = np.argsort(-sims[:, qi], kind="stable")[:5]
        got = out[out["query_id"] == qi].sort_values("rank")["id"].to_numpy()
        assert list(got) == list(truth)
        assert got[0] == qi  # self is nearest
    # ivf with full probe == exact
    ivf = ivf_topk(ds, q, k=5, nprobe=64, num_centroids=16)
    for qi in range(2):
        got = ivf[ivf["query_id"] == qi].sort_values("rank")["id"].to_numpy()
        assert got[0] == qi


def test_hll_accuracy():
    from quickwit_ray.functions.sketches import HyperLogLog

    h1, h2 = HyperLogLog(), HyperLogLog()
    h1.add(np.arange(0, 60_000))
    h2.add(np.arange(40_000, 100_000))
    merged = h1.merge(h2)
    assert abs(merged.estimate() - 100_000) / 100_000 < 0.03


def test_quantile_sketch_accuracy():
    from quickwit_ray.functions.sketches import QuantileSketch

    rng = np.random.Generator(np.random.PCG64(5))
    data = rng.standard_normal(100_000)
    qs1, qs2 = QuantileSketch(), QuantileSketch()
    qs1.add(data[:50_000])
    qs2.add(data[50_000:])
    qs = qs1.merge(qs2)
    for p in (25, 50, 95):
        assert abs(qs.percentile(p) - np.percentile(data, p)) < 0.05


def test_multimodal_decode_plumbing(ray_session):
    import ray.data

    from quickwit_ray.pipelines.multimodal import (
        DecodeImageStage,
        decode_images,
        make_fake_image,
    )

    rows = [{"img_id": i, "image": make_fake_image(32 + i, 16)} for i in range(6)]
    rows.append({"img_id": 99, "image": None})
    ds = ray.data.from_items(rows)
    out = decode_images(ds, image_col="image", fake=True, resize_to=(8, 8),
                        concurrency=2, batch_size=4).to_pandas()
    ok = out[out["img_id"] < 90]
    assert (ok["width"] == 8).all() and (ok["height"] == 8).all()
    assert out[out["img_id"] == 99]["width"].isna().all()
    # strict mode raises on an undecodable payload
    with pytest.raises(ValueError, match="undecodable"):
        DecodeImageStage(strict=True)(pa.table({"image": [b"garbagebytes"]}))


def test_search_stream_table(ray_session):
    import pyarrow.compute as pc
    import ray.data

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    out = ds
    from quickwit_ray.pipelines.search_stream import search_stream_table

    res = search_stream_table(
        ds, lambda t: pc.equal(t["event_type"], pa.scalar("click")),
        ["user_id", "value"]).to_pandas()
    import pyarrow.parquet as pq

    truth = pq.read_table("/root/testdata/sf0.001/events.parquet").to_pandas()
    assert len(res) == int((truth["event_type"] == "click").sum())
    _ = out


def test_ngram_jaccard_dedup(dup_ds):
    from quickwit_ray.pipelines.dedup import ngram_jaccard_dedup

    kept, clusters = ngram_jaccard_dedup(dup_ds, "text", "doc_id",
                                         threshold=0.5, sample_mod=2)
    ids = set(kept.to_pandas()["doc_id"])
    assert 100 in ids and 101 not in ids  # exact dup dropped, keep-first
    assert 102 not in ids                 # near dup dropped
    cl = {int(r["id"]): int(r["root"]) for r in clusters.take_all()}
    assert cl.get(101) == 100


def test_search_stream_export_formats(tmp_path):
    import numpy as np

    from quickwit_ray.api import Index
    from quickwit_ray.config import documents_doc_mapping
    from quickwit_ray.pipelines.search_stream import (
        export_csv,
        export_rowbinary,
        search_stream_index,
    )

    d = str(tmp_path / "idx")
    idx = Index.create(d, "documents", documents_doc_mapping())
    idx.ingest("/root/testdata/sf0.001/documents.parquet", execution="local")
    df = search_stream_index(d, "lang:de", ["doc_id", "n_chars"]).to_pandas()
    blob = export_rowbinary(df, "doc_id")
    assert len(blob) == 8 * len(df)
    assert list(np.frombuffer(blob, "<i8")) == list(df["doc_id"])
    csv = export_csv(df)
    assert csv.splitlines()[0] == "doc_id,n_chars"
    assert len(csv.splitlines()) == len(df) + 1


def test_dedup_keepsets_pinned_to_round1(ray_session):
    """Regression: the distributed dedup (Dataset pairs, label
    propagation, anti-join) must produce EXACT pinned keep-sets on the
    sf0.001 fixture (count + sha1 of the sorted kept-id list). Pins date
    from round 1; simhash re-pinned in round 3 when word hashing moved to
    the vendored qhash1 (see comment below)."""
    import hashlib

    import ray.data

    from quickwit_ray.pipelines.dedup import (
        embedding_dedup,
        minhash_dedup,
        ngram_jaccard_dedup,
        simhash_dedup,
    )

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    emb = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")

    def sig(ids):
        return hashlib.sha1(",".join(map(str, sorted(ids))).encode()
                            ).hexdigest()[:16]

    kept, cl = minhash_dedup(docs, "text", "doc_id", threshold=0.8)
    ids = list(kept.to_pandas()["doc_id"])
    assert (len(ids), sig(ids)) == (476, "61eb0c5250120953")
    # every dropped dup maps to a kept root, root is the component min id
    cmap = {int(r["id"]): int(r["root"]) for r in cl.take_all()}
    assert set(cmap) == set(range(500)) - set(ids)
    assert all(root in ids and root < d for d, root in cmap.items())

    kept, _ = simhash_dedup(docs, "text", "doc_id", max_hamming=2)
    ids = list(kept.to_pandas()["doc_id"])
    # re-pinned when the word hash moved to the vendored qhash1
    # (functions/stablehash.py): simhash fingerprints are a direct
    # function of the word hash, so its keep-set legitimately moved
    # (486 -> 489); minhash/ngram/embedding keep-sets are invariant
    # because their final verdicts compare real shingle/vector overlap.
    assert (len(ids), sig(ids)) == (489, "31daa7a69976ee42")

    kept, _ = ngram_jaccard_dedup(docs, "text", "doc_id", threshold=0.8)
    ids = list(kept.to_pandas()["doc_id"])
    assert (len(ids), sig(ids)) == (478, "39bf1b767f0102c1")

    kept, _ = embedding_dedup(emb, "embedding", "vec_id", threshold=0.98)
    ids = list(kept.to_pandas()["vec_id"])
    assert (len(ids), sig(ids)) == (500, "18b9a7dc1962258b")


def test_real_image_decoders_roundtrip(ray_session):
    """PPM/PGM/BMP encode->decode round-trips through the actor-pool
    stage: dimensions, channels, format and pixel values survive."""
    import ray.data

    from quickwit_ray.pipelines.multimodal import (
        decode_image,
        decode_images,
        make_bmp,
        make_pgm,
        make_ppm,
    )

    # direct kernel checks, incl. exact pixel recovery
    for maker, fmt, ch in ((make_ppm, "ppm", 3), (make_pgm, "pgm", 1),
                           (make_bmp, "bmp", 3)):
        buf = maker(13, 7, seed=42)
        got = decode_image(buf)
        assert got is not None
        gfmt, w, h, px = got
        assert (gfmt, w, h, px.shape) == (fmt, 13, 7, (7, 13, ch))
        from quickwit_ray.pipelines.multimodal import _seeded_pixels

        np.testing.assert_array_equal(px, _seeded_pixels(13, 7, ch, 42))
    # ascii P3 variant
    assert decode_image(b"P3\n2 1\n255\n10 20 30 40 50 60\n")[3].tolist() == \
        [[[10, 20, 30], [40, 50, 60]]]
    # corrupt payloads -> None
    assert decode_image(b"BMgarbage") is None
    assert decode_image(b"P6\n4 4\n255\nshort") is None
    # through the Ray actor-pool stage with mixed formats + resize
    rows = [{"img_id": 0, "image": make_ppm(16, 8, 1)},
            {"img_id": 1, "image": make_bmp(9, 9, 2)},
            {"img_id": 2, "image": make_pgm(5, 4, 3)},
            {"img_id": 3, "image": b"\x89PNG not supported"},
            {"img_id": 4, "image": None}]
    out = decode_images(ray.data.from_items(rows), concurrency=2,
                        batch_size=2, resize_to=(4, 4)).to_pandas()
    out = out.set_index("img_id").sort_index()
    assert out.loc[0, "format"] == "ppm" and out.loc[0, "width"] == 4
    assert out.loc[1, "format"] == "bmp" and out.loc[1, "channels"] == 3
    assert out.loc[2, "format"] == "pgm" and out.loc[2, "channels"] == 1
    assert pd.isna(out.loc[3, "format"]) and pd.isna(out.loc[4, "width"])


def test_ivf_persisted_index(ray_session, tmp_path):
    """Persisted centroid-partitioned IVF: hive list dirs on disk, queries
    read only probed lists; full probe equals exact brute force."""
    import os

    import ray.data

    from quickwit_ray.pipelines.ann import (
        brute_force_topk,
        build_ivf_index,
        ivf_index_topk,
    )

    rng = np.random.Generator(np.random.PCG64(9))
    vecs = rng.standard_normal((300, 12)).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(300), "embedding": list(vecs)})
    ds = ray.data.from_pandas(df)
    idx = str(tmp_path / "ivf")
    cents = build_ivf_index(ds, idx, num_centroids=8, sample_rows=300)
    assert cents.shape == (8, 12)
    lists = sorted(os.listdir(os.path.join(idx, "lists")))
    assert all(d.startswith("list=") for d in lists) and len(lists) >= 4
    q = vecs[:3]
    exact = brute_force_topk(ds, q, k=5)
    full = ivf_index_topk(idx, q, k=5, nprobe=8)
    assert full.equals(exact)
    # narrow probe: self is always in its own centroid's list
    narrow = ivf_index_topk(idx, q, k=5, nprobe=1)
    for qi in range(3):
        got = narrow[narrow["query_id"] == qi].sort_values("rank")
        assert int(got.iloc[0]["id"]) == qi


def test_textstats_vectorized_edge_cases():
    """The round-2 vectorized kernels must match the per-row definitions on
    boundary shapes: empties, exactly-window rows, trailing short rows."""
    import pandas as pd_util

    from quickwit_ray.functions import textstats as ts

    texts = ["", None, "one", "a b c d e f g h",          # exactly window=8
             "a b c d e f g h i j k",                      # > window
             "tail short", " ".join(f"w{i}" for i in range(9))]
    fp = ts.fingerprints(texts, window=8)
    assert fp[0] == 0 and fp[1] == 0

    def slow_fp(t, window=8):
        words = (t or "").lower().split()
        if not words:
            return np.uint64(0)
        from quickwit_ray.functions.stablehash import hash_strings

        h = hash_strings(np.asarray(words, object))
        if len(h) >= window:
            roll = np.zeros(len(h) - window + 1, np.uint64)
            for k in range(window):
                seg = h[k: len(h) - window + 1 + k]
                r = k % 63
                roll ^= (seg << np.uint64(r)) | (seg >> np.uint64(64 - r if r else 63))
            return np.bitwise_xor.reduce(np.sort(roll)) ^ np.uint64(len(words))
        return np.bitwise_xor.reduce(np.sort(h)) ^ np.uint64(len(words))

    for i, t in enumerate(texts):
        assert fp[i] == slow_fp(t), (i, t)
    # identical docs -> identical fingerprints; shifted docs share windows
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    assert ts.fingerprints([a, a])[0] == ts.fingerprints([a, a])[1]
    q = ts.quality_scores(["", "hello world the of and", None])
    assert q["n_words"][0] == 0 and q["stopword_ratio"][1] > 0
    langs = ts.detect_language(["the cat and the hat is it", "", None,
                                "der hund und die katze ist", "地址包含字元" * 5])
    assert list(langs) == ["en", "und", "und", "de", "zh"]


def test_minhash_join_verify_path_matches_broadcast(dup_ds, monkeypatch):
    """Review-3: the shuffle-join verification path (large candidate sets)
    must produce the same keep-set as the broadcast path — incl. null
    texts, which verify as identical empty shingle sets on BOTH paths."""
    import pyarrow as pa
    import ray.data

    import quickwit_ray.pipelines.dedup as dd

    base = dd.minhash_dedup(dup_ds, "text", "doc_id", threshold=0.5)
    base_ids = sorted(base[0].to_pandas()["doc_id"])
    monkeypatch.setattr(dd, "BROADCAST_VERIFY_IDS", 0)
    joined = dd.minhash_dedup(dup_ds, "text", "doc_id", threshold=0.5)
    assert sorted(joined[0].to_pandas()["doc_id"]) == base_ids
    # null texts: identical-null docs are dups on both paths
    nds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([None, None, "real content here words"], pa.string()),
    }))
    monkeypatch.setattr(dd, "BROADCAST_VERIFY_IDS", 0)
    kept_j, _ = dd.minhash_dedup(nds, "text", "doc_id", threshold=0.5)
    monkeypatch.setattr(dd, "BROADCAST_VERIFY_IDS", 200_000)
    kept_b, _ = dd.minhash_dedup(nds, "text", "doc_id", threshold=0.5)
    assert sorted(kept_j.to_pandas()["doc_id"]) == \
        sorted(kept_b.to_pandas()["doc_id"]) == [1, 3]


def test_wav_decode_roundtrip_and_stage(ray_session):
    """Audio decode (pure-struct RIFF/WAVE PCM16, like the image
    containers): codec round-trip + the actor-pool stage over a Dataset."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from quickwit_ray.pipelines.multimodal import (
        DecodeAudioStage,
        decode_audio,
        decode_wav,
        make_wav,
    )

    buf = make_wav(1000, 16_000, 2, seed=7)
    sr, ch, n, rms = decode_wav(buf)
    assert (sr, ch, n) == (16_000, 2, 1000) and rms > 0
    # word-aligned extra chunk before data still parses
    weird = buf[:12] + b"LIST\x04\x00\x00\x00abcd" + buf[12:]
    assert decode_wav(weird)[:3] == (16_000, 2, 1000)
    assert decode_wav(b"not audio") is None
    # malformed chunks must return None / degrade, never raise (a bad
    # payload must not abort the non-strict stage's whole Ray task)
    import struct as _st

    assert decode_wav(buf[:12] + b"fmt " + _st.pack("<I", 16)
                      + b"\x00" * 8) is None          # truncated fmt body
    assert decode_wav(buf[:12] + b"data" + _st.pack("<I", 10_000)
                      + b"xx") is None                 # overrunning chunk
    odd = decode_wav(buf[:40] + _st.pack("<I", 7) + b"\x01" * 7)
    assert odd is not None and odd[:3] == (16_000, 2, 1)  # odd data trimmed
    # strict stage raises on junk; lenient emits null rows
    junk = pa.table({"audio": pa.array([b"nope"], pa.binary())})
    try:
        DecodeAudioStage(strict=True)(junk)
        raise AssertionError("strict should raise")
    except ValueError:
        pass
    rows = [{"doc_id": i, "audio": make_wav(100 + i, 8000, 1, seed=i)}
            for i in range(40)]
    out = decode_audio(ray.data.from_items(rows), concurrency=2,
                       batch_size=16).to_pandas().sort_values("doc_id")
    assert list(out["n_samples"]) == [100 + i for i in range(40)]
    assert (out["sample_rate"] == 8000).all()
    assert (out["duration_ms"] == (np.arange(40) + 100) * 1000 // 8000).all()


def test_sessionize_gap_semantics(ray_session):
    """Gap-based sessionization: deterministic session splits at
    inactivity gaps, per-user, vs a hand-computed reference."""
    import ray.data

    from quickwit_ray.pipelines.sessions import sessionize

    base = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(60_000_000, "us")  # one minute
    rows = [
        # user 1: 3 events tight, 40-min gap, 2 more
        {"event_id": 1, "user_id": 1, "ts": base + 0 * m},
        {"event_id": 2, "user_id": 1, "ts": base + 5 * m},
        {"event_id": 3, "user_id": 1, "ts": base + 9 * m},
        {"event_id": 4, "user_id": 1, "ts": base + 49 * m},
        {"event_id": 5, "user_id": 1, "ts": base + 50 * m},
        # user 2: single event
        {"event_id": 6, "user_id": 2, "ts": base + 7 * m},
        # user 3: tie on ts broken by event_id; exactly-30min gap stays
        {"event_id": 8, "user_id": 3, "ts": base + 0 * m},
        {"event_id": 7, "user_id": 3, "ts": base + 0 * m},
        {"event_id": 9, "user_id": 3, "ts": base + 30 * m},
    ]
    out = sessionize(ray.data.from_items(rows), gap_secs=1800) \
        .to_pandas().sort_values(["user_id", "session_idx"]) \
        .reset_index(drop=True)
    u1 = out[out["user_id"] == 1]
    assert list(u1["n_events"]) == [3, 2]
    assert u1.iloc[0]["end_ts"] == pd.Timestamp(base + 9 * m)
    assert u1.iloc[1]["start_ts"] == pd.Timestamp(base + 49 * m)
    assert list(out[out["user_id"] == 2]["n_events"]) == [1]
    # exactly-gap is NOT a break (strict >)
    assert list(out[out["user_id"] == 3]["n_events"]) == [3]


def test_dedup_exchange_columns_are_native_int64(ray_session):
    """Round-4 VERDICT perf finding: uint64 band-hash columns above 2^63
    degraded to pickled-object blocks in Ray's groupby exchange. Hash
    columns now travel as int64 bit-views (_i64 bijection — buckets and
    keep-sets unchanged); pin the transport dtypes so a refactor can't
    silently reintroduce the pickle fallback on the widest shuffle."""
    import pyarrow as pa
    import ray.data

    from quickwit_ray.pipelines.dedup import _i64, _u64

    h = np.array([2**64 - 1, 2**63, 5, 0], np.uint64)
    assert (_u64(_i64(h)) == h).all()          # exact bijection
    assert _i64(h).dtype == np.int64

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"]).limit(64)

    from quickwit_ray.pipelines import dedup as dd

    # drive each banding stage and check the materialized GROUPBY output
    # (the exchange itself) holds native int64, not object/extension
    def exchange_types(banded, key_cols):
        out = banded.groupby(key_cols).count().materialize()
        sch = out.schema()
        return dict(zip(sch.names, sch.types))

    def sig_bands_of(fn, *a, **k):
        # re-run the pipeline's first map_batches stage in isolation
        return fn(docs, "text", "doc_id", *a, **k)

    import pyarrow.types as pt

    # minhash banding
    banded = docs.map_batches(
        lambda b: pa.table({
            "band": pa.array(
                np.tile(np.arange(dd.NUM_BANDS), b.num_rows), pa.int32()),
            "bh": pa.array(_i64(dd.band_hashes(dd.minhash_signatures(
                b["text"].to_pylist())).reshape(-1)), pa.int64()),
        }), batch_format="pyarrow")
    t = exchange_types(banded, ["band", "bh"])
    assert pt.is_int64(t["bh"]), t

    # full pipelines still run clean end-to-end on the bit-view columns
    kept, _ = dd.simhash_dedup(docs, "text", "doc_id")
    assert kept.count() > 0
