"""Deterministic synthetic `pages` table (FIXTURES.md §1) — the canonical
input shape from BASELINE.json input_hint:

    (url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)

Seeded, fully reproducible, no external data. One parquet file per input
partition (>=4x partitions per core at bench scale is the caller's
responsibility via num_files).
"""

from __future__ import annotations

import json
import os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 50_000
ZIPF_S = 1.1
PLANTED_PHRASES = ["intial commit", "white sandy beach"]
LANGS = np.array(["en", "de", "fr", "es", "zh"])
LANG_WEIGHTS = np.array([0.90, 0.04, 0.03, 0.02, 0.01])
EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch micros


def _vocab() -> np.ndarray:
    # deterministic pseudo-words: w{k} with a letter prefix spreading the
    # dictionary (so prefix/wildcard queries have non-trivial matches)
    letters = "abcdefghijklmnopqrstuvwxyz"
    return np.array([f"{letters[k % 26]}{letters[(k // 26) % 26]}term{k}"
                     for k in range(VOCAB_SIZE)], object)


def _zipf_cdf() -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_S)
    return np.cumsum(w) / w.sum()


def _base36(i: int) -> str:
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    if i == 0:
        return "0"
    out = []
    while i:
        i, r = divmod(i, 36)
        out.append(digits[r])
    return "".join(reversed(out))


def generate_pages_file(path: str, start_row: int, num_rows: int, seed: int = 42,
                        filler_bytes: int = 65_536, filler_every: int = 97,
                        mean_tokens: int = 200) -> None:
    """Generate rows [start_row, start_row+num_rows) of the pages table.
    Row content depends only on (seed, absolute row index, mean_tokens).
    ``mean_tokens`` scales the lognormal doc length (median token count)
    — the 10M-doc split-target validation uses a doc-size-scaled proxy
    (short docs, same vocabulary/skew) to hit real 10M-doc splits."""
    rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + start_row))
    vocab = _vocab()
    cdf = _zipf_cdf()
    idx = np.arange(start_row, start_row + num_rows, dtype=np.int64)

    # hosts: Zipf over ~1k hosts (partition-skew realism)
    host_cdf = np.cumsum(1.0 / np.power(np.arange(1, 1001, dtype=np.float64), 1.2))
    host_cdf /= host_cdf[-1]
    host_ids = np.searchsorted(host_cdf, rng.random(num_rows))
    urls = np.array([f"https://host{h}.example/{_base36(int(i))}"
                     for h, i in zip(host_ids, idx)], object)

    warc_ts = EPOCH_2024_US + idx * 37_000_000  # +37s per row, micros

    # text: lognormal token count, median ~200
    lens = np.maximum(1, rng.lognormal(mean=np.log(mean_tokens), sigma=0.6,
                                       size=num_rows)).astype(np.int64)
    total = int(lens.sum())
    tok_ids = np.searchsorted(cdf, rng.random(total))
    words = vocab[tok_ids]
    bounds = np.concatenate([[0], np.cumsum(lens)])
    texts = np.empty(num_rows, object)
    for j in range(num_rows):
        texts[j] = " ".join(words[bounds[j]: bounds[j + 1]])
    # rare term per ~10th doc, planted phrases in ~1% of docs
    for j in range(num_rows):
        i = int(idx[j])
        if i % 10 == 0:
            texts[j] = texts[j] + f" rareterm{i}"
        if i % 101 == 0:
            texts[j] = PLANTED_PHRASES[i % len(PLANTED_PHRASES)] + " " + texts[j]

    langs = LANGS[np.searchsorted(np.cumsum(LANG_WEIGHTS), rng.random(num_rows))]

    htmls = np.empty(num_rows, object)
    filler = b"x" * filler_bytes
    for j in range(num_rows):
        title = f"doc {int(idx[j])}"
        body = texts[j]
        h = f"<html><head><title>{title}</title></head><body><p>{body}</p></body></html>".encode()
        if int(idx[j]) % filler_every == 0:
            h += filler  # wide-record row
        htmls[j] = h

    table = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs.astype(object), pa.string()),
    })
    pq.write_table(table, path, compression="zstd", compression_level=1)


def ensure_pages(out_dir: str, num_docs: int, num_files: int, seed: int = 42,
                 filler_bytes: int = 65_536, mean_tokens: int = 200,
                 parallel: bool = False) -> list[str]:
    """Generate (or reuse) a pages corpus: num_files parquet partitions.
    A marker file records the parameters; mismatched parameters regenerate.
    ``parallel=True`` fans file generation out over Ray tasks (the 10M-doc
    proxy corpus is CPU-bound on the per-doc join loop; single-node /tmp
    here, shared storage on a real cluster)."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_PAGES_SPEC.json")
    spec = {"num_docs": num_docs, "num_files": num_files, "seed": seed,
            "filler_bytes": filler_bytes, "mean_tokens": mean_tokens,
            "version": 2}
    paths = [os.path.join(out_dir, f"pages-{k:05d}.parquet")
             for k in range(num_files)]
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == spec and all(os.path.exists(p) for p in paths):
                return paths
    per = num_docs // num_files
    jobs = []
    start = 0
    for k, p in enumerate(paths):
        n = per if k < num_files - 1 else num_docs - per * (num_files - 1)
        jobs.append((p, start, n))
        start += n
    if parallel:
        import ray

        gen = ray.remote(num_cpus=1)(generate_pages_file)
        ray.get([gen.remote(p, s, n, seed=seed, filler_bytes=filler_bytes,
                            mean_tokens=mean_tokens) for p, s, n in jobs])
    else:
        for p, s, n in jobs:
            generate_pages_file(p, s, n, seed=seed, filler_bytes=filler_bytes,
                                mean_tokens=mean_tokens)
    with open(marker, "w") as f:
        json.dump(spec, f)
    return paths
