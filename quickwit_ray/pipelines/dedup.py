"""Deduplication pipelines over a Ray Dataset of documents.

All variants follow the partial-before-shuffle discipline:
  * exact:    vectorized content-hash per batch -> groupby(hash) -> keep
              first (min id). One shuffle, keyed on the 64-bit hash.
  * minhash:  per-batch vectorized shingle->minhash (128 perms) ->
              explode to (band, band_hash, id) rows -> groupby on the
              LSH bucket -> candidate pairs -> exact-Jaccard verify ->
              union-find over the (small) surviving pair set.
  * simhash:  64-bit simhash per batch -> band buckets -> hamming verify.
  * ngram:    word n-gram Jaccard verification used by both.
  * embedding: random-hyperplane LSH buckets -> within-bucket cosine.

Scale note: the only all-to-all exchanges are groupbys on
well-distributed hash keys; candidate verification happens inside the
bucket groups; only the candidate PAIR list (tiny vs corpus) reaches the
driver for the union-find.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

NUM_PERMS = 128
NUM_BANDS = 16  # 16 bands x 8 rows -> catches jaccard ~>0.7
ROWS_PER_BAND = NUM_PERMS // NUM_BANDS
_MERSENNE = (1 << 61) - 1


def _perm_params(seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, NUM_PERMS, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, NUM_PERMS, dtype=np.int64).astype(np.uint64)
    return a, b


def content_hashes(texts) -> np.ndarray:
    """Stable 64-bit content hash per text (exact dedup key)."""
    return pd.util.hash_array(np.asarray(texts, object)).astype(np.uint64)


def word_shingles(text: str, k: int = 5) -> np.ndarray:
    words = (text or "").lower().split()
    if len(words) < k:
        return pd.util.hash_array(np.asarray([" ".join(words)], object)).astype(np.uint64)
    sh = np.asarray([" ".join(words[i: i + k]) for i in range(len(words) - k + 1)],
                    object)
    return pd.util.hash_array(sh).astype(np.uint64)


def minhash_signatures(texts, k: int = 5, seed: int = 7) -> np.ndarray:
    """(n_docs, NUM_PERMS) uint64 minhash signature matrix, vectorized via
    reduceat over the concatenated shingle-hash stream."""
    a, b = _perm_params(seed)
    hashes = []
    bounds = [0]
    for t in texts:
        h = word_shingles(t, k)
        hashes.append(h)
        bounds.append(bounds[-1] + len(h))
    if not hashes:
        return np.empty((0, NUM_PERMS), np.uint64)
    allh = np.concatenate(hashes)
    starts = np.asarray(bounds[:-1])
    sig = np.empty((len(texts), NUM_PERMS), np.uint64)
    # loop over 128 perms (vectorized over the whole token stream each time)
    for p in range(NUM_PERMS):
        t = (allh * a[p] + b[p]) % np.uint64(_MERSENNE)
        sig[:, p] = np.minimum.reduceat(t, starts)
    return sig


def band_hashes(sig: np.ndarray) -> np.ndarray:
    """(n_docs, NUM_BANDS) uint64: hash per LSH band of the signature."""
    n = sig.shape[0]
    out = np.empty((n, NUM_BANDS), np.uint64)
    for bnd in range(NUM_BANDS):
        seg = sig[:, bnd * ROWS_PER_BAND: (bnd + 1) * ROWS_PER_BAND]
        acc = np.zeros(n, np.uint64)
        for c in range(ROWS_PER_BAND):
            acc = acc * np.uint64(1_000_003) + seg[:, c]
        out[:, bnd] = acc
    return out


def jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = set(word_shingles(a, k).tolist()), set(word_shingles(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def simhash64(texts) -> np.ndarray:
    """64-bit SimHash over word hashes (unweighted)."""
    out = np.zeros(len(texts), np.uint64)
    bit_cols = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        words = (t or "").lower().split()
        if not words:
            continue
        h = pd.util.hash_array(np.asarray(words, object)).astype(np.uint64)
        bits = ((h[:, None] >> bit_cols) & np.uint64(1)).astype(np.int64)
        v = bits.sum(0) * 2 - len(h)
        out[i] = np.uint64(((v > 0).astype(np.uint64) << bit_cols).sum())
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(x.shape, np.int64)
    while np.any(x):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


class UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != self.parent.get(p, p):
            self.parent[p] = self.parent.get(self.parent[p], self.parent[p])
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if rb < ra:  # keep the smallest id as the root (keep-first)
                ra, rb = rb, ra
            self.parent[rb] = ra



def _ensure_pair_cols(pair_df: pd.DataFrame) -> pd.DataFrame:
    """All-empty map_groups output can lose the schema; restore it."""
    if "a" not in pair_df.columns or "b" not in pair_df.columns:
        return pd.DataFrame({"a": [], "b": []})
    return pair_df

# ---------------------------------------------------------------------------
# Ray Dataset pipelines
# ---------------------------------------------------------------------------

def exact_dedup(ds, text_col: str, id_col: str):
    """Keep the min-id row per exact text value. One hash-keyed shuffle."""
    import pyarrow as pa

    def add_hash(batch: pa.Table) -> pa.Table:
        h = content_hashes(batch[text_col].to_pylist())
        return batch.append_column("_h", pa.array(h, pa.uint64()))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.loc[[g[id_col].idxmin()]]

    out = (ds.map_batches(add_hash, batch_format="pyarrow")
             .groupby("_h")
             .map_groups(keep_first, batch_format="pandas"))
    return out.drop_columns(["_h"])


def _candidate_pairs_from_buckets(bucket_rows: pd.DataFrame, id_col: str
                                  ) -> set[tuple]:
    pairs: set[tuple] = set()
    ids = sorted(bucket_rows[id_col].tolist())
    for i in range(len(ids)):
        for j in range(i + 1, min(i + 16, len(ids))):  # cap fanout per bucket
            pairs.add((ids[i], ids[j]))
    return pairs


def minhash_dedup(ds, text_col: str, id_col: str, threshold: float = 0.7,
                  k: int = 5):
    """MinHash+LSH near-dup detection. Returns (keep_dataset, clusters)
    where clusters maps duplicate id -> kept (root) id."""
    import pyarrow as pa

    def sig_bands(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        sig = minhash_signatures(texts, k)
        bh = band_hashes(sig)
        n = len(texts)
        return pa.table({
            id_col: pa.array(np.repeat(ids, NUM_BANDS)),
            "band": pa.array(np.tile(np.arange(NUM_BANDS), n), pa.int32()),
            "bh": pa.array(bh.reshape(-1), pa.uint64()),
        })

    banded = ds.map_batches(sig_bands, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": []})
        pairs = _candidate_pairs_from_buckets(g, id_col)
        if not pairs:
            return pd.DataFrame({"a": [], "b": []})
        a, b = zip(*pairs)
        return pd.DataFrame({"a": list(a), "b": list(b)})

    pair_ds = banded.groupby(["band", "bh"]).map_groups(bucket_pairs,
                                                        batch_format="pandas")
    pair_df = _ensure_pair_cols(pair_ds.to_pandas()).drop_duplicates()

    # verification needs the texts of candidate ids only: broadcast the
    # (tiny) candidate id set and semi-join it inside map_batches
    cand_ids = set(pair_df["a"]) | set(pair_df["b"])

    def pick_candidates(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[id_col].isin(cand_ids)][[id_col, text_col]]

    texts_df = (ds.map_batches(pick_candidates, batch_format="pandas")
                .to_pandas()) if cand_ids else pd.DataFrame({id_col: [], text_col: []})
    texts_map = dict(zip(texts_df[id_col], texts_df[text_col]))
    uf = UnionFind()
    for a, b in zip(pair_df["a"], pair_df["b"]):
        if a in texts_map and b in texts_map \
                and jaccard(texts_map[a], texts_map[b], k) >= threshold:
            uf.union(a, b)
    clusters = {x: uf.find(x) for x in list(uf.parent)}
    dups = {x for x, root in clusters.items() if x != root}

    def drop_dups(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[~batch[id_col].isin(dups)]

    return ds.map_batches(drop_dups, batch_format="pandas"), clusters


def simhash_dedup(ds, text_col: str, id_col: str, max_hamming: int = 3):
    """SimHash near-dup: 4x16-bit band buckets, hamming-verify in bucket."""
    import pyarrow as pa

    def sim_bands(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        sh = simhash64(texts)
        rows_id, rows_band, rows_key, rows_sim = [], [], [], []
        for bnd in range(4):
            key = (sh >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)
            rows_id.extend(ids)
            rows_band.extend([bnd] * len(ids))
            rows_key.extend(key.tolist())
            rows_sim.extend(sh.tolist())
        return pa.table({
            id_col: pa.array(rows_id),
            "band": pa.array(rows_band, pa.int32()),
            "key": pa.array(rows_key, pa.uint64()),
            "sim": pa.array(rows_sim, pa.uint64()),
        })

    banded = ds.map_batches(sim_bands, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": []})
        g = g.sort_values(id_col).head(64)
        ids = g[id_col].to_numpy()
        sims = g["sim"].to_numpy(dtype=np.uint64)
        out_a, out_b = [], []
        for i in range(len(ids)):
            d = hamming64(sims[i], sims[i + 1:])
            for j in np.nonzero(d <= max_hamming)[0]:
                out_a.append(ids[i])
                out_b.append(ids[i + 1 + j])
        return pd.DataFrame({"a": out_a, "b": out_b})

    pair_df = _ensure_pair_cols(
        banded.groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()).drop_duplicates()
    uf = UnionFind()
    for a, b in zip(pair_df["a"], pair_df["b"]):
        uf.union(a, b)
    clusters = {x: uf.find(x) for x in list(uf.parent)}
    dups = {x for x, root in clusters.items() if x != root}

    def drop_dups(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[~batch[id_col].isin(dups)]

    return ds.map_batches(drop_dups, batch_format="pandas"), clusters


def ngram_jaccard_dedup(ds, text_col: str, id_col: str, threshold: float = 0.8,
                        k: int = 5, sample_mod: int = 8):
    """Exact n-gram-Jaccard near-dup detection WITHOUT minhash: candidate
    pairs come from sharing any SAMPLED shingle (hash % sample_mod == 0 —
    a 1/sample_mod document-independent shingle sample, so near-dups share
    many sampled shingles with high probability), then pairs verify with
    the exact Jaccard over full shingle sets. Returns (keep_ds, clusters)."""
    import pyarrow as pa

    def sampled_shingles(batch: pa.Table) -> pa.Table:
        ids_out, sh_out = [], []
        for rid, text in zip(batch[id_col].to_pylist(),
                             batch[text_col].to_pylist()):
            h = word_shingles(text, k)
            sel = h[h % np.uint64(sample_mod) == 0]
            ids_out.extend([rid] * len(sel))
            sh_out.extend(sel.tolist())
        return pa.table({id_col: pa.array(ids_out),
                         "sh": pa.array(sh_out, pa.uint64())})

    exploded = ds.map_batches(sampled_shingles, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": []})
        pairs = _candidate_pairs_from_buckets(g, id_col)
        if not pairs:
            return pd.DataFrame({"a": [], "b": []})
        a, b = zip(*pairs)
        return pd.DataFrame({"a": list(a), "b": list(b)})

    pair_df = _ensure_pair_cols(
        exploded.groupby("sh").map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()).drop_duplicates()
    cand_ids = set(pair_df["a"]) | set(pair_df["b"])

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[id_col].isin(cand_ids)][[id_col, text_col]]

    texts_df = (ds.map_batches(pick, batch_format="pandas").to_pandas()
                if cand_ids else pd.DataFrame({id_col: [], text_col: []}))
    texts_map = dict(zip(texts_df[id_col], texts_df[text_col]))
    uf = UnionFind()
    for a, b in zip(pair_df["a"], pair_df["b"]):
        if a in texts_map and b in texts_map \
                and jaccard(texts_map[a], texts_map[b], k) >= threshold:
            uf.union(a, b)
    clusters = {x: uf.find(x) for x in list(uf.parent)}
    dups = {x for x, root in clusters.items() if x != root}

    def drop_dups(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[~batch[id_col].isin(dups)]

    return ds.map_batches(drop_dups, batch_format="pandas"), clusters


def embedding_dedup(ds, vec_col: str, id_col: str, threshold: float = 0.95,
                    num_planes: int = 16, seed: int = 11):
    """Embedding near-dup: random-hyperplane LSH bucket -> within-bucket
    cosine >= threshold -> union-find keep-first."""
    import pyarrow as pa

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch[vec_col].to_pylist(), np.float32)
        ids = batch[id_col].to_pylist()
        rng = np.random.Generator(np.random.PCG64(seed))
        planes = rng.standard_normal((vecs.shape[1], num_planes)).astype(np.float32)
        bits = (vecs @ planes) > 0
        key = np.zeros(len(ids), np.uint64)
        for c in range(num_planes):
            key = (key << np.uint64(1)) | bits[:, c].astype(np.uint64)
        return pa.table({
            id_col: pa.array(ids),
            "key": pa.array(key, pa.uint64()),
            "vec": batch[vec_col],
        })

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": []})
        g = g.sort_values(id_col).head(256)
        v = np.asarray(g["vec"].tolist(), np.float32)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-9)
        sims = v @ v.T
        ids = g[id_col].to_numpy()
        iu = np.triu_indices(len(ids), 1)
        hit = sims[iu] >= threshold
        return pd.DataFrame({"a": ids[iu[0][hit]], "b": ids[iu[1][hit]]})

    pair_df = _ensure_pair_cols(
        bucketed.groupby("key").map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()).drop_duplicates()
    uf = UnionFind()
    for a, b in zip(pair_df["a"], pair_df["b"]):
        uf.union(a, b)
    clusters = {x: uf.find(x) for x in list(uf.parent)}
    dups = {x for x, root in clusters.items() if x != root}

    def drop_dups(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[~batch[id_col].isin(dups)]

    return ds.map_batches(drop_dups, batch_format="pandas"), clusters
