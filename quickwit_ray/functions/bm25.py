"""BM25 scoring math, pinned to the reference's golden literals.

The reference's scoring semantics (verified against the exact score
literals in `quickwit/quickwit-search/src/tests.rs:616-706`, e.g.
`title:one` over the 3-doc corpus -> scores 0.1738279 / 0.15965714 /
0.12343242):

  idf(term)   = ln(1 + (N - df + 0.5) / (df + 0.5))          # per SPLIT stats
  tf_norm     = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
  score       = idf * tf_norm,    k1 = 1.2, b = 0.75

with:
  * N, df, avgdl computed per split (no global IDF exchange —
    docs/overview/concepts/querying.md:107),
  * avgdl = exact total_num_tokens / num_docs for the field,
  * dl     = the document length AFTER round-tripping through the 1-byte
    fieldnorm quantization (Lucene SmallFloat byte4 scheme, which tantivy's
    fieldnorm code mirrors): exact for lengths 0..7, then a 4-bit-mantissa
    floating representation (8..15 exact, 16..31 step 2, ...). This
    quantization is load-bearing for reproducing exact reference scores.
  * record=basic fields score with tf == 1.

All functions are numpy-vectorized.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def _build_fieldnorm_table() -> np.ndarray:
    """256 decoded fieldnorm values: id -> smallest length mapping to id.

    Lucene SmallFloat byte4 decode: ids 0..7 are the subnormal values 0..7;
    for id >= 8, bits = id & 7, shift = (id >> 3) - 1,
    value = (bits | 8) << shift.
    """
    table = np.empty(256, np.int64)
    for i in range(256):
        bits = i & 0x07
        shift = (i >> 3) - 1
        table[i] = bits if shift == -1 else (bits | 0x08) << shift
    return table


FIELDNORM_TABLE = _build_fieldnorm_table()  # id -> decoded doc length


def fieldnorm_to_id(lengths: np.ndarray) -> np.ndarray:
    """Quantize exact doc lengths to 1-byte fieldnorm ids (floor semantics:
    the largest id whose decoded value <= length)."""
    lengths = np.asarray(lengths, np.int64)
    ids = np.searchsorted(FIELDNORM_TABLE, lengths, side="right") - 1
    return np.clip(ids, 0, 255).astype(np.uint8)


def id_to_fieldnorm(ids: np.ndarray) -> np.ndarray:
    """Decode 1-byte fieldnorm ids back to (quantized) doc lengths."""
    return FIELDNORM_TABLE[np.asarray(ids, np.int64)]


_F1 = np.float32(1.0)
_F05 = np.float32(0.5)


def idf(df: float | np.ndarray, num_docs: float) -> np.float32:
    """Per-split inverse document frequency — f32 arithmetic like the
    reference engine (whose Score type is f32; the golden literals only
    reproduce under f32 rounding)."""
    x = (np.float32(num_docs - df) + _F05) / (np.float32(df) + _F05)
    return np.log(_F1 + x, dtype=np.float32)


def bm25_scores(tf: np.ndarray, norm_ids: np.ndarray, df: float,
                num_docs: float, avgdl: float,
                k1: float = K1, b: float = B) -> np.ndarray:
    """Full per-posting f32 score vector for one term within one split.

    score = weight * tf / (tf + cache[norm_id]) with
    weight = idf * (1 + k1), cache = k1 * (1 - b + b * dl / avgdl),
    every step rounded to f32 (this reproduces the reference's exact
    score literals, e.g. 0.1738279 for the 3-doc golden corpus).
    """
    k1f, bf = np.float32(k1), np.float32(b)
    dl = id_to_fieldnorm(norm_ids).astype(np.float32)
    weight = np.float32(idf(df, num_docs) * (_F1 + k1f))
    cache = (k1f * (_F1 - bf + bf * dl / np.float32(avgdl))).astype(np.float32)
    tf32 = np.asarray(tf, np.float32)
    return weight * (tf32 / (tf32 + cache))


def bm25_max_score(max_tf: float, df: float, num_docs: float, avgdl: float,
                   k1: float = K1, b: float = B) -> float:
    """Upper bound of the score any posting of this term can reach —
    dl -> 0 maximizes the tf factor. Used for term-level MaxScore /
    block-max pruning (per-block variant uses the stored per-block max tf)."""
    tf_norm = max_tf * (k1 + 1.0) / (max_tf + k1 * (1.0 - b))
    # (1 + 1e-6) margin absorbs f32 rounding of the actual scores
    return float(idf(df, num_docs)) * tf_norm * (1.0 + 1e-6)
