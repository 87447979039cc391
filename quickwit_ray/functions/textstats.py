"""Text-analysis kernels for large-scale training-data pipelines:
language-ID (stopword/char-class heuristic), quality scoring, token
counting, and document fingerprinting.

Round-2: genuinely vectorized. Per row there is at most one C regex call;
all per-WORD work (stopword membership, lengths, hashing, rolling
windows) runs over the concatenated word stream with factorize/reduceat —
the same joined-stream discipline as tokenize_batch. No Python loop ever
iterates words in a hot path."""

from __future__ import annotations

import re
from itertools import chain

import numpy as np

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "was",
           "on", "are", "with", "as", "be", "at", "this", "have", "from"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
           "auf", "für", "von", "dem", "den", "des", "im", "zu", "sich"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "dans",
           "pour", "que", "qui", "sur", "avec", "pas", "au", "ce"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "en",
           "que", "por", "con", "para", "no", "se", "del", "su"},
}
_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
_CJK_RE = re.compile("[㐀-鿿\U00020000-\U0002ceaf]")
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
_DIGIT_RE = re.compile(r"\d")
# BPE-ish token heuristic: word pieces, numbers, or single non-space symbols
_BPE_RE = re.compile(r"[^\W\d_]+|\d+|[^\w\s]", re.UNICODE)

_LANGS = tuple(_STOPWORDS)


def _word_stream(texts, per_row_cap: int | None = None):
    """(counts, all_words, starts): one C findall per row, then a single
    concatenated object stream with row boundaries."""
    n = len(texts)
    lists = [_WORD_RE.findall(t or "")[: per_row_cap] for t in texts]
    counts = np.fromiter(map(len, lists), np.int64, count=n)
    total = int(counts.sum())
    allw = np.fromiter(chain.from_iterable(lists), object, count=total)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return counts, allw, starts


def detect_language(texts) -> np.ndarray:
    """n-gram/stopword heuristic language id -> 'en'/'de'/'fr'/'es'/'zh'/'und'.

    Vectorized: one findall per row, ONE stopword-membership pass over the
    unique vocabulary (factorize), per-row per-language counts by
    reduceat, argmax over the language axis."""
    import pandas as pd

    n = len(texts)
    out = np.full(n, "und", object)
    if n == 0:
        return out
    cjk = np.fromiter((len(_CJK_RE.findall(t or "")) for t in texts),
                      np.int64, count=n)
    lens = np.fromiter((len(t or "") for t in texts), np.int64, count=n)
    is_zh = (lens > 0) & (cjk / np.maximum(lens, 1) > 0.2)
    counts, allw, starts = _word_stream(texts, per_row_cap=200)
    if len(allw):
        codes, uniq = pd.factorize(allw)
        # recode to the LOWERCASED vocabulary: the heuristic counts
        # DISTINCT lowercased stopwords per row (set-intersection
        # semantics), so 'De' and 'de' must collapse to one hit
        lower_codes_of_uniq, uniq_l = pd.factorize(
            np.asarray([u.lower() for u in uniq], object))
        lcodes = lower_codes_of_uniq[codes]
        lang_counts = np.zeros((n, len(_LANGS)), np.int64)
        # dedupe (row, lowered-code) pairs so set-semantics hold
        row_of = np.repeat(np.arange(n), counts)
        pair_key = row_of.astype(np.int64) * (len(uniq_l) + 1) + lcodes
        uniq_pairs = np.unique(pair_key)
        u_rows = uniq_pairs // (len(uniq_l) + 1)
        u_codes = uniq_pairs % (len(uniq_l) + 1)
        for li, lang in enumerate(_LANGS):
            sw = _STOPWORDS[lang]
            member = np.fromiter((u in sw for u in uniq_l), bool,
                                 count=len(uniq_l))
            hits = member[u_codes]
            np.add.at(lang_counts[:, li], u_rows[hits], 1)
        best = np.argmax(lang_counts, axis=1)
        best_n = lang_counts[np.arange(n), best]
        has_words = counts > 0
        sel = has_words & (best_n >= 1)
        out[sel] = np.asarray(_LANGS, object)[best[sel]]
    out[is_zh] = "zh"
    return out


def token_counts(texts, mode: str = "bpe") -> np.ndarray:
    """Token counting: 'whitespace' or 'bpe' (regex word-piece heuristic)."""
    pat = _BPE_RE if mode == "bpe" else re.compile(r"\S+")
    return np.fromiter((len(pat.findall(t or "")) for t in texts), np.int64,
                       count=len(texts))


def quality_scores(texts) -> dict[str, np.ndarray]:
    """Heuristic document-quality features + a combined [0,1] score:
    length, mean word length, stopword ratio, punctuation ratio, digit
    ratio (C4/Gopher-style rule features). Vectorized over the word
    stream (factorize + reduceat; no per-word Python)."""
    import pandas as pd

    n = len(texts)
    n_chars = np.fromiter((len(t or "") for t in texts), np.int64, count=n)
    mean_word_len = np.zeros(n, np.float64)
    stop_ratio = np.zeros(n, np.float64)
    punct = np.fromiter((len(_PUNCT_RE.findall(t or "")) for t in texts),
                        np.int64, count=n)
    digits = np.fromiter((len(_DIGIT_RE.findall(t or "")) for t in texts),
                         np.int64, count=n)
    counts, allw, starts = _word_stream(texts)
    n_words = counts
    nz = counts > 0
    if nz.any():
        wlens = np.fromiter(map(len, allw), np.int64, count=len(allw))
        sum_lens = np.add.reduceat(wlens, starts[nz])
        mean_word_len[nz] = sum_lens / counts[nz]
        codes, uniq = pd.factorize(allw)
        en_stop = _STOPWORDS["en"]
        member = np.fromiter((u.lower() in en_stop for u in uniq), bool,
                             count=len(uniq))
        is_stop = member[codes].astype(np.int64)
        stop_ratio[nz] = np.add.reduceat(is_stop, starts[nz]) / counts[nz]
    has_chars = n_chars > 0
    punct_ratio = np.where(has_chars, punct / np.maximum(n_chars, 1), 0.0)
    digit_ratio = np.where(has_chars, digits / np.maximum(n_chars, 1), 0.0)
    # combined score: reasonable length, word shape, some stopwords, low punct
    length_ok = np.clip(n_words / 50.0, 0, 1) * np.clip((20_000 - n_chars) / 20_000, 0, 1)
    wordlen_ok = np.exp(-0.5 * ((mean_word_len - 5.0) / 3.0) ** 2)
    score = np.clip(0.4 * length_ok + 0.3 * wordlen_ok
                    + 0.2 * np.clip(stop_ratio * 5, 0, 1)
                    + 0.1 * (1 - np.clip(punct_ratio * 5, 0, 1)), 0, 1)
    return {"n_chars": n_chars, "n_words": n_words, "mean_word_len": mean_word_len,
            "stopword_ratio": stop_ratio, "punct_ratio": punct_ratio,
            "digit_ratio": digit_ratio, "quality_score": score}


def fingerprints(texts, window: int = 8) -> np.ndarray:
    """Rolling-hash document fingerprint: hash of the multiset of rolling
    word-window hashes (shift-invariant content fingerprint).

    Vectorized: one hash pass over the concatenated lowercased word
    stream; rolling windows computed globally with windows that straddle a
    row boundary masked out; xor is commutative, so the per-row reduce is
    one bitwise_xor.reduceat."""
    import pandas as pd

    n = len(texts)
    out = np.zeros(n, np.uint64)
    if n == 0:
        return out
    lists = [(t or "").lower().split() for t in texts]
    counts = np.fromiter(map(len, lists), np.int64, count=n)
    total = int(counts.sum())
    if total == 0:
        return out
    allw = np.fromiter(chain.from_iterable(lists), object, count=total)
    from quickwit_ray.functions.stablehash import hash_word_stream

    h = hash_word_stream(allw)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    row_of = np.repeat(np.arange(n), counts)

    # small rows (< window words): xor of all word hashes
    small = (counts > 0) & (counts < window)
    if small.any():
        xors = np.bitwise_xor.reduceat(h, starts[counts > 0])
        nz_rows = np.nonzero(counts > 0)[0]
        m = counts[nz_rows] < window
        out[nz_rows[m]] = xors[m] ^ counts[nz_rows[m]].astype(np.uint64)

    big = counts >= window
    if big.any():
        # global rolling xor-rotate windows over the whole stream
        n_roll = total - window + 1
        if n_roll > 0:
            roll = np.zeros(n_roll, np.uint64)
            for k in range(window):
                seg = h[k: n_roll + k]
                r = k % 63
                if r:
                    roll ^= (seg << np.uint64(r)) | (seg >> np.uint64(64 - r))
                else:
                    roll ^= (seg << np.uint64(0)) | (seg >> np.uint64(63))
            # a window starting at j is valid iff it stays in one row (xor
            # with 0 is identity, so invalid entries are just zeroed)
            valid = row_of[: n_roll] == row_of[window - 1:]
            roll_masked = np.where(valid, roll, np.uint64(0))
            big_rows = np.nonzero(big)[0]
            a = starts[big_rows]
            b = np.minimum(a + counts[big_rows] - window + 1, n_roll)
            # per-row xor via ONE reduceat over interleaved [a,b) bounds:
            # even segments are the row reduces, odd segments are discarded
            bounds = np.empty(2 * len(a), np.int64)
            bounds[0::2] = a
            bounds[1::2] = b
            # reduceat indices must be < len: extend with one xor-identity
            # sentinel so end bounds equal to n_roll stay valid
            roll_ext = np.append(roll_masked, np.uint64(0))
            red = np.bitwise_xor.reduceat(roll_ext, bounds)
            vals = np.where(b > a, red[0::2], np.uint64(0))
            out[big_rows] = vals ^ counts[big_rows].astype(np.uint64)
    return out
