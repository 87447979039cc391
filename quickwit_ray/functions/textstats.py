"""Text-analysis kernels for large-scale training-data pipelines:
language-ID (stopword/char-class heuristic), quality scoring, token
counting, and document fingerprinting. All vectorized over batches."""

from __future__ import annotations

import re

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
_CJK_RE = re.compile("[\u3400-\u9fff\U00020000-\U0002ceaf]")
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
_DIGIT_RE = re.compile(r"\d")
# BPE-ish token heuristic: word pieces, numbers, or single non-space symbols
_BPE_RE = re.compile(r"[^\W\d_]+|\d+|[^\w\s]", re.UNICODE)


def detect_language(texts) -> np.ndarray:
    """n-gram/stopword heuristic language id -> 'en'/'de'/'fr'/'es'/'zh'/'und'."""
    out = np.empty(len(texts), object)
    for i, t in enumerate(texts):
        t = t or ""
        if len(t) and len(_CJK_RE.findall(t)) / max(len(t), 1) > 0.2:
            out[i] = "zh"
            continue
        words = [w.lower() for w in _WORD_RE.findall(t)[:200]]
        if not words:
            out[i] = "und"
            continue
        ws = set(words)
        best, best_n = "und", 0
        for lang, sw in _STOPWORDS.items():
            n = len(ws & sw)
            if n > best_n:
                best, best_n = lang, n
        out[i] = best if best_n >= 1 else "und"
    return out


def token_counts(texts, mode: str = "bpe") -> np.ndarray:
    """Token counting: 'whitespace' or 'bpe' (regex word-piece heuristic)."""
    pat = _BPE_RE if mode == "bpe" else re.compile(r"\S+")
    return np.fromiter((len(pat.findall(t or "")) for t in texts), np.int64,
                       count=len(texts))


def quality_scores(texts) -> dict[str, np.ndarray]:
    """Heuristic document-quality features + a combined [0,1] score:
    length, mean word length, stopword ratio, punctuation ratio, digit
    ratio (C4/Gopher-style rule features)."""
    n = len(texts)
    n_chars = np.zeros(n, np.int64)
    n_words = np.zeros(n, np.int64)
    mean_word_len = np.zeros(n, np.float64)
    stop_ratio = np.zeros(n, np.float64)
    punct_ratio = np.zeros(n, np.float64)
    digit_ratio = np.zeros(n, np.float64)
    en_stop = _STOPWORDS["en"]
    for i, t in enumerate(texts):
        t = t or ""
        n_chars[i] = len(t)
        words = _WORD_RE.findall(t)
        n_words[i] = len(words)
        if words:
            mean_word_len[i] = sum(map(len, words)) / len(words)
            stop_ratio[i] = sum(1 for w in words if w.lower() in en_stop) / len(words)
        if t:
            punct_ratio[i] = len(_PUNCT_RE.findall(t)) / len(t)
            digit_ratio[i] = len(_DIGIT_RE.findall(t)) / len(t)
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
    word-window hashes (shift-invariant content fingerprint)."""
    import pandas as pd

    out = np.zeros(len(texts), np.uint64)
    for i, t in enumerate(texts):
        words = (t or "").lower().split()
        if not words:
            continue
        h = pd.util.hash_array(np.asarray(words, object)).astype(np.uint64)
        if len(h) >= window:
            # rolling xor-rotate window hash
            roll = np.zeros(len(h) - window + 1, np.uint64)
            for k in range(window):
                seg = h[k: len(h) - window + 1 + k]
                roll ^= (seg << np.uint64(k % 63)) | (seg >> np.uint64(64 - (k % 63) if k % 63 else 63))
            out[i] = np.bitwise_xor.reduce(np.sort(roll)) ^ np.uint64(len(words))
        else:
            out[i] = np.bitwise_xor.reduce(np.sort(h)) ^ np.uint64(len(words))
    return out
