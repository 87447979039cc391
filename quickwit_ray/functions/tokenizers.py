"""Tokenizers — behavior-compatible with the reference registry
(`quickwit/quickwit-query/src/tokenizers/mod.rs:36-118`):

  raw              whole value is one token (no lowercase), drop if >255 bytes
  raw_lowercase    whole value lowercased, drop if >255 bytes
  lowercase        alias of raw_lowercase
  default          split on non-alphanumeric (tantivy SimpleTokenizer), drop
                   tokens >255 bytes, lowercase
  en_stem          default + English (Porter) stemmer
  whitespace       split on unicode whitespace (no lowercase, no length filter
                   in the reference registry beyond the 255 cut)
  chinese_compatible  CJK chars become single-char tokens, other runs of
                   alphanumerics group as in `default`
                   (`tokenizers/chinese_compatible.rs`)
  source_code_default  splits identifiers on case/class transitions
                   ("PigCaféFactory2" -> pig, cafe, factory, 2) + lowercase +
                   ascii folding (`tokenizers/code_tokenizer.rs`)

All tokenizers are exposed two ways:
  * ``tokenize(text) -> list[str]`` — exact, per-string (used in tests, query
    parsing, and the conformance oracle).
  * ``tokenize_batch(texts) -> (doc_idx, tokens, positions)`` — vectorized
    over a whole Arrow/numpy batch via the joined-buffer trick: one C regex
    pass over the concatenated batch, numpy searchsorted to map token offsets
    back to rows. This is the indexing hot path.

The 255-*byte* length cut mirrors
`tokenizers/mod.rs:33` (DEFAULT_REMOVE_TOKEN_LENGTH = 255: tokens of len
>= 255 bytes are removed; tantivy RemoveLongFilter drops tokens whose
byte-length >= limit).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Callable, Iterable

import numpy as np

MAX_TOKEN_BYTES = 255  # DEFAULT_REMOVE_TOKEN_LENGTH (tokenizers/mod.rs:33)

# `[^\W_]` ≈ unicode alphanumeric (tantivy SimpleTokenizer splits on
# !char::is_alphanumeric()).  Python \w includes '_', which Rust
# is_alphanumeric rejects, hence the class subtraction.
_SIMPLE_RE = re.compile(r"[^\W_]+", re.UNICODE)
_WHITESPACE_RE = re.compile(r"\S+", re.UNICODE)

# CJK ranges from the reference (`chinese_compatible.rs:41-55`; note the
# first range really is 0x4500 there, not 0x4E00 — reproduce it verbatim).
_CJK_RANGES = ((0x4500, 0x9FFF), (0x3400, 0x4DBF), (0x20000, 0x2A6DF), (0x2A700, 0x2CEAF))
_CJK_CLASS = "".join(f"{chr(a)}-{chr(b)}" for a, b in _CJK_RANGES)
_CHINESE_RE = re.compile(rf"[{_CJK_CLASS}]|[^\W_{_CJK_CLASS}]+", re.UNICODE)

# code tokenizer: split a token stream on case transitions / digit runs.
#  - runs of uppercase followed by lowercase: "HTTPServer" -> HTTP? the
#    reference emits "http", "server"; an uppercase run followed by a
#    lowercase letter contributes its last char to the next token.
_CODE_PART_RE = re.compile(
    r"[0-9]+"  # digit run ("2" in PigCaféFactory2; hex handled separately)
    r"|[^\W\d_]+",  # letter run; split further on case transitions below
    re.UNICODE,
)
_CASE_SPLIT_RE = re.compile(
    r"[A-ZÀ-Ü]+(?![a-zß-ÿ])"  # ALLCAPS run not followed by lowercase
    r"|[A-ZÀ-Ü][^A-ZÀ-Ü\W\d_]*"  # Capitalized word
    r"|[^A-ZÀ-Ü\W\d_]+",  # lowercase run
    re.UNICODE,
)
_HEX_RE = re.compile(r"^[0-9a-fA-F]{16,}$")


def _ascii_fold(s: str) -> str:
    """ASCII folding filter: strip diacritics (é->e). NFKD + drop combining."""
    return "".join(c for c in unicodedata.normalize("NFKD", s) if not unicodedata.combining(c))


def _len_ok(tok: str) -> bool:
    return len(tok.encode("utf-8", "ignore")) < MAX_TOKEN_BYTES


# ---------------------------------------------------------------------------
# exact per-string tokenizers
# ---------------------------------------------------------------------------

def tokenize_raw(text: str) -> list[str]:
    return [text] if text and _len_ok(text) else []


def tokenize_raw_lowercase(text: str) -> list[str]:
    return [text.lower()] if text and _len_ok(text) else []


def tokenize_default(text: str) -> list[str]:
    return [t.lower() for t in _SIMPLE_RE.findall(text) if _len_ok(t)]


def tokenize_whitespace(text: str) -> list[str]:
    return [t for t in _WHITESPACE_RE.findall(text) if _len_ok(t)]


def tokenize_chinese_compatible(text: str) -> list[str]:
    return [t.lower() for t in _CHINESE_RE.findall(text) if _len_ok(t)]


def _code_parts(text: str) -> Iterable[str]:
    i, n = 0, len(text)
    for m in re.finditer(r"[^\W_]+", text, re.UNICODE):
        word = m.group()
        if _HEX_RE.match(word):
            # source_code_with_hex keeps long hex literals whole
            yield ("\x01hex", word)
            continue
        for pm in _CODE_PART_RE.finditer(word):
            part = pm.group()
            if part.isdigit():
                yield ("", part)
            else:
                for cm in _CASE_SPLIT_RE.finditer(part):
                    yield ("", cm.group())
    _ = i, n


def tokenize_source_code(text: str, hex_support: bool = False) -> list[str]:
    out: list[str] = []
    for kind, part in _code_parts(text):
        if kind == "\x01hex" and not hex_support:
            # without hex support, a hex run still splits per the normal rules
            for cm in _CASE_SPLIT_RE.finditer(part):
                out.append(cm.group())
            continue
        out.append(part)
    return [_ascii_fold(t.lower()) for t in out if _len_ok(t)]


# --- Porter stemmer (public-domain algorithm; Porter 1980) for en_stem -----

_V = "aeiou"


def _cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _V:
        return False
    if c == "y":
        return i == 0 or not _cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    m, prev_vowel = 0, False
    for i in range(len(stem)):
        v = not _cons(stem, i)
        if not v and prev_vowel:
            m += 1
        prev_vowel = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _double_cons(word: str) -> bool:
    return len(word) >= 2 and word[-1] == word[-2] and _cons(word, len(word) - 1)


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (_cons(word, len(word) - 3) and not _cons(word, len(word) - 2)
            and _cons(word, len(word) - 1)):
        return False
    return word[-1] not in "wxy"


def porter_stem(word: str) -> str:
    """Porter (1980) English stemmer — the algorithm behind the reference's
    en_stem Snowball English default."""
    if len(word) <= 2:
        return word
    w = word
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w, flag = w[:-2], True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w, flag = w[:-3], True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in (("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
                     ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
                     ("alli", "al"), ("entli", "ent"), ("eli", "e"),
                     ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
                     ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
                     ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
                     ("iviti", "ive"), ("biliti", "ble")):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in (("icate", "ic"), ("ative", ""), ("alize", "al"),
                     ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", "")):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous",
                "ive", "ize"):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ent" and w.endswith(("sion", "tion")):
                # handled by "ion" rule below
                pass
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" and _measure(w[:-3]) > 1:
            w = w[:-3]
    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def tokenize_en_stem(text: str) -> list[str]:
    return [porter_stem(t) for t in tokenize_default(text)]


TOKENIZERS: dict[str, Callable[[str], list[str]]] = {
    "raw": tokenize_raw,
    "raw_lowercase": tokenize_raw_lowercase,
    "lowercase": tokenize_raw_lowercase,
    "default": tokenize_default,
    "en_stem": tokenize_en_stem,
    "whitespace": tokenize_whitespace,
    "chinese_compatible": tokenize_chinese_compatible,
    "source_code_default": tokenize_source_code,
    "source_code_with_hex": lambda t: tokenize_source_code(t, hex_support=True),
}


def tokenize(text: str, tokenizer: str = "default") -> list[str]:
    try:
        fn = TOKENIZERS[tokenizer]
    except KeyError:
        raise ValueError(f"unknown tokenizer {tokenizer!r}") from None
    return fn(text)


# ---------------------------------------------------------------------------
# vectorized batch tokenization (the indexing hot path)
# ---------------------------------------------------------------------------

_SEP = "\x00"  # never alphanumeric, never emitted by any tokenizer


def tokenize_batch(texts, tokenizer: str = "default"):
    """Tokenize a batch of strings with ONE regex pass over the joined buffer.

    Parameters
    ----------
    texts : sequence of str (list, numpy array of object/str, pyarrow column
        already converted via ``to_pylist()`` / ``to_numpy(zero_copy_only=False)``)

    Returns
    -------
    (doc_idx, tokens, positions):
        doc_idx   int32 ndarray — row index of each token
        tokens    object ndarray of str — token text (lowercased etc.)
        positions int32 ndarray — token ordinal within its row (for phrase)
    """
    n = len(texts)
    if n == 0:
        return (np.empty(0, np.int32), np.empty(0, object), np.empty(0, np.int32))

    if tokenizer in ("raw", "raw_lowercase", "lowercase"):
        # one token per non-empty value; vectorized via pandas-free numpy path
        toks, idxs = [], []
        lower = tokenizer != "raw"
        for i, t in enumerate(texts):
            if t is not None and t != "" and _len_ok(t):
                toks.append(t.lower() if lower else t)
                idxs.append(i)
        doc_idx = np.asarray(idxs, np.int32)
        return (doc_idx, np.asarray(toks, object), np.zeros(len(toks), np.int32))

    sep = _SEP
    if tokenizer == "default":
        pattern, lower = _SIMPLE_RE, True
    elif tokenizer == "whitespace":
        # the separator must itself be a token breaker: use '\n' here since
        # '\x00' is not unicode whitespace
        pattern, lower, sep = _WHITESPACE_RE, False, "\n"
    elif tokenizer == "chinese_compatible":
        pattern, lower = _CHINESE_RE, True
    elif tokenizer == "en_stem":
        doc_idx, toks, pos = tokenize_batch(texts, "default")
        # stem through a cache — Zipf vocab means most tokens repeat
        uniq, inv = np.unique(toks.astype(object), return_inverse=True) if len(toks) else (toks, toks)
        if len(toks):
            stemmed = np.array([porter_stem(t) for t in uniq], object)
            toks = stemmed[inv]
        return doc_idx, toks, pos
    else:
        # slow path for the exotic tokenizers — per-row exact
        idxs, toks, poss = [], [], []
        fn = TOKENIZERS[tokenizer]
        for i, t in enumerate(texts):
            if not t:
                continue
            row = fn(t)
            toks.extend(row)
            idxs.extend([i] * len(row))
            poss.extend(range(len(row)))
        return (np.asarray(idxs, np.int32), np.asarray(toks, object),
                np.asarray(poss, np.int32))

    from itertools import chain

    parts = [(t if isinstance(t, str) else ("" if t is None else str(t))) for t in texts]
    joined = sep.join(parts)

    # one C findall per row over the ORIGINAL text (the reference filter
    # order is tokenize -> 255-byte cut -> lowercase; lowering first would
    # change token boundaries for case folds that emit combining marks,
    # e.g. 'İ' -> 'i̇')
    fa = pattern.findall
    lists = [fa(p) for p in parts]
    counts = np.fromiter(map(len, lists), np.int64, count=n)
    total = int(counts.sum())
    if total == 0:
        return (np.empty(0, np.int32), np.empty(0, object), np.empty(0, np.int32))
    tokens = np.fromiter(chain.from_iterable(lists), object, count=total)
    doc_idx = np.repeat(np.arange(n, dtype=np.int32), counts)
    offsets = np.repeat(np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    positions = (np.arange(total, dtype=np.int64) - offsets).astype(np.int32)

    # 255-byte cut on PRE-lowercase bytes (reference RemoveLongFilter runs
    # before LowerCaser): numpy byte-run prescan bounds token byte lengths;
    # the per-token check runs only when some run reaches the limit. The
    # breaker byte set depends on the tokenizer: NUL is a separator for the
    # alphanumeric tokenizers but legal inside a whitespace-tokenizer token.
    maybe_long = False
    bts = np.frombuffer(joined.encode("utf-8", "ignore"), np.uint8)
    if len(bts) >= MAX_TOKEN_BYTES:
        is_break = (bts == 32) | (bts == 9) | (bts == 10) | (bts == 13)
        if tokenizer == "whitespace":
            is_break |= (bts == 11) | (bts == 12)
        else:
            is_break |= bts == 0
        sep_pos = np.nonzero(is_break)[0]
        runs = np.diff(np.concatenate([[-1], sep_pos, [len(bts)]])) - 1
        maybe_long = bool(runs.max() >= MAX_TOKEN_BYTES)
    if maybe_long:
        keep = np.ones(total, bool)
        for j, t in enumerate(tokens):
            if len(t) >= MAX_TOKEN_BYTES // 4 \
                    and len(t.encode("utf-8", "ignore")) >= MAX_TOKEN_BYTES:
                keep[j] = False
        if not keep.all():
            doc_idx, tokens = doc_idx[keep], tokens[keep]
            total = len(tokens)
            if total == 0:
                return (doc_idx, tokens, np.empty(0, np.int32))
            # recompute per-row ordinals after the drop
            row_change = np.empty(len(doc_idx), bool)
            row_change[0] = True
            row_change[1:] = doc_idx[1:] != doc_idx[:-1]
            seg_starts = np.nonzero(row_change)[0]
            seg_lens = np.diff(np.append(seg_starts, len(doc_idx)))
            positions = (np.arange(len(doc_idx), dtype=np.int64)
                         - np.repeat(seg_starts, seg_lens)).astype(np.int32)
    if lower and total:
        # lowercase AFTER the cut, on the unique vocabulary only (Zipf:
        # vocab << token count, so this loop is tiny)
        import pandas as pd

        codes, uniq = pd.factorize(tokens)
        lowered = np.asarray([t.lower() for t in uniq], object)
        tokens = lowered[codes]
    return doc_idx, tokens, positions
