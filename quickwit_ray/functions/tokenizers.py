"""Tokenizers — behavior-compatible with the reference registry
(`quickwit/quickwit-query/src/tokenizers/mod.rs:36-118`):

  raw              whole value is one token (no lowercase), drop if >255 bytes
  raw_lowercase    whole value lowercased, drop if >255 bytes
  lowercase        alias of raw_lowercase
  default          split on non-alphanumeric (tantivy SimpleTokenizer), drop
                   tokens >255 bytes, lowercase
  en_stem          default + Snowball English (Porter2) stemmer, matching
                   tantivy Stemmer::new(Language::English) (mod.rs:65)
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


# --- Porter2 / Snowball English stemmer for en_stem -------------------------
# The reference's en_stem is tantivy Stemmer::new(Language::English)
# (tokenizers/mod.rs:65), i.e. Snowball "english" (Porter2), NOT the 1980
# Porter algorithm — they diverge on common words (fairly->fair, ties->tie,
# generously->generous). Implemented from the published Snowball spec.

_SB_VOWELS = "aeiouy"  # 'Y' (marked consonant-y) is NOT in this set
_SB_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_SB_LI_END = "cdeghkmnrt"

_SB_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_SB_EXC2 = frozenset(("inning", "outing", "canning", "herring", "earring",
                      "proceed", "exceed", "succeed"))

_SB_STEP2 = (
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"), ("li", ""),
)
_SB_STEP3 = (
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"), ("icate", "ic"),
    ("iciti", "ic"), ("ative", ""), ("ical", "ic"), ("ness", ""), ("ful", ""),
)
_SB_STEP4 = ("ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
             "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic")


def _sb_regions(w: str) -> tuple[int, int]:
    """R1 = after the first non-vowel following a vowel (with the gener/
    commun/arsen prefix exception); R2 = same rule applied within R1."""
    n = len(w)
    r1 = n
    for p in ("gener", "commun", "arsen"):
        if w.startswith(p):
            r1 = len(p)
            break
    else:
        for i in range(1, n):
            if w[i] not in _SB_VOWELS and w[i - 1] in _SB_VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _SB_VOWELS and w[i - 1] in _SB_VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _sb_ends_short_syllable(w: str) -> bool:
    n = len(w)
    if n == 2:
        return w[0] in _SB_VOWELS and w[1] not in _SB_VOWELS
    return (n >= 3 and w[-2] in _SB_VOWELS and w[-1] not in _SB_VOWELS
            and w[-1] not in "wxY" and w[-3] not in _SB_VOWELS)


def snowball_stem(word: str) -> str:
    """Snowball English (Porter2) stemmer. Input is expected lowercased."""
    w = word
    if len(w) <= 2:
        return w
    if w[0] == "'":
        w = w[1:]
    exc = _SB_EXC1.get(w)
    if exc is not None:
        return exc
    if len(w) <= 2:
        return w
    # mark consonant-y as 'Y' (initial y, or y after a vowel)
    if "y" in w:
        chars = list(w)
        if chars[0] == "y":
            chars[0] = "Y"
        for i in range(1, len(chars)):
            if chars[i] == "y" and chars[i - 1] in _SB_VOWELS:
                chars[i] = "Y"
        w = "".join(chars)
    r1, r2 = _sb_regions(w)
    # step 0: strip 's / ' / 's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if any(c in _SB_VOWELS for c in w[:-2]):
            w = w[:-1]
    if w in _SB_EXC2:
        return w
    # step 1b
    done1b = False
    for suf in ("eedly", "eed"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + "ee"
            done1b = True
            break
    if not done1b:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(c in _SB_VOWELS for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w[-2:] in _SB_DOUBLES:
                        w = w[:-1]
                    elif r1 >= len(w) and _sb_ends_short_syllable(w):
                        w += "e"
                break
    # step 1c: y/Y -> i after a non-vowel that is not the first letter
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _SB_VOWELS:
        w = w[:-1] + "i"
    # step 2 (longest suffix; apply only if it sits in R1)
    for suf, rep in _SB_STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) >= 3 and w[-3] in _SB_LI_END:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break
    # step 3 (in R1; 'ative' additionally requires R2)
    for suf, rep in _SB_STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break
    # step 4 (in R2)
    for suf in _SB_STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) >= 4 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break
    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (len(w) - 1 >= r1
                                and not _sb_ends_short_syllable(w[:-1])):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= r2:
        w = w[:-1]
    return w.replace("Y", "y")


# Back-compat alias: en_stem's stemmer entry point.
porter_stem = snowball_stem


def tokenize_en_stem(text: str) -> list[str]:
    return [porter_stem(t) for t in tokenize_default(text)]


# --- multilang tokenizer (tokenizers/multilang.rs:1-334) --------------------
# The reference detects the language with `whichlang` and segments CJK text
# with lindera dictionaries (CcCedict / IPADIC / KoDic). The dictionaries
# are not installable here, so:
#   * JAPANESE segments with a real minimum-cost Viterbi lattice over a
#     small vendored lexicon (functions/ja_segment.py — the lindera
#     ALGORITHM with an approximated dictionary; classic IPADIC outputs
#     like すもも/も/もも/も/もも/の/うち reproduce exactly, rare
#     out-of-lexicon compounds split per-char — documented divergence);
#   * CHINESE segments with a max-probability dictionary DAG over a
#     small vendored frequency lexicon (functions/zh_segment.py — the
#     CC-CEDICT ALGORITHM with an approximated dictionary; the reference
#     golden multilang.rs:223-238 reproduces exactly at 19 tokens, OOV
#     runs split per-char like lindera unknown words — documented
#     divergence for out-of-lexicon compounds);
#   * KOREAN hangul runs split on non-alphanumerics like the reference
#     fallback SimpleTokenizer.
# The language-prefix override protocol (`CMN:` / `ENG:` / `JPN:` /
# `KOR:`, multilang.rs:125-145) and the registered filter chain
# (RemoveLong(255) + LowerCaser, mod.rs:94-102) are reproduced exactly.

_KANA_CLASS = "぀-ゟ゠-ヿ"
_JPN_RE = re.compile(rf"[{_CJK_CLASS}{_KANA_CLASS}]|[^\W_{_CJK_CLASS}{_KANA_CLASS}]+",
                     re.UNICODE)
# whole CJK/kana runs (fed to the Japanese Viterbi segmenter) vs
# non-CJK word runs
_JPN_RUN_RE = re.compile(
    rf"[{_CJK_CLASS}{_KANA_CLASS}]+|[^\W_{_CJK_CLASS}{_KANA_CLASS}]+",
    re.UNICODE)
_LANG_PREFIXES = ("CMN:", "ENG:", "JPN:", "KOR:")
# whole CJK runs (fed to the Chinese dictionary segmenter) vs non-CJK
# word runs
_CMN_RUN_RE = re.compile(rf"[{_CJK_CLASS}]+|[^\W_{_CJK_CLASS}]+",
                         re.UNICODE)


def detect_lang_script(text: str) -> str:
    """whichlang analog by script counts: kor / jpn / cmn / other."""
    kor = jpn = cmn = 0
    for ch in text:
        o = ord(ch)
        if 0xAC00 <= o <= 0xD7AF or 0x1100 <= o <= 0x11FF or 0x3130 <= o <= 0x318F:
            kor += 1
        elif 0x3040 <= o <= 0x30FF:
            jpn += 1
        elif 0x3400 <= o <= 0x9FFF or 0x20000 <= o <= 0x2CEAF:
            cmn += 1
    best = max(kor, jpn, cmn)
    if best == 0:
        return "other"
    if best == kor:
        return "kor"
    if best == jpn:
        return "jpn"
    return "cmn"


_CJK_SINGLE_RE = re.compile(rf"[{_CJK_CLASS}]")
_CJKKANA_SINGLE_RE = re.compile(rf"[{_CJK_CLASS}{_KANA_CLASS}]")


def _multilang_raw(text: str) -> list[str]:
    """Token stream BEFORE the filter chain (prefix + dispatch)."""
    lang = None
    if text[:4] in _LANG_PREFIXES:
        lang = {"CMN:": "cmn", "ENG:": "other", "JPN:": "jpn",
                "KOR:": "kor"}[text[:4]]
        text = text[4:]
    if not text.strip():
        return []
    if lang is None:
        lang = detect_lang_script(text)
    if lang == "cmn":
        # CC-CEDICT-style dictionary segmentation over each CJK run
        # (functions/zh_segment.py — max-probability DAG, the same
        # lattice idea the JPN path uses; OOV runs split per char like
        # lindera's unknown-word handling). Replaces the round-3 bigram
        # approximation; reproduces multilang.rs:223-238's 19-token
        # golden exactly.
        from quickwit_ray.functions.zh_segment import segment as _zh

        out: list[str] = []
        for run in _CMN_RUN_RE.findall(text):
            if _CJK_SINGLE_RE.match(run):
                out.extend(_zh(run))
            else:
                out.append(run)
        return out
    if lang == "jpn":
        # lindera-style dictionary Viterbi over each CJK/kana run
        # (functions/ja_segment.py; round-3 verdict item — replaces the
        # round-3 bigram approximation for Japanese). Non-CJK runs split
        # like the SimpleTokenizer, as before.
        from quickwit_ray.functions.ja_segment import segment as _ja

        out: list[str] = []
        for run in _JPN_RUN_RE.findall(text):
            if _CJKKANA_SINGLE_RE.match(run):
                out.extend(_ja(run))
            else:
                out.append(run)
        return out
    # kor / other: SimpleTokenizer fallback (hangul runs are alphanumeric)
    return _SIMPLE_RE.findall(text)


def tokenize_multilang(text: str) -> list[str]:
    # multilang_default filter chain: RemoveLong(255) then LowerCaser
    return [t.lower() for t in _multilang_raw(text) if _len_ok(t)]


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
    "multilang": tokenize_multilang,
    "multilang_default": tokenize_multilang,  # registry name in mod.rs:96
}

_BUILTIN_NAMES = frozenset(TOKENIZERS)


# --- user-defined tokenizers (tokenizer_entry.rs:35-144) --------------------
# A doc mapping may declare custom entries:
#   {"name": ..., "type": "simple"|"ngram"|"regex"|"source_code"|"multilang",
#    "min_gram"/"max_gram"/"prefix_only", "pattern",
#    "filters": ["remove_long", "lower_caser", "ascii_folding"]}
# The base tokenizer emits raw tokens; the listed filters apply IN ORDER
# (no implicit defaults — mirrors TokenizerConfig::text_analyzer).

_CUSTOM_PARAMS: dict[str, dict] = {}


def _ngram_tokens(text: str, min_gram: int, max_gram: int,
                  prefix_only: bool) -> list[str]:
    """tantivy NgramTokenizer: character n-grams over the whole value,
    emitted position-major (all gram sizes at offset 0, then offset 1, ...);
    prefix_only keeps only offset 0."""
    n = len(text)
    out = []
    for i in ([0] if prefix_only else range(n)):
        for g in range(min_gram, max_gram + 1):
            if i + g <= n:
                out.append(text[i: i + g])
    return out


def _make_custom(entry: dict) -> Callable[[str], list[str]]:
    typ = entry["type"]
    if typ == "simple":
        base = _SIMPLE_RE.findall
    elif typ == "source_code":
        def base(t):  # raw case-split parts, unfiltered
            return [part for _kind, part in _code_parts(t)]
    elif typ == "regex":
        rx = re.compile(entry["pattern"])

        def base(t, _rx=rx):
            return [m.group(0) for m in _rx.finditer(t)]
    elif typ == "ngram":
        mn, mx = int(entry["min_gram"]), int(entry["max_gram"])
        if not (0 < mn <= mx):
            raise ValueError(f"bad ngram bounds {mn}..{mx}")
        po = bool(entry.get("prefix_only", False))

        def base(t, _mn=mn, _mx=mx, _po=po):
            return _ngram_tokens(t, _mn, _mx, _po)
    elif typ == "multilang":
        base = _multilang_raw
    else:
        raise ValueError(f"unknown custom tokenizer type {typ!r}")

    filters = tuple(entry.get("filters", ()))
    for f in filters:
        if f not in ("remove_long", "lower_caser", "ascii_folding"):
            raise ValueError(f"unknown token filter {f!r}")

    def fn(text: str) -> list[str]:
        toks = base(text)
        for f in filters:
            if f == "remove_long":
                toks = [t for t in toks if _len_ok(t)]
            elif f == "lower_caser":
                toks = [t.lower() for t in toks]
            else:  # ascii_folding
                toks = [_ascii_fold(t) for t in toks]
        return toks

    return fn


def register_custom_tokenizers(entries) -> None:
    """Register doc-mapping tokenizer entries into the process registry
    (TokenizerManager::register analog). Redefining a name with identical
    parameters is a no-op; clashing with a built-in raises."""
    for e in entries:
        e = dict(e)
        name = e.get("name")
        if not name:
            raise ValueError("tokenizer entry needs a name")
        if name in _BUILTIN_NAMES:
            raise ValueError(f"cannot override built-in tokenizer {name!r}")
        prev = _CUSTOM_PARAMS.get(name)
        if prev == e:
            continue
        if prev is not None:
            # the registry is process-global: silently letting a second
            # index's same-named-but-different entry win would corrupt the
            # first index's tokenization
            raise ValueError(
                f"tokenizer {name!r} already registered with different "
                f"parameters ({prev!r} vs {e!r}); tokenizer names must be "
                "unique per process")
        TOKENIZERS[name] = _make_custom(e)
        _CUSTOM_PARAMS[name] = e


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
            # tantivy RemoveLongFilter drops tokens WITHOUT renumbering the
            # survivors — keep original ordinals (position gaps) so phrase /
            # slop semantics across a removed long token match the reference
            doc_idx, tokens = doc_idx[keep], tokens[keep]
            positions = positions[keep]
            total = len(tokens)
            if total == 0:
                return (doc_idx, tokens, np.empty(0, np.int32))
    if lower and total:
        # lowercase AFTER the cut, on the unique vocabulary only (Zipf:
        # vocab << token count, so this loop is tiny)
        import pandas as pd

        codes, uniq = pd.factorize(tokens)
        lowered = np.asarray([t.lower() for t in uniq], object)
        tokens = lowered[codes]
    return doc_idx, tokens, positions


def tokenize_batch_encoded(col, tokenizer: str = "default"):
    """Dictionary-encoded batch tokenization for the indexing hot path.

    Returns ``(doc_idx, codes, uniq, positions)`` where ``uniq`` is a
    SMALL object ndarray of final token strings (lowered/stemmed) and
    ``codes`` (int64) indexes into it — the token stream itself never
    materializes per-token Python strings. ``uniq`` may contain
    duplicate values after lowercasing; callers dedup through their
    vocab dict.

    For the ``default``/``en_stem`` tokenizers on an Arrow string column
    the regex split, length filter and dictionary encode all run as
    Arrow C++ kernels (RE2 ``[^\\pL\\pN]+`` == Python ``[^\\W_]+``:
    Python's \\w is isalnum + underscore, and isalnum is exactly
    L*/Nd/Nl/No). Lowercasing stays Python ``str.lower`` on the unique
    vocabulary only — Arrow's utf8_lower is simple case folding and
    would diverge on full-folding chars like 'İ'. Every other tokenizer
    (or non-Arrow input) falls back to :func:`tokenize_batch` +
    pandas factorize, so semantics are identical either way."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arrow_ok = (isinstance(col, (pa.Array, pa.ChunkedArray))
                and pa.types.is_string(
                    col.type if isinstance(col, pa.Array) else col.type))
    if tokenizer in ("default", "en_stem") and arrow_ok:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        empty = (np.empty(0, np.int32), np.empty(0, np.int64),
                 np.empty(0, object), np.empty(0, np.int32))
        if n == 0:
            return empty
        split = pc.split_pattern_regex(pc.fill_null(col, ""),
                                       pattern=r"[^\pL\pN]+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = pc.list_flatten(split)
        counts = np.diff(np.asarray(split.offsets, np.int64))
        blens = np.asarray(pc.binary_length(flat), np.int64)
        doc_idx_all = np.repeat(np.arange(n, dtype=np.int32), counts)
        # split (unlike findall) emits "" at row edges — drop them BEFORE
        # assigning ordinals, so positions match findall's match ordinals
        ne = np.nonzero(blens > 0)[0]
        if len(ne) == 0:
            return empty
        d = doc_idx_all[ne]
        row_change = np.empty(len(d), bool)
        row_change[0] = True
        row_change[1:] = d[1:] != d[:-1]
        rs = np.nonzero(row_change)[0]
        seg_len = np.diff(np.append(rs, len(d)))
        pos = (np.arange(len(d), dtype=np.int64)
               - np.repeat(rs, seg_len)).astype(np.int32)
        # RemoveLongFilter: drop >=255-byte tokens WITHOUT renumbering
        # the survivors (position gaps preserved, tokenize_batch parity)
        keep = blens[ne] < MAX_TOKEN_BYTES
        if not keep.all():
            ne, d, pos = ne[keep], d[keep], pos[keep]
            if len(ne) == 0:
                return empty
        de = pc.dictionary_encode(flat.take(pa.array(ne)))
        codes = np.asarray(de.indices, np.int64)
        uniq = np.asarray(
            [t.lower() for t in de.dictionary.to_pylist()]
            if tokenizer == "default"
            else [porter_stem(t.lower())
                  for t in de.dictionary.to_pylist()], object)
        return d, codes, uniq, pos

    texts = (col.to_pylist()
             if isinstance(col, (pa.Array, pa.ChunkedArray)) else col)
    doc_idx, tokens, positions = tokenize_batch(texts, tokenizer)
    if len(tokens) == 0:
        return (doc_idx, np.empty(0, np.int64), np.empty(0, object),
                positions)
    import pandas as pd

    codes, uniq = pd.factorize(tokens)
    return (doc_idx, codes.astype(np.int64), np.asarray(uniq, object),
            positions)
