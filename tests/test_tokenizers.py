"""Tokenizer goldens from the reference test suite
(`quickwit/quickwit-query/src/tokenizers/mod.rs:126-189`,
`code_tokenizer.rs` tests)."""

import numpy as np
import pytest

from quickwit_ray.functions.tokenizers import (
    porter_stem,
    tokenize,
    tokenize_batch,
)

HAIKU = """
        white sandy beach
        a strong wind is coming
        sand in my face
        """
LONG_TEXT = ("a text, that is just too long, no one will type it, no one will like "
             "it, no one shall find it. I just need some more chars, now you may "
             "not pass.")


def test_raw_tokenizer_one_token():
    # reference: haiku -> exactly one token under `raw`
    assert tokenize(HAIKU, "raw") == [HAIKU]
    assert tokenize(LONG_TEXT, "raw") == [LONG_TEXT]


def test_raw_drops_over_255_bytes():
    long = "x" * 255
    assert tokenize(long, "raw") == []
    assert tokenize("x" * 254, "raw") == ["x" * 254]


def test_raw_lowercase():
    toks = tokenize(LONG_TEXT, "raw_lowercase")
    assert len(toks) == 1
    assert len(toks[0]) == len(LONG_TEXT)
    assert not any(c.isupper() for c in toks[0])


def test_default_tokenizer():
    assert tokenize("Hello, World! 42", "default") == ["hello", "world", "42"]
    # underscores split (Rust is_alphanumeric excludes '_')
    assert tokenize("foo_bar", "default") == ["foo", "bar"]
    # long tokens dropped
    assert tokenize("ok " + "y" * 300 + " fine", "default") == ["ok", "fine"]


def test_code_tokenizer_golden():
    # reference golden: "PigCaféFactory2" -> ["pig", "cafe", "factory", "2"]
    assert tokenize("PigCaféFactory2", "source_code_default") == ["pig", "cafe", "factory", "2"]


def test_code_tokenizer_caps_runs():
    assert tokenize("HTTPServer", "source_code_default") == ["http", "server"]
    assert tokenize("snake_case_id3", "source_code_default") == ["snake", "case", "id", "3"]


def test_chinese_compatible():
    toks = tokenize("张华考上了北京大学 abc", "chinese_compatible")
    assert "abc" in toks
    # each CJK char its own token
    assert "张" in toks and "华" in toks
    assert len([t for t in toks if len(t) == 1 and ord(t[0]) > 0x3000]) == 9


def test_whitespace():
    assert tokenize("Hello,  World!", "whitespace") == ["Hello,", "World!"]


def test_porter_stem_classics():
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("running") == "run"
    assert porter_stem("relational") == "relat"


@pytest.mark.parametrize("tok", ["default", "whitespace", "chinese_compatible", "en_stem"])
def test_batch_matches_exact(tok):
    texts = ["Hello, World! 42", "", "foo_bar baz", HAIKU, "张华考上了 University",
             "ok " + "y" * 300 + " end", None, "UPPER lower MiXeD"]
    doc_idx, tokens, positions = tokenize_batch(texts, tok)
    per_row = [[] for _ in texts]
    for i, t in zip(doc_idx, tokens):
        per_row[i].append(t)
    expected = [tokenize(t or "", tok) for t in texts]
    assert per_row == expected
    # positions are per-row PRE-filter ordinals: the row with the 300-byte
    # token keeps a gap where it was removed (RemoveLongFilter semantics)
    for i in np.unique(doc_idx):
        got = list(positions[doc_idx == i])
        if texts[i] and "yyy" in texts[i]:
            assert got == [0, 2]
        else:
            assert got == list(range(len(got)))


def test_batch_raw():
    texts = ["A", "", "b c"]
    doc_idx, tokens, _ = tokenize_batch(texts, "raw")
    assert list(doc_idx) == [0, 2]
    assert list(tokens) == ["A", "b c"]
    doc_idx, tokens, _ = tokenize_batch(texts, "raw_lowercase")
    assert list(tokens) == ["a", "b c"]


def test_snowball_english_golden():
    """en_stem = Snowball English (Porter2), matching tantivy
    Stemmer::new(Language::English) — NOT Porter 1980 (ADVICE r1). The
    diverging triples from the advice plus published Snowball demo pairs."""
    from quickwit_ray.functions.tokenizers import snowball_stem as s

    # Porter1 gives fairli / ti / gener for these
    assert s("fairly") == "fair"
    assert s("ties") == "tie"
    assert s("generously") == "generous"
    golden = {
        "consistency": "consist", "consolatory": "consolatori",
        "conspicuously": "conspicu", "knackeries": "knackeri",
        "knightly": "knight", "knives": "knive", "agreed": "agre",
        "dying": "die", "skies": "sky", "early": "earli",
        "inning": "inning", "proceed": "proceed", "beautifully": "beauti",
        "electricity": "electr", "nationally": "nation",
        "generate": "generat", "generically": "generic",
        "communism": "communism", "hopping": "hop", "hoping": "hope",
        "flies": "fli", "cries": "cri", "gas": "gas", "kiwis": "kiwi",
        "vilely": "vile", "analogously": "analog",
    }
    for w, want in golden.items():
        assert s(w) == want, (w, want, s(w))


def test_en_stem_tokenizer_uses_snowball():
    from quickwit_ray.functions.tokenizers import tokenize, tokenize_batch

    assert tokenize("Fairly generous ties", "en_stem") == \
        ["fair", "generous", "tie"]
    _, toks, _ = tokenize_batch(["Fairly generous ties"], "en_stem")
    assert list(toks) == ["fair", "generous", "tie"]


def test_batch_encoded_matches_batch():
    """tokenize_batch_encoded (Arrow RE2 split + dictionary encode) must
    reproduce tokenize_batch exactly: same doc_idx/positions, same
    expanded token stream — including full-casefold chars, >=255-byte
    token removal without renumbering, leading/trailing separators,
    nulls, empty rows, and unicode digits."""
    import numpy as np
    import pyarrow as pa

    from quickwit_ray.functions.tokenizers import (
        tokenize_batch,
        tokenize_batch_encoded,
    )

    texts = [
        "Hello, World! 42",
        "",
        None,
        "  leading and trailing  ",
        "İstanbul STRASSE Weiß",             # full casefold chars
        "a" * 300 + " short " + "b" * 254,    # long-token removal
        "naïve café — résumé",
        "١٢٣ ٤٥٦ unicode ٧ digits",           # Arabic-Indic digits (\pN)
        "under_score splits_here",            # '_' is a separator
        "日本語 mixed ascii",
        "x",
    ]
    for tok in ("default", "en_stem"):
        col = pa.array(texts, pa.string())
        d1, t1, p1 = tokenize_batch(
            ["" if t is None else t for t in texts], tok)
        d2, codes, uniq, p2 = tokenize_batch_encoded(col, tok)
        assert np.array_equal(d1, d2)
        assert np.array_equal(p1, p2)
        assert list(t1) == [uniq[c] for c in codes]
    # non-arrow input / unsupported tokenizer: fallback equivalence
    d2, codes, uniq, p2 = tokenize_batch_encoded(texts_safe := [
        "Foo Bar", "baz foo"], "whitespace")
    d1, t1, p1 = tokenize_batch(texts_safe, "whitespace")
    assert np.array_equal(d1, d2) and np.array_equal(p1, p2)
    assert list(t1) == [uniq[c] for c in codes]
