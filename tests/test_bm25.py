"""BM25 scorer pinned against the reference's own golden literals
(`quickwit/quickwit-search/src/tests.rs:616-706`, test_sort_bm25):

3-doc corpus, field `title` (record: freq, fieldnorms: true):
    doc0 "one pad", doc1 "one", doc2 "one one"
`title:one` -> [(0.1738279, 2), (0.15965714, 1), (0.12343242, 0)]
field `nofreq` (record: basic): `nofreq:two` ->
    [(0.15965714, 1), (0.12343242, 2), (0.12343242, 0)]
"""

import numpy as np

from quickwit_ray.functions.bm25 import (
    FIELDNORM_TABLE,
    bm25_scores,
    fieldnorm_to_id,
    id_to_fieldnorm,
)


def test_fieldnorm_table_shape():
    # subnormal: exact 0..7
    assert list(FIELDNORM_TABLE[:8]) == list(range(8))
    # 8..15 exact
    assert list(FIELDNORM_TABLE[8:16]) == list(range(8, 16))
    # monotone non-decreasing, ends large
    assert np.all(np.diff(FIELDNORM_TABLE.astype(np.int64)) >= 0)
    assert FIELDNORM_TABLE[255] == (7 | 8) << 30


def test_fieldnorm_roundtrip_floor():
    lens = np.array([0, 1, 7, 8, 15, 16, 17, 18, 100, 1000, 10**6])
    ids = fieldnorm_to_id(lens)
    dec = id_to_fieldnorm(ids)
    assert np.all(dec <= lens)
    # 17 quantizes down to 16 (step 2 in the 16..31 range)
    assert dec[np.where(lens == 17)[0][0]] == 16


def _golden_scores(tfs, dls, df, n, avgdl):
    norm_ids = fieldnorm_to_id(np.asarray(dls))
    return bm25_scores(np.asarray(tfs, float), norm_ids, df, n, avgdl)


def test_reference_bm25_literals_freq_field():
    # title: doc0 dl=2 tf=1; doc1 dl=1 tf=1; doc2 dl=2 tf=2; N=3 df=3 avgdl=5/3
    scores = _golden_scores([1, 1, 2], [2, 1, 2], df=3, n=3, avgdl=5 / 3)
    got = np.float32(scores)
    assert got[2] == np.float32(0.1738279)
    assert got[1] == np.float32(0.15965714)
    assert got[0] == np.float32(0.12343242)


def test_reference_bm25_literals_basic_field():
    # nofreq (record: basic -> tf==1): doc0 "two pad" dl=2; doc1 "two" dl=1;
    # doc2 "two two" dl=2 but tf scored as 1.
    scores = _golden_scores([1, 1, 1], [2, 1, 2], df=3, n=3, avgdl=5 / 3)
    got = np.float32(scores)
    assert got[1] == np.float32(0.15965714)
    assert got[0] == got[2] == np.float32(0.12343242)


def test_reference_bm25_sum_of_clauses():
    # "title:one nofreq:two" -> sum of the two clause scores per doc
    title = _golden_scores([1, 1, 2], [2, 1, 2], 3, 3, 5 / 3)
    nofreq = _golden_scores([1, 1, 1], [2, 1, 2], 3, 3, 5 / 3)
    total = np.float32(title + nofreq)
    assert total[1] == np.float32(0.31931427)
    assert total[2] == np.float32(0.2972603)
    assert total[0] == np.float32(0.24686484)
