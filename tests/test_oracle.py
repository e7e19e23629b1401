"""Pin the pure-Python Lucene-semantics oracle to hand-computed values.

The oracle (emailindexer_spark/oracle.py) is the stand-in for the Lucene
9.1 reference (no JVM in the sandbox — SURVEY.md §7): these tests pin the
BM25 formula, lossy norms, boolean semantics, phrase/prefix behavior,
tie-breaks, and conversation collapse to values computed by hand.
"""

import math

import pytest

from emailindexer_spark.oracle import build_oracle_index, search

ROWS = [
    ("c1", 0, "apple banana apple"),
    ("c1", 1, "banana cherry"),
    ("c2", 0, "apple cherry cherry date"),
    ("c3", 0, "elderberry"),
]


@pytest.fixture(scope="module")
def ix():
    return build_oracle_index(ROWS)


def test_hand_computed_bm25(ix):
    # apple: df=2, N=4 → idf = ln(1 + 2.5/2.5) = ln 2
    # doc0: tf=2, dl=3 (<8 → lossless norm), avgdl = 10/4 = 2.5
    exp0 = math.log(2.0) * 2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 3 / 2.5))
    exp2 = math.log(2.0) * 1 / (1 + 1.2 * (1 - 0.75 + 0.75 * 4 / 2.5))
    got = dict(search(ix, "apple"))
    assert got[0] == pytest.approx(exp0, rel=1e-12)
    assert got[2] == pytest.approx(exp2, rel=1e-12)


def test_or_sums_and_orders(ix):
    r = search(ix, "apple cherry")
    assert [d for d, _ in r] == [2, 0, 1]
    single = dict(search(ix, "apple"))
    cherry = dict(search(ix, "cherry"))
    assert dict(r)[2] == pytest.approx(single[2] + cherry[2], rel=1e-12)


def test_must_filters_but_should_scores(ix):
    # +apple banana: only apple-docs match; banana adds score where present
    r = dict(search(ix, "+apple banana"))
    assert set(r) == {0, 2}
    assert r[0] > dict(search(ix, "apple"))[0]


def test_not_and_pure_negative(ix):
    assert [d for d, _ in search(ix, "cherry -date")] == [1]
    assert search(ix, "-apple") == []


def test_phrase_exact_adjacency(ix):
    r = search(ix, '"cherry cherry"')
    assert [d for d, _ in r] == [2]
    assert search(ix, '"banana apple"') != []  # doc0: banana@1 apple@2
    assert search(ix, '"apple date"') == []


def test_prefix_constant_score(ix):
    r = search(ix, "ap* el*")
    assert all(s == 1.0 for _, s in r)
    assert {d for d, _ in r} == {0, 2, 3}


def test_absent_term_empty(ix):
    assert search(ix, "zzz") == []


def test_conversation_collapse(ix):
    # both c1 turns match banana; collapse keeps the higher-scored one
    full = search(ix, "banana")
    conv = search(ix, "banana", mode="conversations")
    assert len(full) == 2 and len(conv) == 1
    assert conv[0] == full[0]


def test_tie_break_doc_id_asc():
    rows = [("a", 0, "x y"), ("b", 0, "x y"), ("c", 0, "x z")]
    r = search(build_oracle_index(rows), "x")
    # docs 0 and 1 identical stats → identical score → docID asc
    assert [d for d, _ in r][:2] == [0, 1]
    assert r[0][1] == r[1][1]


def test_lossy_norms_first_shared_bucket_40_41():
    # Lucene 9.1 encodes doc lengths 0..39 exactly (NUM_FREE_VALUES=24 plus
    # the exact tiny-float range); 41 is the first length to share a bucket
    # (with 40) → identical scores at same tf, while 16 vs 17 now differ.
    rows = [
        ("a", 0, "q " + "f0 " * 39),  # dl 40
        ("b", 0, "q " + "f1 " * 40),  # dl 41 → bucket 40
        ("c", 0, "q " + "f2 " * 15),  # dl 16
        ("d", 0, "q " + "f3 " * 16),  # dl 17 — exact, NOT bucketed with 16
        ("e", 0, "q q r"),
    ]
    r = dict(search(build_oracle_index(rows), "q"))
    assert r[0] == r[1]
    assert r[2] != r[3]


def test_empty_text_docs_excluded_from_stats():
    rows = [("a", 0, "x"), ("b", 0, ""), ("c", 0, "x y")]
    ix2 = build_oracle_index(rows)
    assert ix2.n_docs == 2 and ix2.avgdl == 1.5
