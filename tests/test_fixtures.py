"""Fixture-generator properties (FIXTURES.md §1/§6)."""

import numpy as np

from emailindexer_spark.functions.tokenizer import tokenize
from emailindexer_spark.sources.fixtures import (
    N_HEAVY,
    _vocab,
    make_tags,
    make_transcripts,
    reference_queries,
)


def test_deterministic_and_shape():
    a = make_transcripts(3000, seed=42)
    b = make_transcripts(3000, seed=42)
    assert a.equals(b)
    assert list(a.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert len(a) == 3000
    assert a["turn_idx"].dtype == np.int32


def test_stable_ordering_and_dense_turns():
    df = make_transcripts(2000, seed=1)
    assert df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).equals(df)
    for _, g in list(df.groupby("conv_id"))[:50]:
        assert g["turn_idx"].tolist() == list(range(len(g)))


def test_heavy_terms_are_heavy():
    df = make_transcripts(2000, seed=42)
    heavy = _vocab(np.random.default_rng(42), 5000)[:N_HEAVY]
    texts = df["text"].head(500)
    for h in heavy[:5]:
        frac = sum(1 for t in texts if h in set(tokenize(t))) / len(texts)
        assert frac > 0.40, (h, frac)


def test_noise_and_ts_monotone():
    df = make_transcripts(2000, seed=42)
    assert df["text"].str.contains("-----Original Message-----").mean() > 0.05
    g = df.groupby("conv_id")["ts"]
    assert (g.apply(lambda s: s.is_monotonic_increasing)).all()


def test_tags_and_queries():
    df = make_transcripts(2000, seed=42)
    tags = make_tags(df)
    assert 0.05 < len(tags) / len(df) < 0.15
    qs = reference_queries(df)
    ids = [q["query_id"] for q in qs]
    assert len(ids) == len(set(ids))
    assert any(q["mode"] == "conversations" for q in qs)
    assert any("*" in q["query"] for q in qs)
    assert any('"' in q["query"] for q in qs)
