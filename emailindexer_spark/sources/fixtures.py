"""Deterministic synthetic transcript corpora (FIXTURES.md).

Seeded generator for the ``transcripts`` input table of BASELINE.json's
``input_hint`` shape::

    (conv_id string, turn_idx int32, role string, text string,
     tool string, ts timestamp)

Properties mirroring the reference's test corpus (threaded mailing-list
mail, ``/root/reference/test_emails/``) re-expressed as transcripts:

* ~N/8 conversations, 1-40 turns each, long-tail sizes,
* 5-300 tokens per turn, Zipfian ~5k-term vocabulary,
* ~20 heavy stopword-like terms present in >40% of turns (drives the
  skew-splitting path, SURVEY.md §2.10 step 4),
* ~15% of turns carry ``> ``-quoted lines and an
  ``-----Original Message-----`` trailer (sanitizer parity with the
  reference's BodyReplyRemover.java:10-24),
* vocabulary includes apostrophe and dotted-version tokens (``don't``,
  ``2.0.26``) to exercise the UAX#29 tokenizer edges,
* ``ts`` monotone within a conversation.

Pure numpy + pandas; everything keyed off one integer seed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["search", "browser", "python", "sql"])

N_HEAVY = 20
HEAVY_TOKEN_P = 0.35  # probability a token is drawn from the heavy set


def _vocab(rng: np.random.Generator, size: int = 5000) -> np.ndarray:
    """Deterministic pseudo-word vocabulary with tokenizer edge cases."""
    cons = np.array(list("bcdfghjklmnpqrstvwz"))
    vow = np.array(list("aeiou"))
    n_syll = rng.integers(2, 5, size=size)
    words = []
    for ns in n_syll:
        w = "".join(rng.choice(cons) + rng.choice(vow) for _ in range(ns))
        words.append(w)
    words = np.array(words, dtype=object)
    # de-dup deterministically by suffixing collision count
    seen: dict[str, int] = {}
    for i, w in enumerate(words):
        c = seen.get(w, 0)
        seen[w] = c + 1
        if c:
            words[i] = f"{w}{c}"
    # tokenizer edge-case tokens: apostrophes and dotted versions/acronyms
    n_edge = max(50, size // 100)
    edges = []
    for i in range(n_edge):
        kind = i % 4
        if kind == 0:
            edges.append(f"don't{i}" if i else "don't")
        elif kind == 1:
            edges.append(f"{rng.integers(1, 9)}.{rng.integers(0, 20)}.{rng.integers(0, 40)}")
        elif kind == 2:
            edges.append("u.s.a" if i == 2 else f"v{rng.integers(1, 9)}.{rng.integers(0, 30)}")
        else:
            edges.append(f"it's{i}")
    words[-n_edge:] = np.array(edges, dtype=object)
    return words


def make_transcripts(
    n_turns: int,
    seed: int = 42,
    vocab_size: int = 5000,
    chunk: int = 100_000,
) -> pd.DataFrame:
    """Generate a deterministic transcripts DataFrame with n_turns rows."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng, vocab_size)
    heavy = vocab[:N_HEAVY]
    tail = vocab[N_HEAVY:]
    # Zipf ranks over the tail vocabulary
    ranks = np.arange(1, tail.size + 1, dtype=np.float64)
    zipf_p = 1.0 / ranks**1.07
    zipf_p /= zipf_p.sum()

    # conversation sizes: long-tail 1..40
    sizes = []
    total = 0
    while total < n_turns:
        s = int(min(40, rng.geometric(0.18)))
        sizes.append(s)
        total += s
    sizes[-1] -= total - n_turns
    if sizes[-1] == 0:
        sizes.pop()
    sizes = np.array(sizes, dtype=np.int64)
    n_conv = sizes.size
    conv_ids = np.array([f"c{i:08d}" for i in range(n_conv)], dtype=object)
    conv_col = np.repeat(conv_ids, sizes)
    turn_idx = np.concatenate([np.arange(s, dtype=np.int32) for s in sizes])

    out_chunks: list[pd.DataFrame] = []
    base_ts = np.datetime64("2025-01-01T00:00:00", "us")
    for lo in range(0, n_turns, chunk):
        hi = min(lo + chunk, n_turns)
        m = hi - lo
        ntok = np.clip(
            np.round(np.exp(rng.normal(3.8, 0.9, size=m))).astype(np.int64), 5, 300
        )
        tot = int(ntok.sum())
        is_heavy = rng.random(tot) < HEAVY_TOKEN_P
        toks = np.empty(tot, dtype=object)
        n_h = int(is_heavy.sum())
        toks[is_heavy] = heavy[rng.integers(0, N_HEAVY, size=n_h)]
        toks[~is_heavy] = tail[rng.choice(tail.size, size=tot - n_h, p=zipf_p)]
        turn_of_tok = np.repeat(np.arange(m), ntok)
        texts = (
            pd.Series(toks)
            .groupby(turn_of_tok)
            .agg(" ".join)
            .reindex(range(m), fill_value="")
            .to_numpy()
        )
        # quoted-reply noise on ~15% of turns (sanitizer must strip it)
        noisy = rng.random(m) < 0.15
        for i in np.nonzero(noisy)[0]:
            texts[i] = (
                texts[i]
                + "\n> quoted zz"
                + str(rng.integers(0, 99))
                + " reply line\n  > more quote\n-----Original Message-----\nold body to drop"
            )
        roles = ROLES[(turn_idx[lo:hi] + rng.integers(0, 3, size=m)) % 3]
        tool = np.where(
            rng.random(m) < 0.2, TOOLS[rng.integers(0, TOOLS.size, size=m)], None
        )
        ts = base_ts + (np.arange(lo, hi) * 1_000_000 + rng.integers(0, 1000, size=m)).astype(
            "timedelta64[us]"
        )
        out_chunks.append(
            pd.DataFrame(
                {
                    "conv_id": conv_col[lo:hi],
                    "turn_idx": turn_idx[lo:hi],
                    "role": roles,
                    "text": texts,
                    "tool": tool,
                    "ts": ts,
                }
            )
        )
    df = pd.concat(out_chunks, ignore_index=True)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def make_tags(transcripts: pd.DataFrame, seed: int = 42) -> pd.DataFrame:
    """Seeded tag assignment to ~10% of turns (reference
    EmailDatasetIntegrationTests.java:180-188 uses Random(0) similarly)."""
    rng = np.random.default_rng(seed + 1)
    m = len(transcripts)
    sel = rng.random(m) < 0.10
    tags = np.array(["alpha", "beta", "gamma", "delta"])[rng.integers(0, 4, size=m)]
    out = transcripts.loc[sel, ["conv_id", "turn_idx"]].copy()
    out["tag"] = tags[sel]
    return out.reset_index(drop=True)


def reference_queries(transcripts: pd.DataFrame, seed: int = 42) -> list[dict]:
    """The fixed query set (FIXTURES.md §3): every term class appears."""
    from collections import Counter

    from emailindexer_spark.functions.tokenizer import tokenize

    cnt: Counter[str] = Counter()
    for t in transcripts["text"].head(20000):
        cnt.update(set(tokenize(t)))
    by_df = cnt.most_common()
    heavy_t = by_df[0][0]
    mid_t = by_df[len(by_df) // 4][0]
    rare_t = next(t for t, c in reversed(by_df) if c >= 3)
    rare2 = next(t for t, c in reversed(by_df) if 5 <= c <= 50 and t != rare_t)
    pre = mid_t[:2]
    qs = [
        {"query_id": "q_rare", "query": rare_t, "k": 10, "mode": "turns"},
        {"query_id": "q_mid", "query": mid_t, "k": 10, "mode": "turns"},
        {"query_id": "q_heavy", "query": heavy_t, "k": 10, "mode": "turns"},
        {"query_id": "q_absent", "query": "zzzzqqqqxxxx", "k": 10, "mode": "turns"},
        {"query_id": "q_or", "query": f"{rare_t} {mid_t}", "k": 10, "mode": "turns"},
        {"query_id": "q_or3", "query": f"{rare_t} {mid_t} {heavy_t}", "k": 100, "mode": "turns"},
        {"query_id": "q_and", "query": f"{mid_t} AND {heavy_t}", "k": 10, "mode": "turns"},
        {"query_id": "q_must", "query": f"+{mid_t} {rare_t}", "k": 10, "mode": "turns"},
        # exclusion by a mid-df term: a heavy term would co-occur with
        # every match and leave the NOT path tested only by emptiness
        {"query_id": "q_not", "query": f"{heavy_t} -{mid_t}", "k": 10, "mode": "turns"},
        {"query_id": "q_prefix", "query": f"{pre}*", "k": 10, "mode": "turns"},
        {"query_id": "q_phrase", "query": f'"{heavy_t} {mid_t}"', "k": 10, "mode": "turns"},
        {"query_id": "q_conv", "query": f"{rare_t} {mid_t}", "k": 10, "mode": "conversations"},
        {"query_id": "q_conv_heavy", "query": heavy_t, "k": 10, "mode": "conversations"},
        {"query_id": "q_rare2_or", "query": f"{rare2} {rare_t}", "k": 10, "mode": "turns"},
        {"query_id": "q_bool_nested", "query": f"({rare_t} OR {mid_t}) AND {heavy_t}", "k": 10, "mode": "turns"},
    ]
    return qs
