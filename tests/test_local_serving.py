"""Driver-local serving fast path (r6): exact parity with the
distributed plans, engagement checks, and budget fallbacks.

The local path must be INVISIBLE semantically: for every supported
query shape its (rank, doc_id, conv_id, turn_idx, score) output equals
the distributed plan's to float precision (same kernels, same combine
order up to float-sum association, which the 9-decimal comparison
absorbs)."""

import numpy as np
import pytest

from emailindexer_spark.plans.planner import SearchEngine


def _rows(df):
    return [
        (r.rank, r.doc_id, r.conv_id, r.turn_idx, round(r.score, 9))
        for r in df.collect()
    ]


@pytest.fixture(scope="module")
def engines(spark, index_dir):
    local = SearchEngine(spark, index_dir)
    dist = SearchEngine(spark, index_dir)
    dist._local_search = lambda *a, **k: None  # force distributed plans
    return local, dist


def _terms(eng):
    vocab, dfs, _parts = eng._driver_vocab()
    heavy = vocab[int(np.argmax(dfs))]
    mid = vocab[int(np.argsort(dfs)[len(dfs) // 2])]
    rare = vocab[int(np.argmin(dfs))]
    return rare, mid, heavy


SHAPES = [
    ("{rare}", "turns", None),
    ("{heavy}", "turns", None),
    ("{rare} {mid} {heavy}", "turns", None),
    ("{rare} {mid} {heavy}", "turns", True),  # explicit WAND
    ("{mid} AND {heavy}", "turns", None),
    ("+{rare} {heavy}", "turns", None),
    ("{heavy} -{mid}", "turns", None),
    ("zzznope {rare}", "turns", None),
    ("zzznope", "turns", None),
    ("{mid}^2 {heavy}", "turns", None),
    ("{pre}*", "turns", None),
    ("[{lo} TO {hi}]", "turns", None),
    ("{mid}~1", "turns", None),
    ('"{heavy} {mid}"', "turns", None),
    ('"{mid} {heavy}"~2', "turns", None),
    ("{rare} {mid} {heavy}", "conversations", None),
    ("{pre}*", "conversations", None),
    ('"{heavy} {mid}"', "conversations", None),
]


def test_local_matches_distributed_everywhere(engines):
    local, dist = engines
    rare, mid, heavy = _terms(local)
    subs = {
        "rare": rare,
        "mid": mid,
        "heavy": heavy,
        "pre": mid[:2],
        "lo": mid[:2],
        "hi": mid[:2] + "zz",
    }
    for tmpl, mode, wand in SHAPES:
        q = tmpl.format(**subs)
        a = _rows(local.search(q, k=12, mode=mode, use_wand=wand))
        b = _rows(dist.search(q, k=12, mode=mode, use_wand=wand))
        assert a == b, (q, mode, wand, a[:3], b[:3])


def test_local_path_engages_and_runs_zero_jobs(spark, engines):
    local, _ = engines
    rare, _mid, _heavy = _terms(local)
    sc = spark.sparkContext
    sc.setJobGroup("local_probe", "local_probe")
    try:
        local.search(rare, k=5).collect()
        jobs = sc.statusTracker().getJobIdsForGroup("local_probe")
    finally:
        sc.setJobGroup(None, None)
    assert jobs == [] or len(jobs) == 0


def test_budget_fallback_is_distributed_and_equal(engines):
    from emailindexer_spark.plans.parser import parse

    local, dist = engines
    _rare, mid, heavy = _terms(local)
    q = f"{mid} {heavy}"
    # shrink the budget so the same query takes the distributed plan
    local.LOCAL_MAX_POSTINGS = 1
    try:
        ast = local._resolve_node(parse(q, simple=local.simple))
        assert local._local_search(ast, ast, 10, "turns") is None
        assert _rows(local.search(q, k=10)) == _rows(dist.search(q, k=10))
    finally:
        del local.LOCAL_MAX_POSTINGS  # restore the class attribute


def test_search_many_mixed_local_and_distributed(engines):
    local, dist = engines
    rare, mid, heavy = _terms(local)
    batch = {
        "a": (rare, 5, "turns"),
        "b": (f"{mid} AND {heavy}", 5, "turns"),
        "c": (f'"{heavy} {mid}"', 5, "turns"),
        "d": (f"{rare} {heavy}", 5, "conversations"),
        "e": (mid[:2] + "*", 8, "turns"),
    }
    a = sorted(
        (r.query_id, r.rank, r.doc_id, r.conv_id, r.turn_idx, round(r.score, 9))
        for r in local.search_many(batch, use_wand=False).collect()
    )
    b = sorted(
        (r.query_id, r.rank, r.doc_id, r.conv_id, r.turn_idx, round(r.score, 9))
        for r in dist.search_many(batch, use_wand=False).collect()
    )
    assert a == b


def test_local_decoders_match_block_kernels(engines):
    """_local_decode_postings / _local_decode_docs vs decode_block over
    every posting row of a real index part."""
    local, _ = engines
    from emailindexer_spark.functions.codec import decode_block

    vocab, dfs, _parts = local._driver_vocab()
    heavy = vocab[int(np.argmax(dfs))]
    rows = local._local_posting_rows({heavy}, local.SCORE_COLS)
    docs, tfs, norms = local._local_decode_postings(rows)
    exp_d, exp_t, exp_n = [], [], []
    for r in rows.itertuples(index=False):
        for i in range(len(r.b_docs)):
            d, t, n = decode_block(int(r.b_first[i]), r.b_docs[i], r.b_tfs[i], r.b_norms[i])
            exp_d.append(d)
            exp_t.append(t)
            exp_n.append(n)
    assert (docs == np.concatenate(exp_d)).all()
    assert (tfs == np.concatenate(exp_t)).all()
    assert (norms == np.concatenate(exp_n)).all()
    drows = local._local_posting_rows({heavy}, local.LOCAL_DOCS_COLS)
    assert (local._local_decode_docs(drows) == np.unique(np.concatenate(exp_d))).all()


def test_local_finish_conversations_collapse_fuzz():
    """The grouped-reduceat conversation collapse in _local_finish must
    pick exactly the winners of the reference algorithm (full
    (score desc, doc asc) sort then first-per-conv) — including score
    ties within AND across conversations."""
    from types import SimpleNamespace

    import pandas as pd

    from emailindexer_spark.plans.planner import SearchEngine

    rng = np.random.default_rng(17)
    for trial in range(60):
        n_rows = int(rng.integers(1, 400))
        # conv layout: contiguous doc ranges tiling [0, n_rows)
        n_convs = int(rng.integers(1, min(40, n_rows) + 1))
        cuts = np.sort(rng.choice(np.arange(1, n_rows), size=n_convs - 1, replace=False)) if n_convs > 1 else np.empty(0, np.int64)
        offs = np.concatenate(([0], cuts)).astype(np.int64)
        conv_ids = np.array([f"c{i}" for i in range(n_convs)], dtype=object)
        eng = SimpleNamespace(_off_bc=SimpleNamespace(value=(conv_ids, offs)))
        # candidate subset with heavy score ties (quantized scores)
        m = int(rng.integers(1, n_rows + 1))
        docs = np.sort(rng.choice(n_rows, size=m, replace=False)).astype(np.int64)
        scores = rng.integers(0, 4, size=m).astype(np.float64) / 2.0
        k = int(rng.integers(1, 12))

        got = SearchEngine._local_finish(eng, docs.copy(), scores.copy(), k, "conversations")

        order = np.lexsort((docs, -scores))
        ds, ss = docs[order], scores[order]
        oi_all = np.searchsorted(offs, ds, side="right") - 1
        first = ~pd.Series(oi_all).duplicated().to_numpy()
        ds, ss = ds[first][:k], ss[first][:k]
        oi = np.searchsorted(offs, ds, side="right") - 1
        assert list(got["doc_id"]) == list(ds), trial
        assert list(got["score"]) == list(ss), trial
        assert list(got["conv_id"]) == list(conv_ids[oi]), trial
        assert list(got["turn_idx"]) == list((ds - offs[oi]).astype(np.int32)), trial
