"""Batched multi-query execution equals per-query execution."""

from emailindexer_spark.plans.planner import SearchEngine


def test_search_many_matches_single(spark, index_dir):
    eng = SearchEngine(spark, index_dir)
    batch = {
        "a": ("qojema", 5, "turns"),
        "b": ("qojema fuhepi", 5, "turns"),
        "c": ("fuhepi", 3, "conversations"),
        "d": ("zzznothere", 5, "turns"),
    }
    got = eng.search_many(batch, use_wand=False).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, (q, k, mode) in batch.items():
        single = [
            (r["rank"], r["doc_id"], r["score"])
            for r in eng.search(q, k=k, mode=mode, use_wand=False).collect()
        ]
        assert sorted(by_q.get(qid, [])) == sorted(single), qid


def test_search_many_shared_scan_mixed(spark, index_dir):
    # flat queries (shared scan: AND/NOT/boost/musts) mixed with
    # non-flat fallbacks (phrase/prefix/fuzzy) in one batch
    eng = SearchEngine(spark, index_dir)
    batch = {
        "and": ("qojema AND fuhepi", 5, "turns"),
        "not": ("qojema -fuhepi", 5, "turns"),
        "boost": ("qojema^2 fuhepi", 5, "turns"),
        "must": ("+qojema fuhepi noza", 5, "turns"),
        "conv": ("qojema fuhepi", 4, "conversations"),
        "phrase": ('"noza guka"', 5, "turns"),
        "prefix": ("qo*", 5, "turns"),
        "fuzzy": ("qojema~1", 5, "turns"),
        "negonly": ("-qojema", 5, "turns"),
    }
    got = eng.search_many(batch).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], round(r["score"], 9)))
    for qid, (q, k, mode) in batch.items():
        single = [
            (r["rank"], r["doc_id"], round(r["score"], 9))
            for r in eng.search(q, k=k, mode=mode, use_wand=False).collect()
        ]
        assert sorted(by_q.get(qid, [])) == sorted(single), qid
    assert by_q.get("negonly") is None  # pure-negative matches nothing


def test_kernel_chunking_invariant(spark, index_dir, monkeypatch):
    # the batch kernel bounds executor memory by processing doc-aligned
    # chunks; forcing tiny chunks must not change any query's results
    import emailindexer_spark.plans.planner as P

    eng = SearchEngine(spark, index_dir)
    batch = {
        "a": ("qojema fuhepi", 5, "turns"),
        "b": ("+qojema fuhepi", 5, "turns"),
        "c": ("qojema -fuhepi", 4, "conversations"),
    }
    base = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in eng.search_many(batch, use_wand=False).collect()
    )
    monkeypatch.setattr(P, "KERNEL_MAX_CELLS", 16)  # a few docs per chunk
    tiny = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in eng.search_many(batch, use_wand=False).collect()
    )
    assert tiny == base and base


def test_conv_offsets_fast_path_matches_join_fallback(spark, index_dir):
    # dense-docid indexes attach (conv_id, turn_idx) via the broadcast
    # conv_offsets searchsorted; disabling it (the non-dense / appended
    # index fallback: doc_stats join) must give identical results on
    # both the single-query and the batched path
    eng_fast = SearchEngine(spark, index_dir)
    assert eng_fast._off_bc is not None, "fixture index should be dense"
    eng_join = SearchEngine(spark, index_dir)
    eng_join._off_bc = None

    def snap(eng):
        rows = []
        for q, k, mode in [
            ("qojema", 5, "turns"),
            ("qojema fuhepi", 4, "conversations"),
        ]:
            rows += [
                (q, r["rank"], r["doc_id"], r["conv_id"], r["turn_idx"], round(r["score"], 9))
                for r in eng.search(q, k=k, mode=mode, use_wand=False).collect()
            ]
        rows += sorted(
            (r["query_id"], r["rank"], r["doc_id"], r["conv_id"], r["turn_idx"], round(r["score"], 9))
            for r in eng.search_many(
                {"x": ("qojema fuhepi", 5, "turns")}, use_wand=False
            ).collect()
        )
        return rows

    assert snap(eng_fast) == snap(eng_join) and snap(eng_fast)
