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
