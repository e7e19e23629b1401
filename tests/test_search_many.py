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
