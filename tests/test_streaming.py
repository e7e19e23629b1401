"""Incremental / Structured Streaming ingest: appended batches integrate
with the read path and match an oracle built in insertion order."""

import os
import shutil
import tempfile

import pytest

from emailindexer_spark.oracle import build_oracle_index, search as osearch
from emailindexer_spark.plans.builder import IndexBuilder
from emailindexer_spark.plans.planner import SearchEngine
from emailindexer_spark.sources.fixtures import make_transcripts
from emailindexer_spark.streaming.ingest import incremental_append, stream_ingest


@pytest.fixture(scope="module")
def corpus3(corpus_pdf):
    """Corpus cut into base + two append batches (whole conversations)."""
    convs = corpus_pdf["conv_id"].unique()
    c1, c2 = convs[: len(convs) // 2], convs[len(convs) // 2 : 3 * len(convs) // 4]
    base = corpus_pdf[corpus_pdf.conv_id.isin(set(c1))]
    b1 = corpus_pdf[corpus_pdf.conv_id.isin(set(c2))]
    b2 = corpus_pdf[~corpus_pdf.conv_id.isin(set(c1) | set(c2))]
    return base, b1, b2


@pytest.mark.slow
def test_incremental_append_matches_oracle(spark, corpus3):
    base, b1, b2 = corpus3
    d = tempfile.mkdtemp(prefix="ix_stream_")
    try:
        IndexBuilder(spark, d, num_parts=8, heavy_df_threshold=500, split_target=400).build(
            spark.createDataFrame(base)
        )
        incremental_append(spark, d, spark.createDataFrame(b1))
        incremental_append(spark, d, spark.createDataFrame(b2))
        eng = SearchEngine(spark, d)
        assert eng.n_rows == len(base) + len(b1) + len(b2)
        # oracle in the engine's insertion order: each chunk sorted, chained
        rows = []
        for chunk in (base, b1, b2):
            rows += sorted(
                chunk[["conv_id", "turn_idx", "text"]].itertuples(index=False, name=None)
            )
        ix = build_oracle_index(rows, sort=False)
        for q, mode in [("qojema", "turns"), ("qojema fuhepi", "turns"), ("fuhepi", "conversations")]:
            exp = osearch(ix, q, k=10, mode=mode)
            got = [
                (r["doc_id"], r["score"])
                for r in eng.search(q, k=10, mode=mode, use_wand=False).collect()
            ]
            assert [x[0] for x in got] == [x[0] for x in exp], (q, mode)
            for (_, a), (_, b) in zip(got, exp):
                assert abs(a - b) <= 1e-6 * max(1.0, abs(b))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_manifest_first_append_visibility(spark, corpus3):
    # MANIFEST-FIRST publish: (1) a reader opening the index after the
    # batch's files were moved into the live tables but BEFORE the
    # manifest commit sees exactly the pre-append corpus (the files are
    # hidden); (2) a crash AFTER the commit but before the rename-
    # visible step is healed at the next engine open, which sees the
    # fully-appended corpus.
    import glob

    import emailindexer_spark.streaming.ingest as ING
    from emailindexer_spark.sources.checkpoint import Manifest

    base, b1, b2 = corpus3
    d = tempfile.mkdtemp(prefix="ix_vis_")

    def snap(eng):
        out = []
        for q, mode in [("qojema", "turns"), ("fuhepi", "conversations")]:
            out += [
                (q, r["rank"], r["doc_id"], round(r["score"], 9))
                for r in eng.search(q, k=10, mode=mode, use_wand=False).collect()
            ]
        return out

    try:
        IndexBuilder(spark, d, num_parts=8, heavy_df_threshold=500, split_target=400).build(
            spark.createDataFrame(base)
        )
        pre = snap(SearchEngine(spark, d))

        # ---- window 1: moved-but-uncommitted (crash before commit) ----
        orig_commit = Manifest.commit_stage_with_stats

        def boom(self, *a, **k):
            raise RuntimeError("crash before manifest commit")

        Manifest.commit_stage_with_stats = boom
        try:
            with pytest.raises(RuntimeError, match="crash before"):
                incremental_append(spark, d, spark.createDataFrame(b1), batch_id=3)
        finally:
            Manifest.commit_stage_with_stats = orig_commit
        hidden = [
            f for f in os.listdir(os.path.join(d, "doc_index")) if f.startswith(".ing")
        ]
        assert hidden, "the crashed append must have staged hidden files"
        mid = SearchEngine(spark, d)
        assert mid.n_rows == len(base)
        assert snap(mid) == pre, "mid-append reader must see the pre-append corpus"
        # the writer's retry completes the append
        incremental_append(spark, d, spark.createDataFrame(b1), batch_id=3)
        eng_full = SearchEngine(spark, d)
        assert eng_full.n_rows == len(base) + len(b1)
        full = snap(eng_full)

        # ---- window 2: committed-but-hidden (crash before publish) ----
        orig_unhide = ING._unhide_tagged
        ING._unhide_tagged = lambda live, tag: None
        try:
            incremental_append(spark, d, spark.createDataFrame(b2), batch_id=4)
        finally:
            ING._unhide_tagged = orig_unhide
        assert any(
            f.startswith(".ing") for f in os.listdir(os.path.join(d, "doc_index"))
        ), "batch 4's files must still be hidden"
        healed = SearchEngine(spark, d)  # open-time repair publishes them
        assert healed.n_rows == len(base) + len(b1) + len(b2)
        assert not any(
            f.startswith(".ing")
            for t in ("doc_index", "doc_stats", "term_dict")
            for f in os.listdir(os.path.join(d, t))
        )
        assert len(snap(healed)) >= len(full)
        # every live parquet is readable and the corpus totals reconcile
        n = sum(
            len(spark.read.parquet(p).columns) >= 0
            for p in glob.glob(os.path.join(d, "doc_index", "*.parquet"))
        )
        assert n > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_replayed_batch_id_is_noop_and_crash_repair(spark, corpus3):
    # Structured Streaming delivers foreachBatch at-least-once: a replay
    # of a committed batch_id must not duplicate docs or inflate stats,
    # and a crashed half-append (tagged files present, manifest not
    # committed) must be cleaned up by the retry.
    import glob

    from emailindexer_spark.sources.checkpoint import Manifest

    base, b1, _ = corpus3
    d = tempfile.mkdtemp(prefix="ix_idem_")
    try:
        IndexBuilder(spark, d, num_parts=8, heavy_df_threshold=500, split_target=400).build(
            spark.createDataFrame(base)
        )
        sdf1 = spark.createDataFrame(b1)
        incremental_append(spark, d, sdf1, batch_id=7)
        man = Manifest.load_or_create(d)
        stats_after = dict(man.stats)
        n_files = len(glob.glob(os.path.join(d, "doc_index", "*")))
        # replay the SAME batch id → complete no-op
        incremental_append(spark, d, sdf1, batch_id=7)
        man2 = Manifest.load_or_create(d)
        assert man2.stats == stats_after
        assert len(glob.glob(os.path.join(d, "doc_index", "*"))) == n_files
        # simulate a crashed half-append of the NEXT batch: stray tagged
        # files in the live table must be removed before the rewrite
        tag = "ingb000000000008"
        stray = os.path.join(d, "doc_index", f"{tag}-part-junk.parquet")
        with open(stray, "wb"):
            pass
        # (an unreadable 0-byte parquet would poison every later scan)
        incremental_append(spark, d, spark.createDataFrame(b1.head(50)), batch_id=8)
        assert not os.path.exists(stray)
        eng = SearchEngine(spark, d)
        assert eng.n_rows == len(base) + len(b1) + 50
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_stream_ingest_available_now(spark, corpus3):
    base, b1, _ = corpus3
    d = tempfile.mkdtemp(prefix="ix_streamq_")
    src = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        IndexBuilder(spark, d, num_parts=8, heavy_df_threshold=500, split_target=400).build(
            spark.createDataFrame(base)
        )
        spark.createDataFrame(b1).write.mode("overwrite").parquet(os.path.join(src, "batch1"))
        q = stream_ingest(spark, d, os.path.join(src, "batch1"), ckpt)
        q.awaitTermination(120)
        eng = SearchEngine(spark, d)
        assert eng.n_rows == len(base) + len(b1)
        assert eng.search("qojema", k=5).count() == 5
    finally:
        for p in (d, src, ckpt):
            shutil.rmtree(p, ignore_errors=True)


@pytest.mark.slow
def test_compact_merges_ingested_splits(spark, corpus3):
    from pyspark.sql import functions as F

    from emailindexer_spark.streaming.compact import compact_index, _repair_partial
    from emailindexer_spark.sources.checkpoint import Manifest

    base, b1, b2 = corpus3
    d = tempfile.mkdtemp(prefix="ix_compact_")
    try:
        IndexBuilder(spark, d, num_parts=8, heavy_df_threshold=500, split_target=400).build(
            spark.createDataFrame(base)
        )
        incremental_append(spark, d, spark.createDataFrame(b1))
        incremental_append(spark, d, spark.createDataFrame(b2))
        eng = SearchEngine(spark, d)
        queries = [("qojema", "turns"), ("qojema fuhepi", "turns"), ('"noza guka"', "turns"), ("fuhepi", "conversations")]
        before = {
            (q, m): [
                (r["doc_id"], round(r["score"], 9))
                for r in eng.search(q, k=10, mode=m, use_wand=False).collect()
            ]
            for q, m in queries
        }
        p = spark.read.parquet(os.path.join(d, "postings"))
        rows_before = p.count()
        # ingest created per-batch splits: some term must have >1 row
        multi = p.groupBy("term").count().where("count > 1").count()
        assert multi > 0, "fixture must produce multi-row terms pre-compaction"
        dfs_before = {r["term"]: r["df"] for r in p.groupBy("term").agg(F.sum("df_row").alias("df")).collect()}

        man = compact_index(spark, d)
        assert man.stats["compactions"] == 1

        eng2 = SearchEngine(spark, d)
        p2 = spark.read.parquet(os.path.join(d, "postings"))
        rows_after = p2.count()
        assert rows_after < rows_before  # splits merged
        # every non-heavy term is now exactly ONE row
        assert p2.groupBy("term").count().where("count > 1").join(
            p2.groupBy("term").agg(F.sum("df_row").alias("df")).where(F.col("df") <= 500),
            "term",
        ).count() == 0
        # df per term invariant (term_dict untouched by design)
        dfs_after = {r["term"]: r["df"] for r in p2.groupBy("term").agg(F.sum("df_row").alias("df")).collect()}
        assert dfs_after == dfs_before
        for (q, m), exp in before.items():
            got = [
                (r["doc_id"], round(r["score"], 9))
                for r in eng2.search(q, k=10, mode=m, use_wand=False).collect()
            ]
            assert got == exp, (q, m)
        # ingest AFTER compaction still integrates
        extra = base.head(0)
        incremental_append(spark, d, spark.createDataFrame(b1.assign(conv_id="zz_" + b1["conv_id"])))
        eng3 = SearchEngine(spark, d)
        assert eng3.n_rows == eng2.n_rows + len(b1)
        # crash-repair: a leftover .bak with live missing is restored
        live = os.path.join(d, "postings")
        os.rename(live, live + ".bak")
        _repair_partial(Manifest.load_or_create(d))
        assert os.path.isdir(live) and not os.path.isdir(live + ".bak")
    finally:
        shutil.rmtree(d, ignore_errors=True)
