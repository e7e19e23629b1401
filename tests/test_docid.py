"""docID assignment: two-phase == window, invariant to partition count
(FIXTURES.md §6.2)."""

import pytest
from pyspark.sql import functions as F

from emailindexer_spark.operators.docid import assign_doc_ids, validate_transcripts


@pytest.fixture(scope="module")
def small(spark, corpus_sdf):
    return corpus_sdf.limit(1200).cache()


def _ids(df):
    return {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in df.select("conv_id", "turn_idx", "doc_id").collect()
    }


def test_two_phase_equals_window(spark, small):
    a = _ids(assign_doc_ids(small, method="window"))
    b = _ids(assign_doc_ids(small, method="two_phase"))
    assert a == b


@pytest.mark.parametrize("nparts", [2, 8, 32])
def test_invariant_to_partitioning(spark, small, nparts):
    base = _ids(assign_doc_ids(small, method="window"))
    shuffled = small.repartition(nparts)
    got = _ids(assign_doc_ids(shuffled, method="two_phase", num_partitions=nparts))
    assert got == base


def test_dense_zero_based(spark, small):
    df = assign_doc_ids(small, method="two_phase")
    n = df.count()
    agg = df.agg(
        F.min("doc_id").alias("mn"),
        F.max("doc_id").alias("mx"),
        F.countDistinct("doc_id").alias("d"),
    ).collect()[0]
    assert agg["mn"] == 0 and agg["mx"] == n - 1 and agg["d"] == n


def test_partial_conversations_no_collisions(spark):
    # a streaming batch may hold only turns 5..9 of a conversation;
    # doc_ids must stay dense and unique (rank within conv, not turn_idx)
    rows = [("c1", i, "x") for i in range(5, 10)] + [("c2", i, "y") for i in range(3)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    d = assign_doc_ids(df, method="two_phase")
    ids = sorted(r["doc_id"] for r in d.collect())
    assert ids == list(range(8))
    got = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in d.collect()}
    assert got[("c1", 5)] == 0 and got[("c1", 9)] == 4 and got[("c2", 0)] == 5


def test_validate_rejects_sparse_turns(spark):
    bad = spark.createDataFrame(
        [("c1", 0, "x"), ("c1", 2, "y")], "conv_id string, turn_idx int, text string"
    )
    with pytest.raises(ValueError):
        validate_transcripts(bad)
    ok = spark.createDataFrame(
        [("c1", 0, "x"), ("c1", 1, "y")], "conv_id string, turn_idx int, text string"
    )
    validate_transcripts(ok)


def test_big_path_matches_small_path(spark, small):
    # force the at-scale machinery (range-partitioned per-partition
    # sums + co-partitioned shuffle join + window) by capping the
    # driver-collect threshold below the conv count, and prove it
    # assigns the exact same ids as the small-table driver path
    from emailindexer_spark.operators.docid import assign_doc_ids_with_total

    base = _ids(assign_doc_ids(small, method="window"))
    big, total_b = assign_doc_ids_with_total(
        small.repartition(7), max_broadcast_convs=2
    )
    assert _ids(big) == base and total_b == small.count()
    # partial conversations through the big path too (rank, not turn_idx)
    rows = [("c1", i, "x") for i in range(5, 10)] + [("c2", i, "y") for i in range(3)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got, _t = assign_doc_ids_with_total(df, max_broadcast_convs=1)
    ids = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in got.collect()}
    assert ids[("c1", 5)] == 0 and ids[("c1", 9)] == 4 and ids[("c2", 0)] == 5
