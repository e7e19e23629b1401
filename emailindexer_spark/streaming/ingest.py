"""Incremental / streaming index ingest.

The reference is batch-only — its index rebuild is a full delete+rewrite
(EmailIndexGenerator.java:45-50).  Our engine adds an append path: new
transcript turns get docIDs continuing from the current max (exactly
Lucene's insertion-order docID semantics), are tokenized and encoded
into NEW posting rows with a fresh ``split_id`` per ingest batch.
Because the query engine already handles multi-row posting lists whose
rows cover disjoint doc ranges (that is what skew splits are), appended
rows integrate with zero changes to the read path: per-term df sums over
rows, block decode is per-row, WAND shards see the union.

Corpus statistics (N, total_tokens → avgdl) are updated in the manifest
on every commit, so scores reflect the full corpus after each batch —
the same behavior as a Lucene commit making new segments visible.

``stream_ingest`` wires this into Structured Streaming via
``foreachBatch`` + ``trigger(availableNow)``; ``incremental_append`` is
the batch core, usable directly for micro-batch ETL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emailindexer_spark.plans.builder import (
    POSTINGS_SCHEMA,
    TF_SCHEMA,
    _encode_group,
    _tokenize_to_tf_rows,
)
from emailindexer_spark.sources.checkpoint import Manifest


def incremental_append(spark: SparkSession, index_dir: str, batch: DataFrame) -> Manifest:
    """Append one batch of transcripts to an existing index."""
    man = Manifest.load_or_create(index_dir)
    if "n_rows" not in man.stats:
        raise ValueError(f"{index_dir} has no completed base build")
    base = int(man.stats["n_rows"])
    num_parts = int(man.params.get("num_parts", 32))
    simple = bool(man.params.get("simple_tokens", False))
    batch_seq = int(man.stats.get("ingest_batches", 0)) + 1

    # docIDs: insertion order within the batch (stable (conv_id, turn_idx)
    # inside the batch), offset by the current corpus size
    from emailindexer_spark.operators.docid import assign_doc_ids

    with_ids = assign_doc_ids(batch, method="two_phase").withColumn(
        "doc_id", F.col("doc_id") + F.lit(base)
    )
    with_ids.select("doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "text").write.mode(
        "append"
    ).parquet(man.stage_path("doc_index"))

    tf_rows = with_ids.select("doc_id", "text").mapInPandas(
        _tokenize_to_tf_rows(simple), TF_SCHEMA
    ).persist()

    dl_df = tf_rows.groupBy("doc_id").agg(F.max("dl").alias("dl"), F.max("norm").alias("norm"))
    (
        with_ids.select("doc_id", "conv_id", "turn_idx")
        .join(dl_df, "doc_id", "left")
        .fillna(0, subset=["dl", "norm"])
        .write.mode("append")
        .parquet(man.stage_path("doc_stats"))
    )

    # every batch becomes one fresh split per term: doc ranges are
    # disjoint from all prior rows by construction (ids ≥ base)
    postings = (
        tf_rows.withColumn("split_id", F.lit(batch_seq * 1_000_000))
        .groupBy("term", "split_id")
        .applyInPandas(_encode_group(int(man.params.get("block_size", 128)), num_parts), POSTINGS_SCHEMA)
    )
    postings.repartition(max(1, num_parts // 4), "part").write.mode("append").partitionBy(
        "part"
    ).parquet(man.stage_path("postings"))

    agg = dl_df.agg(F.count("*"), F.sum("dl")).collect()[0]
    n_batch = with_ids.count()
    tf_rows.unpersist(blocking=False)
    man.set_stats(
        n_rows=base + n_batch,
        max_doc_id=base + n_batch - 1,
        n_docs=int(man.stats["n_docs"]) + int(agg[0] or 0),
        total_tokens=int(man.stats["total_tokens"]) + int(agg[1] or 0),
        ingest_batches=batch_seq,
    )
    man.commit_stage(f"ingest_{batch_seq:06d}", rows=n_batch)
    return man


def stream_ingest(
    spark: SparkSession,
    index_dir: str,
    source_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Structured Streaming: watch source_dir for transcript parquet and
    append each micro-batch to the index.  Returns the StreamingQuery."""
    schema = (
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        incremental_append(spark, index_dir, batch_df)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
