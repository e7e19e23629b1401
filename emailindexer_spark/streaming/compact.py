"""Posting-list compaction — the Lucene segment-merge analogue.

Streaming appends (streaming/ingest.py) add one fresh posting row
(split) per term per batch; after many batches a term's posting list is
spread over many small rows and query-side decode pays per-row
overhead.  ``compact_index`` merges every term's rows back into
minimal, freshly skew-split runs — exactly what Lucene's background
TieredMergePolicy does for segments (reference: Lucene merges implied
by S6, SURVEY.md §4 "Segment merge policy") — WITHOUT re-tokenizing or
touching the text:

* posting rows are decoded to (term, doc_id, tf, norm[, pos]) entries —
  the per-doc POSITION payloads are never decoded, only byte-split at
  doc boundaries (the codec's segmented delta+varbyte encodes each
  doc's positions independently, so merged runs re-assemble by
  concatenation, plans/builder._encode_one),
* heavy terms are re-split from EXACT per-term df (summed over rows —
  no sampling needed here), then the builder's own run encoder
  (_encode_runs) re-encodes, so compacted output is byte-compatible
  with a fresh build's,
* the new postings directory is swapped in with a rename pair +
  leftover repair (``_repair_partial``): a crash mid-swap is healed by
  every entry point that touches the postings dir — the next
  ``compact_index``, ``SearchEngine`` open, or ``incremental_append``
  all invoke the repair first — and ``term_dict`` needs NO rewrite:
  per (term, part) df is invariant under merging splits.

Doc ranges of distinct splits never overlap (base split ranges come
from doc-range cuts; each ingest batch's ids start at the previous
corpus size), so the merged run's doc_ids stay strictly increasing —
asserted by the encoder.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from emailindexer_spark.functions.codec import decode_block
from emailindexer_spark.plans.builder import POSTINGS_SCHEMA, _encode_runs
from emailindexer_spark.sources.checkpoint import Manifest

_ENTRY_SCHEMA = "term string, doc_id long, tf int, norm int"
_ENTRY_SCHEMA_POS = _ENTRY_SCHEMA + ", pos binary"


def _decode_entries(positions: bool):
    """Posting rows → per-doc entries; position payloads byte-split at
    doc boundaries (varbyte continuation-bit scan), never decoded."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            terms, docs, tfs, norms, poss = [], [], [], [], []
            for r in pdf.itertuples(index=False):
                for i in range(len(r.b_docs)):
                    d, t, n = decode_block(
                        int(r.b_first[i]), r.b_docs[i], r.b_tfs[i], r.b_norms[i]
                    )
                    terms.append(np.full(d.size, r.term, dtype=object))
                    docs.append(d)
                    tfs.append(t)
                    norms.append(n)
                    if positions:
                        raw = r.b_pos[i]
                        b = np.frombuffer(raw, dtype=np.uint8)
                        ends = np.nonzero((b & 0x80) == 0)[0] + 1
                        byte_ends = ends[np.cumsum(t) - 1]
                        byte_starts = np.concatenate(([0], byte_ends[:-1]))
                        poss.extend(raw[a:z] for a, z in zip(byte_starts, byte_ends))
            if not docs:
                continue
            out = {
                "term": np.concatenate(terms),
                "doc_id": np.concatenate(docs),
                "tf": np.concatenate(tfs).astype("int32"),
                "norm": np.concatenate(norms).astype("int32"),
            }
            if positions:
                out["pos"] = poss
            yield pd.DataFrame(out)

    return gen


def _repair_partial(man: Manifest) -> None:
    """Heal a crash mid-swap: live-missing+bak-present → restore; a
    stale tmp from an interrupted compact is discarded."""
    live = man.stage_path("postings")
    bak, tmp = live + ".bak", live + ".tmp"
    if not os.path.isdir(live) and os.path.isdir(bak):
        os.rename(bak, live)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(bak, ignore_errors=True)


def compact_index(
    spark: SparkSession,
    index_dir: str,
    heavy_df_threshold: int | None = None,
    split_target: int | None = None,
) -> Manifest:
    """Merge every term's posting rows into minimal skew-split runs."""
    man = Manifest.load_or_create(index_dir)
    if "n_rows" not in man.stats:
        raise ValueError(f"{index_dir} has no completed build")
    _repair_partial(man)
    from emailindexer_spark.streaming.ingest import repair_ingest_visibility

    repair_ingest_visibility(man)  # publish a committed-but-hidden append
    t0 = time.time()
    num_parts = int(man.params.get("num_parts", 32))
    block_size = int(man.params.get("block_size", 128))
    positions = bool(man.params.get("positions", False))
    heavy_df_threshold = heavy_df_threshold or int(
        man.params.get("heavy_df_threshold", 100_000)
    )
    split_target = split_target or int(man.params.get("split_target", 50_000))
    n_rows = int(man.stats["n_rows"])

    live = man.stage_path("postings")
    p = spark.read.parquet(live)
    cols = ["term", "b_first", "b_docs", "b_tfs", "b_norms"] + (
        ["b_pos"] if positions else []
    )
    entries = p.select(*cols).mapInPandas(
        _decode_entries(positions), _ENTRY_SCHEMA_POS if positions else _ENTRY_SCHEMA
    )
    # EXACT per-term df from the rows being merged — no sampling
    heavy = (
        p.groupBy("term")
        .agg(F.sum("df_row").alias("df"))
        .where(F.col("df") > heavy_df_threshold)
        .withColumn("n_splits", F.ceil(F.col("df") / F.lit(split_target)).cast("int"))
        .select("term", "n_splits")
    )
    rows = entries.join(F.broadcast(heavy), "term", "left").withColumn(
        "split_id",
        F.when(F.col("n_splits").isNull(), F.lit(0)).otherwise(
            F.floor(
                F.col("doc_id")
                / F.ceil(F.lit(max(1, n_rows)) / F.col("n_splits")).cast("long")
            ).cast("int")
        ),
    )
    width = max(num_parts, spark.sparkContext.defaultParallelism * 2)
    shuffle_cols = ["term", "split_id", "doc_id", "tf", "norm"] + (
        ["pos"] if positions else []
    )
    compacted = (
        rows.select(*shuffle_cols)
        .repartition(width, "term", "split_id")
        .sortWithinPartitions("term", "split_id", "doc_id")
        .mapInPandas(_encode_runs(block_size, num_parts), POSTINGS_SCHEMA)
    )
    tmp = live + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        compacted.repartition(num_parts, "part")
        .sortWithinPartitions("term", "split_id")
        .write.mode("overwrite")
        .partitionBy("part")
        .parquet(tmp)
    )
    # atomic-ish swap with crash repair; term_dict content is invariant
    # (df per (term, part) is preserved by merging), so only postings move
    bak = live + ".bak"
    os.rename(live, bak)
    os.rename(tmp, live)
    shutil.rmtree(bak)
    n_compactions = int(man.stats.get("compactions", 0)) + 1
    man.set_stats(compactions=n_compactions)
    man.commit_stage(
        f"compact_{n_compactions:04d}", seconds=round(time.time() - t0, 2)
    )
    return man
