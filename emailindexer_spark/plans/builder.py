"""Distributed inverted-index build (SURVEY.md §2.10, §3.3).

Replaces the reference's sequential paged scan → Lucene IndexWriter loop
(EmailIndexGenerator.java:45-101) with a Spark-first pipeline:

  stage doc_index   sanitize (BodyReplyRemover parity, optional) →
                    docID assignment (two-phase, operators/docid.py) →
                    stored-fields table, range-partitioned by doc_id
  stage doc_stats   single tokenize pass (Arrow/pandas UDF, vectorized) →
                    (doc_id, term, tf, dl, norm) rows → per-doc lengths +
                    SmallFloat norms; global N/avgdl into the manifest
  stage postings    heavy-term detection from per-term doc frequencies →
                    explicit skew splitting: df > threshold terms are cut
                    into doc-range splits → ONE salted
                    repartition-by-(term, split) shuffle →
                    applyInPandas encodes each sorted run into
                    delta+varbyte blocks with block-max metadata →
                    written partitioned by part = md5(term) % P
                    (query-side partition pruning)
  stage build_metrics  per-part lineage: postings rows written, payload
                    bytes, skew splits (FIXTURES.md §5)

Every stage commits a snapshot in the manifest (sources/checkpoint.py);
``build(resume=True)`` skips committed stages, reproducing byte-identical
postings after a mid-build kill.

Scale notes (the 100 TB story):
* exactly two wide shuffles touch per-token data: the tf-row aggregation
  implicit in tokenize (map-side, inside the UDF — no Spark shuffle) and
  the repartition-by-(term, split); everything else shuffles per-doc or
  per-term rows,
* skew: without splitting, a 40%-presence stopword's posting run lands in
  one task; with df-proportional splits each task gets ≤ split_target
  postings regardless of term skew,
* no driver-side loops over data; driver only handles P-sized summaries.
"""

from __future__ import annotations

import math
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emailindexer_spark.functions.codec import BLOCK_SIZE, encode_blocks
from emailindexer_spark.functions.sanitize import remove_quoted_replies
from emailindexer_spark.functions.smallfloat import encode_lengths
from emailindexer_spark.functions.tokenizer import tokenize_series
from emailindexer_spark.operators.docid import (
    assign_doc_ids_with_total,
    validate_transcripts,
)
from emailindexer_spark.sources.checkpoint import Manifest

POSTINGS_SCHEMA = (
    "term string, split_id int, part int, df_row long, first_doc long, last_doc long, "
    "b_first array<long>, b_last array<long>, b_n array<int>, b_maxtf array<int>, "
    "b_minnorm array<int>, b_docs array<binary>, b_tfs array<binary>, b_norms array<binary>"
)

TF_SCHEMA = "doc_id long, term string, tf int, dl int, norm int"


def ensure_parallelism(df: DataFrame, target: int) -> DataFrame:
    """Floor a DataFrame's partition count.

    The tokenize stage is map-side of whatever partitioning the scan
    produced; a small-but-dense parquet input (text compresses ~10x)
    otherwise serializes the most expensive stage of the build.  At real
    cluster scale inputs arrive in thousands of splits and this is a
    no-op."""
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def term_part_expr(term_col, num_parts: int):
    """part = int(md5(term)[:8], 16) % P — driver-computable (python
    hashlib gives the same value), so query planning prunes partitions
    without a Spark job."""
    return F.pmod(
        F.conv(F.substring(F.md5(term_col), 1, 8), 16, 10).cast("long"),
        F.lit(num_parts),
    ).cast("int")


def term_part_py(term: str, num_parts: int) -> int:
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % num_parts


def _tokenize_to_tf_rows(simple: bool):
    """mapInPandas: (doc_id, text) batches → (doc_id, term, tf, dl, norm)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            toks = tokenize_series(pdf["text"], simple=simple)
            nlens = toks.str.len().to_numpy(dtype=np.int64)
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            if nlens.sum() == 0:
                continue
            flat_docs = np.repeat(doc_ids, nlens)
            flat_terms = np.concatenate([t for t in toks.to_numpy() if len(t)])
            grouped = (
                pd.DataFrame({"doc_id": flat_docs, "term": flat_terms})
                .groupby(["doc_id", "term"], sort=False)
                .size()
                .reset_index(name="tf")
            )
            dl_map = pd.Series(nlens, index=doc_ids)
            dl = dl_map.reindex(grouped["doc_id"]).to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": grouped["doc_id"],
                    "term": grouped["term"],
                    "tf": grouped["tf"].astype("int32"),
                    "dl": dl.astype("int32"),
                    "norm": encode_lengths(dl).astype("int32"),
                }
            )

    return gen


def _encode_one(term: str, split_id: int, pdf: pd.DataFrame, block_size: int, num_parts: int) -> dict:
    docs = pdf["doc_id"].to_numpy(dtype=np.int64)
    order = np.argsort(docs, kind="stable")
    docs = docs[order]
    eb = encode_blocks(
        docs,
        pdf["tf"].to_numpy(dtype=np.int64)[order],
        pdf["norm"].to_numpy(dtype=np.int64)[order],
        block_size=block_size,
    )
    return {
        "term": term,
        "split_id": split_id,
        "part": term_part_py(term, num_parts),
        "df_row": int(docs.size),
        "first_doc": int(docs[0]),
        "last_doc": int(docs[-1]),
        "b_first": eb.first_doc.tolist(),
        "b_last": eb.last_doc.tolist(),
        "b_n": eb.n.tolist(),
        "b_maxtf": eb.max_tf.tolist(),
        "b_minnorm": eb.min_norm.tolist(),
        "b_docs": eb.doc_bytes,
        "b_tfs": eb.tf_bytes,
        "b_norms": eb.norm_bytes,
    }


def _encode_group(block_size: int, num_parts: int):
    """applyInPandas over one (term, split_id) group → one posting row.
    Kept for the incremental/streaming path, where batches are small."""

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iat[0]
        split_id = int(pdf["split_id"].iat[0])
        return pd.DataFrame([_encode_one(term, split_id, pdf, block_size, num_parts)])

    return enc


def _encode_runs(block_size: int, num_parts: int):
    """mapInPandas over partitions hash-clustered by (term, split_id) and
    sorted so each group is a contiguous run.

    One Arrow stream per PARTITION instead of one pandas call per GROUP:
    a vocabulary-scale build has 10^4..10^8 mostly-tiny groups, and the
    per-group Arrow round-trip dominates applyInPandas; run detection via
    a vectorized group-boundary scan removes that overhead.  Runs spanning
    Arrow batch boundaries are carried over."""

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        out: list[dict] = []

        def flush_complete(pdf: pd.DataFrame, last_incomplete: bool):
            nonlocal carry
            keys = pdf["term"].to_numpy()
            splits = pdf["split_id"].to_numpy()
            # boundaries where (term, split) changes
            change = np.nonzero((keys[1:] != keys[:-1]) | (splits[1:] != splits[:-1]))[0] + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(pdf)]))
            last = len(starts) - 1
            for gi, (s, e) in enumerate(zip(starts, ends)):
                if last_incomplete and gi == last:
                    carry = pdf.iloc[s:e]
                    return
                out.append(
                    _encode_one(keys[s], int(splits[s]), pdf.iloc[s:e], block_size, num_parts)
                )
            carry = None

        for pdf in it:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            flush_complete(pdf, last_incomplete=True)
            if out:
                yield pd.DataFrame(out)
                out = []
        if carry is not None and len(carry):
            out.append(
                _encode_one(
                    carry["term"].iat[0], int(carry["split_id"].iat[0]), carry, block_size, num_parts
                )
            )
        if out:
            yield pd.DataFrame(out)

    return enc


class IndexBuilder:
    """Build (or resume) an index directory from a transcripts DataFrame."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        num_parts: int = 32,
        block_size: int = BLOCK_SIZE,
        heavy_df_threshold: int = 100_000,
        split_target: int = 50_000,
        simple_tokens: bool = False,
        sanitize: bool = False,
        validate: bool = False,
        docid_method: str = "two_phase",
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.num_parts = num_parts
        self.block_size = block_size
        self.heavy_df_threshold = heavy_df_threshold
        self.split_target = split_target
        self.simple_tokens = simple_tokens
        self.sanitize = sanitize
        self.validate = validate
        self.docid_method = docid_method

    def _params(self) -> dict:
        return {
            "num_parts": self.num_parts,
            "block_size": self.block_size,
            "heavy_df_threshold": self.heavy_df_threshold,
            "split_target": self.split_target,
            "simple_tokens": self.simple_tokens,
            "sanitize": self.sanitize,
        }

    def build(self, transcripts: DataFrame, resume: bool = False) -> Manifest:
        man = Manifest.load_or_create(self.out_dir, self._params())
        if not resume:
            # a fresh build over an existing manifest restarts the ledger
            for st in list(man.stages):
                man.stages.pop(st)
            man._flush()

        # ---------------------------------------------------- doc_index
        if not man.is_complete("doc_index"):
            t0 = time.time()
            df = ensure_parallelism(
                transcripts,
                max(self.num_parts, self.spark.sparkContext.defaultParallelism),
            )
            if self.validate:
                validate_transcripts(df)
            if self.sanitize:
                clean = F.pandas_udf(remove_quoted_replies, "string")
                df = df.withColumn("text", clean(F.col("text")))
            df, _n_total = assign_doc_ids_with_total(df, method=self.docid_method)
            # written in the docid join's own partitioning (hashed by
            # conv_id): avoids a second full shuffle of the text payload.
            # doc_ids correlate with conv order, so sorting within
            # partitions still yields tight per-row-group doc_id min/max
            # stats for lookup pruning.
            (
                df.select("doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "text")
                .sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .parquet(man.stage_path("doc_index"))
            )
            man.commit_stage("doc_index", seconds=round(time.time() - t0, 2))
        doc_index = self.spark.read.parquet(man.stage_path("doc_index"))

        # ---------------------------------------------------- tf rows (transient)
        # tokenize wants ~2 tasks per core: scan-aligned tasks straggle on
        # uneven file sizes, and the shuffle that fixes it costs far less
        # than the tokenization it balances (measured 5x on 600k turns)
        par_target = max(
            self.num_parts, 2 * self.spark.sparkContext.defaultParallelism
        )
        from pyspark import StorageLevel

        tf_rows = ensure_parallelism(
            doc_index.select("doc_id", "text"), par_target
        ).mapInPandas(_tokenize_to_tf_rows(self.simple_tokens), TF_SCHEMA)
        # reused by doc_stats, df-stats and postings → persist once
        tf_rows = tf_rows.persist(StorageLevel.MEMORY_AND_DISK)

        # ---------------------------------------------------- doc_stats
        if not man.is_complete("doc_stats"):
            t0 = time.time()
            dl_df = tf_rows.groupBy("doc_id").agg(
                F.max("dl").alias("dl"), F.max("norm").alias("norm")
            )
            (
                doc_index.select("doc_id", "conv_id", "turn_idx")
                .join(dl_df, "doc_id", "left")
                .fillna(0, subset=["dl", "norm"])
                .repartitionByRange(self.num_parts, "doc_id")
                .sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .parquet(man.stage_path("doc_stats"))
            )
            man.commit_stage("doc_stats", seconds=round(time.time() - t0, 2))
        doc_stats = self.spark.read.parquet(man.stage_path("doc_stats"))
        if "n_docs" not in man.stats or not man.is_complete("postings"):
            # one aggregation job: Lucene stats (docCount/avgdl over docs
            # with ≥1 token, §2.9) + total row count
            agg = doc_stats.agg(
                F.count("*").alias("rows"),
                F.count(F.when(F.col("dl") > 0, 1)).alias("n"),
                F.sum("dl").alias("total"),
            ).collect()[0]
            man.set_stats(
                n_docs=int(agg["n"] or 0),
                total_tokens=int(agg["total"] or 0),
                n_rows=int(agg["rows"]),
                max_doc_id=int(agg["rows"]) - 1,
            )

        # ---------------------------------------------------- postings
        if not man.is_complete("postings"):
            t0 = time.time()
            n_rows = int(man.stats["n_rows"])
            df_t = tf_rows.groupBy("term").agg(F.count("*").alias("df"))
            heavy = (
                df_t.where(F.col("df") > self.heavy_df_threshold)
                .withColumn(
                    "n_splits",
                    F.ceil(F.col("df") / F.lit(self.split_target)).cast("int"),
                )
                .select("term", "n_splits")
            )
            rows = tf_rows.join(F.broadcast(heavy), "term", "left").withColumn(
                "split_id",
                F.when(F.col("n_splits").isNull(), F.lit(0)).otherwise(
                    F.floor(
                        F.col("doc_id")
                        / F.ceil(F.lit(n_rows) / F.col("n_splits")).cast("long")
                    ).cast("int")
                ),
            )
            postings = (
                rows.repartition(
                    max(self.num_parts, self.spark.sparkContext.defaultParallelism * 2),
                    "term",
                    "split_id",
                )
                .sortWithinPartitions("term", "split_id", "doc_id")
                .mapInPandas(_encode_runs(self.block_size, self.num_parts), POSTINGS_SCHEMA)
            )
            (
                postings.repartition(self.num_parts, "part")
                .sortWithinPartitions("term", "split_id")
                .write.mode("overwrite")
                .partitionBy("part")
                .parquet(man.stage_path("postings"))
            )
            man.commit_stage("postings", seconds=round(time.time() - t0, 2))
        tf_rows.unpersist(blocking=False)

        # ---------------------------------------------------- build_metrics
        if not man.is_complete("build_metrics"):
            p = self.spark.read.parquet(man.stage_path("postings"))
            payload_bytes = (
                F.aggregate(
                    F.transform(
                        F.col("b_docs"), lambda x: F.octet_length(x)
                    ),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x,
                )
                + F.aggregate(
                    F.transform(F.col("b_tfs"), lambda x: F.octet_length(x)),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x,
                )
                + F.aggregate(
                    F.transform(F.col("b_norms"), lambda x: F.octet_length(x)),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x,
                )
            )
            metrics = (
                p.withColumn("payload_bytes", payload_bytes)
                .groupBy("part")
                .agg(
                    F.count("*").alias("posting_rows"),
                    F.sum("df_row").alias("postings_written"),
                    F.sum("payload_bytes").alias("bytes_compressed"),
                    F.sum(F.when(F.col("split_id") > 0, 1).otherwise(0)).alias("skew_splits"),
                    F.countDistinct("term").alias("n_terms"),
                )
                .withColumn("snapshot_id", F.lit(man.snapshot_id))
            )
            metrics.write.mode("overwrite").parquet(man.stage_path("build_metrics"))
            g = self.spark.read.parquet(man.stage_path("build_metrics")).agg(
                F.sum("postings_written"), F.sum("bytes_compressed"), F.sum("skew_splits")
            ).collect()[0]
            man.set_stats(
                postings_written=int(g[0] or 0),
                bytes_compressed=int(g[1] or 0),
                skew_splits=int(g[2] or 0),
            )
            man.commit_stage("build_metrics")
        return man


def avgdl_from_stats(stats: dict) -> float:
    n = stats.get("n_docs", 0)
    return (stats["total_tokens"] / n) if n else 0.0


def n_shards_for(n_rows: int, target_per_shard: int = 262_144) -> int:
    return max(1, math.ceil(n_rows / target_per_shard))
