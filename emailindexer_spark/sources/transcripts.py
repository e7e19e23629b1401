"""Transcript table loading/derivation.

``load_transcripts`` reads a real transcripts table (input_hint shape).
``derived_transcripts`` deterministically derives a transcripts table
from the sandbox ``documents`` parquet (each document becomes one turn;
conversations are doc_id mod N_CONV) — the same derivation is expressed
in ANSI SQL by the DuckDB oracles in ``__spark_entry__``, so the two
engines see bit-identical inputs.  Keep the two definitions in lock-step.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_CONV = 128

#: SQL prelude mirroring derived_transcripts + docID assignment — prefix
#: for every transcript-based DuckDB oracle query.
SQL_TRANSCRIPTS_PRELUDE = f"""
WITH transcripts AS (
  SELECT 'c' || lpad(CAST(doc_id % {N_CONV} AS VARCHAR), 4, '0') AS conv_id,
         CAST(row_number() OVER (PARTITION BY (doc_id % {N_CONV}) ORDER BY doc_id) - 1 AS INTEGER) AS turn_idx,
         text
  FROM documents
),
docs AS (
  SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id,
         conv_id, turn_idx, text
  FROM transcripts
)"""


#: transcripts schema (BASELINE.json input_hint) — used for schema-less
#: text formats so types land right without inference scans
TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def load_transcripts(spark: SparkSession, path: str, format: str | None = None) -> DataFrame:
    """Read a materialized transcripts table.

    ``format``: ``parquet`` (default), ``jsonl``/``json`` (one object
    per line), ``csv`` (headered) — inferred from the path suffix when
    None.  Text formats read with the explicit input_hint schema (no
    inference pass; a malformed row fails loudly via FAILFAST rather
    than nulling out)."""
    fmt = format
    if fmt is None:
        low = path.rstrip("/").lower()
        if low.endswith((".jsonl", ".json", ".ndjson")):
            fmt = "json"
        elif low.endswith(".csv"):
            fmt = "csv"
        else:
            fmt = "parquet"
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt in ("json", "jsonl", "ndjson"):
        return spark.read.schema(TRANSCRIPTS_SCHEMA).option("mode", "FAILFAST").json(path)
    if fmt == "csv":
        return (
            spark.read.schema(TRANSCRIPTS_SCHEMA)
            .option("header", "true")
            .option("mode", "FAILFAST")
            # transcript text can carry embedded newlines (quoted-reply
            # lines); RFC-4180 quoting needs multiLine + '"' escaping
            .option("multiLine", "true")
            .option("escape", '"')
            .csv(path)
        )
    raise ValueError(f"unsupported transcripts format {fmt!r}")


def derived_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → transcripts(conv_id, turn_idx, role, text,
    tool, ts) — MUST stay identical to SQL_TRANSCRIPTS_PRELUDE."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    grp = F.pmod(F.col("doc_id"), F.lit(N_CONV))
    w = Window.partitionBy(grp).orderBy("doc_id")
    return docs.select(
        F.concat(F.lit("c"), F.lpad(grp.cast("string"), 4, "0")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.lit("2025-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("doc_id"))).alias("ts"),
    )
