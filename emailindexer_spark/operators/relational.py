"""Relational query surface: filtered search, pagination, counts, tags,
mutations, exports (SURVEY.md §2.2-§2.8, §3.2).

Reference lifecycle (EmailSearcher.findAll, data/search/EmailSearcher.java:40-80):
string-assembled WHERE → H2 executes → COUNT query for the page envelope.
Ours: typed predicates → ONE DataFrame plan; Catalyst does pushdown,
pruning and join selection; pagination via sort + offset/limit.

Mutations (hide/delete, EmailRepository.java:227-285) are modeled as
snapshot-producing rewrites over the ``hidden`` flag plus an audit table —
the Parquet stand-in for Iceberg ``UPDATE``/``DELETE`` + snapshot log.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def default_order() -> list[Column]:
    """O1 total order: ts DESC, (conv_id, turn_idx) ASC — the transcript
    analogue of the reference's ``DATE DESC, MESSAGE_ID ASC``.  A function
    (not a module constant) because Column construction needs an active
    SparkContext."""
    return [F.desc("ts"), F.asc("conv_id"), F.asc("turn_idx")]


@dataclass
class SearchPage:
    """EmailSearchResult envelope (EmailSearchResult.java:7-21)."""

    rows: DataFrame
    page: int
    size: int
    total: int

    @property
    def page_count(self) -> int:
        return -(-self.total // self.size) if self.size else 0

    @property
    def has_next(self) -> bool:
        return self.page < self.page_count


def find_all(
    df: DataFrame,
    page: int = 1,
    size: int = 20,
    predicate: Column | None = None,
    order: list[Column] | None = None,
) -> SearchPage:
    """O1 — ORDER BY ts DESC, (conv_id, turn_idx) ASC LIMIT size OFFSET
    (page-1)*size, plus the COUNT envelope (EmailSearcher.java:91-117).

    The sort key mirrors the reference's ``DATE DESC, MESSAGE_ID ASC``
    total order; offset/limit push into the plan (CollectLimit)."""
    base = df.where(predicate) if predicate is not None else df
    total = base.count()
    rows = base.orderBy(*(order or default_order())).offset((page - 1) * size).limit(size)
    return SearchPage(rows=rows, page=page, size=size, total=total)


def count_all(df: DataFrame, predicate: Column | None = None) -> int:
    """A1 — COUNT(*) (EmailRepository.java:29-31; EmailSearcher.java:108-117)."""
    return (df.where(predicate) if predicate is not None else df).count()


def count_tagged(df: DataFrame, tags_df: DataFrame) -> int:
    """A2 — COUNT(DISTINCT tagged turn) (EmailRepository.java:37-39)."""
    return (
        df.join(tags_df.select("conv_id", "turn_idx").distinct(), ["conv_id", "turn_idx"], "left_semi")
        .count()
    )


def replies_of(df: DataFrame, conv_id: str, turn_idx: int) -> DataFrame:
    """J5 — replies lookup ordered by date desc
    (fetch_email_preview_by_parent_id.sql:9-11)."""
    return df.where(
        (F.col("conv_id") == conv_id) & (F.col("turn_idx") > turn_idx)
    ).orderBy(F.desc("ts"))


def reply_counts(df: DataFrame) -> DataFrame:
    """A4 — replies per turn ≙ remaining turns per conversation
    (EmailRepository.java:133-135)."""
    w = Window.partitionBy("conv_id")
    return df.withColumn(
        "reply_count", F.count("*").over(w) - F.col("turn_idx") - 1
    )


def thread_sizes(df: DataFrame) -> DataFrame:
    """A5 — thread-subtree size, recursive in the reference
    (EmailRepository.java:143-149); conversations make it one hash agg."""
    return df.groupBy("conv_id").agg(F.count("*").alias("thread_size"))


def turns_per_tag(df: DataFrame, tags_df: DataFrame) -> DataFrame:
    """A4b — emails per tag (TagRepository.java:65-67), J2-style join."""
    return (
        df.join(tags_df, ["conv_id", "turn_idx"], "left")
        .where(F.col("tag").isNotNull())
        .groupBy("tag")
        .agg(F.count("*").alias("n_turns"))
        .orderBy(F.lower(F.col("tag")))  # O4 case-insensitive name sort
    )


def previews_by_tag(df: DataFrame, tags_df: DataFrame, tag: str) -> DataFrame:
    """J1/A3 — join turns↔tags, group by turn, order by MAX(ts) DESC
    (fetch_email_preview_by_tag_id.sql:9-14)."""
    sel = tags_df.where(F.col("tag") == tag)
    return (
        df.join(F.broadcast(sel.select("conv_id", "turn_idx")), ["conv_id", "turn_idx"], "left_semi")
        .groupBy("conv_id", "turn_idx")
        .agg(F.max("ts").alias("max_ts"))
        .orderBy(F.desc("max_ts"), F.asc("conv_id"), F.asc("turn_idx"))
    )


def with_tag_list(df: DataFrame, tags_df: DataFrame) -> DataFrame:
    """C7 — per-turn comma-joined tag list (TxtExporter.java:96-97)."""
    agg = tags_df.groupBy("conv_id", "turn_idx").agg(
        F.array_join(F.array_sort(F.collect_list("tag")), ", ").alias("tags")
    )
    return df.join(agg, ["conv_id", "turn_idx"], "left").fillna({"tags": ""})


# ---------------------------------------------------------------- mutations

class MutationLog:
    """Audit log + hidden-flag mutations over a parquet-backed table
    (reference MUTATION/MUTATION_EMAIL, schema.sql:33-47; hide/delete at
    EmailRepository.java:227-285).  Every mutation = a new snapshot dir +
    an audit row — the Iceberg-snapshot shape on plain parquet."""

    AUDIT_SCHEMA = "mutation_id string, description string, performed_at timestamp, affected_count long"

    def __init__(self, root: str):
        import os

        self.root = root
        self.audit_path = os.path.join(root, "mutations")
        self.snaps_path = os.path.join(root, "table_snapshots")

    def _load(self, spark) -> DataFrame | None:
        import os

        if not os.path.exists(self.audit_path):
            return None
        return spark.read.parquet(self.audit_path)

    def current(self, spark, base: DataFrame) -> DataFrame:
        """Latest snapshot of the mutable table (base if none yet)."""
        import os

        if not os.path.exists(self.snaps_path):
            return base.withColumn("hidden", F.lit(False))
        snaps = sorted(os.listdir(self.snaps_path))
        return spark.read.parquet(os.path.join(self.snaps_path, snaps[-1]))

    def _commit(self, spark, df: DataFrame, description: str, affected: int) -> DataFrame:
        import os

        snap_id = f"{int(time.time() * 1000):016d}_{uuid.uuid4().hex[:8]}"
        out = os.path.join(self.snaps_path, snap_id)
        df.write.mode("overwrite").parquet(out)
        audit = spark.createDataFrame(
            [(snap_id, description, None, affected)], self.AUDIT_SCHEMA
        ).withColumn("performed_at", F.current_timestamp())
        audit.write.mode("append").parquet(self.audit_path)
        return spark.read.parquet(out)

    def hide_where(self, spark, base: DataFrame, predicate: Column, description: str) -> DataFrame:
        """F12 — UPDATE ... SET HIDDEN=TRUE WHERE <cond> + audit in one
        atomic commit (EmailRepository.java:227-274)."""
        cur = self.current(spark, base)
        affected = cur.where(predicate & ~F.col("hidden")).count()
        nxt = cur.withColumn("hidden", F.col("hidden") | predicate)
        return self._commit(spark, nxt, description, affected)

    def delete_hidden(self, spark, base: DataFrame) -> DataFrame:
        """F13 — DELETE FROM ... WHERE HIDDEN (EmailRepository.java:281-285)."""
        cur = self.current(spark, base)
        affected = cur.where(F.col("hidden")).count()
        nxt = cur.where(~F.col("hidden"))
        return self._commit(spark, nxt, "delete hidden", affected)

    def history(self, spark) -> DataFrame:
        """O5 — mutation log, newest first (fetch_all_mutations.sql:1-3)."""
        log = self._load(spark)
        if log is None:
            raise ValueError("no mutations recorded")
        return log.orderBy(F.desc("performed_at"))


# ---------------------------------------------------------------- exports

def export_csv(results: DataFrame, path: str) -> None:
    """S8 — RFC4180 CSV with header (CsvExporter.java:18-51)."""
    results.write.mode("overwrite").option("header", True).csv(path)


def export_txt(results: DataFrame, path: str) -> None:
    """S9 — per-thread indented text (TxtExporter.java:32-117): one line
    per turn, indented by turn_idx, grouped by conversation order."""
    lines = results.orderBy("conv_id", "turn_idx").select(
        F.concat(
            F.col("conv_id"),
            F.lit(" "),
            F.expr("repeat('  ', turn_idx)"),
            F.lit("["),
            F.col("turn_idx").cast("string"),
            F.lit("] "),
            # line-oriented sink: keep one physical line per turn
            F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), "\n", "\\\\n"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)


def export_parquet(results: DataFrame, path: str) -> None:
    """Columnar sink (beyond the reference's CSV/TXT): the natural
    handoff format to a downstream Spark/DuckDB/pandas consumer."""
    results.write.mode("overwrite").parquet(path)


def export_jsonl(results: DataFrame, path: str) -> None:
    """One JSON object per line — the training-data-pipeline interchange
    format; round-trips through sources.transcripts.load_transcripts."""
    results.write.mode("overwrite").json(path)
