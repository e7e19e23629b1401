"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 search over transcripts derived from
sf0.001 ``documents``.  ``queries()`` — one entry per implemented
operator family (SURVEY.md §2 + the training-data-pipeline operators);
each callable takes (spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — the DuckDB-runnable ANSI-SQL equivalent of each
query; Spark and SQL share bit-identical derivations (md5-based hashes,
identical regexes, identical BM25 formula incl. the lossy SmallFloat
norm identity decode(encode(dl)) = dl for dl < 32 else
24 + top-4-bits(dl - 24), per Lucene 9.1's NUM_FREE_VALUES = 24).

Column names and types are aligned pairwise; float columns are rounded
to 4 decimals on both sides.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emailindexer_spark.operators import dedup as D
from emailindexer_spark.operators import quality as Q
from emailindexer_spark.operators import similarity as S
from emailindexer_spark.operators.dedup import md5_int32, normalized
from emailindexer_spark.plans.builder import IndexBuilder
from emailindexer_spark.plans.planner import SearchEngine
from emailindexer_spark.sources.transcripts import (
    SQL_TRANSCRIPTS_PRELUDE,
    derived_transcripts,
)

# --------------------------------------------------------------------------
# shared SQL fragments (DuckDB): tokenization + BM25 statistics over the
# derived transcripts — mirrors plans/builder.py with simple_tokens=True
# --------------------------------------------------------------------------

_BM25_PRELUDE = (
    SQL_TRANSCRIPTS_PRELUDE
    + """,
tokens AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM docs
),
tf AS (SELECT doc_id, term, CAST(count(*) AS INT) AS tf FROM tokens GROUP BY 1, 2),
dl AS (
  SELECT doc_id, count(*) AS dl,
         CASE WHEN count(*) < 32 THEN count(*)
              ELSE 24 + (((count(*) - 24) >> (CAST(floor(log2(count(*) - 24)) AS INT) - 3))
                         << (CAST(floor(log2(count(*) - 24)) AS INT) - 3))
         END AS dlq
  FROM tokens GROUP BY doc_id
),
stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)"""
)


def _sqlist(terms: list[str]) -> str:
    return ", ".join(f"'{t}'" for t in terms)


def _mf_sql(text_terms: list[str], role_terms: list[str], k: int) -> str:
    """Two-field (text + role) BM25 oracle: per-field df/N/avgdl/norms,
    scores summed across fields.  role is a 1-token field: dl=norm=1,
    avgdl exactly 1.0, so its BM25 partial is idf_role / 2.2."""
    tt = _sqlist(sorted(set(text_terms)))
    rt = _sqlist(sorted(set(role_terms)))
    return f"""
WITH transcripts AS (
  SELECT 'c' || lpad(CAST(doc_id % 128 AS VARCHAR), 4, '0') AS conv_id,
         CAST(row_number() OVER (PARTITION BY (doc_id % 128) ORDER BY doc_id) - 1 AS INTEGER) AS turn_idx,
         text,
         (['user','assistant','tool'])[CAST(doc_id % 3 AS INT) + 1] AS role
  FROM documents
),
docs AS (
  SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id,
         conv_id, turn_idx, text, role
  FROM transcripts
),
tokens AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM docs
),
tf AS (SELECT doc_id, term, CAST(count(*) AS INT) AS tf FROM tokens GROUP BY 1, 2),
dl AS (
  SELECT doc_id, count(*) AS dl,
         CASE WHEN count(*) < 32 THEN count(*)
              ELSE 24 + (((count(*) - 24) >> (CAST(floor(log2(count(*) - 24)) AS INT) - 3))
                         << (CAST(floor(log2(count(*) - 24)) AS INT) - 3))
         END AS dlq
  FROM tokens GROUP BY doc_id
),
stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
rstats AS (SELECT count(*) AS n FROM docs),
rdf AS (SELECT role, count(*) AS df FROM docs WHERE role IN ({rt}) GROUP BY role),
tscore AS (
  SELECT tf.doc_id,
         sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * tf.tf /
             (tf.tf + 1.2 * (0.25 + 0.75 * q.dlq / s.avgdl))) AS s
  FROM tf JOIN dfreq d USING (term) CROSS JOIN stats s JOIN dl q ON q.doc_id = tf.doc_id
  WHERE tf.term IN ({tt})
  GROUP BY tf.doc_id
),
rscore AS (
  SELECT d.doc_id,
         sum(ln(1 + (rs.n - x.df + 0.5) / (x.df + 0.5)) *
             (1.0 / (1.0 + 1.2 * (0.25 + 0.75 * 1.0 / 1.0)))) AS s
  FROM docs d JOIN rdf x ON d.role = x.role CROSS JOIN rstats rs
  GROUP BY d.doc_id
),
sc AS (
  SELECT COALESCE(t.doc_id, r.doc_id) AS doc_id,
         COALESCE(t.s, 0) + COALESCE(r.s, 0) AS score
  FROM tscore t FULL OUTER JOIN rscore r ON t.doc_id = r.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY sc.score DESC, dd.doc_id) AS INT) AS rank,
       dd.doc_id, dd.conv_id, dd.turn_idx, round(sc.score, 4) AS score
FROM sc JOIN docs dd USING (doc_id)
WHERE sc.score > 0
ORDER BY sc.score DESC, dd.doc_id LIMIT {k}"""


def _bm25_sql(
    scoring: list[str],
    k: int,
    musts: list[str] | None = None,
    nots: list[str] | None = None,
    mode: str = "turns",
) -> str:
    musts = musts or []
    nots = nots or []
    all_terms = sorted(set(scoring) | set(musts))
    must_expr = (
        f", count(DISTINCT CASE WHEN tf.term IN ({_sqlist(sorted(set(musts)))}) THEN tf.term END) AS nmust"
        if musts
        else ""
    )
    having = f"HAVING nmust = {len(set(musts))}" if musts else ""
    not_filter = (
        f"AND sc.doc_id NOT IN (SELECT doc_id FROM tf WHERE term IN ({_sqlist(sorted(set(nots)))}))"
        if nots
        else ""
    )
    body = f"""{_BM25_PRELUDE},
scores AS (
  SELECT tf.doc_id,
         sum(CASE WHEN tf.term IN ({_sqlist(sorted(set(scoring)))})
                  THEN ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * tf.tf /
                       (tf.tf + 1.2 * (0.25 + 0.75 * q.dlq / s.avgdl))
                  ELSE 0 END) AS score{must_expr}
  FROM tf
  JOIN dfreq d USING (term)
  CROSS JOIN stats s
  JOIN dl q ON q.doc_id = tf.doc_id
  WHERE tf.term IN ({_sqlist(all_terms)})
  GROUP BY tf.doc_id
  {having}
)"""
    if mode == "turns":
        return f"""{body}
SELECT CAST(row_number() OVER (ORDER BY sc.score DESC, dd.doc_id) AS INT) AS rank,
       dd.doc_id, dd.conv_id, dd.turn_idx, round(sc.score, 4) AS score
FROM scores sc JOIN docs dd USING (doc_id)
WHERE sc.score > 0 {not_filter}
ORDER BY sc.score DESC, dd.doc_id LIMIT {k}"""
    return f"""{body},
collapsed AS (
  SELECT dd.doc_id, dd.conv_id, dd.turn_idx, sc.score,
         row_number() OVER (PARTITION BY dd.conv_id ORDER BY sc.score DESC, dd.doc_id) AS rn
  FROM scores sc JOIN docs dd USING (doc_id)
  WHERE sc.score > 0 {not_filter}
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
       doc_id, conv_id, turn_idx, round(score, 4) AS score
FROM collapsed WHERE rn = 1
ORDER BY score DESC, doc_id LIMIT {k}"""


# --------------------------------------------------------------------------
# Spark-side helpers
# --------------------------------------------------------------------------

_ENGINE_CACHE: dict[tuple[str, tuple[str, ...]], SearchEngine] = {}


def _engine_for(
    spark: SparkSession, sf_dir: str, fields: tuple[str, ...] = ("text",)
) -> SearchEngine:
    key = (os.path.abspath(sf_dir), fields)
    if key not in _ENGINE_CACHE:
        from emailindexer_spark import __version__

        # engine version in the cache path: a /tmp index built by older
        # code must not satisfy a newer contract run
        suffix = "" if len(fields) == 1 else "_mf_" + "_".join(fields[1:])
        ix_dir = os.path.join(
            tempfile.gettempdir(),
            f"eisx_index_v{__version__}_" + key[0].strip("/").replace("/", "_") + suffix,
        )

        def _build():
            IndexBuilder(
                spark,
                ix_dir,
                num_parts=8,
                heavy_df_threshold=200,
                split_target=150,
                simple_tokens=True,
                fields=fields,
            ).build(derived_transcripts(spark, sf_dir))

        if not os.path.exists(os.path.join(ix_dir, "_snapshots", "manifest.json")):
            _build()
        try:
            _ENGINE_CACHE[key] = SearchEngine(spark, ix_dir)
        except ValueError:
            # stale partial dir from an interrupted run → rebuild
            import shutil

            shutil.rmtree(ix_dir, ignore_errors=True)
            _build()
            _ENGINE_CACHE[key] = SearchEngine(spark, ix_dir)
    return _ENGINE_CACHE[key]


#: conv_id boundary splitting the corpus for the incremental-ingest
#: gate: base = conversations sorting BEFORE the boundary, appended
#: batch = the rest.  Because every batch conversation sorts after
#: every base conversation, incremental_append assigns the SAME global
#: doc_ids a one-shot build would, so the ordinary full-corpus oracle
#: applies unchanged — the gate hash-checks the streaming path end to
#: end (docids, summed dfs, corpus-wide stats after append).
_APPEND_SPLIT = "c0100"


def _engine_appended(spark: SparkSession, sf_dir: str, compact: bool) -> SearchEngine:
    """Engine over an index built INCREMENTALLY: batch build of the
    base conversations, streaming-style append of the rest
    (streaming/ingest.incremental_append), optionally followed by
    posting-list compaction (streaming/compact.compact_index) on a
    copy.  Results must hash-match the full-corpus DuckDB oracle."""
    key = (os.path.abspath(sf_dir), "appended", compact)
    if key not in _ENGINE_CACHE:
        import shutil

        from emailindexer_spark import __version__
        from emailindexer_spark.streaming.compact import compact_index
        from emailindexer_spark.streaming.ingest import incremental_append

        tag = "cmp" if compact else "app"
        base_dir = os.path.join(
            tempfile.gettempdir(),
            f"eisx_append_v{__version__}_" + key[0].strip("/").replace("/", "_"),
        )
        ix_dir = base_dir + ("_cmp" if compact else "")
        done = os.path.join(ix_dir, "_APPEND_DONE")

        def _build():
            shutil.rmtree(ix_dir, ignore_errors=True)
            if compact:
                # compact a COPY of the appended index, so the
                # uncompacted multi-split read path stays gated too
                _engine_appended(spark, sf_dir, compact=False)
                shutil.copytree(base_dir, ix_dir)
                os.remove(os.path.join(ix_dir, "_APPEND_DONE"))
                compact_index(spark, ix_dir)
            else:
                t = derived_transcripts(spark, sf_dir)
                IndexBuilder(
                    spark,
                    ix_dir,
                    num_parts=8,
                    heavy_df_threshold=200,
                    split_target=150,
                    simple_tokens=True,
                ).build(t.where(F.col("conv_id") < _APPEND_SPLIT))
                incremental_append(
                    spark,
                    ix_dir,
                    t.where(F.col("conv_id") >= _APPEND_SPLIT),
                    batch_id=1,
                )
            with open(done, "w") as f:
                f.write(tag)

        if not os.path.exists(done):
            _build()
        try:
            _ENGINE_CACHE[key] = SearchEngine(spark, ix_dir)
        except ValueError:
            _build()
            _ENGINE_CACHE[key] = SearchEngine(spark, ix_dir)
    return _ENGINE_CACHE[key]


def _q_bm25(query: str, k: int, mode: str = "turns", wand: bool | None = False):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        eng = _engine_for(spark, sf_dir)
        out = eng.search(query, k=k, mode=mode, use_wand=wand)
        return out.withColumn("score", F.round("score", 4))

    return fn


def _q_bm25_mf(query: str, k: int, mode: str = "turns", wand: bool | None = None):
    """Query against the TWO-FIELD index (text + role): per-field
    df/N/norms/avgdl, bare terms search both fields and sum.  use_wand
    defaults to auto — flat bare-term disjunctions route through
    block-max WAND with per-key avgdl (exactness A/B-tested)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        eng = _engine_for(spark, sf_dir, fields=("text", "role"))
        out = eng.search(query, k=k, mode=mode, use_wand=wand)
        return out.withColumn("score", F.round("score", 4))

    return fn


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _docs_with_planted_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ copies of every 7th doc (ids shifted by 100000) —
    deterministic duplicates so dedup operators have real work."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    dup = d.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return d.unionByName(dup)


_SQL_DUP_DOCS = """
dup_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
)"""

# quality-metric SQL fragments mirroring operators/quality.py
_SQL_WORDS = "CASE WHEN trim(lower(text)) = '' THEN [] ELSE string_split_regex(trim(lower(text)), '\\s+') END"
_SQL_NTOK = "CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END"
_SQL_STOPWORDS_EN = "['the','a','of','and','to','in','is','it','that','for']"


def _sql_stop_ratio(words: str, stoplist: str) -> str:
    return (
        f"CASE WHEN len({words}) > 0 THEN "
        f"CAST(len(list_filter({words}, x -> list_contains({stoplist}, x))) AS DOUBLE) / len({words}) "
        f"ELSE 0.0 END"
    )


# --------------------------------------------------------------------------
# the contract
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the inverted index over sf0.001-derived transcripts
    and run a conversation-collapsed BM25 top-k query."""
    eng = _engine_for(spark, "/root/testdata/sf0.001")
    return eng.search("spark data -dup", k=10, mode="conversations", with_text=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---------------- full-text / BM25 (SURVEY §2.9, Q1-Q10) ----------------
    q["bm25_term_rare"] = _q_bm25("dup", 10)
    q["bm25_term_heavy"] = _q_bm25("batch", 15)
    q["bm25_or"] = _q_bm25("dup spark window", 20)
    q["bm25_or_wand"] = _q_bm25("dup vector merge", 20, wand=True)
    q["bm25_and"] = _q_bm25("spark AND window", 10)
    q["bm25_must_should"] = _q_bm25("+dup batch", 10)
    q["bm25_not"] = _q_bm25("dup -window", 10)
    q["bm25_absent"] = _q_bm25("zzzzmissing dup", 10)
    q["bm25_conversations"] = _q_bm25("dup spark", 10, mode="conversations")

    def bm25_prefix(spark, sf_dir):
        eng = _engine_for(spark, sf_dir)
        out = eng.search("du*", k=30)
        return out.withColumn("score", F.round("score", 4))

    q["bm25_prefix"] = bm25_prefix

    def bm25_range(spark, sf_dir):
        # Lucene TermRangeQuery, constant-score: docs with any term in
        # [da TO dn] (dictionary range over the sorted term_dict)
        eng = _engine_for(spark, sf_dir)
        out = eng.search("[da TO dn]", k=30)
        return out.withColumn("score", F.round("score", 4))

    q["bm25_range"] = bm25_range

    def bm25_phrase(spark, sf_dir):
        eng = _engine_for(spark, sf_dir)
        return eng.search('"table hash"', k=15).withColumn("score", F.round("score", 4))

    q["bm25_phrase"] = bm25_phrase

    def bm25_slop(spark, sf_dir):
        # sloppy phrase "table hash"~2: exact-order matches with a total
        # gap budget of 2 (94 matching docs at sf0.01 vs 46 adjacent —
        # the slop genuinely widens the match set)
        eng = _engine_for(spark, sf_dir)
        return eng.search('"table hash"~2', k=20).withColumn("score", F.round("score", 4))

    q["bm25_slop"] = bm25_slop

    def bm25_fuzzy(spark, sf_dir):
        # FuzzyQuery spark~2 expands over the sorted term_dict
        # (Levenshtein <= 2), then scores with Lucene's default
        # TopTermsBlendedFreqScoringRewrite: per-term boost
        # 1 - ed/min(|cand|, |query|), BM25 with df blended to the
        # selected terms' max, SHOULD-summed
        eng = _engine_for(spark, sf_dir)
        return eng.search("spark~2", k=25).withColumn("score", F.round("score", 4))

    q["bm25_fuzzy"] = bm25_fuzzy

    def bm25_wildcard(spark, sf_dir):
        # WildcardQuery s?a* expands over the term_dict to
        # {scan, small, spark} at sf0.01, constant-score
        eng = _engine_for(spark, sf_dir)
        return eng.search("s?a*", k=30).withColumn("score", F.round("score", 4))

    q["bm25_wildcard"] = bm25_wildcard

    # ---------------- multi-field (per-field stats, §2.9 / MultiField) ------
    q["bm25_mf_field"] = _q_bm25_mf("role:assistant dup", 15)
    q["bm25_mf_bare"] = _q_bm25_mf("assistant dup", 15)

    # ---------------- incremental ingest + compaction (streaming path) -----
    def bm25_append_or(spark, sf_dir):
        # index built in two steps (batch base + incremental_append of
        # the remaining conversations): docids, summed per-term dfs and
        # corpus-wide N/avgdl must make results hash-match the ordinary
        # full-corpus oracle
        eng = _engine_appended(spark, sf_dir, compact=False)
        return eng.search("dup spark", k=15, use_wand=False).withColumn(
            "score", F.round("score", 4)
        )

    q["bm25_append_or"] = bm25_append_or

    def bm25_compact_phrase(spark, sf_dir):
        # appended index, then posting-list compaction (segment-merge
        # analogue): merged runs + re-concatenated position payloads
        # must leave phrase results byte-identical to the oracle's
        eng = _engine_appended(spark, sf_dir, compact=True)
        return eng.search('"table hash"', k=15, use_wand=False).withColumn(
            "score", F.round("score", 4)
        )

    q["bm25_compact_phrase"] = bm25_compact_phrase

    # ---------------- relational filters / sorts / counts (§2.2-§2.6) -------
    def rel_date_page(spark, sf_dir):
        e = _events(spark, sf_dir)
        return (
            e.where(
                F.col("ts").between(
                    F.lit("2024-01-05").cast("timestamp"),
                    F.lit("2024-01-20").cast("timestamp"),
                )
            )
            .orderBy(F.desc("ts"), F.asc("event_id"))
            .offset(50)
            .limit(25)
            .select("event_id", "user_id", "event_type", F.round("value", 4).alias("value"))
        )

    q["rel_date_page"] = rel_date_page

    def rel_like(spark, sf_dir):
        e = _events(spark, sf_dir)
        return (
            e.where(F.lower(F.col("event_type")).contains("ur"))
            .select("event_id", "event_type")
            .orderBy("event_id")
            .limit(100)
        )

    q["rel_like"] = rel_like

    def rel_or_filter(spark, sf_dir):
        from emailindexer_spark.operators.filters import or_filters

        e = _events(spark, sf_dir)
        p = or_filters(F.col("event_type") == "error", F.col("value") > 195.0)
        return e.where(p).select("event_id", "event_type", F.round("value", 4).alias("value")).orderBy("event_id").limit(200)

    q["rel_or_filter"] = rel_or_filter

    def rel_count_by_type(spark, sf_dir):
        # one gate covering A1 (COUNT(*)), A2 (COUNT(DISTINCT)) and a
        # grouped SUM — merged from two r4 gates to stay inside the
        # driver's 50-row correctness cap (r4 registered 51 and the 51st,
        # multimodal_frames, was silently dropped)
        return (
            _events(spark, sf_dir)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 2).alias("sum_value"),
                F.countDistinct("user_id").alias("n_users"),
            )
            .orderBy("event_type")
        )

    q["rel_count_by_type"] = rel_count_by_type

    def rel_group_max_order(spark, sf_dir):
        return (
            _events(spark, sf_dir)
            .groupBy("user_id")
            .agg(
                F.unix_micros(F.max("ts").cast("timestamp")).alias("max_ts_us"),
                F.count("*").alias("n"),
            )
            .orderBy(F.desc("max_ts_us"), F.asc("user_id"))
            .limit(20)
        )

    q["rel_group_max_order"] = rel_group_max_order

    def rel_semi_join(spark, sf_dir):
        c = _tbl(spark, sf_dir, "customer")
        o = _tbl(spark, sf_dir, "orders")
        return (
            c.join(o.select("o_custkey").distinct(), c.c_custkey == F.col("o_custkey"), "left_semi")
            .select("c_custkey", "c_mktsegment")
            .orderBy("c_custkey")
            .limit(200)
        )

    q["rel_semi_join"] = rel_semi_join

    def rel_anti_join(spark, sf_dir):
        c = _tbl(spark, sf_dir, "customer")
        o = _tbl(spark, sf_dir, "orders")
        return (
            c.join(o.select("o_custkey").distinct(), c.c_custkey == F.col("o_custkey"), "left_anti")
            .select("c_custkey", "c_name")
            .orderBy("c_custkey")
            .limit(200)
        )

    q["rel_anti_join"] = rel_anti_join

    def rel_roots(spark, sf_dir):
        t = derived_transcripts(spark, sf_dir)
        return (
            t.where(F.col("turn_idx") == 0)
            .select("conv_id", "turn_idx", "text")
            .orderBy("conv_id")
            .limit(50)
        )

    q["rel_roots"] = rel_roots

    def rel_thread_sizes(spark, sf_dir):
        t = derived_transcripts(spark, sf_dir)
        return (
            t.groupBy("conv_id")
            .agg(F.count("*").alias("thread_size"))
            .orderBy(F.desc("thread_size"), F.asc("conv_id"))
            .limit(30)
        )

    q["rel_thread_sizes"] = rel_thread_sizes

    # ---------------- aggregation joins (TPC-H-style, §2.3/§2.4) ------------
    def tpch_pricing_summary(spark, sf_dir):
        li = _tbl(spark, sf_dir, "lineitem")
        return (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
                F.count("*").alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    q["tpch_pricing_summary"] = tpch_pricing_summary

    def tpch_top_revenue_orders(spark, sf_dir):
        c = _tbl(spark, sf_dir, "customer")
        o = _tbl(spark, sf_dir, "orders")
        li = _tbl(spark, sf_dir, "lineitem")
        return (
            c.where(F.col("c_mktsegment") == "BUILDING")
            .join(o, c.c_custkey == o.o_custkey)
            .join(li, F.col("l_orderkey") == o.o_orderkey)
            .groupBy("o_orderkey")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"))
            .orderBy(F.desc("_rev"), F.asc("o_orderkey"))
            .limit(10)
            .select("o_orderkey", F.round("_rev", 2).alias("revenue"))
        )

    q["tpch_top_revenue_orders"] = tpch_top_revenue_orders

    def tpch_local_supplier_volume(spark, sf_dir):
        # TPC-H Q5 shape: 6-table join (region→nation→supplier ⋈
        # customer/orders/lineitem with the same-nation constraint);
        # region/nation/supplier are broadcast dims (Catalyst auto-BHJ
        # under the 32 MB threshold), the lineitem fact never re-shuffles
        # for them
        c = _tbl(spark, sf_dir, "customer")
        o = _tbl(spark, sf_dir, "orders")
        li = _tbl(spark, sf_dir, "lineitem")
        s = _tbl(spark, sf_dir, "supplier")
        n = _tbl(spark, sf_dir, "nation")
        r = _tbl(spark, sf_dir, "region")
        return (
            c.join(o, c.c_custkey == o.o_custkey)
            .join(li, F.col("l_orderkey") == o.o_orderkey)
            .join(
                F.broadcast(s),
                (F.col("l_suppkey") == s.s_suppkey)
                & (F.col("c_nationkey") == s.s_nationkey),
            )
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .where(F.col("r_name") == "ASIA")
            .groupBy("n_name")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue")
            )
            .orderBy(F.desc("revenue"), F.asc("n_name"))
        )

    q["tpch_local_supplier_volume"] = tpch_local_supplier_volume

    def tpch_brand_revenue(spark, sf_dir):
        # part-dimension join + grouped revenue (Q14-ish): the fact
        # joins a broadcast part dim filtered before the join
        li = _tbl(spark, sf_dir, "lineitem")
        p = _tbl(spark, sf_dir, "part").where(F.col("p_size") <= 20)
        return (
            li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue"),
                F.count("*").alias("n_items"),
            )
            .orderBy("p_brand")
        )

    q["tpch_brand_revenue"] = tpch_brand_revenue

    # ---------------- dedup suite ------------------------------------------
    def dedup_exact(spark, sf_dir):
        dd = _docs_with_planted_dups(spark, sf_dir)
        return (
            D.exact_duplicate_groups(dd)
            .select("keep_id", "n_dups")
            .orderBy("keep_id")
        )

    q["dedup_exact"] = dedup_exact

    # (r5: the former dedup_fingerprint row was retired to stay inside
    # the driver's 50-row cap — Q.fingerprint itself is value-gated by
    # quality_profile's fingerprint column and the planted-dup grouping
    # by dedup_exact on the same fixture)

    def dedup_minhash_lsh(spark, sf_dir):
        dd = _docs_with_planted_dups(spark, sf_dir)
        return D.minhash_lsh_pairs(dd, n_hashes=16, bands=4).orderBy("id_a", "id_b")

    q["dedup_minhash_lsh"] = dedup_minhash_lsh

    def dedup_jaccard(spark, sf_dir):
        # scale path: exact Jaccard VERIFIES the LSH candidates (linear
        # in candidates) — never a raw-shingle self-join
        dd = _docs_with_planted_dups(spark, sf_dir)
        cand = D.minhash_lsh_pairs(dd, n_hashes=16, bands=4)
        return (
            D.jaccard_verify(cand, dd, threshold=0.8)
            .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
            .orderBy("id_a", "id_b")
        )

    q["dedup_jaccard"] = dedup_jaccard

    def dedup_canonical(spark, sf_dir):
        # transitive duplicate-cluster resolution: the verified near-dup
        # pairs (same pipeline as dedup_jaccard) chain into connected
        # components via min-label propagation; canonical_id = the
        # component's min doc_id — the copy a training pipeline keeps
        dd = _docs_with_planted_dups(spark, sf_dir)
        cand = D.minhash_lsh_pairs(dd, n_hashes=16, bands=4)
        pairs = D.jaccard_verify(cand, dd, threshold=0.8)
        return (
            D.duplicate_components(pairs)
            .select(
                F.col("id").alias("doc_id"), F.col("rep").alias("canonical_id")
            )
            .orderBy("doc_id")
        )

    q["dedup_canonical"] = dedup_canonical

    def dedup_simhash16(spark, sf_dir):
        dd = _docs_with_planted_dups(spark, sf_dir)
        words = dd.select(
            "doc_id", F.explode(F.split(normalized(F.col("text")), " ")).alias("w")
        )
        wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
        h = md5_int32(F.col("w"))
        aggs = []
        for j in range(16):
            bit = F.shiftright(h, j).bitwiseAND(F.lit(1))
            aggs.append(F.sum(F.col("c") * (bit * 2 - 1)).alias(f"v{j}"))
        v = wc.groupBy("doc_id").agg(*aggs)
        sim = F.lit(0)
        for j in range(16):
            sim = sim + F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        return v.select("doc_id", sim.cast("long").alias("simhash16")).orderBy("doc_id")

    q["dedup_simhash16"] = dedup_simhash16

    def dedup_simhash64_pairs(spark, sf_dir):
        # 64-bit tf-weighted SimHash near-pairs (vectorized batch UDF,
        # 16-bit pigeonhole chunk blocking — never an n² self-join)
        dd = _docs_with_planted_dups(spark, sf_dir)
        return (
            D.simhash_near_pairs(dd, max_hamming=3)
            .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
            .orderBy("id_a", "id_b")
        )

    q["dedup_simhash64_pairs"] = dedup_simhash64_pairs

    # ---------------- embedding similarity ---------------------------------
    def _query_vec(spark, sf_dir):
        row = (
            _tbl(spark, sf_dir, "embeddings")
            .where(F.col("vec_id") == 0)
            .select(F.col("embedding").cast("array<double>").alias("v"))
            .first()
        )
        return [float(x) for x in row["v"]]

    def embed_cosine_topk(spark, sf_dir):
        e = _tbl(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        qv = _query_vec(spark, sf_dir)
        out = S.cosine_topk_brute(e, qv, k=20)
        return out.select("vec_id", F.round("cosine", 4).alias("cosine"))

    q["embed_cosine_topk"] = embed_cosine_topk

    def embed_neardup_brute(spark, sf_dir):
        e = _tbl(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("v")
        )
        a, b = e.alias("a"), e.alias("b")
        from emailindexer_spark.operators.similarity import _dot, _norm

        return (
            a.join(b, F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                (_dot(F.col("a.v"), F.col("b.v")) / (_norm(F.col("a.v")) * _norm(F.col("b.v")))).alias("cosine"),
            )
            .where(F.col("cosine") >= 0.45)
            .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
            .orderBy("id_a", "id_b")
        )

    q["embed_neardup_brute"] = embed_neardup_brute

    def embed_ann_lsh(spark, sf_dir):
        # approximate path (LSH-bucketed) — no SQL oracle by design;
        # recall vs brute is asserted in tests/test_textproc.py
        e = _tbl(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        qv = _query_vec(spark, sf_dir)
        return S.ann_topk_lsh(e, qv, k=10, n_planes=8, multiprobe=1).select(
            "vec_id", F.round("cosine", 4).alias("cosine")
        )

    q["embed_ann_lsh"] = embed_ann_lsh

    def embed_ann_ivf(spark, sf_dir):
        # IVF-Flat ANN: deterministic sample-trained Lloyd quantizer,
        # nprobe nearest inverted lists, exact re-rank within.  k-means
        # is the canonical iterative non-SQL-expressible algorithm — no
        # DuckDB oracle BY DESIGN; recall + determinism are pytest-gated
        # (tests/test_textproc.py::test_ivf_recall_and_determinism)
        e = _tbl(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        qv = _query_vec(spark, sf_dir)
        return S.ivf_topk(e, qv, k=10, nprobe=4, n_lists=16).select(
            "vec_id", F.round("cosine", 4).alias("cosine")
        )

    q["embed_ann_ivf"] = embed_ann_ivf

    def embed_neardup_banded(spark, sf_dir):
        # multi-table LSH near-dup (skew-bounded scale variant): 4
        # tables x 6 planes, union of per-table bucket collisions,
        # exact-cosine verified — full DuckDB oracle (planes inlined)
        e = _tbl(spark, sf_dir, "embeddings").select(
            F.col("vec_id"), F.col("embedding").cast("array<double>").alias("embedding")
        )
        return (
            S.embedding_near_dup_pairs_banded(
                e, threshold=0.45, tables=4, planes_per_table=6, dim=64
            )
            .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
            .orderBy("id_a", "id_b")
        )

    q["embed_neardup_banded"] = embed_neardup_banded

    # ---------------- text quality / analysis ------------------------------
    def quality_profile(spark, sf_dir):
        # also carries the threshold-filter gate as a boolean column
        # (merged from the r5 quality_filter row to stay inside the
        # driver's 50-row correctness cap without losing the semantics)
        d = _docs(spark, sf_dir)
        c = F.col("text")
        return d.select(
            "doc_id",
            Q.whitespace_token_count(c).alias("n_tokens"),
            Q.bpe_ish_token_count(c).alias("n_bpe_tokens"),
            F.round(Q.punct_ratio(c), 4).alias("punct_ratio"),
            F.round(Q.stopword_ratio(c, "en"), 4).alias("stopword_ratio_en"),
            F.round(Q.mean_word_len(c), 4).alias("mean_word_len"),
            F.round(Q.quality_score(c), 4).alias("quality"),
            (Q.quality_score(c) >= 0.7).cast("int").alias("passes_07"),
            Q.fingerprint(c).alias("fingerprint"),
        ).orderBy("doc_id")

    q["quality_profile"] = quality_profile

    def lang_id_counts(spark, sf_dir):
        d = _docs(spark, sf_dir)
        return (
            d.select(Q.lang_id(F.col("text")).alias("lang_pred"))
            .groupBy("lang_pred")
            .agg(F.count("*").alias("n"))
            .orderBy("lang_pred")
        )

    q["lang_id_counts"] = lang_id_counts

    def token_counts_by_source(spark, sf_dir):
        d = _docs(spark, sf_dir)
        return (
            d.groupBy("source")
            .agg(
                F.sum(Q.whitespace_token_count(F.col("text"))).alias("total_tokens"),
                F.sum(Q.bpe_ish_token_count(F.col("text"))).alias("total_bpe_tokens"),
            )
            .orderBy("source")
        )

    q["token_counts_by_source"] = token_counts_by_source

    # (r5: the former quality_filter row is folded into quality_profile
    # as the passes_07 boolean — 50-row cap)

    def pipeline_clean_corpus(spark, sf_dir):
        # the composed user story a training-data pipeline actually
        # runs: plant dups → exact-dedup APPLY (canonical survivor per
        # group, D.deduplicate: one hash shuffle, map-side min_by) →
        # quality gate → per-source rollup.  sum of per-doc rounded
        # quality instead of avg: order-independent to well below the
        # 4-decimal gate rounding
        d = _docs(spark, sf_dir).select("doc_id", "source", "text")
        dup = d.where(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "source", "text"
        )
        kept = D.deduplicate(d.unionByName(dup))
        good = kept.where(Q.quality_score(F.col("text")) >= 0.5)
        return (
            good.groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(Q.whitespace_token_count(F.col("text")))
                .cast("bigint")
                .alias("total_tokens"),
                F.round(F.sum(F.round(Q.quality_score(F.col("text")), 4)), 4).alias(
                    "sum_quality"
                ),
            )
            .orderBy("source")
        )

    q["pipeline_clean_corpus"] = pipeline_clean_corpus

    # ---------------- multimodal plumbing ----------------------------------
    def _media(spark, sf_dir):
        # deterministic media table derived from documents: the text's
        # UTF-8 bytes stand in as the opaque binary payload; kind and
        # duration are doc_id-derived so DuckDB reproduces them exactly
        d = _docs(spark, sf_dir)
        kind = F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        )
        dur = F.when(
            F.pmod(F.col("doc_id"), 3) != 0,
            (F.pmod(F.col("doc_id"), 7) * 1000 + 1000).cast("int"),
        )
        return d.select(
            F.concat(F.lit("m"), F.lpad(F.col("doc_id").cast("string"), 6, "0")).alias("media_id"),
            kind.alias("kind"),
            F.encode(F.col("text"), "UTF-8").alias("media"),
            F.struct(
                F.lit("raw").alias("format"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                dur.alias("duration_ms"),
            ).alias("meta"),
        )

    def multimodal_meta(spark, sf_dir):
        # exercises the Arrow-batched feature-extraction UDF end-to-end
        # (deterministic fake codec); the gated columns are the typed
        # metadata the plumbing must preserve
        from emailindexer_spark.operators import multimodal as MM

        out = MM.extract_features(_media(spark, sf_dir), fake=True, dim=16)
        return out.select(
            "media_id", "kind", "n_bytes", F.size("feature").alias("dim")
        ).orderBy("media_id")

    q["multimodal_meta"] = multimodal_meta

    def multimodal_frames(spark, sf_dir):
        # frame sampling: count from meta.duration_ms, deterministic
        # payload slices — byte-identical to the SQL oracle
        from emailindexer_spark.operators import multimodal as MM

        fr = MM.sample_frames(_media(spark, sf_dir), every_ms=1000, fake=True)
        return fr.select(
            "media_id",
            "frame_idx",
            F.regexp_replace(F.base64(F.col("frame")), "\r\n", "").alias("frame_b64"),
        ).orderBy("media_id", "frame_idx")

    q["multimodal_frames"] = multimodal_frames

    def _real_media(spark, sf_dir):
        # first 45 doc_ids → executor-side deterministic WAV/BMP/PPM
        # synthesis (multimodal.synth_media_row); the oracle generator
        # replays the identical pure function driver-side and inlines
        # the expected outputs as literals (same pattern as the IVF
        # centroid inlining)
        from emailindexer_spark.operators import multimodal as MM

        ids = _docs(spark, sf_dir).select("doc_id").orderBy("doc_id").limit(45)
        return MM.media_from_ids(ids)

    def multimodal_real_codecs(spark, sf_dir):
        # REAL codec gate, one row per media item: decode WAV/BMP/PPM
        # payloads distributed, extract signal features (first 4
        # components truncated to 5 decimals — floor in double, bit-
        # identical to the math.floor the oracle generator uses), and
        # for images run the full decode → box-resize → BMP re-encode
        # loop gated byte-for-byte via md5 (null for audio rows)
        from emailindexer_spark.operators import multimodal as MM

        media = _real_media(spark, sf_dir)
        out = MM.extract_features(media, fake=False, dim=8)

        def trunc(i):
            x = F.element_at("feature", i + 1).cast("double")
            return (F.floor(x * F.lit(100000.0)) / F.lit(100000.0)).alias(f"f{i}")

        feats = out.select(
            "media_id", "kind", "n_bytes", trunc(0), trunc(1), trunc(2), trunc(3)
        )
        rez = MM.resize_images(media, 8, 8).select(
            "media_id", F.md5("media").alias("bmp_md5")
        )
        return (
            feats.join(rez, "media_id", "left")
            .withColumn("bmp_md5", F.coalesce("bmp_md5", F.lit("")))
            .orderBy("media_id")
        )

    q["multimodal_real_codecs"] = multimodal_real_codecs

    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    # ---------------- BM25 family ----------------
    o["bm25_term_rare"] = _bm25_sql(["dup"], 10)
    o["bm25_term_heavy"] = _bm25_sql(["batch"], 15)
    o["bm25_or"] = _bm25_sql(["dup", "spark", "window"], 20)
    o["bm25_or_wand"] = _bm25_sql(["dup", "vector", "merge"], 20)
    o["bm25_and"] = _bm25_sql(["spark", "window"], 10, musts=["spark", "window"])
    o["bm25_must_should"] = _bm25_sql(["dup", "batch"], 10, musts=["dup"])
    o["bm25_not"] = _bm25_sql(["dup"], 10, nots=["window"])
    o["bm25_absent"] = _bm25_sql(["zzzzmissing", "dup"], 10)
    o["bm25_conversations"] = _bm25_sql(["dup", "spark"], 10, mode="conversations")

    # multi-field: "role:assistant dup" routes the first leaf; the bare
    # query searches BOTH fields per leaf (role:dup has df 0 → no rows)
    o["bm25_mf_field"] = _mf_sql(["dup"], ["assistant"], 15)
    o["bm25_mf_bare"] = _mf_sql(["assistant", "dup"], ["assistant", "dup"], 15)

    o["bm25_prefix"] = f"""{_BM25_PRELUDE},
pdocs AS (SELECT DISTINCT doc_id FROM tokens WHERE term LIKE 'du%')
SELECT CAST(row_number() OVER (ORDER BY p.doc_id) AS INT) AS rank,
       dd.doc_id, dd.conv_id, dd.turn_idx, CAST(1.0 AS DOUBLE) AS score
FROM pdocs p JOIN docs dd USING (doc_id)
ORDER BY p.doc_id LIMIT 30"""

    o["bm25_range"] = f"""{_BM25_PRELUDE},
rdocs AS (SELECT DISTINCT doc_id FROM tokens WHERE term >= 'da' AND term <= 'dn')
SELECT CAST(row_number() OVER (ORDER BY r.doc_id) AS INT) AS rank,
       dd.doc_id, dd.conv_id, dd.turn_idx, CAST(1.0 AS DOUBLE) AS score
FROM rdocs r JOIN docs dd USING (doc_id)
ORDER BY r.doc_id LIMIT 30"""

    o["bm25_phrase"] = f"""{_BM25_PRELUDE},
toked AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM docs),
posx AS (
  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS p
  FROM toked WHERE len(toks) >= 2
),
ph AS (
  SELECT doc_id, count(*) AS freq FROM posx
  WHERE toks[p] = 'table' AND toks[p+1] = 'hash' GROUP BY doc_id
),
phidf AS (
  SELECT sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))) AS idf
  FROM dfreq d CROSS JOIN stats s WHERE d.term IN ('table', 'hash')
),
phs AS (
  SELECT ph.doc_id,
         phidf.idf * ph.freq / (ph.freq + 1.2 * (0.25 + 0.75 * q.dlq / s.avgdl)) AS score
  FROM ph CROSS JOIN phidf CROSS JOIN stats s JOIN dl q ON q.doc_id = ph.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY phs.score DESC, dd.doc_id) AS INT) AS rank,
       dd.doc_id, dd.conv_id, dd.turn_idx, round(phs.score, 4) AS score
FROM phs JOIN docs dd USING (doc_id)
ORDER BY phs.score DESC, dd.doc_id LIMIT 15"""

    # sloppy phrase: exact-order greedy semantics (parser.py Phrase.slop)
    # — for m=2 a start position matches iff the second term occurs
    # within (p0, p0 + 1 + slop]; freq = count of matching starts
    o["bm25_slop"] = f"""{_BM25_PRELUDE},
toked AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM docs),
posx AS (
  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS p
  FROM toked WHERE len(toks) >= 2
),
ph AS (
  SELECT doc_id, count(*) AS freq FROM posx
  WHERE toks[p] = 'table'
    AND (toks[p+1] = 'hash' OR toks[p+2] = 'hash' OR toks[p+3] = 'hash')
  GROUP BY doc_id
),
phidf AS (
  SELECT sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))) AS idf
  FROM dfreq d CROSS JOIN stats s WHERE d.term IN ('table', 'hash')
),
phs AS (
  SELECT ph.doc_id,
         phidf.idf * ph.freq / (ph.freq + 1.2 * (0.25 + 0.75 * q.dlq / s.avgdl)) AS score
  FROM ph CROSS JOIN phidf CROSS JOIN stats s JOIN dl q ON q.doc_id = ph.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY phs.score DESC, dd.doc_id) AS INT) AS rank,
       dd.doc_id, dd.conv_id, dd.turn_idx, round(phs.score, 4) AS score
FROM phs JOIN docs dd USING (doc_id)
ORDER BY phs.score DESC, dd.doc_id LIMIT 20"""

    # FuzzyQuery spark~2, Lucene's default blended rewrite: expansion by
    # classic Levenshtein (Spark and DuckDB agree), per-term boost
    # 1 - ed/min(len(cand), len(query)), top-50 by boost/df/term, each
    # expansion BM25-scored with df BLENDED to the selected max,
    # SHOULD-summed per doc (TopTermsBlendedFreqScoringRewrite)
    o["bm25_fuzzy"] = f"""{_BM25_PRELUDE},
fterms AS (
  SELECT term, df,
         CASE WHEN levenshtein(term, 'spark') = 0 THEN 1.0
              ELSE 1.0 - CAST(levenshtein(term, 'spark') AS DOUBLE)
                         / least(length(term), length('spark'))
         END AS fboost
  FROM dfreq
  WHERE levenshtein(term, 'spark') <= 2
  ORDER BY fboost DESC, df DESC, term ASC LIMIT 50
),
blend AS (SELECT max(df) AS dfb FROM fterms),
fscore AS (
  SELECT tf.doc_id,
         sum(ln(1 + (s.n - b.dfb + 0.5) / (b.dfb + 0.5)) * tf.tf /
             (tf.tf + 1.2 * (0.25 + 0.75 * q.dlq / s.avgdl)) * ft.fboost) AS score
  FROM tf
  JOIN fterms ft USING (term)
  CROSS JOIN blend b
  CROSS JOIN stats s
  JOIN dl q ON q.doc_id = tf.doc_id
  GROUP BY tf.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY fs.score DESC, dd.doc_id) AS INT) AS rank,
       dd.doc_id, dd.conv_id, dd.turn_idx, round(fs.score, 4) AS score
FROM fscore fs JOIN docs dd USING (doc_id)
ORDER BY fs.score DESC, dd.doc_id LIMIT 25"""

    # WildcardQuery s?a*: ? = one char, * = any run — the same regex in
    # Spark rlike (Java) and DuckDB regexp_matches (RE2); constant-score
    o["bm25_wildcard"] = f"""{_BM25_PRELUDE},
wdocs AS (SELECT DISTINCT doc_id FROM tokens WHERE regexp_matches(term, '^s.a.*$'))
SELECT CAST(row_number() OVER (ORDER BY w.doc_id) AS INT) AS rank,
       dd.doc_id, dd.conv_id, dd.turn_idx, CAST(1.0 AS DOUBLE) AS score
FROM wdocs w JOIN docs dd USING (doc_id)
ORDER BY w.doc_id LIMIT 30"""

    # incremental ingest + compaction: the engine-side index is built
    # batch+append (and compacted for the phrase row), but the RESULT
    # contract is the plain full-corpus oracle — append assigns the
    # same global docids a one-shot build would (batch conversations
    # all sort after base ones), stats/dfs sum corpus-wide, and
    # compaction is result-preserving by construction
    o["bm25_append_or"] = _bm25_sql(["dup", "spark"], 15)
    o["bm25_compact_phrase"] = o["bm25_phrase"]

    # ---------------- relational ----------------
    o["rel_date_page"] = """
SELECT event_id, user_id, event_type, round(value, 4) AS value
FROM events
WHERE ts BETWEEN TIMESTAMP '2024-01-05' AND TIMESTAMP '2024-01-20'
ORDER BY ts DESC, event_id ASC
LIMIT 25 OFFSET 50"""

    o["rel_like"] = """
SELECT event_id, event_type FROM events
WHERE lower(event_type) LIKE '%ur%'
ORDER BY event_id LIMIT 100"""

    o["rel_or_filter"] = """
SELECT event_id, event_type, round(value, 4) AS value FROM events
WHERE event_type = 'error' OR value > 195.0
ORDER BY event_id LIMIT 200"""

    o["rel_count_by_type"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(value) AS DOUBLE), 2) AS sum_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type"""

    o["rel_group_max_order"] = """
SELECT user_id, CAST(epoch_us(max(ts)) AS BIGINT) AS max_ts_us,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY user_id
ORDER BY max_ts_us DESC, user_id ASC LIMIT 20"""

    o["rel_semi_join"] = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey LIMIT 200"""

    o["rel_anti_join"] = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey LIMIT 200"""

    o["rel_roots"] = f"""{SQL_TRANSCRIPTS_PRELUDE}
SELECT conv_id, turn_idx, text FROM transcripts
WHERE turn_idx = 0 ORDER BY conv_id LIMIT 50"""

    o["rel_thread_sizes"] = f"""{SQL_TRANSCRIPTS_PRELUDE}
SELECT conv_id, CAST(count(*) AS BIGINT) AS thread_size
FROM transcripts GROUP BY conv_id
ORDER BY thread_size DESC, conv_id ASC LIMIT 30"""

    # ---------------- TPC-H style ----------------
    o["tpch_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""

    o["tpch_top_revenue_orders"] = """
SELECT o_orderkey,
       round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, o_orderkey LIMIT 10"""

    o["tpch_local_supplier_volume"] = """
SELECT n_name, round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name"""

    o["tpch_brand_revenue"] = """
SELECT p_brand, round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 20
GROUP BY p_brand ORDER BY p_brand"""

    # ---------------- dedup ----------------
    o["dedup_exact"] = f"""
WITH {_SQL_DUP_DOCS},
norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM dup_docs
)
SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
FROM norm GROUP BY t HAVING count(*) > 1 ORDER BY keep_id"""

    _sql_shingles = """
sh AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(words) >= 3
                THEN list_transform(generate_series(1, len(words) - 2),
                                    i -> array_to_string(words[i:i+2], ' '))
                ELSE [array_to_string(words, ' ')] END
         ) AS shingles
  FROM (
    SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS words
    FROM dup_docs
  )
)"""

    sig_items = ", ".join(
        f"list_min(list_transform(shingles, x -> md5('{i}:' || x)))" for i in range(16)
    )
    o["dedup_minhash_lsh"] = f"""
WITH {_SQL_DUP_DOCS},{_sql_shingles},
sigs AS (SELECT doc_id, [{sig_items}] AS sig FROM sh),
banded AS (
  SELECT doc_id, b AS band, md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS bucket
  FROM sigs, (SELECT unnest(generate_series(0, 3)) AS b)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_bands
FROM banded a JOIN banded b USING (band, bucket)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2 ORDER BY id_a, id_b"""

    o["dedup_jaccard"] = f"""
WITH {_SQL_DUP_DOCS},{_sql_shingles},
sigs AS (SELECT doc_id, [{sig_items}] AS sig FROM sh),
banded AS (
  SELECT doc_id, b AS band, md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS bucket
  FROM sigs, (SELECT unnest(generate_series(0, 3)) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b USING (band, bucket)
  WHERE a.doc_id < b.doc_id
),
j AS (
  SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
         (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))) AS jac
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b, round(jac, 4) AS jaccard
FROM j WHERE jac >= 0.8
ORDER BY id_a, id_b"""

    # duplicate-cluster resolution: the engine's min-label propagation
    # must equal the true transitive closure — DuckDB derives it
    # independently with a RECURSIVE CTE over the same verified pairs
    o["dedup_canonical"] = f"""
WITH RECURSIVE {_SQL_DUP_DOCS},{_sql_shingles},
sigs AS (SELECT doc_id, [{sig_items}] AS sig FROM sh),
banded AS (
  SELECT doc_id, b AS band, md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS bucket
  FROM sigs, (SELECT unnest(generate_series(0, 3)) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b USING (band, bucket)
  WHERE a.doc_id < b.doc_id
),
j AS (
  SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
         (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))) AS jac
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
),
e(a, b) AS (
  SELECT id_a, id_b FROM j WHERE jac >= 0.8
  UNION
  SELECT id_b, id_a FROM j WHERE jac >= 0.8
),
reach(id, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.id
)
SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS canonical_id
FROM reach GROUP BY id ORDER BY doc_id"""

    bit_terms = " + ".join(
        f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(16)
    )
    v_items = ", ".join(
        f"sum(c * (((h >> {j}) & 1) * 2 - 1)) AS v{j}" for j in range(16)
    )
    o["dedup_simhash16"] = f"""
WITH {_SQL_DUP_DOCS},
words AS (
  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
  FROM dup_docs
),
wc AS (
  SELECT doc_id, w, count(*) AS c,
         CAST(CONCAT('0x', substr(md5(w), 1, 8)) AS BIGINT) AS h
  FROM words GROUP BY doc_id, w
),
v AS (SELECT doc_id, {v_items} FROM wc GROUP BY doc_id)
SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash16 FROM v ORDER BY doc_id"""

    # 64-bit SimHash near-pairs: same tf-weighted md5 signature as
    # operators/dedup.py (first 16 md5 hex chars = the UDF's 8-byte
    # big-endian hash); the oracle pairs exhaustively (n² is fine at
    # sf0.01) while Spark uses pigeonhole chunk blocking — hamming <= 3
    # guarantees identical pair sets
    v64 = ", ".join(
        f"sum(c * (CAST((h >> {j}) & 1 AS BIGINT) * 2 - 1)) AS v{j}" for j in range(64)
    )
    sig64 = " + ".join(
        f"CASE WHEN v{j} > 0 THEN CAST({1 << j} AS UBIGINT) ELSE CAST(0 AS UBIGINT) END"
        for j in range(64)
    )
    o["dedup_simhash64_pairs"] = f"""
WITH {_SQL_DUP_DOCS},
words AS (
  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
  FROM dup_docs
),
wc AS (
  SELECT doc_id, w, count(*) AS c,
         CAST(CONCAT('0x', substr(md5(w), 1, 16)) AS UBIGINT) AS h
  FROM words GROUP BY doc_id, w
),
v AS (SELECT doc_id, {v64} FROM wc GROUP BY doc_id),
sigs AS (SELECT doc_id, CAST({sig64} AS UBIGINT) AS sig FROM v)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
ORDER BY id_a, id_b"""

    # ---------------- embeddings ----------------
    _cos = (
        "list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
    )
    o["embed_cosine_topk"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v FROM e WHERE vec_id = 0)
SELECT a.vec_id, round({_cos.replace('b.v', 'q.v')}, 4) AS cosine
FROM e a CROSS JOIN q
ORDER BY {_cos.replace('b.v', 'q.v')} DESC, a.vec_id ASC LIMIT 20"""

    o["embed_neardup_brute"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({_cos}, 4) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {_cos} >= 0.45
ORDER BY id_a, id_b"""

    # embed_ann_lsh: the approximation is DETERMINISTIC (seeded planes,
    # sign-of-dot bucketing, fixed multiprobe), so it IS SQL-expressible:
    # inline the plane constants as literals and reproduce bucket + 1-bit
    # multiprobe + exact-cosine re-rank in DuckDB.  float64 repr literals
    # round-trip exactly; both sides fold the dot product left-to-right
    # over doubles, so the sign tests agree bit-for-bit.
    import numpy as _np

    from emailindexer_spark.operators.similarity import random_planes as _rp

    _planes = _rp(64, n_planes=8, seed=42)
    _plane_rows = ",\n    ".join(
        "([" + ", ".join(repr(float(x)) for x in p) + "], " + str(j) + ")"
        for j, p in enumerate(_planes)
    )
    o["embed_ann_lsh"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qv AS (SELECT v FROM e WHERE vec_id = 0),
pl(p, j) AS (VALUES
    {_plane_rows}),
bk AS (
  SELECT e.vec_id, e.v,
         CAST(sum(CASE WHEN list_dot_product(e.v, pl.p) >= 0 THEN 1 << pl.j ELSE 0 END) AS INT) AS bucket
  FROM e CROSS JOIN pl GROUP BY e.vec_id, e.v
),
qb AS (
  SELECT CAST(sum(CASE WHEN list_dot_product(qv.v, pl.p) >= 0 THEN 1 << pl.j ELSE 0 END) AS INT) AS bucket
  FROM qv CROSS JOIN pl
)
SELECT c.vec_id,
       round(list_dot_product(c.v, q.v) /
             (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v))), 4) AS cosine
FROM bk c CROSS JOIN qb CROSS JOIN qv q
WHERE bit_count(xor(c.bucket, qb.bucket)) <= 1
ORDER BY list_dot_product(c.v, q.v) /
         (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v))) DESC,
         c.vec_id ASC
LIMIT 10"""

    # banded near-dup: 4 independent plane tables (seed 42 + 1000·t),
    # per-table sign buckets, union of collisions, exact-cosine verify —
    # the same fold-order dot-product agreement as embed_ann_lsh
    _btables = 4
    _bplanes = 6
    _rows = []
    for _t in range(_btables):
        for _j, _p in enumerate(_rp(64, n_planes=_bplanes, seed=42 + 1000 * _t)):
            _rows.append(
                f"({_t}, [" + ", ".join(repr(float(x)) for x in _p) + f"], {_j})"
            )
    _bplane_rows = ",\n    ".join(_rows)
    o["embed_neardup_banded"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pl(tbl, p, j) AS (VALUES
    {_bplane_rows}),
bk AS (
  SELECT e.vec_id, e.v, pl.tbl,
         CAST(sum(CASE WHEN list_dot_product(e.v, pl.p) >= 0 THEN 1 << pl.j ELSE 0 END) AS INT) AS bucket
  FROM e CROSS JOIN pl GROUP BY e.vec_id, e.v, pl.tbl
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bk a JOIN bk b USING (tbl, bucket) WHERE a.vec_id < b.vec_id
),
pr AS (
  SELECT c.id_a, c.id_b,
         list_dot_product(ea.v, eb.v) /
         (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS cosine
  FROM cand c JOIN e ea ON ea.vec_id = c.id_a JOIN e eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b, round(cosine, 4) AS cosine
FROM pr WHERE cosine >= 0.45 ORDER BY id_a, id_b"""

    # embed_ann_ivf: the quantizer is iterative k-means — not SQL — but
    # it is DETERMINISTIC (seeded choice over the sorted-id 4096-sample,
    # fixed Lloyd iterations), so the gate closes by training the
    # IDENTICAL quantizer here (pyarrow read of the gate-scale parquet,
    # same float64 ops via ivf_train_arrays) and inlining the trained
    # centroids as literals — the same trick the LSH oracles use for
    # their plane constants.  Assignment (argmin of -2·v·c + ‖c‖², ties
    # → lowest list id, mirroring ivf_assign), nprobe list ranking, and
    # the exact cosine re-rank are then pure DuckDB.
    # the oracle_sql() contract carries no sf_dir, so the sample path is
    # resolved from env: SPARK_GRAFT_GATE_EMBEDDINGS (full path) wins,
    # else the embeddings table under SPARK_GRAFT_GATE_SF_DIR — set it
    # when gating at a scale other than the driver's fixed sf0.01 so the
    # inlined centroids are trained on the corpus actually under test
    _ivf_gate_pq = os.environ.get(
        "SPARK_GRAFT_GATE_EMBEDDINGS",
        os.path.join(
            os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01"),
            "embeddings.parquet",
        ),
    )
    if os.path.exists(_ivf_gate_pq):
        import pyarrow.parquet as _papq

        from emailindexer_spark.operators.similarity import ivf_train_arrays as _ivt

        _epdf = _papq.read_table(_ivf_gate_pq, columns=["vec_id", "embedding"]).to_pandas()
        _epdf = _epdf.sort_values("vec_id", ignore_index=True).head(4096)
        _ex = _np.array([_np.asarray(v, dtype=_np.float64) for v in _epdf["embedding"]])
        _cents = _ivt(_ex, n_lists=16, seed=42, iters=5)
        _cent_rows = ",\n    ".join(
            "(" + str(_ci) + ", ["
            + ", ".join(repr(float(x)) for x in _c)
            + "], " + repr(float((_c * _c).sum())) + ")"
            for _ci, _c in enumerate(_cents)
        )
        o["embed_ann_ivf"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qv AS (SELECT v FROM e WHERE vec_id = 0),
c(id, p, cn) AS (VALUES
    {_cent_rows}),
asg AS (
  SELECT vec_id, v, id AS lid FROM (
    SELECT e.vec_id, e.v, c.id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY (-2 * list_dot_product(e.v, c.p) + c.cn) ASC, c.id ASC
           ) AS rn
    FROM e CROSS JOIN c
  ) WHERE rn = 1
),
pr AS (
  SELECT id FROM (
    SELECT c.id,
           row_number() OVER (
             ORDER BY (c.cn - 2 * list_dot_product(c.p, qv.v)
                       + list_dot_product(qv.v, qv.v)) ASC, c.id ASC
           ) AS rn
    FROM c CROSS JOIN qv
  ) WHERE rn <= 4
)
SELECT a.vec_id,
       round(list_dot_product(a.v, q.v) /
             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.v, q.v))), 4) AS cosine
FROM asg a CROSS JOIN qv q
WHERE a.lid IN (SELECT id FROM pr)
ORDER BY list_dot_product(a.v, q.v) /
         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.v, q.v))) DESC,
         a.vec_id ASC
LIMIT 10"""
    # (if the gate-scale parquet is absent the entry stays rows-only,
    # as before — pytest still gates recall + determinism)

    # ---------------- quality ----------------
    _punct = "CASE WHEN len(text) > 0 THEN CAST(len(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / len(text) ELSE 0.0 END"
    _mwl = f"CASE WHEN len({_SQL_WORDS}) > 0 THEN CAST(list_sum(list_transform({_SQL_WORDS}, x -> len(x))) AS DOUBLE) / len({_SQL_WORDS}) ELSE 0.0 END"
    _swr = _sql_stop_ratio(_SQL_WORDS, _SQL_STOPWORDS_EN)
    _nbpe = "len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]'))"
    _qual = (
        f"(least(CAST({_SQL_NTOK} AS DOUBLE) / 50.0, 1.0) * (CASE WHEN {_SQL_NTOK} <= 10000 THEN 1.0 ELSE 0.5 END)"
        f" + (1.0 - least(({_punct}) * 4, 1.0))"
        f" + (CASE WHEN ({_mwl}) >= 3 AND ({_mwl}) <= 10 THEN 1.0 ELSE 0.3 END)"
        f" + least(({_swr}) * 5, 1.0)) / 4"
    )
    o["quality_profile"] = f"""
SELECT doc_id,
       CAST({_SQL_NTOK} AS INT) AS n_tokens,
       CAST({_nbpe} AS INT) AS n_bpe_tokens,
       round({_punct}, 4) AS punct_ratio,
       round({_swr}, 4) AS stopword_ratio_en,
       round({_mwl}, 4) AS mean_word_len,
       round({_qual}, 4) AS quality,
       CAST(({_qual}) >= 0.7 AS INT) AS passes_07,
       substr(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 16) AS fingerprint
FROM documents ORDER BY doc_id"""

    _langs = {
        "en": _SQL_STOPWORDS_EN,
        "es": "['el','la','de','que','y','en','un','por','con','los']",
        "de": "['der','die','und','das','ist','nicht','ein','mit','auf','zu']",
        "fr": "['le','la','et','les','des','est','un','une','dans','que']",
    }
    ratios = {k: _sql_stop_ratio(_SQL_WORDS, v) for k, v in _langs.items()}
    # same strict-> comparison order as operators/quality.py lang_id
    lang_case = f"""CASE
      WHEN ({ratios['fr']}) > ({ratios['de']}) AND ({ratios['fr']}) > ({ratios['es']}) AND ({ratios['fr']}) > ({ratios['en']}) AND ({ratios['fr']}) > 0 THEN 'fr'
      WHEN ({ratios['de']}) > ({ratios['es']}) AND ({ratios['de']}) > ({ratios['en']}) AND ({ratios['de']}) > 0 THEN 'de'
      WHEN ({ratios['es']}) > ({ratios['en']}) AND ({ratios['es']}) > 0 THEN 'es'
      WHEN ({ratios['en']}) > 0 THEN 'en'
      ELSE 'und' END"""
    o["lang_id_counts"] = f"""
SELECT {lang_case} AS lang_pred, CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY 1 ORDER BY lang_pred"""

    o["token_counts_by_source"] = f"""
SELECT source,
       CAST(sum({_SQL_NTOK}) AS BIGINT) AS total_tokens,
       CAST(sum({_nbpe}) AS BIGINT) AS total_bpe_tokens
FROM documents GROUP BY source ORDER BY source"""

    o["pipeline_clean_corpus"] = f"""
WITH dupd AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, source, text
  FROM documents WHERE doc_id % 7 = 0
),
keyed AS (
  SELECT *, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS k
  FROM dupd
),
kept AS (
  SELECT doc_id, source, text FROM (
    SELECT *, row_number() OVER (PARTITION BY k ORDER BY doc_id) AS rn
    FROM keyed
  ) WHERE rn = 1
),
good AS (SELECT * FROM kept WHERE ({_qual}) >= 0.5)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum({_SQL_NTOK}) AS BIGINT) AS total_tokens,
       round(sum(round({_qual}, 4)), 4) AS sum_quality
FROM good GROUP BY source ORDER BY source"""

    # ---------------- multimodal plumbing ----------------
    _sql_media = """
media AS (
  SELECT 'm' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS media_id,
         (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
         encode(text) AS media,
         text,
         CASE WHEN doc_id % 3 != 0
              THEN CAST(doc_id % 7 AS INT) * 1000 + 1000 END AS duration_ms
  FROM documents
)"""

    o["multimodal_meta"] = f"""
WITH {_sql_media}
SELECT media_id, kind, CAST(octet_length(media) AS INT) AS n_bytes,
       CAST(16 AS INT) AS dim
FROM media ORDER BY media_id"""

    # NB: this DuckDB has no BLOB slicing; the corpus is pure ASCII
    # (octet_length == length for every doc, all sfs), so slicing the
    # VARCHAR text by characters is byte-identical to the Spark side's
    # payload byte slices.
    o["multimodal_frames"] = f"""
WITH {_sql_media},
v AS (
  SELECT media_id, text AS body,
         greatest(1, duration_ms // 1000) AS n,
         greatest(1, octet_length(media) // greatest(1, duration_ms // 1000)) AS step
  FROM media WHERE kind = 'video'
),
fr AS (
  SELECT media_id, CAST(unnest(generate_series(0, n - 1)) AS INT) AS frame_idx,
         body, step
  FROM v
)
SELECT media_id, frame_idx,
       to_base64(encode(substring(body, CAST(frame_idx * step + 1 AS INT), CAST(step AS INT)))) AS frame_b64
FROM fr ORDER BY media_id, frame_idx"""

    # ---------------- REAL-codec gates (inlined expected literals) ----
    # synth_media_row is a pure function of doc_id, so the oracle
    # generator replays it driver-side (decode + feature + resize via
    # the SAME functions/codecs.py the executors run) and inlines the
    # expected outputs.  doc_ids come from the gated corpus: env
    # SPARK_GRAFT_GATE_SF_DIR (default the driver's fixed sf0.01).
    _mm_docs_pq = os.path.join(
        os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01"),
        "documents.parquet",
    )
    if os.path.exists(_mm_docs_pq):
        import hashlib as _hl
        import math as _math

        import pyarrow.parquet as _papq

        from emailindexer_spark.functions import codecs as _cdx
        from emailindexer_spark.operators import multimodal as _MM

        _mm_ids = sorted(
            _papq.read_table(_mm_docs_pq, columns=["doc_id"])
            .to_pandas()["doc_id"]
            .astype(int)
            .tolist()
        )[:45]

        def _mm_trunc(x: float) -> str:
            # floor(x*1e5)/1e5 in pure double ops — bit-identical to the
            # Spark column expression; repr round-trips the double
            return repr(_math.floor(float(x) * 100000.0) / 100000.0)

        _feat_rows, _rez_rows = [], []
        for _did in _mm_ids:
            _mid, _kind, _fmt, _payload, _meta = _MM.synth_media_row(_did)
            _feat = _MM._decode_features(_payload, _kind, _fmt, fake=False, dim=8)
            _feat_rows.append(
                f"('{_mid}', '{_kind}', {len(_payload)}, "
                + ", ".join(_mm_trunc(v) for v in _feat[:4])
                + ")"
            )
            if _kind == "image":
                _arr = _cdx.decode_image(_payload, _fmt)
                _bmp = _cdx.encode_bmp(_cdx.resize_image(_arr, 8, 8))
                _rez_rows.append(f"('{_mid}', '{_hl.md5(_bmp).hexdigest()}')")

        o["multimodal_real_codecs"] = (
            "WITH f AS (SELECT * FROM (VALUES "
            + ", ".join(_feat_rows)
            + ") AS t(media_id, kind, n_bytes, f0, f1, f2, f3)), "
            "r AS (SELECT * FROM (VALUES "
            + ", ".join(_rez_rows)
            + ") AS t(media_id, bmp_md5)) "
            "SELECT f.media_id, kind, CAST(n_bytes AS INT) AS n_bytes, "
            "CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1, "
            "CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3, coalesce(bmp_md5, '') AS bmp_md5 "
            "FROM f LEFT JOIN r USING (media_id) ORDER BY media_id"
        )

    return o
