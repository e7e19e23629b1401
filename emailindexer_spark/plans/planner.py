"""Query planning + execution: parse → logical AST → DataFrame program.

Reference lifecycle (SURVEY.md §3.1): MultiFieldQueryParser → rewrite →
per-segment BM25 scorers → top-k collector → root-id dedup.  Ours:
driver-side parse (plans/parser.py) → postings selection with partition
pruning (part = md5(term) % P is computed in Python, so only matching
``part=`` directories are read; the term predicate additionally prunes
parquet row-groups via min/max on the sorted ``term`` column) →
vectorized decode+score (Arrow batches, numpy BM25) → boolean
combination in DataFrame ops → conversation collapse (window top-1 per
conv_id) → global top-k (TakeOrderedAndProject).

Scoring needs NO join against per-doc stats: norms ride inside the
postings payload (functions/codec.py), so a term's score stream is a
pure map over its posting rows.  The only joins are candidate-sized:
conv_id attachment for collapse mode and text attachment for phrase
verification / display.

Routing: flat pure-OR term queries in turns mode go to block-max WAND
(plans/wand.py — the reference's Lucene uses BMW exactly there,
EmailIndexSearcher.java:107); everything else (conjunctions, phrases,
prefixes, conversation collapse) uses the exhaustive path, matching the
reference's own exhaustive flagship search (n=Integer.MAX_VALUE,
EmailIndexSearcher.java:57).
"""

from __future__ import annotations

import os
from functools import reduce
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emailindexer_spark.functions import bm25
from emailindexer_spark.functions.codec import decode_block, decode_positions
from emailindexer_spark.functions.smallfloat import encode_lengths
from emailindexer_spark.plans import wand as wand_mod
from emailindexer_spark.plans.builder import avgdl_from_stats, term_part_py
from emailindexer_spark.plans.parser import (
    MUST,
    MUST_NOT,
    SHOULD,
    Bool,
    Node,
    Phrase,
    Prefix,
    Term,
    parse,
    query_terms,
)
from emailindexer_spark.sources.checkpoint import Manifest

SCORE_SCHEMA = "doc_id long, score double"
TERM_SCORE_SCHEMA = "term string, doc_id long, score double"
RESULT_COLS = ["rank", "doc_id", "conv_id", "turn_idx", "score"]


def _decode_score_rows(idf_map: dict[str, float], avgdl: float):
    """mapInPandas over posting rows → (term, doc_id, score)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            terms, docs, scores = [], [], []
            for r in pdf.itertuples(index=False):
                iv = idf_map.get(r.term)
                if iv is None:
                    continue
                for i in range(len(r.b_docs)):
                    d, t, n = decode_block(int(r.b_first[i]), r.b_docs[i], r.b_tfs[i], r.b_norms[i])
                    s = bm25.score_tf(t, n, avgdl, iv)
                    docs.append(d)
                    scores.append(s)
                    terms.append(np.full(d.size, r.term, dtype=object))
            if not docs:
                continue
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms),
                    "doc_id": np.concatenate(docs),
                    "score": np.concatenate(scores),
                }
            )

    return gen


def _decode_docs_only():
    """mapInPandas over posting rows → distinct doc_ids (prefix match)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            docs = []
            for r in pdf.itertuples(index=False):
                for i in range(len(r.b_docs)):
                    d, _t, _n = decode_block(int(r.b_first[i]), r.b_docs[i], r.b_tfs[i], r.b_norms[i])
                    docs.append(d)
            if docs:
                yield pd.DataFrame({"doc_id": np.unique(np.concatenate(docs))})

    return gen


def _phrase_score_fn(terms: tuple[str, ...], idf_sum: float, avgdl: float, simple: bool):
    """mapInPandas over candidate (doc_id, text) → (doc_id, score).

    Exact Lucene PhraseQuery semantics: tf = number of exact adjacent
    occurrences; idf = sum of constituent term idfs; doc norm re-derived
    from the text (identical to the indexed norm byte by construction).
    """

    from emailindexer_spark.functions.tokenizer import tokenize_series

    m = len(terms)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            toks = tokenize_series(pdf["text"], simple=simple)
            n = toks.str.len().to_numpy(dtype=np.int64)
            if n.sum() == 0:
                continue
            rows = np.repeat(np.arange(len(pdf), dtype=np.int64), n)
            starts = np.concatenate(([0], np.cumsum(n[:-1])))
            pos = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(starts, n)
            flat = pd.DataFrame(
                {"row": rows, "pos": pos, "term": np.concatenate([t for t in toks.to_numpy() if len(t)])}
            )
            # adjacency via successive (row, pos) merges — fully vectorized
            cur = flat.loc[flat["term"] == terms[0], ["row", "pos"]]
            for i in range(1, m):
                nxt = flat.loc[flat["term"] == terms[i], ["row", "pos"]].copy()
                nxt["pos"] -= i
                cur = cur.merge(nxt, on=["row", "pos"])
                if cur.empty:
                    break
            if cur.empty:
                continue
            freq = cur.groupby("row").size()
            ridx = freq.index.to_numpy()
            f = freq.to_numpy(dtype=np.float64)
            dl = bm25.LENGTH_TABLE[encode_lengths(n[ridx])].astype(np.float64)
            sc = idf_sum * f / (f + bm25.K1 * (1 - bm25.B + bm25.B * dl / avgdl))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy()[ridx], "score": sc}
            )

    return gen


POS_STREAM_SCHEMA = "doc_id long, pos long, slot int, norm int"


def _decode_positions_stream(phrase_terms: tuple[str, ...]):
    """mapInPandas over posting rows (with b_pos) → (doc_id, pos, slot,
    norm): slot i carries term i's positions shifted by -i, so an exact
    phrase match is m slots agreeing on one (doc_id, pos).  Norm bytes
    ride on slot-0 rows only (one per doc is enough for scoring).
    Repeated phrase terms ("x x") emit the same postings under each of
    their slots — Lucene PhraseWeight semantics fall out."""
    slot_map: dict[str, list[int]] = {}
    for i, t in enumerate(phrase_terms):
        slot_map.setdefault(t, []).append(i)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            docs_out, pos_out, slot_out, norm_out = [], [], [], []
            for r in pdf.itertuples(index=False):
                slots = slot_map.get(r.term)
                if not slots:
                    continue
                for i in range(len(r.b_docs)):
                    d, t, n = decode_block(
                        int(r.b_first[i]), r.b_docs[i], r.b_tfs[i], r.b_norms[i]
                    )
                    p = decode_positions(r.b_pos[i], t)
                    drep = np.repeat(d, t)
                    for s in slots:
                        docs_out.append(drep)
                        pos_out.append(p - s)
                        slot_out.append(np.full(drep.size, s, dtype=np.int32))
                        norm_out.append(
                            np.repeat(n, t) if s == 0 else np.zeros(drep.size, dtype=np.int64)
                        )
            if docs_out:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(docs_out),
                        "pos": np.concatenate(pos_out),
                        "slot": np.concatenate(slot_out),
                        "norm": np.concatenate(norm_out),
                    }
                )

    return gen


def _phrase_match_positions(m: int, idf_sum: float, avgdl: float):
    """mapInPandas over doc_id-partitioned position streams → scores.

    Adjacency is m-1 vectorized merges on (doc_id, pos); phrase tf =
    matches per doc; score is the standard BM25 partial with the SUMMED
    constituent idf (Lucene PhraseWeight).  The whole partition is
    concatenated first: a doc's rows may span Arrow batches."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        batches = list(it)
        if not batches:
            return
        pdf = pd.concat(batches, ignore_index=True) if len(batches) > 1 else batches[0]
        cur = pdf.loc[pdf["slot"] == 0, ["doc_id", "pos", "norm"]]
        for i in range(1, m):
            nxt = pdf.loc[pdf["slot"] == i, ["doc_id", "pos"]]
            cur = cur.merge(nxt, on=["doc_id", "pos"])
            if cur.empty:
                return
        g = cur.groupby("doc_id").agg(freq=("pos", "size"), norm=("norm", "first"))
        f = g["freq"].to_numpy(np.float64)
        dl = bm25.LENGTH_TABLE[g["norm"].to_numpy(np.int64)].astype(np.float64)
        sc = idf_sum * f / (f + bm25.K1 * (1 - bm25.B + bm25.B * dl / avgdl))
        yield pd.DataFrame({"doc_id": g.index.to_numpy(), "score": sc})

    return gen


class SearchEngine:
    """Query engine over an index directory built by plans/builder.py."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.man = Manifest.load_or_create(index_dir)
        if "n_docs" not in self.man.stats:
            raise ValueError(f"{index_dir} has no completed build")
        self.num_parts = int(self.man.params.get("num_parts", 32))
        self.simple = bool(self.man.params.get("simple_tokens", False))
        self.positions = bool(self.man.params.get("positions", False))
        self.n_docs = int(self.man.stats["n_docs"])
        self.n_rows = int(self.man.stats["n_rows"])
        self.avgdl = avgdl_from_stats(self.man.stats)
        self.postings = spark.read.parquet(os.path.join(index_dir, "postings"))
        self.doc_stats = spark.read.parquet(os.path.join(index_dir, "doc_stats"))
        self._doc_index: DataFrame | None = None
        # sorted term dictionary (term, part, df): prefix expansion +
        # df lookups scan the vocabulary, never the postings payloads
        td_path = os.path.join(index_dir, "term_dict")
        self.term_dict: DataFrame | None = (
            spark.read.parquet(td_path) if os.path.isdir(td_path) else None
        )
        # driver-side df cache (Lucene keeps its term dictionary in
        # memory too): terms resolve once per engine instance; None
        # marks a term known to be absent from the index
        self._df_cache: dict[str, int | None] = {}

    @property
    def doc_index(self) -> DataFrame:
        if self._doc_index is None:
            self._doc_index = self.spark.read.parquet(os.path.join(self.index_dir, "doc_index"))
        return self._doc_index

    # ------------------------------------------------------------ postings access

    def _rows_for_terms(self, terms: set[str]) -> DataFrame:
        """Partition-pruned + term-predicate-pushed posting selection."""
        parts = sorted({term_part_py(t, self.num_parts) for t in terms})
        return self.postings.where(
            F.col("part").isin(parts) & F.col("term").isin(sorted(terms))
        )

    def term_dfs(self, terms: set[str]) -> dict[str, int]:
        """Global doc frequency per term (sum over skew splits/batches).

        Cached per engine instance, so a batch of queries sharing terms
        (or ``search_many`` pre-warming the cache with the union of all
        its queries' terms) pays ONE driver round-trip total.
        """
        missing = {t for t in terms if t not in self._df_cache}
        if missing:
            if self.term_dict is not None:
                src = self.term_dict.where(F.col("term").isin(sorted(missing)))
            else:  # pre-term_dict index layout
                src = self._rows_for_terms(missing).withColumnRenamed("df_row", "df")
            rows = src.groupBy("term").agg(F.sum("df").alias("df")).collect()
            found = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                self._df_cache[t] = found.get(t)
        return {t: v for t in terms if (v := self._df_cache.get(t)) is not None}

    def _empty_scores(self) -> DataFrame:
        return self.spark.createDataFrame([], SCORE_SCHEMA)

    # ------------------------------------------------------------ leaf scoring

    def _scored_terms_df(self, terms: set[str], idf_map: dict[str, float]) -> DataFrame:
        return self._rows_for_terms(terms).mapInPandas(
            _decode_score_rows(idf_map, self.avgdl), TERM_SCORE_SCHEMA
        )

    def _leaf_df(self, node: Node, idf_map: dict[str, float]) -> DataFrame | None:
        if isinstance(node, Term):
            if node.text not in idf_map:
                return None
            df = self._scored_terms_df({node.text}, idf_map).drop("term")
            return df.withColumn("score", F.col("score") * F.lit(node.boost))
        if isinstance(node, Prefix):
            pred = F.col("term").startswith(node.prefix)
            if self.term_dict is not None:
                # expand against the sorted term dictionary (vocab-scale
                # scan, row-group pruned by the sorted `term` min/max),
                # then prune postings PARTITIONS like any term query —
                # the P-bounded part list is the only driver round-trip
                parts = [
                    r["part"]
                    for r in self.term_dict.where(pred).select("part").distinct().collect()
                ]
                if not parts:
                    return None
                prows = self.postings.where(F.col("part").isin(sorted(parts)) & pred)
            else:  # pre-term_dict index layout: full postings scan
                prows = self.postings.where(pred)
            docs = prows.mapInPandas(_decode_docs_only(), "doc_id long").distinct()
            return docs.withColumn("score", F.lit(1.0 * node.boost))
        if isinstance(node, Phrase):
            terms = set(node.terms)
            if any(t not in idf_map for t in terms):
                return None
            # Lucene PhraseWeight sums idf over term POSITIONS — a phrase
            # "x x" counts x's idf twice (duplicates not deduped)
            idf_sum = sum(idf_map[t] for t in node.terms)
            if self.positions:
                # positions path (index is DOCS_AND_FREQS_AND_POSITIONS):
                # decode the phrase terms' position payloads, ONE shuffle
                # by doc_id, vectorized adjacency merge — cost scales with
                # the terms' postings volume, never with corpus text size
                stream = self._rows_for_terms(terms).mapInPandas(
                    _decode_positions_stream(node.terms), POS_STREAM_SCHEMA
                )
                scored = stream.repartition("doc_id").mapInPandas(
                    _phrase_match_positions(len(node.terms), idf_sum, self.avgdl),
                    SCORE_SCHEMA,
                )
                return scored.withColumn("score", F.col("score") * F.lit(node.boost))
            # fallback for position-less indexes: candidate docs contain
            # ALL phrase terms; re-tokenize their text to verify adjacency
            cand = (
                self._scored_terms_df(terms, idf_map)
                .groupBy("doc_id")
                .agg(F.countDistinct("term").alias("nt"))
                .where(F.col("nt") == len(terms))
                .select("doc_id")
            )
            cand_text = cand.join(self.doc_index.select("doc_id", "text"), "doc_id")
            scored = cand_text.mapInPandas(
                _phrase_score_fn(node.terms, idf_sum, self.avgdl, self.simple),
                SCORE_SCHEMA,
            )
            return scored.withColumn("score", F.col("score") * F.lit(node.boost))
        raise TypeError(type(node))

    # ------------------------------------------------------------ boolean combine

    def _score_node(self, node: Node, idf_map: dict[str, float]) -> DataFrame | None:
        if not isinstance(node, Bool):
            return self._leaf_df(node, idf_map)
        if self._is_flat_terms(node):
            return self._score_flat_terms(node, idf_map)
        musts, shoulds, nots = [], [], []
        for occur, child in node.clauses:
            d = self._score_node(child, idf_map)
            if occur == MUST:
                if d is None:
                    return None  # unmatched MUST → nothing matches
                musts.append(d)
            elif occur == SHOULD:
                if d is not None:
                    shoulds.append(d)
            else:
                if d is not None:
                    nots.append(d.select("doc_id"))
        should_sum = None
        if shoulds:
            should_sum = (
                reduce(lambda a, b: a.unionByName(b), shoulds)
                .groupBy("doc_id")
                .agg(F.sum("score").alias("score"))
            )
        if musts:
            base = musts[0]
            for i, m in enumerate(musts[1:], start=1):
                m = m.withColumnRenamed("score", f"_s{i}")
                base = base.join(m, "doc_id")
                base = base.withColumn("score", F.col("score") + F.col(f"_s{i}")).drop(f"_s{i}")
            if should_sum is not None:
                s = should_sum.withColumnRenamed("score", "_ss")
                base = base.join(s, "doc_id", "left").withColumn(
                    "score", F.col("score") + F.coalesce(F.col("_ss"), F.lit(0.0))
                ).drop("_ss")
        elif should_sum is not None:
            base = should_sum
        else:
            return None
        for nd in nots:
            base = base.join(nd, "doc_id", "left_anti")
        if node.boost != 1.0:
            base = base.withColumn("score", F.col("score") * F.lit(node.boost))
        return base

    @staticmethod
    def _is_flat_terms(node: Bool) -> bool:
        return all(isinstance(c, Term) for _, c in node.clauses) and node.clauses

    def _score_flat_terms(self, node: Bool, idf_map: dict[str, float]) -> DataFrame | None:
        """One-aggregation path for flat boolean-of-terms queries: a single
        postings scan + ONE shuffle, no per-leaf DataFrames."""
        boosts = {}
        musts, nots, scoring = [], [], []
        for occur, c in node.clauses:
            if occur == MUST:
                if c.text not in idf_map:
                    return None
                musts.append(c.text)
            elif occur == MUST_NOT:
                nots.append(c.text)
            if occur != MUST_NOT and c.text in idf_map:
                scoring.append(c.text)
                boosts[c.text] = boosts.get(c.text, 0.0) + c.boost
        if not scoring:
            return None
        all_terms = set(scoring) | set(nots)
        scored = self._scored_terms_df({t for t in all_terms if t in idf_map}, idf_map)
        boost_expr = F.create_map(
            *[x for t, b in boosts.items() for x in (F.lit(t), F.lit(b))]
        )
        aggs = [
            F.sum(
                F.when(
                    F.col("term").isin(scoring),
                    F.col("score") * F.element_at(boost_expr, F.col("term")),
                ).otherwise(0.0)
            ).alias("score")
        ]
        if musts:
            aggs.append(
                F.countDistinct(
                    F.when(F.col("term").isin(musts), F.col("term"))
                ).alias("_nmust")
            )
        if nots:
            aggs.append(
                F.max(F.when(F.col("term").isin(nots), 1).otherwise(0)).alias("_hit_not")
            )
        g = scored.groupBy("doc_id").agg(*aggs)
        if musts:
            g = g.where(F.col("_nmust") == len(set(musts))).drop("_nmust")
        if nots:
            g = g.where(F.col("_hit_not") == 0).drop("_hit_not")
        if not musts and nots:
            # a doc matched ONLY by a not-term would survive as a score-0
            # row — require ≥1 scoring-term match
            g = g.join(
                scored.where(F.col("term").isin(scoring)).select("doc_id").distinct(),
                "doc_id",
            )
        if node.boost != 1.0:
            g = g.withColumn("score", F.col("score") * F.lit(node.boost))
        return g

    # ------------------------------------------------------------ public API

    def score(self, query: str) -> DataFrame:
        """(doc_id, score) for every matching doc — exhaustive semantics."""
        ast = parse(query, simple=self.simple)
        idf_map = {
            t: float(bm25.idf(dfv, self.n_docs))
            for t, dfv in self.term_dfs(query_terms(ast)).items()
        }
        out = self._score_node(ast, idf_map)
        return out if out is not None else self._empty_scores()

    def search(
        self,
        query: str,
        k: int | None = 10,
        mode: str = "turns",
        use_wand: bool | None = None,
        with_text: bool = False,
    ) -> DataFrame:
        """Top-k search. Returns (rank, doc_id, conv_id, turn_idx, score)."""
        ast = parse(query, simple=self.simple)
        if use_wand is None:
            use_wand = (
                mode == "turns"
                and k is not None
                and wand_mod.is_wand_eligible(ast)
            )
        if use_wand:
            idf_map = {
                t: float(bm25.idf(dfv, self.n_docs))
                for t, dfv in self.term_dfs(query_terms(ast)).items()
            }
            boosts = {c.text: c.boost for _, c in ast.clauses if c.text in idf_map}
            rows = self._rows_for_terms(set(boosts)) if boosts else None
            scores = (
                wand_mod.wand_topk(
                    self.spark, rows, idf_map, boosts, self.avgdl, k, self.n_rows
                )
                if rows is not None
                else self._empty_scores()
            )
        else:
            scores = self.score(query)
        return self._finish(scores, k, mode, with_text)

    def search_many(
        self, queries: dict[str, tuple[str, int, str]], use_wand: bool | None = None
    ) -> DataFrame:
        """Run a batch of queries in ONE Spark job.

        queries: query_id -> (query_string, k, mode).  Returns a single
        DataFrame (query_id, rank, doc_id, conv_id, turn_idx, score) —
        per-query plans are unioned so driver/job overhead is amortized
        across the batch (the batch-throughput story; single-query
        latency on Spark pays ~0.5 s of scheduling that Lucene does not).
        """
        # ONE df-stat lookup for the whole batch: pre-warm the term cache
        # with the union of every query's terms, so the per-query plans
        # below fire zero additional driver round-trips for stats
        all_terms: set[str] = set()
        for q, _k, _mode in queries.values():
            all_terms |= query_terms(parse(q, simple=self.simple))
        self.term_dfs(all_terms)
        parts = []
        for qid, (q, k, mode) in queries.items():
            df = self.search(q, k=k, mode=mode, use_wand=use_wand)
            parts.append(df.withColumn("query_id", F.lit(qid)))
        if not parts:
            return self.spark.createDataFrame(
                [], "query_id string, rank int, doc_id long, conv_id string, turn_idx int, score double"
            )
        out = reduce(lambda a, b: a.unionByName(b), parts)
        return out.select("query_id", *RESULT_COLS)

    def _finish(self, scores: DataFrame, k: int | None, mode: str, with_text: bool) -> DataFrame:
        enriched = scores.join(
            self.doc_stats.select("doc_id", "conv_id", "turn_idx"), "doc_id"
        )
        if mode == "conversations":
            w = Window.partitionBy("conv_id").orderBy(F.desc("score"), F.asc("doc_id"))
            enriched = (
                enriched.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        ordered = enriched.orderBy(F.desc("score"), F.asc("doc_id"))
        if k is not None:
            ordered = ordered.limit(k)
        wr = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        out = ordered.withColumn("rank", F.row_number().over(wr)).select(*RESULT_COLS)
        if with_text:
            out = out.join(self.doc_index.select("doc_id", "text"), "doc_id", "left")
        return out
