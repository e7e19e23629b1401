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
from emailindexer_spark.functions.codec import decode_block
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
        self.n_docs = int(self.man.stats["n_docs"])
        self.n_rows = int(self.man.stats["n_rows"])
        self.avgdl = avgdl_from_stats(self.man.stats)
        self.postings = spark.read.parquet(os.path.join(index_dir, "postings"))
        self.doc_stats = spark.read.parquet(os.path.join(index_dir, "doc_stats"))
        self._doc_index: DataFrame | None = None

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
        """Global doc frequency per term (sum over skew splits)."""
        if not terms:
            return {}
        rows = (
            self._rows_for_terms(terms)
            .groupBy("term")
            .agg(F.sum("df_row").alias("df"))
            .collect()
        )
        return {r["term"]: int(r["df"]) for r in rows}

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
            prows = self.postings.where(F.col("term").startswith(node.prefix))
            docs = prows.mapInPandas(_decode_docs_only(), "doc_id long").distinct()
            return docs.withColumn("score", F.lit(1.0 * node.boost))
        if isinstance(node, Phrase):
            terms = set(node.terms)
            if any(t not in idf_map for t in terms):
                return None
            cand = (
                self._scored_terms_df(terms, idf_map)
                .groupBy("doc_id")
                .agg(F.countDistinct("term").alias("nt"))
                .where(F.col("nt") == len(terms))
                .select("doc_id")
            )
            # Lucene PhraseWeight sums idf over term POSITIONS — a phrase
            # "x x" counts x's idf twice (duplicates not deduped)
            idf_sum = sum(idf_map[t] for t in node.terms)
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
