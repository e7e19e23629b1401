"""Block-max WAND top-k — the engine's custom physical operator.

Lucene prunes disjunctive top-k with block-max WAND when maxResults is
bounded (reference ``EmailIndexSearcher.java:107``; SURVEY.md §4 "Top-k
pruning").  Spark's ``TakeOrderedAndProject`` is exhaustive, so we add
the pruning operator ourselves, distributed document-at-a-range:

1. **Shard by doc range.**  Posting blocks of the query terms are mapped
   to shards of the global docID space (``shard = doc_id // S``).  A
   block overlapping several shards is sent to each (blocks are
   independently decodable, ≤128 docs, so straddler duplication is
   bounded); every shard therefore sees ALL postings for its doc range —
   per-doc scores are complete within one shard, and shards are disjoint,
   so global top-k ⊆ union of shard-local top-k.  Only compressed block
   payloads move in this shuffle.
2. **Impact-ordered block-max pruning per shard** (applyInPandas): the
   shard's doc range is cut into segments at block boundaries; each
   segment's upper bound is the sum of overlapping blocks' bounds
   (idf · maxtf/(maxtf + k1·(1−b+b·dl(min_norm)/avgdl)) — derived at
   query time from block metadata, nothing corpus-specific baked into
   the index).  Segments are processed in DESCENDING upper-bound order;
   once the k-th best real score θ ≥ the next segment's bound (strictly
   greater, to preserve docID-asc tie-breaks), every remaining segment is
   skipped without decoding.  Within a processed segment everything is
   vectorized numpy (decode → score → bincount-aggregate).
3. Shard-local top-k unions → global top-k (TakeOrderedAndProject over
   k·n_shards rows).

Exactness: a doc's true score never exceeds its segment's bound, and we
only skip segments whose bound is strictly below θ achieved by k real
docs — so the surviving set is exactly the exhaustive top-k (ties
included; A/B property-tested against the exhaustive path).

Eligible queries: flat pure-OR term disjunctions in turns mode — exactly
where Lucene applies BMW; everything else takes the exhaustive path.
"""

from __future__ import annotations

import heapq
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from emailindexer_spark.functions import bm25
from emailindexer_spark.functions.codec import decode_block
from emailindexer_spark.plans.parser import SHOULD, Bool, Node, Term

BLOCKS_SCHEMA = (
    "shard long, term string, first long, last long, maxtf int, minnorm int, "
    "docb binary, tfb binary, normb binary"
)
SCORE_SCHEMA = "doc_id long, score double"


def is_wand_eligible(ast: Node) -> bool:
    if not isinstance(ast, Bool) or not ast.clauses:
        return False
    terms = [c.text for occ, c in ast.clauses if occ == SHOULD and isinstance(c, Term)]
    return len(terms) == len(ast.clauses) and len(set(terms)) == len(terms)


def _explode_blocks(shard_size: int):
    """Flatten posting rows to per-(shard, block) rows, vectorized: the
    only Python-level loops are the flattening of the per-row payload
    byte lists (one step per BLOCK, not per posting); shard replication
    for straddling blocks is a numpy repeat + offset trick."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            counts = pdf["b_first"].map(len).to_numpy(np.int64)
            if counts.sum() == 0:
                continue
            firsts = np.concatenate(list(pdf["b_first"])).astype(np.int64)
            lasts = np.concatenate(list(pdf["b_last"])).astype(np.int64)
            maxtfs = np.concatenate(list(pdf["b_maxtf"])).astype(np.int64)
            minnorms = np.concatenate(list(pdf["b_minnorm"])).astype(np.int64)
            terms = np.repeat(pdf["term"].to_numpy(), counts)
            docb = np.array([x for row in pdf["b_docs"] for x in row], dtype=object)
            tfb = np.array([x for row in pdf["b_tfs"] for x in row], dtype=object)
            normb = np.array([x for row in pdf["b_norms"] for x in row], dtype=object)
            lo = firsts // shard_size
            n_sh = lasts // shard_size - lo + 1  # shards each block straddles
            total = int(n_sh.sum())
            starts = np.concatenate(([0], np.cumsum(n_sh[:-1])))
            shards = np.repeat(lo, n_sh) + (
                np.arange(total, dtype=np.int64) - np.repeat(starts, n_sh)
            )
            yield pd.DataFrame(
                {
                    "shard": shards,
                    "term": np.repeat(terms, n_sh),
                    "first": np.repeat(firsts, n_sh),
                    "last": np.repeat(lasts, n_sh),
                    "maxtf": np.repeat(maxtfs, n_sh).astype("int32"),
                    "minnorm": np.repeat(minnorms, n_sh).astype("int32"),
                    "docb": np.repeat(docb, n_sh),
                    "tfb": np.repeat(tfb, n_sh),
                    "normb": np.repeat(normb, n_sh),
                }
            )

    return gen


def _wand_shard(
    idf_map: dict[str, float],
    boosts: dict[str, float],
    avgdl: float,
    k: int,
    shard_size: int,
    avgdl_map: dict[str, float] | None = None,
):
    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iat[0])
        lo, hi = shard * shard_size, (shard + 1) * shard_size  # [lo, hi)
        nb = len(pdf)
        first = np.maximum(pdf["first"].to_numpy(np.int64), lo)
        last = np.minimum(pdf["last"].to_numpy(np.int64), hi - 1)
        w = np.array([idf_map[t] * boosts.get(t, 1.0) for t in pdf["term"]])
        # per-KEY avgdl: field-prefixed keys score under their own
        # field's statistics (MultiFieldQueryParser parity)
        adl = (
            np.array([avgdl_map.get(t, avgdl) for t in pdf["term"]])
            if avgdl_map
            else np.full(nb, avgdl)
        )
        ub = w * (
            pdf["maxtf"].to_numpy(np.float64)
            / (
                pdf["maxtf"].to_numpy(np.float64)
                + bm25.K1
                * (1 - bm25.B + bm25.B * bm25.LENGTH_TABLE[pdf["minnorm"].to_numpy(np.int64)] / adl)
            )
        )
        # segments at block boundaries (within the shard's clipped range)
        bounds = np.unique(np.concatenate([first, last + 1]))
        seg_lo, seg_hi = bounds[:-1], bounds[1:]  # [seg_lo, seg_hi)
        nseg = seg_lo.size
        if nseg == 0:
            return pd.DataFrame({"doc_id": [], "score": []}).astype({"doc_id": "int64", "score": "float64"})
        # per-segment upper bound via diff-trick over block coverage
        s_idx = np.searchsorted(seg_lo, first, side="right") - 1
        e_idx = np.searchsorted(seg_lo, last, side="right") - 1
        diff = np.zeros(nseg + 1)
        np.add.at(diff, s_idx, ub)
        np.add.at(diff, e_idx + 1, -ub)
        seg_ub = np.cumsum(diff[:-1])
        order = np.argsort(-seg_ub, kind="stable")

        decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}  # block row → (docs, scores)
        heap: list[float] = []  # min-heap of the k best scores seen
        cand_docs: list[np.ndarray] = []
        cand_scores: list[np.ndarray] = []
        for si in order:
            if len(heap) == k and seg_ub[si] < heap[0]:
                break  # all remaining segments are bounded below θ
            a, b = seg_lo[si], seg_hi[si]
            block_rows = np.nonzero((first <= b - 1) & (last >= a))[0]
            seg_d, seg_s = [], []
            for bi in block_rows:
                if bi not in decoded:
                    d, t, n = decode_block(
                        int(pdf["first"].iat[bi]), pdf["docb"].iat[bi], pdf["tfb"].iat[bi], pdf["normb"].iat[bi]
                    )
                    m = (d >= lo) & (d < hi)
                    decoded[bi] = (
                        d[m],
                        bm25.score_tf(t[m], n[m], float(adl[bi]), float(w[bi])),
                    )
                d, s = decoded[bi]
                m = (d >= a) & (d < b)
                if m.any():
                    seg_d.append(d[m])
                    seg_s.append(s[m])
            if not seg_d:
                continue
            dd = np.concatenate(seg_d)
            ss = np.concatenate(seg_s)
            uniq, inv = np.unique(dd, return_inverse=True)
            tot = np.bincount(inv, weights=ss)
            cand_docs.append(uniq)
            cand_scores.append(tot)
            for sc in tot:
                if len(heap) < k:
                    heapq.heappush(heap, float(sc))
                elif sc > heap[0]:
                    heapq.heapreplace(heap, float(sc))
        if not cand_docs:
            return pd.DataFrame({"doc_id": [], "score": []}).astype({"doc_id": "int64", "score": "float64"})
        docs = np.concatenate(cand_docs)
        scores = np.concatenate(cand_scores)
        # shard-local top-k with the global tie-break (score desc, doc asc)
        order2 = np.lexsort((docs, -scores))[:k]
        return pd.DataFrame({"doc_id": docs[order2], "score": scores[order2]})

    return run


def wand_topk(
    spark: SparkSession,
    rows: DataFrame,
    idf_map: dict[str, float],
    boosts: dict[str, float],
    avgdl: float,
    k: int,
    n_rows: int,
    n_shards: int | None = None,
    avgdl_map: dict[str, float] | None = None,
) -> DataFrame:
    """Exact top-k (doc_id, score) for a pure disjunction of terms."""
    if not idf_map:
        return spark.createDataFrame([], SCORE_SCHEMA)
    if n_shards is None:
        par = spark.sparkContext.defaultParallelism
        n_shards = max(1, min(4 * par, math.ceil(n_rows / 65_536)))
    shard_size = max(1, math.ceil(n_rows / n_shards))
    blocks = rows.mapInPandas(_explode_blocks(shard_size), BLOCKS_SCHEMA)
    return blocks.groupBy("shard").applyInPandas(
        _wand_shard(idf_map, boosts, avgdl, k, shard_size, avgdl_map), SCORE_SCHEMA
    )
