"""Pure-Python executable spec of the reference's search semantics.

No JVM/Lucene exists in the sandbox, so rank/score parity (BASELINE.md)
is checked against this ~200-LoC single-node oracle implementing exactly
the Lucene 9.1 semantics the reference relies on (SURVEY.md §2.9):

* StandardAnalyzer tokenization (functions.tokenizer),
* BM25 k1=1.2 b=0.75, Lucene-8+ formula, idf = ln(1+(N-df+0.5)/(df+0.5)),
* lossy 1-byte SmallFloat norms for doc length, exact avgdl,
* BooleanQuery: SHOULD scores sum, MUST required+scoring, MUST_NOT
  excluding, pure-negative → empty (reference query surface §2.9),
* phrase = exact adjacent positions; phrase tf = occurrence count;
  phrase idf = sum of constituent idfs (Lucene PhraseWeight),
* prefix = constant-score 1.0*boost for docs matching any expansion
  (multi-term CONSTANT_SCORE rewrite; reference's own test queries
  ``t*`` — EmailDatasetIntegrationTests.java:52,74),
* top-k sort: score desc, docID asc (Lucene tie-break),
* conversation collapse = first-occurrence dedup of hits by conv_id in
  score order (reference root-id dedup, EmailIndexSearcher.java:58-71).

docID = dense 0-based rank over the stable (conv_id, turn_idx) ordering
(BASELINE.json input_hint).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

from emailindexer_spark.functions.bm25 import B, K1, idf as _idf
from emailindexer_spark.functions.smallfloat import byte4_to_int, int_to_byte4
from emailindexer_spark.functions.tokenizer import tokenize
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
)


@dataclass
class OracleIndex:
    postings: dict[str, dict[int, int]]  # term -> {doc_id: tf}
    positions: dict[str, dict[int, list[int]]]  # term -> {doc_id: [pos]}
    norm_dl: list[int]  # decoded lossy doc length per doc
    conv_of: list[str]
    n_docs: int
    avgdl: float


def build_oracle_index(
    rows: list[tuple[str, int, str]], simple: bool = False, sort: bool = True
) -> OracleIndex:
    """rows: (conv_id, turn_idx, text); docID = rank in sorted order.
    ``sort=False`` keeps the given order (streaming-append semantics:
    docID = insertion order, like Lucene)."""
    if sort:
        rows = sorted(rows, key=lambda r: (r[0], r[1]))
    postings: dict[str, dict[int, int]] = {}
    positions: dict[str, dict[int, list[int]]] = {}
    norm_dl: list[int] = []
    conv_of: list[str] = []
    total_len = 0
    for doc_id, (conv_id, _ti, text) in enumerate(rows):
        toks = tokenize(text, simple=simple)
        total_len += len(toks)
        norm_dl.append(byte4_to_int(int_to_byte4(len(toks))))
        conv_of.append(conv_id)
        for pos, t in enumerate(toks):
            positions.setdefault(t, {}).setdefault(doc_id, []).append(pos)
        for t, tf in Counter(toks).items():
            postings.setdefault(t, {})[doc_id] = tf
    # Lucene docCount / avgdl (sumTotalTermFreq/docCount) count only docs
    # with at least one token for the field — match that exactly.
    n = sum(1 for d in norm_dl if d > 0)
    return OracleIndex(
        postings, positions, norm_dl, conv_of, n, (total_len / n) if n else 0.0
    )


def _bm25(ix: OracleIndex, tf: int, doc_id: int, idf_val: float) -> float:
    dl = ix.norm_dl[doc_id]
    return idf_val * tf / (tf + K1 * (1.0 - B + B * dl / ix.avgdl))


def _score_leaf(ix: OracleIndex, node: Node) -> dict[int, float]:
    """doc_id -> score for one leaf clause."""
    if isinstance(node, Term):
        plist = ix.postings.get(node.text, {})
        iv = float(_idf(len(plist), ix.n_docs))
        return {d: node.boost * _bm25(ix, tf, d, iv) for d, tf in plist.items()}
    if isinstance(node, Prefix):
        docs: set[int] = set()
        for t, plist in ix.postings.items():
            if t.startswith(node.prefix):
                docs.update(plist)
        return {d: 1.0 * node.boost for d in docs}
    if isinstance(node, Phrase):
        # candidates must contain every term; verify adjacency by positions
        termsets = [ix.positions.get(t, {}) for t in node.terms]
        if any(not ts for ts in termsets):
            return {}
        cand = set(termsets[0])
        for ts in termsets[1:]:
            cand &= set(ts)
        iv = sum(float(_idf(len(ix.postings[t]), ix.n_docs)) for t in node.terms)
        out: dict[int, float] = {}
        for d in cand:
            possets = [set(ts[d]) for ts in termsets]
            freq = sum(
                1
                for p in termsets[0][d]
                if all((p + i) in possets[i] for i in range(1, len(possets)))
            )
            if freq:
                out[d] = node.boost * _bm25(ix, freq, d, iv)
        return out
    raise TypeError(type(node))


def _score_node(ix: OracleIndex, node: Node) -> dict[int, float]:
    if not isinstance(node, Bool):
        return _score_leaf(ix, node)
    must: list[dict[int, float]] = []
    should: list[dict[int, float]] = []
    must_not: set[int] = set()
    for occur, child in node.clauses:
        s = _score_node(ix, child)
        if occur == MUST:
            must.append(s)
        elif occur == SHOULD:
            should.append(s)
        elif occur == MUST_NOT:
            must_not.update(s)
    if must:
        docs = set(must[0])
        for m in must[1:]:
            docs &= set(m)
    else:
        docs = set()
        for s in should:
            docs |= set(s)
    docs -= must_not
    out: dict[int, float] = {}
    for d in docs:
        sc = sum(m[d] for m in must) + sum(s.get(d, 0.0) for s in should)
        out[d] = sc * node.boost
    return out


def search(
    ix: OracleIndex,
    query: str,
    k: int | None = None,
    mode: str = "turns",
    simple: bool = False,
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score), reference tie-break; mode per SURVEY §7."""
    scores = _score_node(ix, parse(query, simple=simple))
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    if mode == "conversations":
        seen: set[str] = set()
        out: list[tuple[int, float]] = []
        for d, s in ranked:
            c = ix.conv_of[d]
            if c not in seen:
                seen.add(c)
                out.append((d, s))
        ranked = out
    return ranked[:k] if k is not None else ranked
