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
  phrase idf = sum of constituent idfs (Lucene PhraseWeight); sloppy
  phrase ``"a b"~k`` = the engine's documented exact-order greedy-chain
  semantics (plans/parser.py Phrase.slop),
* prefix / wildcard / range = constant-score 1.0*boost for docs
  matching any expansion (multi-term CONSTANT_SCORE rewrite; reference's
  own test queries ``t*`` — EmailDatasetIntegrationTests.java:52,74),
* fuzzy = Lucene's default TopTermsBlendedFreqScoringRewrite: classic-
  Levenshtein expansion over the vocabulary, per-term boost
  1 - ed/min(|cand|, |query|), top MAX_FUZZY_EXPANSIONS by boost/df/term,
  BM25-scored with df blended to the selected terms' max,
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
    MAX_FUZZY_EXPANSIONS,
    MUST,
    MUST_NOT,
    SHOULD,
    Bool,
    Fuzzy,
    Node,
    Phrase,
    Prefix,
    Term,
    TermRange,
    Wildcard,
    parse,
)


@dataclass
class OracleIndex:
    postings: dict[str, dict[int, int]]  # KEY -> {doc_id: tf}
    positions: dict[str, dict[int, list[int]]]  # KEY -> {doc_id: [pos]}
    field_norm_dl: dict[str, list[int]]  # field -> decoded lossy dl per doc
    field_stats: dict[str, tuple[int, float]]  # field -> (n_docs, avgdl)
    conv_of: list[str]
    fields: tuple[str, ...]  # fields[0] = default field
    #: FuzzyQuery distance metric: False = classic Levenshtein (the
    #: gated default — Spark/DuckDB `levenshtein()` compute the same
    #: function), True = optimal string alignment (adjacent-
    #: transposition credit, Lucene FuzzyQuery's own default metric)
    fuzzy_transpositions: bool = False
    #: sloppy-phrase order: False = exact-order greedy chain (the gated
    #: default), True = unordered minimal-covering-window semantics
    #: (the SpanNearQuery inOrder=false analogue)
    slop_order_tolerant: bool = False

    # legacy single-field accessors (default field)
    @property
    def norm_dl(self) -> list[int]:
        return self.field_norm_dl[self.fields[0]]

    @property
    def n_docs(self) -> int:
        return self.field_stats[self.fields[0]][0]

    @property
    def avgdl(self) -> float:
        return self.field_stats[self.fields[0]][1]

    def key(self, field: str, term: str) -> str:
        """Per-field posting key: the default field owns the bare term
        namespace; other fields are prefixed ``field:term`` (one shared
        sorted term space — Lucene's per-field terms dictionaries
        flattened into one)."""
        return term if field == self.fields[0] else f"{field}:{term}"


def build_oracle_index_fields(
    rows: list[tuple[str, int, dict[str, str]]],
    fields: tuple[str, ...],
    simple: bool = False,
    sort: bool = True,
) -> OracleIndex:
    """rows: (conv_id, turn_idx, {field: text}); docID = rank in sorted
    order.  Per-field df/norms/avgdl, exactly Lucene's per-field stats."""
    if sort:
        rows = sorted(rows, key=lambda r: (r[0], r[1]))
    postings: dict[str, dict[int, int]] = {}
    positions: dict[str, dict[int, list[int]]] = {}
    field_norm_dl: dict[str, list[int]] = {f: [] for f in fields}
    conv_of: list[str] = []
    totals = {f: 0 for f in fields}
    for doc_id, (conv_id, _ti, texts) in enumerate(rows):
        conv_of.append(conv_id)
        for fi, f in enumerate(fields):
            toks = tokenize(texts.get(f) or "", simple=simple)
            totals[f] += len(toks)
            field_norm_dl[f].append(byte4_to_int(int_to_byte4(len(toks))))
            pref = "" if fi == 0 else f + ":"
            for pos, t in enumerate(toks):
                positions.setdefault(pref + t, {}).setdefault(doc_id, []).append(pos)
            for t, tf in Counter(toks).items():
                postings.setdefault(pref + t, {})[doc_id] = tf
    # Lucene docCount / avgdl (sumTotalTermFreq/docCount) count only docs
    # with at least one token for the field — match that exactly.
    field_stats = {}
    for f in fields:
        n = sum(1 for d in field_norm_dl[f] if d > 0)
        field_stats[f] = (n, (totals[f] / n) if n else 0.0)
    return OracleIndex(postings, positions, field_norm_dl, field_stats, conv_of, tuple(fields))


def build_oracle_index(
    rows: list[tuple[str, int, str]], simple: bool = False, sort: bool = True
) -> OracleIndex:
    """Single-field convenience: rows (conv_id, turn_idx, text)."""
    return build_oracle_index_fields(
        [(c, t, {"text": x}) for c, t, x in rows], ("text",), simple=simple, sort=sort
    )


def _bm25(ix: OracleIndex, field: str, tf: int, doc_id: int, idf_val: float) -> float:
    dl = ix.field_norm_dl[field][doc_id]
    avgdl = ix.field_stats[field][1]
    return idf_val * tf / (tf + K1 * (1.0 - B + B * dl / avgdl))


def _fields_for(ix: OracleIndex, field: str | None) -> list[str]:
    if field is None:
        # bare leaves search ALL indexed fields (MultiFieldQueryParser)
        return list(ix.fields)
    if field not in ix.fields:
        # Lucene parity: an unindexed field's query matches zero docs
        return []
    return [field]


def _levenshtein(a: str, b: str) -> int:
    """Classic Levenshtein (no transposition credit) — the same function
    Spark `levenshtein()` and DuckDB `levenshtein()` compute."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _osa(a: str, b: str) -> int:
    """Optimal string alignment (restricted Damerau-Levenshtein):
    classic edits plus an adjacent-transposition edit, no substring
    edited twice — Lucene FuzzyQuery's default metric
    (transpositions=true).  Deliberately a scalar three-row DP,
    INDEPENDENT of the engine's vectorized implementation, so parity
    tests compare two derivations of the metric."""
    la, lb = len(a), len(b)
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i]
        for j in range(1, lb + 1):
            c = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
            if (
                i >= 2
                and j >= 2
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                c = min(c, prev2[j - 2] + 1)
            cur.append(c)
        prev2, prev = prev, cur
    return prev[-1]


def _field_vocab(ix: OracleIndex, f: str) -> list[tuple[str, str]]:
    """(key, bare term) pairs of one field's posting keys."""
    pref = "" if f == ix.fields[0] else f + ":"
    out = []
    for t in ix.postings:
        if f == ix.fields[0]:
            if ":" in t:
                continue
            out.append((t, t))
        elif t.startswith(pref):
            out.append((t, t[len(pref):]))
    return out


def _score_leaf(ix: OracleIndex, node: Node) -> dict[int, float]:
    """doc_id -> score for one leaf clause (summed over matched fields)."""
    out: dict[int, float] = {}
    if isinstance(node, Term):
        for f in _fields_for(ix, node.field):
            plist = ix.postings.get(ix.key(f, node.text), {})
            n_f = ix.field_stats[f][0]
            iv = float(_idf(len(plist), n_f))
            for d, tf in plist.items():
                out[d] = out.get(d, 0.0) + node.boost * _bm25(ix, f, tf, d, iv)
        return out
    if isinstance(node, Prefix):
        # constant score PER FIELD clause (a doc matching the prefix in
        # two fields sums two 1.0*boost clauses — BooleanQuery of
        # per-field CONSTANT_SCORE rewrites)
        for f in _fields_for(ix, node.field):
            kpre = ix.key(f, node.prefix)
            docs: set[int] = set()
            for t, plist in ix.postings.items():
                if t.startswith(kpre) and (f == ix.fields[0]) == (":" not in t):
                    docs.update(plist)
            for d in docs:
                out[d] = out.get(d, 0.0) + 1.0 * node.boost
        return out
    if isinstance(node, TermRange):
        # Lucene TermRangeQuery: constant-score rewrite, like Prefix
        for f in _fields_for(ix, node.field):
            pref = "" if f == ix.fields[0] else f + ":"
            docs: set[int] = set()
            for t, plist in ix.postings.items():
                if f == ix.fields[0]:
                    if ":" in t:
                        continue
                elif not t.startswith(pref):
                    continue
                bare = t[len(pref):]
                if node.lo is not None and (bare < node.lo or (bare == node.lo and not node.lo_incl)):
                    continue
                if node.hi is not None and (bare > node.hi or (bare == node.hi and not node.hi_incl)):
                    continue
                docs.update(plist)
            for d in docs:
                out[d] = out.get(d, 0.0) + 1.0 * node.boost
        return out
    if isinstance(node, Fuzzy):
        # FuzzyQuery, Lucene's default TopTermsBlendedFreqScoringRewrite:
        # vocab expansion by classic Levenshtein, per-term boost
        # 1 - ed/min(|candidate|, |query|) (FuzzyTermsEnum), top
        # MAX_FUZZY_EXPANSIONS by boost desc / df desc / term asc, each
        # expansion scored as a BM25 TermQuery whose df is BLENDED to
        # the max df across the selected terms, SHOULD-summed.
        dist = _osa if ix.fuzzy_transpositions else _levenshtein
        for f in _fields_for(ix, node.field):
            hits = []
            for k, bare in _field_vocab(ix, f):
                if abs(len(bare) - len(node.text)) > node.max_edits:
                    continue
                ed = dist(bare, node.text)
                if ed > node.max_edits:
                    continue
                fb = 1.0 if ed == 0 else 1.0 - ed / min(len(bare), len(node.text))
                hits.append((k, fb))
            hits.sort(key=lambda kb: (-kb[1], -len(ix.postings[kb[0]]), kb[0]))
            sel = hits[:MAX_FUZZY_EXPANSIONS]
            if not sel:
                continue
            n_f = ix.field_stats[f][0]
            df_blend = max(len(ix.postings[k]) for k, _fb in sel)
            iv = float(_idf(df_blend, n_f))
            for k, fb in sel:
                for d, tf in ix.postings[k].items():
                    out[d] = out.get(d, 0.0) + node.boost * fb * _bm25(ix, f, tf, d, iv)
        return out
    if isinstance(node, Wildcard):
        import re as _re

        rx = _re.compile(
            "^"
            + "".join(
                ".*" if c == "*" else "." if c == "?" else _re.escape(c)
                for c in node.pattern
            )
            + "$"
        )
        for f in _fields_for(ix, node.field):
            docs = set()
            for k, bare in _field_vocab(ix, f):
                if rx.match(bare):
                    docs.update(ix.postings[k])
            for d in docs:
                out[d] = out.get(d, 0.0) + 1.0 * node.boost
        return out
    if isinstance(node, Phrase):
        from bisect import bisect_right

        for f in _fields_for(ix, node.field):
            keys = [ix.key(f, t) for t in node.terms]
            termsets = [ix.positions.get(k, {}) for k in keys]
            if any(not ts for ts in termsets):
                continue
            cand = set(termsets[0])
            for ts in termsets[1:]:
                cand &= set(ts)
            n_f = ix.field_stats[f][0]
            iv = sum(float(_idf(len(ix.postings[k]), n_f)) for k in keys)
            m = len(node.terms)
            for d in cand:
                if node.slop == 0:
                    possets = [set(ts[d]) for ts in termsets]
                    freq = sum(
                        1
                        for p in termsets[0][d]
                        if all((p + i) in possets[i] for i in range(1, m))
                    )
                elif ix.slop_order_tolerant:
                    # unordered minimal-window sweep, written
                    # independently of the engine's numpy version: merge
                    # all slots' positions into (pos, slot) events; a
                    # match is a minimal window covering all m slots
                    # with width − (m−1) ≤ slop
                    events = sorted(
                        (p, i) for i, ts in enumerate(termsets) for p in ts[d]
                    )
                    need = [0] * m
                    covered = lo = freq = 0
                    for hi, (php, shs) in enumerate(events):
                        need[shs] += 1
                        if need[shs] == 1:
                            covered += 1
                        while covered == m:
                            pl, sl = events[lo]
                            if need[sl] > 1:
                                need[sl] -= 1
                                lo += 1
                                continue
                            if (php - pl) - (m - 1) <= node.slop:
                                freq += 1
                            need[sl] -= 1
                            covered -= 1
                            lo += 1
                else:
                    # exact-order greedy chain (parser.py Phrase.slop):
                    # from each start p0, take the SMALLEST next-slot
                    # position > current, pruning at p0 + i + slop
                    poslists = [sorted(ts[d]) for ts in termsets]
                    freq = 0
                    for p0 in poslists[0]:
                        cur = p0
                        ok = True
                        for i in range(1, m):
                            j = bisect_right(poslists[i], cur)
                            if j == len(poslists[i]) or poslists[i][j] > p0 + i + node.slop:
                                ok = False
                                break
                            cur = poslists[i][j]
                        freq += ok
                if freq:
                    out[d] = out.get(d, 0.0) + node.boost * _bm25(ix, f, freq, d, iv)
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
