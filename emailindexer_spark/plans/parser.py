"""Lucene classic-query-parser subset → typed AST.

The reference parses queries with ``MultiFieldQueryParser`` over
StandardAnalyzer (reference ``EmailIndexSearcher.java:49-53,99-103``;
SURVEY.md §2.9).  We support the full grammar the reference exposes:
bare terms (default operator OR), ``AND``/``OR``/``NOT``, ``+``/``-``
prefixes, parentheses, quoted phrases with slop ``"a b"~k``,
trailing-``*`` prefix wildcards (reference test queries ``"t*"``,
``"t* r* s* e*"``), general wildcards ``te?m``/``te*m`` (leading
wildcards rejected, the classic-parser default), fuzzy ``term~``/
``term~1``/``term~2``, term ranges ``[a TO b]``/``{a TO b}``, and
``^boost``.  Query-side text is analyzed with the same tokenizer as the
index (case-insensitive matching falls out of lowercasing).

Semantics implemented identically by the pure-Python oracle
(:mod:`emailindexer_spark.oracle`) and the Spark planner
(:mod:`emailindexer_spark.plans.planner`):

* Boolean doc matching: all MUST clauses, no MUST_NOT clause, and —
  when there is no MUST clause — at least one SHOULD clause.
* Score = sum of matching MUST and SHOULD clause scores (Lucene
  BooleanQuery), times boost.
* Term/phrase clauses score BM25 (phrase tf = exact adjacent-occurrence
  count; phrase idf = sum of constituent term idfs, Lucene
  ``PhraseWeight`` behavior).
* Prefix clauses are constant-score: a doc matching ANY expansion scores
  ``1.0 * boost`` (Lucene multi-term CONSTANT_SCORE rewrite).
* A pure-negative query matches nothing.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from emailindexer_spark.functions.tokenizer import tokenize

SHOULD, MUST, MUST_NOT = "SHOULD", "MUST", "MUST_NOT"


@dataclass
class Node:
    boost: float = 1.0


@dataclass
class Term(Node):
    text: str = ""
    field: str | None = None  # None = query the index's default field set


@dataclass
class Phrase(Node):
    terms: tuple[str, ...] = ()
    field: str | None = None
    #: Lucene sloppy-phrase slop (``"a b"~k``).  Our slop semantics are
    #: EXACT-ORDER with a total-gap budget: positions p_0 < … < p_{m-1}
    #: of the respective terms with (p_{m-1} - p_0) - (m-1) <= slop;
    #: freq = number of starting occurrences p_0 that begin >=1 match
    #: (greedy-minimal completion).  Lucene's SloppyPhraseScorer is
    #: order-tolerant with 1/(distance+1) weighting — a documented
    #: divergence (SURVEY.md §2.9); slop=0 is exact Lucene adjacency.
    slop: int = 0


@dataclass
class Fuzzy(Node):
    """Lucene FuzzyQuery (``term~``, ``term~1``, ``term~2``): expands to
    vocabulary terms within Levenshtein edit distance ``max_edits``,
    capped at ``MAX_FUZZY_EXPANSIONS`` terms by similarity-boost desc /
    df desc / term asc, then scored with Lucene's DEFAULT rewrite
    (TopTermsBlendedFreqScoringRewrite): each expansion is a BM25
    TermQuery with boost ``1 - ed/min(|cand|, |query|)`` and df blended
    to the selected terms' max, SHOULD-summed.  One documented
    divergence remains (SURVEY.md §2.9): the distance is CLASSIC
    Levenshtein — no adjacent-transposition credit — so Spark
    ``levenshtein()`` and DuckDB ``levenshtein()`` reproduce the
    expansion exactly; Lucene's automaton defaults to transpositions=
    true (OSA).  The engine ships the OSA primitive
    (plans/planner._levenshtein_batch(transpositions=True)) but gates
    on the SQL-verifiable classic metric."""

    text: str = ""
    max_edits: int = 2
    field: str | None = None


MAX_FUZZY_EXPANSIONS = 50


@dataclass
class Prefix(Node):
    prefix: str = ""
    field: str | None = None


@dataclass
class Wildcard(Node):
    """Lucene WildcardQuery (``te?m``, ``te*m``, ``t?e*``): ``?`` = one
    character, ``*`` = any run.  Expands against the sorted term
    dictionary (a literal-prefix band narrows the scan when the pattern
    has one), CONSTANT-SCORE rewrite like Prefix.  Leading wildcards
    stay rejected — Lucene's classic parser default
    (``allowLeadingWildcard=false``), which the reference never
    overrides."""

    pattern: str = ""  # lowercased, chars: [a-z0-9'.?*]
    field: str | None = None


@dataclass
class TermRange(Node):
    """Lucene TermRangeQuery: ``[a TO b]`` inclusive, ``{a TO b}``
    exclusive.  Constant-score rewrite, like Prefix."""

    lo: str | None = None  # None = open end (* in Lucene syntax)
    hi: str | None = None
    lo_incl: bool = True
    hi_incl: bool = True
    field: str | None = None


@dataclass
class Bool(Node):
    clauses: list[tuple[str, Node]] = field(default_factory=list)


class QueryParseError(ValueError):
    pass


def _lex(q: str) -> list[str]:
    out: list[str] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
        elif c in "()+-":
            out.append(c)
            i += 1
        elif c == '"':
            j = q.find('"', i + 1)
            if j < 0:
                raise QueryParseError(f"unterminated phrase in {q!r}")
            j = _extend_suffix(q, j + 1)  # keep ~slop / ^boost attached
            out.append(q[i:j])
            i = j
        else:
            j = i
            while j < n and not q[j].isspace() and q[j] not in '()"':
                j += 1
            # `field:"a phrase"` — keep the quoted body attached to the
            # field prefix as ONE token
            if j < n and q[j] == '"' and q[j - 1] == ":":
                k = q.find('"', j + 1)
                if k < 0:
                    raise QueryParseError(f"unterminated phrase in {q!r}")
                j = _extend_suffix(q, k + 1)  # keep ~slop / ^boost attached
            # range bodies contain spaces (`[a TO b]`) — extend the token
            # to the closing bracket
            tok = q[i:j]
            ob = max(tok.find("["), tok.find("{"))
            if ob >= 0 and not any(cb in tok[ob:] for cb in "]}"):
                closers = [k for k in (q.find("]", j), q.find("}", j)) if k >= 0]
                if not closers:
                    raise QueryParseError(f"unterminated range in {q!r}")
                j = min(closers) + 1
                # keep a trailing ^boost attached
                while j < n and not q[j].isspace() and q[j] not in '()"':
                    j += 1
            out.append(q[i:j])
            i = j
    return out


def _strip_boost(tok: str) -> tuple[str, float]:
    if "^" in tok:
        body, _, bs = tok.rpartition("^")
        try:
            return body, float(bs)
        except ValueError:
            return tok, 1.0
    return tok, 1.0


import re as _re

_FIELD_RE = _re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$", _re.DOTALL)
_SUFFIX_RE = _re.compile(r"(?:~\d*|\^\d+(?:\.\d+)?)+")
_WILDCARD_OK = _re.compile(r"[a-z0-9'.?*]+")
_BOOST_TAIL = _re.compile(r"\^(\d+(?:\.\d+)?)$")
_TILDE_TAIL = _re.compile(r"~(\d*)$")


def _extend_suffix(q: str, j: int) -> int:
    """Extend a token end past trailing ``~slop`` / ``^boost`` suffixes
    (classic-parser grammar: ``"a b"~2``, ``"a b"^3``, ``"a b"~2^3``)."""
    m = _SUFFIX_RE.match(q, j)
    return m.end() if m else j


def _strip_suffixes(tok: str) -> tuple[str, int | None, float]:
    """tok → (body, tilde, boost).  ``tilde`` is the integer after a
    trailing ``~`` (Lucene fuzzy edits / phrase slop), -1 for a bare
    ``~`` (caller applies the grammar default), None if absent.  Boost
    is stripped outermost-first, so both ``body~2^3`` and ``body^3~2``
    parse; each suffix kind is consumed at most once."""
    boost = 1.0
    tilde: int | None = None
    m = _BOOST_TAIL.search(tok)
    if m:
        boost = float(m.group(1))
        tok = tok[: m.start()]
    m = _TILDE_TAIL.search(tok)
    if m:
        tilde = int(m.group(1)) if m.group(1) else -1
        tok = tok[: m.start()]
        if boost == 1.0:  # allow "body~2^3" (boost after tilde)
            m2 = _BOOST_TAIL.search(tok)
            if m2:
                boost = float(m2.group(1))
                tok = tok[: m2.start()]
    return tok, tilde, boost


def _leaf(tok: str, simple: bool) -> Node | None:
    tok, tilde, boost = _strip_suffixes(tok)
    # `field:term` routes to that field; a field absent from the index
    # matches nothing at planning time (Lucene: a TermQuery on an
    # unindexed field has zero hits)
    field: str | None = None
    m = _FIELD_RE.match(tok)
    if m:
        field, tok = m.group(1), m.group(2)
    if tok and tok[0] in "[{" and tok[-1] in "]}":
        if tilde is not None:
            raise QueryParseError(f"'~' is not valid after a range in {tok!r}")
        # Lucene TermRangeQuery syntax: [lo TO hi] incl / {lo TO hi} excl
        parts = _re.split(r"\s+TO\s+", tok[1:-1].strip())
        if len(parts) != 2:
            raise QueryParseError(f"malformed range {tok!r} (expected '[a TO b]')")

        def end(raw: str, side: str) -> str | None:
            if raw == "*":
                return None  # open end
            toks = tokenize(raw, simple=simple)
            if len(toks) != 1:
                raise QueryParseError(f"range {side} endpoint {raw!r} must analyze to one term")
            return toks[0]

        return TermRange(
            boost=boost,
            lo=end(parts[0], "lower"),
            hi=end(parts[1], "upper"),
            lo_incl=tok[0] == "[",
            hi_incl=tok[-1] == "]",
            field=field,
        )
    if tok.startswith('"') and tok.endswith('"') and len(tok) >= 2:
        terms = tuple(tokenize(tok[1:-1], simple=simple))
        if not terms:
            return None
        # `"..."~k` = phrase slop (bare `~` on a phrase means slop 0 in
        # the classic parser); slop is any non-negative int
        slop = 0 if tilde in (None, -1) else tilde
        if len(terms) == 1:
            return Term(boost=boost, text=terms[0], field=field)
        return Phrase(boost=boost, terms=terms, field=field, slop=slop)
    if "?" in tok or "*" in tok:
        if tilde is not None:
            raise QueryParseError(f"'~' is not valid on a wildcard in {tok!r}")
        if tok[0] in "?*":
            raise QueryParseError(
                f"leading wildcards are not allowed in {tok!r} "
                "(Lucene classic-parser default)"
            )
        if tok.endswith("*") and tok.count("*") == 1 and "?" not in tok:
            # trailing-star only → PrefixQuery (term_dict range scan)
            pre = tokenize(tok[:-1], simple=simple)
            if len(pre) != 1:
                return None
            return Prefix(boost=boost, prefix=pre[0], field=field)
        # general WildcardQuery: normalize (lowercase) but do NOT analyze
        # — Lucene normalizes wildcard terms without tokenizing them
        pat = tok.lower()
        if not _WILDCARD_OK.fullmatch(pat):
            raise QueryParseError(
                f"wildcard pattern {tok!r} has characters outside the "
                "token alphabet [a-z0-9'.]"
            )
        return Wildcard(boost=boost, pattern=pat, field=field)
    toks = tokenize(tok, simple=simple)
    if not toks:
        return None
    if tilde is not None:
        # `term~` / `term~N` = FuzzyQuery; Lucene caps edit distance at 2
        # (bare `~` defaults to 2), and `term~0` is a plain TermQuery
        if len(toks) != 1:
            raise QueryParseError(f"fuzzy term {tok!r} must analyze to one token")
        edits = 2 if tilde == -1 else tilde
        if edits > 2:
            raise QueryParseError(
                f"maximum supported fuzzy edit distance is 2, got {tilde} in {tok!r}"
            )
        if edits == 0:
            return Term(boost=boost, text=toks[0], field=field)
        return Fuzzy(boost=boost, text=toks[0], max_edits=edits, field=field)
    if len(toks) == 1:
        return Term(boost=boost, text=toks[0], field=field)
    # one input word analyzed into several tokens (e.g. "a1.b") → phrase,
    # matching Lucene classic-parser behavior for multi-token analysis
    return Phrase(boost=boost, terms=tuple(toks), field=field)


def _reject_unsupported(tok: str) -> None:
    """Fail LOUDLY on classic-parser syntax we do not implement.

    The reference's parser accepts embedded wildcards (``te?m``,
    ``te*m``); silently analyzing them into bare terms returns
    wrong-but-plausible results, so raise instead (quoted phrase bodies
    are analyzed text and exempt).  Fuzzy ``term~N`` / slop ``"a b"~k``
    / ranges ``[a TO b]`` ARE supported and validated by ``_leaf``.
    """
    body, _tilde, _boost = _strip_suffixes(tok)
    if not body:
        # a stray `^2` / `~1` token (e.g. from `"a b" ^2` with a space)
        raise QueryParseError(f"dangling suffix token {tok!r}")
    if body.startswith('"') and body.endswith('"') and len(body) >= 2:
        return
    m = _FIELD_RE.match(body)
    if m and m.group(2).startswith('"') and m.group(2).endswith('"'):
        return  # field:"quoted phrase" — analyzed text
    if "~" in body:
        raise QueryParseError(
            f"unsupported '~' in {tok!r} (supported: term~, term~1, term~2, \"a b\"~k)"
        )
    # well-formed ranges ([a TO b] / {a TO b}, optionally field-prefixed)
    # are parsed (and validated) by _leaf — incl. '*' as an open end;
    # stray brackets must not silently degrade
    rng = m.group(2) if m else body
    if rng and rng[0] in "[{" and rng[-1] in "]}":
        return
    if any(c in body for c in "[]{}"):
        raise QueryParseError(f"stray range bracket in {tok!r}")
    # bare-star and leading wildcards: Lucene classic-parser default
    # (allowLeadingWildcard=false) — _leaf validates everything else
    term = m.group(2) if m else body
    if term and term[0] in "?*":
        raise QueryParseError(
            f"leading wildcards are not allowed in {tok!r} "
            "(Lucene classic-parser default)"
        )


def parse(query: str, simple: bool = False) -> Bool:
    """Parse a query string into a Bool root node."""
    toks = _lex(query)
    for idx, t in enumerate(toks):
        if t.startswith("^") and idx > 0 and toks[idx - 1] == ")":
            continue  # group boost `(...)^2`, consumed by _parse_bool
        _reject_unsupported(t)
    node, rest = _parse_bool(toks, 0, simple)
    if rest != len(toks):
        raise QueryParseError(f"trailing tokens in {query!r}")
    return node


def _parse_bool(toks: list[str], i: int, simple: bool) -> tuple[Bool, int]:
    clauses: list[tuple[str, Node]] = []
    pending_occur: str | None = None
    pending_op: str | None = None  # 'AND' | 'OR' | 'NOT'
    while i < len(toks):
        t = toks[i]
        if t == ")":
            break
        if t in ("AND", "&&"):
            pending_op = "AND"
            i += 1
            continue
        if t in ("OR", "||"):
            pending_op = "OR"
            i += 1
            continue
        if t in ("NOT", "!"):
            pending_op = "NOT"
            i += 1
            continue
        if t == "+":
            pending_occur = MUST
            i += 1
            continue
        if t == "-":
            pending_occur = MUST_NOT
            i += 1
            continue
        if t == "(":
            sub, j = _parse_bool(toks, i + 1, simple)
            if j >= len(toks) or toks[j] != ")":
                raise QueryParseError("unbalanced parens")
            i = j + 1
            boost = 1.0
            if i < len(toks) and toks[i].startswith("^"):
                _, boost = _strip_boost("x" + toks[i])
                i += 1
            sub.boost = boost
            node: Node = sub
        else:
            leaf = _leaf(t, simple)
            i += 1
            if leaf is None:
                pending_occur, pending_op = None, None
                continue
            node = leaf
        occur = pending_occur
        if occur is None:
            if pending_op == "AND":
                occur = MUST
                # classic parser: `a AND b` promotes the PREVIOUS clause too
                if clauses and clauses[-1][0] == SHOULD:
                    clauses[-1] = (MUST, clauses[-1][1])
            elif pending_op == "NOT":
                occur = MUST_NOT
            else:
                occur = SHOULD
        clauses.append((occur, node))
        pending_occur, pending_op = None, None
    return Bool(clauses=clauses), i


def query_terms(node: Node) -> set[str]:
    """All exact terms referenced (for postings pruning; prefixes excluded)."""
    if isinstance(node, Term):
        return {node.text}
    if isinstance(node, Phrase):
        return set(node.terms)
    if isinstance(node, Bool):
        out: set[str] = set()
        for _, c in node.clauses:
            out |= query_terms(c)
        return out
    return set()


def query_prefixes(node: Node) -> set[str]:
    if isinstance(node, Prefix):
        return {node.prefix}
    if isinstance(node, Bool):
        out: set[str] = set()
        for _, c in node.clauses:
            out |= query_prefixes(c)
        return out
    return set()
