"""StandardAnalyzer-parity tokenizer (vectorized).

The reference analyzes both index- and query-side text with Lucene's
``StandardAnalyzer`` (SURVEY.md §1.2): UAX#29 word-break tokenization +
lowercasing, empty stopword set, max token length 255.  We replicate the
UAX#29 rules for the character classes the corpus uses (lowercase ASCII
letters, digits, apostrophes, dots — FIXTURES.md §1), which reduce to:

* a token is a maximal run of ``[a-z0-9]``,
* a single ``'`` joins two runs iff both neighbors are LETTERS
  (UAX#29 WB6/WB7 with Single_Quote; ``don't`` → one token, ``2'3`` → two),
* a single ``.`` joins two runs iff both neighbors are letters or both
  are digits (MidNumLet; ``u.s.a`` and ``2.0.26`` are one token,
  ``a1.b`` splits — the char before the dot is a digit, after is a letter),
* everything else (whitespace, punctuation, ``-``, ``_`` is excluded from
  the generated corpora) breaks,
* tokens longer than 255 chars are split at 255 (StandardTokenizer
  ``maxTokenLength``),
* lowercase filter (applied up front; word-break classes of ASCII are
  case-insensitive so the result is identical to Lucene's
  tokenize-then-lowercase order).

Two implementations, kept in lock-step by tests:
``tokenize`` (pure Python, used by the oracle and the query parser) and
``tokenize_series`` (vectorized pandas, used inside the Spark build UDFs).

Simple mode (``simple=True``) is plain ``[a-z0-9]+`` runs — the variant
the DuckDB oracle SQL can reproduce (RE2 has no lookbehind); on plain
space-separated corpora the two modes coincide.
"""

from __future__ import annotations

import re

import pandas as pd

MAX_TOKEN_LEN = 255

# one token: an alnum run, extended by ' between letters or . between
# letters/letters or digits/digits (single separator only).
_STANDARD_RE = re.compile(
    r"[a-z0-9]+(?:"
    r"(?<=[a-z])'(?=[a-z])[a-z0-9]+"
    r"|(?<=[a-z])\.(?=[a-z])[a-z0-9]+"
    r"|(?<=[0-9])\.(?=[0-9])[a-z0-9]+"
    r")*"
)
_SIMPLE_RE = re.compile(r"[a-z0-9]+")

#: simple-mode pattern as a string for engines that share it (DuckDB RE2,
#: Spark regexp_extract_all) — keep in sync with _SIMPLE_RE.
SIMPLE_PATTERN = "[a-z0-9]+"

#: standard-mode pattern as a string. Java regex (Spark JVM-side) supports
#: the same lookbehind/lookahead syntax as Python `re`, so this string is
#: shared verbatim — keep in sync with _STANDARD_RE.
STANDARD_PATTERN = (
    r"[a-z0-9]+(?:"
    r"(?<=[a-z])'(?=[a-z])[a-z0-9]+"
    r"|(?<=[a-z])\.(?=[a-z])[a-z0-9]+"
    r"|(?<=[0-9])\.(?=[0-9])[a-z0-9]+"
    r")*"
)


def dl_expr(text_col, simple: bool = False):
    """Spark Column: exact token COUNT of a text column, JVM-side.

    Identical to ``len(tokenize(text, simple))`` — same regex executed by
    java.util.regex instead of Python ``re`` (lookarounds behave the
    same), with the maxTokenLength-255 split contributing
    ceil(len(token)/255) per over-long token.  Lets the build compute
    per-doc lengths (and SmallFloat norms) inside a plain column
    projection: no Python worker, no per-token rows, no shuffle.
    """
    from pyspark.sql import functions as F

    pattern = SIMPLE_PATTERN if simple else STANDARD_PATTERN
    toks = F.regexp_extract_all(F.lower(F.coalesce(text_col, F.lit(""))), F.lit(pattern), F.lit(0))
    return F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(MAX_TOKEN_LEN)).cast("int"),
    )


def _split_long(tokens: list[str]) -> list[str]:
    if all(len(t) <= MAX_TOKEN_LEN for t in tokens):
        return tokens
    out: list[str] = []
    for t in tokens:
        if len(t) <= MAX_TOKEN_LEN:
            out.append(t)
        else:
            out.extend(t[i : i + MAX_TOKEN_LEN] for i in range(0, len(t), MAX_TOKEN_LEN))
    return out


def tokenize(text: str, simple: bool = False) -> list[str]:
    """Analyze one string → ordered token list (positions = indexes)."""
    if text is None:
        return []
    rx = _SIMPLE_RE if simple else _STANDARD_RE
    return _split_long(rx.findall(text.lower()))


def tokenize_series(texts: pd.Series, simple: bool = False) -> pd.Series:
    """Vectorized analyze: Series[str] → Series[list[str]]."""
    rx = _SIMPLE_RE if simple else _STANDARD_RE
    toks = texts.fillna("").str.lower().str.findall(rx)
    # long-token split is a no-op on real corpora; only pay when needed
    if (texts.str.len().fillna(0) > MAX_TOKEN_LEN).any():
        toks = toks.map(_split_long)
    return toks
