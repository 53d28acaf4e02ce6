"""Text-analysis column expressions: tokenization, quality scoring,
language-ID heuristic, fingerprinting, shingling.

All pure ``pyspark.sql.functions`` (JVM-side, whole-stage-codegen) —
this is the part of the engine that must *never* drop into Python at
100 TB. Each expression has an exact ANSI-SQL twin in ``oracles.py``
(the DuckDB oracle), so the arithmetic here is written to be
IEEE-reproducible: same operation order, no reliance on rounding.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "to", "and", "in")

# Java regex \s — ASCII-only [ \t\n\x0B\f\r]; the Python twin of the
# JVM F.split(r"\s+") tokenizer must use the same class.
_ASCII_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is"),
    "de": ("der", "und", "ist"),
    "fr": ("le", "et", "est"),
    "es": ("el", "y", "es"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped (BPE-ish regex split)."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    return _count_in(toks, STOPWORDS) / F.size(toks)


def punct_ratio(text: Column) -> Column:
    clean = F.regexp_replace(text, r"[^a-z0-9\s]", "")
    return (F.length(text) - F.length(clean)) / F.length(text)


def quality_score(text: Column) -> Column:
    """0..1 heuristic: length term + (1 - stopword share) + (1 - punct
    share), weighted 0.4/0.4/0.2. Operation order fixed for IEEE
    reproducibility against the DuckDB oracle."""
    n = F.size(tokens(text))
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_term
        + F.lit(0.4) * (F.lit(1.0) - stopword_ratio(text))
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio(text))
    )


def lang_guess(text: Column) -> Column:
    """Marker-word language ID (n-gram-heuristic stand-in). Priority
    order en > de > fr > es on ties; 'und' when no markers hit —
    mirrors the reference's language mapping role
    (easyocr_engine.py:147-186)."""
    toks = tokens(text)
    c = {lang: _count_in(toks, words) for lang, words in LANG_MARKERS.items()}
    return (
        F.when(
            (c["en"] == 0) & (c["de"] == 0) & (c["fr"] == 0) & (c["es"] == 0), "und"
        )
        .when(c["en"] >= F.greatest(c["de"], c["fr"], c["es"]), "en")
        .when(c["de"] >= F.greatest(c["fr"], c["es"]), "de")
        .when(c["fr"] >= c["es"], "fr")
        .otherwise("es")
    )


def fingerprint_md5(text: Column) -> Column:
    """Exact-dup document fingerprint (lowercase hex)."""
    return F.md5(F.encode(text, "UTF-8"))


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-gram word shingles, joined by single spaces."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return F.when(F.size(toks) >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two distinct-element arrays."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def word_shingles_fast(k: int = 3):
    """Arrow-vectorized twin of ``word_shingles`` (identical output:
    distinct k-gram shingles in first-occurrence order). The JVM
    higher-order form above is interpreted, not codegen'd (~9ms/doc);
    this pandas_udf is ~20x faster and is what the hot paths (pairwise
    jaccard, MinHash verification) use. Returns a Column function.

    Tokenizes with the same ASCII whitespace class Java regex ``\\s+``
    uses — ``str.split()`` also splits on Unicode whitespace (U+00A0
    …), which would diverge from the JVM twin on non-ASCII text."""

    @F.pandas_udf("array<string>")
    def _sh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [w for w in _ASCII_WS_RE.split(t or "") if w]
            if len(toks) < k:
                out.append([])
                continue
            out.append(
                list(
                    dict.fromkeys(
                        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
                    )
                )
            )
        return pd.Series(out)

    return _sh


BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish subword-boundary token count: alpha runs, digit runs,
    and individual punctuation marks each count as one token (the
    regex family GPT-2-style tokenizers split on before merges).
    Whitespace-token counting is ``token_count`` above."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)).cast("long")
