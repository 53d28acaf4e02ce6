"""Gopher-style document quality rules (Rae et al. 2021, public) —
the standard LLM-corpus repetition/quality cleanup, as pure JVM
column expressions with an exact DuckDB twin (oracles.gopher_sql).

Signals per document (all integer counts divided ONCE, so both
engines produce bit-identical doubles):

- ``n_words`` / ``mean_word_len`` / ``alpha_word_ratio`` /
  ``stopword_hits`` — word-shape rules (50 <= words <= 100k, mean
  word length in [3, 10], >= 80% words contain a letter, >= 2
  stopwords present)
- ``top_word_frac`` — most frequent token's share of all tokens (the
  single-token analog of Gopher's top-n-gram character fraction)
- ``dup_line_frac`` / ``dup_line_char_frac`` — repeated-line share by
  line count and by character mass (Gopher's duplicate-line rules)
- ``bullet_line_frac`` / ``ellipsis_line_frac`` — formatting rules
  (< 90% bullet lines, < 30% ellipsis-terminated lines)
- ``gopher_keep`` — the conjunction, with the paper's thresholds

Interpreted higher-order functions are deliberate here: every fold is
over INTEGERS (no IEEE order sensitivity), the per-document work is
O(distinct_tokens x tokens) on ~10^2-token web docs, and the whole
operator stays shuffle-free (pure per-row projection).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .textstats import STOPWORDS, tokens

BULLET_PREFIXES = ("- ", "* ", "• ")

MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_ALPHA_WORD_RATIO = 0.8
MIN_STOPWORD_HITS = 2
MAX_BULLET_LINE_FRAC = 0.9
MAX_ELLIPSIS_LINE_FRAC = 0.3
MAX_DUP_LINE_FRAC = 0.3


def _long0() -> Column:
    return F.lit(0).cast("long")


def gopher_signals(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    n_words = F.size(toks).cast("long")
    sum_len = F.aggregate(
        F.transform(toks, F.length), _long0(), lambda acc, x: acc + x.cast("long")
    )
    mean_word_len = F.when(
        n_words > 0, sum_len.cast("double") / n_words.cast("double")
    )
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))).cast("long")
    alpha_ratio = F.when(
        n_words > 0, alpha_words.cast("double") / n_words.cast("double")
    )
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("long")
    top_word = F.when(
        n_words > 0,
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda w: F.size(F.filter(toks, lambda x: x == w)).cast("long"),
            )
        ).cast("double")
        / n_words.cast("double"),
    )
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("long")
    n_distinct = F.size(F.array_distinct(lines)).cast("long")
    dup_line_frac = (n_lines - n_distinct).cast("double") / n_lines.cast("double")
    line_chars = F.aggregate(
        F.transform(lines, F.length), _long0(), lambda acc, x: acc + x.cast("long")
    )
    dup_chars = F.aggregate(
        F.array_distinct(lines),
        _long0(),
        lambda acc, l: acc
        + (
            (F.size(F.filter(lines, lambda y: y == l)) - 1).cast("long")
            * F.length(l).cast("long")
        ),
    )
    dup_line_char_frac = F.when(line_chars > 0, dup_chars.cast("double") / line_chars.cast("double")).otherwise(F.lit(0.0))
    bullet = F.size(
        F.filter(
            lines,
            lambda x: (
                x.startswith(BULLET_PREFIXES[0])
                | x.startswith(BULLET_PREFIXES[1])
                | x.startswith(BULLET_PREFIXES[2])
            ),
        )
    ).cast("long")
    bullet_frac = bullet.cast("double") / n_lines.cast("double")
    ellipsis = F.size(F.filter(lines, lambda x: x.endswith("..."))).cast("long")
    ellipsis_frac = ellipsis.cast("double") / n_lines.cast("double")
    keep = (
        (n_words >= MIN_WORDS)
        & (n_words <= MAX_WORDS)
        & (mean_word_len >= MIN_MEAN_WORD_LEN)
        & (mean_word_len <= MAX_MEAN_WORD_LEN)
        & (alpha_ratio >= MIN_ALPHA_WORD_RATIO)
        & (stop_hits >= MIN_STOPWORD_HITS)
        & (dup_line_frac <= MAX_DUP_LINE_FRAC)
        & (bullet_frac < MAX_BULLET_LINE_FRAC)
        & (ellipsis_frac < MAX_ELLIPSIS_LINE_FRAC)
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "alpha_word_ratio": alpha_ratio,
        "stopword_hits": stop_hits,
        "top_word_frac": top_word,
        "n_lines": n_lines,
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "gopher_keep": F.coalesce(keep, F.lit(False)),
    }


def with_gopher_signals(df, text_col: str = "text", id_col: str = "doc_id"):
    """(id, text) -> (id, <all signals>) — a pure projection, zero
    shuffles; the filter form is ``.where('gopher_keep')``."""
    sig = gopher_signals(F.col(text_col))
    return df.select(F.col(id_col), *(c.alias(n) for n, c in sig.items()))
