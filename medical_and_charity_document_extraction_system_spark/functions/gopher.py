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
operator stays shuffle-free (per-row projections only). The plan is
STAGED — (_toks, _lines) materialized first, then each integer count
exactly once, then the cheap ratio arithmetic — because signals and
the ``gopher_keep`` conjunction share sub-expressions: a single flat
projection re-expands the tokenize/count HOFs per referencing signal
(measured 34 filter() sites in the plan vs 9 staged; CollapseProject
keeps non-cheap multi-referenced aliases materialized, so the staged
shape sticks).
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


def _count_signals(toks: Column, lines: Column) -> dict[str, Column]:
    """All integer counts, each tokenize/scan HOF appearing exactly
    once — this whole dict is projected in ONE stage over the
    materialized (_toks, _lines) columns."""
    return {
        "n_words": F.size(toks).cast("long"),
        "sum_word_len": F.aggregate(
            F.transform(toks, F.length),
            _long0(),
            lambda acc, x: acc + x.cast("long"),
        ),
        "alpha_words": F.size(
            F.filter(toks, lambda x: x.rlike("[A-Za-z]"))
        ).cast("long"),
        "stopword_hits": F.size(
            F.filter(toks, lambda x: x.isin(*STOPWORDS))
        ).cast("long"),
        # null on an empty token array (array_max of []); the ratio
        # stage guards on n_words > 0 exactly like the flat form did
        "top_word_count": F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda w: F.size(F.filter(toks, lambda x: x == w)).cast("long"),
            )
        ),
        "n_lines": F.size(lines).cast("long"),
        "distinct_lines": F.size(F.array_distinct(lines)).cast("long"),
        "line_chars": F.aggregate(
            F.transform(lines, F.length),
            _long0(),
            lambda acc, x: acc + x.cast("long"),
        ),
        "dup_chars": F.aggregate(
            F.array_distinct(lines),
            _long0(),
            lambda acc, l: acc
            + (
                (F.size(F.filter(lines, lambda y: y == l)) - 1).cast("long")
                * F.length(l).cast("long")
            ),
        ),
        "bullet_lines": F.size(
            F.filter(
                lines,
                lambda x: (
                    x.startswith(BULLET_PREFIXES[0])
                    | x.startswith(BULLET_PREFIXES[1])
                    | x.startswith(BULLET_PREFIXES[2])
                ),
            )
        ).cast("long"),
        "ellipsis_lines": F.size(
            F.filter(lines, lambda x: x.endswith("..."))
        ).cast("long"),
    }


def with_gopher_signals(df, text_col: str = "text", id_col: str = "doc_id"):
    """(id, text) -> (id, <all signals>) — per-row projections only,
    zero shuffles; the filter form is ``.where('gopher_keep')``.
    Ratio formulas are unchanged from the flat form (every division
    is integer-count / integer-count, done once), so values are
    bit-identical to the DuckDB twin."""
    base = df.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("_toks"),
        F.split(F.col(text_col), "\n").alias("_lines"),
    )
    cnt = _count_signals(F.col("_toks"), F.col("_lines"))
    base = base.select(
        F.col(id_col), *(c.alias("_" + n) for n, c in cnt.items())
    )

    def g(name: str) -> Column:
        return F.col("_" + name)

    n_words, n_lines = g("n_words"), g("n_lines")
    mean_word_len = F.when(
        n_words > 0, g("sum_word_len").cast("double") / n_words.cast("double")
    )
    alpha_ratio = F.when(
        n_words > 0, g("alpha_words").cast("double") / n_words.cast("double")
    )
    top_word = F.when(
        n_words > 0,
        g("top_word_count").cast("double") / n_words.cast("double"),
    )
    dup_line_frac = (n_lines - g("distinct_lines")).cast("double") / n_lines.cast(
        "double"
    )
    dup_line_char_frac = F.when(
        g("line_chars") > 0,
        g("dup_chars").cast("double") / g("line_chars").cast("double"),
    ).otherwise(F.lit(0.0))
    bullet_frac = g("bullet_lines").cast("double") / n_lines.cast("double")
    ellipsis_frac = g("ellipsis_lines").cast("double") / n_lines.cast("double")
    keep = (
        (n_words >= MIN_WORDS)
        & (n_words <= MAX_WORDS)
        & (mean_word_len >= MIN_MEAN_WORD_LEN)
        & (mean_word_len <= MAX_MEAN_WORD_LEN)
        & (alpha_ratio >= MIN_ALPHA_WORD_RATIO)
        & (g("stopword_hits") >= MIN_STOPWORD_HITS)
        & (dup_line_frac <= MAX_DUP_LINE_FRAC)
        & (bullet_frac < MAX_BULLET_LINE_FRAC)
        & (ellipsis_frac < MAX_ELLIPSIS_LINE_FRAC)
    )
    return base.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        alpha_ratio.alias("alpha_word_ratio"),
        g("stopword_hits").alias("stopword_hits"),
        top_word.alias("top_word_frac"),
        n_lines.alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
        dup_line_char_frac.alias("dup_line_char_frac"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        F.coalesce(keep, F.lit(False)).alias("gopher_keep"),
    )
