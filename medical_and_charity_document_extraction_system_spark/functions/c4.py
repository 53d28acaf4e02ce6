"""C4-style line/page cleanup (Raffel et al. 2020, section 2.2).

The published C4 recipe, applied between extraction and quality
filtering:

line rules (a line survives iff ALL hold):
- at least ``min_words`` whitespace words (C4: 3);
- does not contain the word "javascript" (case-insensitive);
- if ``require_terminal``: ends in a terminal punctuation mark
  (period / exclamation / question mark / closing quote).

page rules (evaluated on the ORIGINAL text, precedence order fixed):
- no "lorem ipsum" (case-insensitive)        -> 'lorem_ipsum'
- no curly brace '{'                          -> 'brace'
- no token on the word ``blocklist`` (ci)     -> 'blocklist'
- at least ``min_lines`` surviving lines      -> 'too_few_lines'
  (C4 counts sentences; lines are this corpus's sentence proxy —
  the synthesizer emits one statement per line)

``require_terminal`` defaults to False because the synthetic corpus
has no sentence punctuation (every doc would degenerate to empty);
the rule itself is implemented and pinned by pytest fixtures.

Everything is integer / boolean / string arithmetic — no float
discipline needed. Plan shape: a zero-shuffle staged projection
(the line array and the surviving-line array are each materialized
exactly ONCE — the interpreted-HOF rule from CLAUDE.md; a flat
projection would re-run the per-line word-count filter once per
referencing expression).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java regex: terminal punctuation at end of line (C4's sentence cue)
TERMINAL_PUNCT_RE = '[.!?"]$'


def _line_ok_factory(min_words: int, require_terminal: bool):
    # factory closure (not a default-arg lambda: F.filter would pass
    # the element INDEX as a second lambda argument)
    def ok(line: Column) -> Column:
        words = F.size(F.filter(F.split(line, r"\s+"), lambda x: x != ""))
        cond = (words >= F.lit(min_words)) & (
            ~F.lower(line).contains(F.lit("javascript"))
        )
        if require_terminal:
            cond = cond & line.rlike(TERMINAL_PUNCT_RE)
        return cond

    return ok


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    min_lines: int = 5,
    require_terminal: bool = False,
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """(id, n_lines, n_kept_lines, keep, reject_reason, kept_text):
    the C4 cleanup verdict per document. ``kept_text`` is the
    surviving lines rejoined in order (empty string when none
    survive); ``reject_reason`` is the FIRST violated page rule or
    'none'; ``keep`` == (reject_reason = 'none')."""
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("_t"),
        F.filter(F.split(F.col(text_col), "\n"), lambda x: x != "").alias(
            "_lines"
        ),
    )
    base = base.select(
        F.col(id_col),
        F.col("_t"),
        F.size("_lines").alias("_nl"),
        F.filter(
            "_lines", _line_ok_factory(min_words, require_terminal)
        ).alias("_kept"),
    )
    if blocklist:
        blocked = F.arrays_overlap(
            F.transform(
                F.filter(F.split(F.col("_t"), r"\s+"), lambda x: x != ""),
                lambda x: F.lower(x),
            ),
            F.array(*[F.lit(w.lower()) for w in blocklist]),
        )
    else:
        blocked = F.lit(False)
    reason = (
        F.when(
            F.lower(F.col("_t")).contains(F.lit("lorem ipsum")),
            F.lit("lorem_ipsum"),
        )
        .when(F.col("_t").contains(F.lit("{")), F.lit("brace"))
        .when(blocked, F.lit("blocklist"))
        .when(F.size("_kept") < F.lit(min_lines), F.lit("too_few_lines"))
        .otherwise(F.lit("none"))
    )
    return base.select(
        F.col(id_col),
        F.col("_nl").cast("long").alias("n_lines"),
        F.size("_kept").cast("long").alias("n_kept_lines"),
        (reason == "none").alias("keep"),
        reason.alias("reject_reason"),
        F.array_join("_kept", "\n").alias("kept_text"),
    )
