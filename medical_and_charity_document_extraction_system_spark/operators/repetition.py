"""Gopher-style repetition signals (Rae et al. 2021, appendix A1.1).

The repetition family of quality filters complements the word-shape
rules in functions/gopher.py: machine-generated / boilerplate pages
repeat themselves — the same line pasted dozens of times, one n-gram
covering half the characters. Per document this computes:

- ``n_lines``             — non-empty '\\n' lines;
- ``dup_line_frac``       — fraction of lines that are repeats of an
  earlier line (1 - distinct/total);
- ``dup_line_char_frac``  — fraction of line CHARACTERS inside those
  repeats (Gopher's "duplicate line character fraction");
- ``top{2,3,4}gram_char_frac`` — fraction of the token-joined text's
  characters covered by the most frequent word n-gram
  (count * len(ngram) / len(join(tokens))); ties broken by the
  lexicographically smallest n-gram so both engines agree.

Gopher's published cuts: dup_line_frac <= 0.30,
dup_line_char_frac <= 0.20, top-2/3/4-gram char fractions
<= 0.20/0.18/0.16.

Float discipline: every fraction is ONE division of two exact
integers — bit-identical across engines by IEEE 754. Determinism:
the arg-max n-gram is picked via ``min(struct(-count, ngram))``
(map-side combinable — no per-term window), which the DuckDB twin
mirrors with ``row_number() OVER (ORDER BY cnt DESC, ngram)``.

Scale shape: line metrics are a zero-shuffle projection (array ops
over a staged line array). The n-gram stage explodes ONCE (all three
n sizes tagged in one pass — Spark does not share scans between
union branches) into (doc, n, gram) rows, then two hash-aggs keyed by
doc — per-DOC groups, bounded by document length, so a hot corpus
n-gram ("the end") never concentrates: the key includes doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens

NGRAM_SIZES = (2, 3, 4)


def _ngrams_tagged(toks: Column, n: int) -> Column:
    """array<struct<n:int, g:string>> of the column's word n-grams.
    ``sequence(1, stop)`` DESCENDS when stop < 1 (it would emit index
    0 for a too-short doc), so the sequence end is clamped to 1 and a
    zero-length outer slice yields the empty array instead."""
    n_grams = F.size(toks) - (n - 1)
    all_grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
        lambda i: F.struct(
            F.lit(n).alias("n"),
            F.array_join(F.slice(toks, i, n), " ").alias("g"),
        ),
    )
    return F.slice(all_grams, 1, F.greatest(n_grams, F.lit(0)))


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_lines, dup_line_frac, dup_line_char_frac,
    top2gram_char_frac, top3gram_char_frac, top4gram_char_frac).
    Docs with no lines / too few tokens get NULL for the undefined
    fractions."""
    # ---- line-duplication metrics: staged projection, zero shuffle
    base = df.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("_toks"),
        F.filter(
            F.split(F.col(text_col), "\n"), lambda x: x != ""
        ).alias("_lines"),
    )
    base = base.select(
        F.col(id_col),
        F.col("_toks"),
        F.size("_lines").alias("_nl"),
        F.size(F.array_distinct("_lines")).alias("_ndl"),
        F.length(F.array_join("_lines", "")).alias("_lc"),
        F.length(F.array_join(F.array_distinct("_lines"), "")).alias("_dlc"),
        F.length(F.array_join("_toks", " ")).alias("_jlen"),
    )
    lines = base.select(
        F.col(id_col),
        F.col("_nl").cast("long").alias("n_lines"),
        F.when(
            F.col("_nl") > 0,
            (F.col("_nl") - F.col("_ndl")).cast("double")
            / F.col("_nl").cast("double"),
        ).alias("dup_line_frac"),
        F.when(
            F.col("_lc") > 0,
            (F.col("_lc") - F.col("_dlc")).cast("double")
            / F.col("_lc").cast("double"),
        ).alias("dup_line_char_frac"),
        F.col("_jlen"),
    )

    # ---- top-n-gram char fractions: ONE explode carries all n sizes
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.concat(
                *[_ngrams_tagged(tokens(F.col(text_col)), n) for n in NGRAM_SIZES]
            )
        ).alias("_t"),
    ).select(id_col, F.col("_t.n").alias("n"), F.col("_t.g").alias("g"))
    counts = grams.groupBy(id_col, "n", "g").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    # arg-max per (doc, n) with deterministic ties: min over
    # (-cnt, gram) — an agg, not a window (map-side combinable)
    top = counts.groupBy(id_col, "n").agg(
        F.min(F.struct((-F.col("cnt")).alias("negc"), F.col("g"))).alias("m")
    )
    top = top.select(
        id_col,
        "n",
        ((-F.col("m.negc")) * F.length(F.col("m.g"))).alias("_cov"),
    )
    wide = top.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("_cov"))).alias(f"_cov{n}")
            for n in NGRAM_SIZES
        ]
    )
    out = lines.join(wide, id_col, "left")
    frac_cols = [
        F.when(
            F.col("_jlen") > 0,
            F.col(f"_cov{n}").cast("double") / F.col("_jlen").cast("double"),
        ).alias(f"top{n}gram_char_frac")
        for n in NGRAM_SIZES
    ]
    return out.select(
        id_col, "n_lines", "dup_line_frac", "dup_line_char_frac", *frac_cols
    )
