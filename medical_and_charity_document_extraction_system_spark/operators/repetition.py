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


DUP_NGRAM_SIZES = (5, 10)


def dup_ngram_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sizes: tuple[int, ...] = DUP_NGRAM_SIZES,
) -> DataFrame:
    """Gopher's OTHER repetition family: the fraction of a document's
    token characters covered by word n-grams that occur more than
    once WITHIN the document (union of covered positions — an
    occurrence overlapping another duplicate is not double-counted).
    Returns (id, n_tokens, dup{n}gram_char_frac ...); fraction
    denominators are token characters only (separators excluded),
    NULL when the doc has no tokens.

    Gopher's published cuts: dup-5..10-gram char fractions <=
    0.15/0.14/0.13/0.12/0.11/0.10.

    Plan: one tagged explode (doc, n, gram, pos) -> duplicate grams
    via a (doc, n, gram) hash-agg -> semi-join occurrences back ->
    explode each occurrence's covered positions -> distinct ->
    per-position token lengths joined on (doc, pos) -> doc-keyed sum.
    Every shuffle key includes doc_id, so corpus-frequent grams never
    concentrate. Fractions are one exact-integer division."""
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    tok_pos = toked.select(
        F.col(id_col), F.posexplode("_toks").alias("p0", "tok")
    ).select(
        id_col, (F.col("p0") + 1).alias("p"), F.length("tok").alias("tlen")
    )
    totals = tok_pos.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("tlen").cast("long").alias("_tot"),
    )
    grams = toked.select(
        F.col(id_col),
        F.explode(
            F.concat(
                *[
                    F.transform(
                        _seq_upto(F.size("_toks") - (n - 1)),
                        _gram_factory(n),
                    )
                    for n in sizes
                ]
            )
        ).alias("_t"),
    ).select(
        id_col,
        F.col("_t.n").alias("n"),
        F.col("_t.g").alias("g"),
        F.col("_t.i").alias("i"),
    )
    dup = (
        grams.groupBy(id_col, "n", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select(id_col, "n", "g")
    )
    covered = (
        grams.join(dup, [id_col, "n", "g"], "left_semi")
        .select(
            id_col,
            "n",
            F.explode(F.sequence("i", F.col("i") + (F.col("n") - 1))).alias("p"),
        )
        .distinct()
    )
    cov_chars = (
        covered.join(tok_pos, [id_col, "p"])
        .groupBy(id_col, "n")
        .agg(F.sum("tlen").cast("long").alias("_cov"))
    )
    wide = cov_chars.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("_cov"))).alias(f"_cov{n}")
            for n in sizes
        ]
    )
    out = totals.join(wide, id_col, "left")
    fracs = [
        F.when(
            F.col("_tot") > 0,
            F.coalesce(F.col(f"_cov{n}"), F.lit(0)).cast("double")
            / F.col("_tot").cast("double"),
        ).alias(f"dup{n}gram_char_frac")
        for n in sizes
    ]
    return out.select(id_col, "n_tokens", *fracs)


# (column, threshold) cuts, in rejection-precedence order — the
# published Gopher values; a NULL signal (doc too short to define it)
# passes the cut (no evidence of repetition)
REPETITION_CUTS: tuple[tuple[str, float], ...] = (
    ("dup_line_frac", 0.30),
    ("dup_line_char_frac", 0.20),
    ("top2gram_char_frac", 0.20),
    ("top3gram_char_frac", 0.18),
    ("top4gram_char_frac", 0.16),
    ("dup5gram_char_frac", 0.15),
    ("dup10gram_char_frac", 0.10),
)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The COMPOSED Gopher document filter: word-shape rules
    (functions/gopher.with_gopher_signals) AND the repetition cuts,
    evaluated in a fixed precedence order. Returns (id, keep,
    reject_reason) with reason = the FIRST violated rule ('gopher'
    for the word-shape conjunction, else the cut's column name) or
    'none'. One zero-shuffle signal projection joined with the two
    doc-keyed repetition aggregates — the keep/drop decision a
    training-data pipeline applies before dedup (training_pipeline
    composes the word-shape half; this is the full filter)."""
    from ..functions.gopher import with_gopher_signals

    g = with_gopher_signals(df, text_col, id_col).select(id_col, "gopher_keep")
    rep = gopher_repetition(df, text_col, id_col)
    dng = dup_ngram_coverage(df, text_col, id_col)
    j = g.join(rep, id_col, "left").join(dng.drop("n_tokens"), id_col, "left")
    reason = F.when(~F.col("gopher_keep"), F.lit("gopher"))
    for col, cut in REPETITION_CUTS:
        reason = reason.when(F.col(col) > F.lit(cut), F.lit(col))
    reason = reason.otherwise(F.lit("none"))
    return j.select(
        F.col(id_col),
        (reason == "none").alias("keep"),
        reason.alias("reject_reason"),
    )


def _seq_upto(stop: Column) -> Column:
    """sequence(1..stop) that is EMPTY (not descending) for stop < 1:
    the clamp-then-zero-slice trick from _ngrams_tagged."""
    return F.slice(
        F.sequence(F.lit(1), F.greatest(stop, F.lit(1))),
        1,
        F.greatest(stop, F.lit(0)),
    )


def _gram_factory(n: int):
    # factory closure: a default-arg lambda would receive the element
    # INDEX as a second argument from F.transform
    def make(i: Column) -> Column:
        return F.struct(
            F.lit(n).alias("n"),
            F.array_join(F.slice(F.col("_toks"), i, n), " ").alias("g"),
            i.alias("i"),
        )

    return make
