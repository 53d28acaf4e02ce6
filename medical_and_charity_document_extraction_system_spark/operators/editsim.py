"""Exact edit-distance similarity join (all pairs within Levenshtein
distance ``d``), without a cartesian product.

The string-similarity complement to the set-based joins already in the
repo (shingle Jaccard in operators/sparsesim.py, MinHash banding in
operators/dedup.py): Jaccard treats a document as a bag of grams and is
insensitive to order; Levenshtein is the right metric for SHORT keys —
titles, names, URLs, OCR'd field values — where single-character noise
is the dominant corruption (the reference repo's extracted field
values, e.g. patient/donor names from OCR spans, are exactly this
shape).

Candidate generation is LOSSLESS (no false negatives), two paths:

- **Segment path** (PassJoin — Li, Deng, Feng, VLDB 2011 pigeonhole
  partitioning), for every pair whose lexicographically-assignable
  "build" string has ``len >= d+1``: split each string into ``d+1``
  contiguous segments (as even as possible). Within edit distance
  ``d`` at most ``d`` segments are touched by edits, so at least one
  segment of the build string appears VERBATIM in the probe string,
  shifted by at most ``d`` positions. The join key is
  ``(build_len, segment_index, segment_content)`` — an exact match on
  a ~``len/(d+1)``-char substring, far more selective than any q-gram
  scheme (a first cut with 3-gram count filtering produced ~48M join
  rows at sf0.1 on this corpus's 375-gram vocabulary; the segment join
  produces ~1.6M). Probe emission is pure runtime arithmetic — three
  chained JVM explodes (candidate build length, segment index,
  position window) with the candidate-length explode immediately
  pruned by an equi-join against the tiny DISTINCT-build-lengths
  table (broadcast by AQE) — no data-derived literals, no driver
  collect.
- **Short path** (``len <= d``, where a ``d+1``-way split is
  impossible): deletion-neighborhood join (FastSS, Bocek et al.
  2007) — strings within distance ``d`` share a member of their
  up-to-``d``-deletions variant sets. Only strings of at most ``d``
  characters enter this path, so the neighborhood size is trivially
  bounded.

Both paths carry the (short) strings through the postings, so
verification is a filter on the joined row — no join-back. The exact
check uses Spark's banded ``levenshtein(a, b, threshold)`` (O(len*d)
with early abort, returns -1 past the threshold); DuckDB's plain
``levenshtein`` agrees on the survivors, so the oracle twin is the
straightforward all-pairs SQL.

Scale shape: equi-joins on selective bounded-width keys only —
AQE-splittable, no window, no cross join (a plan test pins the absence
of BroadcastNestedLoopJoin). Posting volume is O(d) rows per string on
the build side and O(d^2 * |distinct lengths within +-d|) on the probe
side — independent of corpus size per string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _one_deletion_variants():
    """All strings reachable by deleting exactly one character of v
    (callers guarantee length(v) >= 1)."""
    return F.expr(
        "array_distinct(transform(sequence(1, length(v)),"
        " i -> concat(substring(v, 1, i - 1),"
        "             substring(v, i + 1, length(v) - i))))"
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int,
) -> DataFrame:
    """All pairs (id_a < id_b) whose strings are within Levenshtein
    distance ``max_dist``, with the exact distance. Returns
    (id_a, id_b, dist) — bigint, bigint, bigint."""
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1 (use exact_dedup for 0)")
    d = max_dist
    nseg = d + 1

    s = (
        df.select(F.col(id_col).alias("id"), F.col(str_col).alias("s"))
        .where(F.col("s").isNotNull())
        .withColumn("l", F.length("s"))
        .cache()  # feeds build postings, probe postings, and variants
    )

    # ---- segment path (PassJoin) ----
    # segment i of a length-l string: base = l DIV nseg, rem = l % nseg,
    # len_i = base + (i < rem), start_i = 1 + i*base + min(i, rem)
    build = (
        s.where(F.col("l") >= nseg)
        .select("id", "s", "l", F.explode(F.sequence(F.lit(0), F.lit(d))).alias("i"))
        .select(
            F.col("id").alias("id_b"),
            F.col("s").alias("s_b"),
            F.col("l").alias("lb"),
            "i",
            F.expr(
                f"substring(s, 1 + i * (l DIV {nseg}) + least(i, l % {nseg}),"
                f" l DIV {nseg} + IF(i < l % {nseg}, 1, 0))"
            ).alias("c"),
        )
    )
    build_lengths = (
        s.where(F.col("l") >= nseg).select(F.col("l").alias("lb")).distinct()
    )
    # probe: candidate build length lb in [max(d+1, l-d), l+d], pruned
    # immediately against the lengths that actually exist; then the
    # segment index and the +-d position window (clamped to the string)
    probe = (
        # guard: for l = 0 the [greatest(nseg, l-d), l+d] range is
        # empty and sequence() would DESCEND, emitting bogus lb values
        # (harmless — the exact verify rejects them — but wasted rows);
        # empty/short strings are the deletion path's job anyway
        s.where(F.col("l") + d >= nseg)
        .select(
            "id",
            "s",
            "l",
            F.explode(
                F.sequence(F.greatest(F.lit(nseg), F.col("l") - d), F.col("l") + d)
            ).alias("lb"),
        )
        .join(build_lengths, "lb")
        .select(
            "id", "s", "l", "lb",
            F.explode(F.sequence(F.lit(0), F.lit(d))).alias("i"),
        )
        .withColumn("len_i", F.expr(f"lb DIV {nseg} + IF(i < lb % {nseg}, 1, 0)"))
        .withColumn(
            "st", F.expr(f"1 + i * (lb DIV {nseg}) + least(i, lb % {nseg})")
        )
        # window [max(1, st-d), min(l - len_i + 1, st + d)]; empty -> drop
        .withColumn("p_lo", F.greatest(F.lit(1), F.col("st") - d))
        .withColumn("p_hi", F.least(F.col("l") - F.col("len_i") + 1, F.col("st") + d))
        .where(F.col("p_hi") >= F.col("p_lo"))  # sequence must not descend
        .select(
            F.col("id").alias("id_p"),
            F.col("s").alias("s_p"),
            "lb",
            "i",
            F.explode(F.sequence("p_lo", "p_hi")).alias("p"),
            "len_i",
        )
        .select(
            "id_p", "s_p", "lb", "i",
            F.expr("substring(s_p, p, len_i)").alias("c"),
        )
        .distinct()  # multiple p can yield the same content
    )
    seg_pairs = (
        build.join(probe, ["lb", "i", "c"])
        .where(F.col("id_b") != F.col("id_p"))
        .select(
            F.least("id_b", "id_p").alias("id_a"),
            F.greatest("id_b", "id_p").alias("id_b2"),
            # levenshtein is symmetric: orientation doesn't matter
            F.col("s_b").alias("s_a"),
            F.col("s_p").alias("s_b3"),
        )
        .select(
            "id_a",
            F.col("id_b2").alias("id_b"),
            "s_a",
            F.col("s_b3").alias("s_b"),
        )
    )

    # ---- short path: both strings <= d chars ----
    variants = s.where(F.col("l") <= d).select("id", "s", F.col("s").alias("v"))
    frontier = variants.select("id", "v")
    for _ in range(d):
        frontier = (
            frontier.where(F.length("v") >= 1)  # sequence(1,0) descends
            .select("id", F.explode(_one_deletion_variants()).alias("v"))
            .distinct()
        )
        variants = variants.unionByName(
            frontier.join(s.select("id", "s"), "id").select("id", "s", "v")
        )
    variants = variants.distinct()
    va = variants.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"), "v")
    vb = variants.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"), "v")
    del_pairs = (
        va.join(vb, "v")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "s_a", "s_b")
    )

    # ---- verify: banded exact distance on the candidate rows ----
    # (strings ride the postings, so no join-back; duplicates collapse
    # in the final distinct over the tiny surviving set)
    cand = seg_pairs.unionByName(del_pairs)
    return (
        cand.withColumn(
            "dist", F.levenshtein("s_a", "s_b", d).cast("long")
        )
        .where((F.col("dist") >= 0) & (F.col("dist") <= d))
        .select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            "dist",
        )
        .distinct()
    )
