"""Exact edit-distance similarity join (all pairs within Levenshtein
distance ``d``), without a cartesian product.

The string-similarity complement to the set-based joins already in the
repo (shingle Jaccard in operators/sparsesim.py, MinHash banding in
operators/dedup.py): Jaccard treats a document as a bag of grams and is
insensitive to order; Levenshtein is the right metric for SHORT keys —
titles, names, URLs, OCR'd field values — where single-character noise
is the dominant corruption (the reference repo's extracted field values,
e.g. patient/donor names from OCR spans, are exactly this shape; see
/root/reference/backend/app/services/extraction... field parsing).

Candidate generation is LOSSLESS (no false negatives), two paths:

- **Long strings** (``len >= q*(d+1)``): positional q-gram posting join
  (Gravano et al., VLDB 2001 count filtering). If ``ed(a,b) <= d`` and
  ``max(|a|,|b|) >= q*(d+1)`` then a and b share at least
  ``max(|a|,|b|) - q + 1 - q*d >= 1`` positional q-grams within
  position shift ``d``. Postings join on ``(gram, pos DIV (d+1))``
  with the probe side emitted to the 3 adjacent buckets — a hot gram
  is split across position buckets instead of landing in one reduce
  task, and each (pos_a, pos_b) pair matches in exactly one bucket, so
  counting join rows never double-counts. Pairs below the count
  threshold are pruned BEFORE any string comparison.
- **Short strings** (``len < q*(d+1)``, where the gram guarantee does
  not hold): deletion-neighborhood join (FastSS, Bocek et al. 2007).
  If ``ed(a,b) <= d`` the two strings share a common subsequence
  reachable by deleting at most ``d`` characters from each, so the
  up-to-``d``-deletions variant sets intersect. Variants are generated
  by ``d`` rounds of JVM ``transform``+``explode`` (no Python), each
  round deduplicated; neighborhood size is bounded by C(q*(d+1), d) —
  a constant, because only short strings enter this path.

Survivor pairs from both paths are distinct-unioned, the strings are
joined back by id (the pair shuffle carries ids only), and the exact
``levenshtein(a, b) <= d`` post-filter runs once per candidate.
Spark's ``levenshtein`` and DuckDB's agree (plain unit-cost DP over
characters), so the oracle twin is the straightforward all-pairs SQL.

Scale shape: both candidate paths are equi-joins on bounded-width keys
(gram×bucket, deletion variant) — AQE-splittable; no window, no
cross join (a plan test pins the absence of BroadcastNestedLoopJoin).
The count filter is what keeps a 10^10-row key table feasible: on
24-char keys at d=4/q=3 a surviving pair must share >= 10 positional
grams, so near-miss pairs never reach the verify join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positional_grams(q: int):
    """struct(pos, gram) array over 1..len-q+1 (callers guarantee
    len >= q, so the sequence stop is >= 1 — no descending-sequence
    hazard)."""
    return F.expr(
        f"transform(sequence(1, length(s) - {q} + 1),"
        f" i -> struct(i AS pos, substring(s, i, {q}) AS gram))"
    )


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
    q: int = 3,
) -> DataFrame:
    """All pairs (id_a < id_b) whose strings are within Levenshtein
    distance ``max_dist``, with the exact distance. Returns
    (id_a, id_b, dist) — bigint, bigint, bigint."""
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1 (use exact_dedup for 0)")
    if q < 2:
        raise ValueError("q must be >= 2")
    d = max_dist
    short_cut = q * (d + 1)  # len below this -> deletion path

    s = (
        df.select(F.col(id_col).alias("id"), F.col(str_col).alias("s"))
        .where(F.col("s").isNotNull())
        .withColumn("l", F.length("s"))
        .cache()  # feeds postings (2 sides), variants, and the verify join
    )

    # ---- long path: positional q-gram postings, count-filtered ----
    postings = (
        s.where(F.col("l") >= q)
        .select("id", "l", F.explode(_positional_grams(q)).alias("pg"))
        .select("id", "l", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    )
    bucket = F.expr(f"CAST(pos - 1 AS BIGINT) DIV {d + 1}")
    build = postings.select(
        F.col("id").alias("id_a"),
        F.col("l").alias("l_a"),
        F.col("pos").alias("pos_a"),
        "gram",
        bucket.alias("bkt"),
    )
    probe = (
        postings.select(
            F.col("id").alias("id_b"),
            F.col("l").alias("l_b"),
            F.col("pos").alias("pos_b"),
            "gram",
            bucket.alias("b0"),
        )
        .withColumn("k", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select("id_b", "l_b", "pos_b", "gram", (F.col("b0") + F.col("k")).alias("bkt"))
    )
    gram_pairs = (
        build.join(probe, ["gram", "bkt"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("pos_a") - F.col("pos_b")) <= d)
            & (F.abs(F.col("l_a") - F.col("l_b")) <= d)
        )
        .groupBy("id_a", "id_b", "l_a", "l_b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # count filter: lossless for pairs with max(len) >= q*(d+1);
        # smaller pairs are the deletion path's job, so greatest(.,1)
        # never drops anything the gram path is responsible for
        .where(
            F.col("cnt")
            >= F.greatest(
                F.greatest("l_a", "l_b") - F.lit(q - 1) - F.lit(q * d), F.lit(1)
            )
        )
        .select("id_a", "id_b")
    )

    # ---- short path: up-to-d-deletions neighborhood join ----
    variants = s.where(F.col("l") < short_cut).select("id", F.col("s").alias("v"))
    frontier = variants
    for _ in range(d):
        frontier = (
            frontier.where(F.length("v") >= 1)  # sequence(1,0) descends
            .select("id", F.explode(_one_deletion_variants()).alias("v"))
            .distinct()
        )
        variants = variants.unionByName(frontier)
    variants = variants.distinct()
    va = variants.select(F.col("id").alias("id_a"), "v")
    vb = variants.select(F.col("id").alias("id_b"), "v")
    del_pairs = (
        va.join(vb, "v")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # ---- verify: exact distance on the deduped candidate set ----
    cand = gram_pairs.unionByName(del_pairs).distinct()
    sa = s.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
    sb = s.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            F.levenshtein("s_a", "s_b").cast("long").alias("dist"),
        )
        .where(F.col("dist") <= d)
    )
