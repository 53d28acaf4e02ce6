"""Exact sparse similarity join over shingle posting lists.

The third member of the near-dup family (exact hash-dedup ->
MinHash-LSH banding -> THIS): an ALL-PAIRS-ABOVE-THRESHOLD join that
is exact (no banding miss probability to argue about) yet never
materializes the quadratic pair space. The classic plan (Vernica et
al., SIGMOD 2010 "Efficient Parallel Set-Similarity Joins Using
MapReduce"):

1. shingle each doc (same word-3-gram sets MinHash uses — shared
   tokenizer, `functions/textstats.word_shingles_fast`),
2. explode to (gram, doc) postings,
3. drop df=1 grams from the JOIN (they cannot co-occur — a pure
   optimization that leaves results exact, since set sizes are taken
   BEFORE the prune),
4. self-join postings on the gram, count co-occurrences per pair
   (map-side combinable hash-agg, so the shuffle carries (pair ->
   partial count), not raw gram hits),
5. one exact integer division for the Jaccard; the threshold filter
   itself is an integer cross-multiplication (`ov * t_den >= t_num *
   (sa + sb - ov)`), so floats never gate membership.

Scale shape: the per-gram pair fan-out is df*(df-1)/2, so a single
boilerplate shingle shared by 10^6 docs would alone emit 5*10^11
join rows. `max_df` caps that: grams above the cap are dropped from
the join, making the result the documented *lower-bound* overlap
(column names switch to `overlap_lb`/`jaccard_lb` so approximate
output is never mistaken for exact). Real corpora prune boilerplate
upstream (operators/textdedup.boilerplate_removal); with the cap the
join cost is O(vocab * max_df^2) regardless of corpus size, every
stage is an AQE-splittable equi-join or map-side-combinable agg, and
nothing ever collects to the driver.

Reference parity: the reference has no similarity join at all (its
dedup story is per-document reprocessing); this generalizes its
exact re-upload detection (SURVEY §2's fingerprint path) to
near-identical uploads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import word_shingles_fast


def shingle_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    t_num: int = 1,
    t_den: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """All document pairs with shingle-set Jaccard >= t_num/t_den.

    Returns (id_a, id_b, sz_a, sz_b, overlap, jaccard) with id_a <
    id_b; `jaccard` is the ONE float division over exact integers.
    With ``max_df`` set, grams seen in more than max_df docs are
    excluded from the join and the overlap/jaccard columns become
    lower bounds (renamed `overlap_lb`/`jaccard_lb`).
    """
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles_fast(k)(F.col(text_col)).alias("sh")
    )
    # cache the exploded postings: they feed the gram-df agg AND both
    # sides of the pair self-join — uncached, the Arrow shingle UDF
    # re-runs over the whole corpus once per reference (8 ArrowEval
    # sites in the uncached plan; same rationale as the MinHash
    # signature cache in operators/dedup.py). Also fan out first: a
    # single-file corpus would otherwise shingle on one core.
    sc = df.sparkSession.sparkContext
    width = sc.defaultParallelism
    n_files = len(df.inputFiles())
    if (0 < n_files < width) or df.rdd.getNumPartitions() < width:
        df = df.repartition(width)
        sh = df.select(
            F.col(id_col).alias("id"),
            word_shingles_fast(k)(F.col(text_col)).alias("sh"),
        )
    posts = sh.select(
        "id", F.size("sh").cast("long").alias("sz"), F.explode("sh").alias("gram")
    ).cache()
    gdf = posts.groupBy("gram").agg(F.count(F.lit(1)).alias("gram_df"))
    cond = F.col("gram_df") >= 2
    if max_df is not None:
        cond = cond & (F.col("gram_df") <= max_df)
    joinable = posts.join(gdf.where(cond).select("gram"), "gram")
    a, b = joinable.alias("a"), joinable.alias("b")
    pairs = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    union_sz = F.col("sz_a") + F.col("sz_b") - F.col("overlap")
    out = pairs.where(
        F.col("overlap") * F.lit(t_den) >= F.lit(t_num) * union_sz
    ).select(
        "id_a",
        "id_b",
        "sz_a",
        "sz_b",
        "overlap",
        (F.col("overlap") / union_sz).alias("jaccard"),
    )
    if max_df is not None:
        out = out.withColumnRenamed("overlap", "overlap_lb").withColumnRenamed(
            "jaccard", "jaccard_lb"
        )
    return out
