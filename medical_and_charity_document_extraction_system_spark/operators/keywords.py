"""Class-distinctive terms: which words characterize each group.

The cluster/class-labeling step of topic pipelines (BERTopic's
c-TF-IDF, Grootendorst 2022): after grouping documents (by semantic
cluster, source, language, host...), rank each group's terms by how
over-represented they are vs the whole corpus. Where BERTopic scores
``tf_c * log(1 + A/f_t)``, this implementation ranks by association
LIFT,

    lift(t, c) = n_tc * N / (n_t * n_c)

— the same monotone over-representation signal with NO logarithm, so
the score is one correctly-rounded division of EXACT int64 cross
products and every engine ranks identically (the collocation_lift
discipline; log-based forms need injected literals to survive the
oracle gate). ``n_tc`` = count of term t in class c, ``n_t``/``n_c``
the term/class totals, N the corpus token count.

Plan shape: ONE corpus scan -> (class, term) hash-agg (map-side
combinable); term totals and class totals are re-aggregations of that
table, not second scans; N is a single scalar collect. Top-k per class
goes through operators/topk.grouped_topk — class-count thresholds, no
row_number window over the raw term table (a stopword's class row set
is 1 row here anyway, but the group count = class count can be large
when classes are clusters). The int64 cross products cap at
N * max(n_tc) < 2^63 — at bigger corpora promote to decimal, as
collocation_lift documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medical_and_charity_document_extraction_system_spark.functions.textstats import (
    tokens,
)
from medical_and_charity_document_extraction_system_spark.operators.topk import (
    grouped_topk,
)


def distinctive_terms(
    df: DataFrame,
    class_col: str = "source",
    text_col: str = "text",
    top_k: int = 5,
    min_count: int = 3,
) -> DataFrame:
    """Top ``top_k`` terms per class by lift (ties: term ASC via
    grouped_topk's id tiebreak), among terms with at least
    ``min_count`` in-class occurrences. Returns
    (class_col, term, n_tc, lift)."""
    if top_k < 1 or min_count < 1:
        raise ValueError("top_k and min_count must be >= 1")
    tc = (
        df.select(
            F.col(class_col).alias("cls"),
            F.explode(tokens(F.col(text_col))).alias("t"),
        )
        .groupBy("cls", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tc"))
        .cache()  # feeds term totals, class totals, N, and the join
    )
    tt = tc.groupBy("t").agg(F.sum("n_tc").cast("long").alias("n_t"))
    ct = tc.groupBy("cls").agg(F.sum("n_tc").cast("long").alias("n_c"))
    total = tc.agg(F.sum("n_tc")).collect()[0][0] or 0  # ONE scalar
    scored = (
        tc.where(F.col("n_tc") >= min_count)
        .join(tt, "t")
        .join(ct, "cls")
        .select(
            "cls",
            "t",
            "n_tc",
            (
                (F.col("n_tc") * F.lit(total).cast("long")).cast("double")
                / (F.col("n_t") * F.col("n_c")).cast("double")
            ).alias("lift"),
        )
    )
    # grouped_topk needs a composite-free id; (cls, t) is unique so t
    # works as the per-group tiebreak id
    out = grouped_topk(scored, "cls", "lift", "t", k=top_k)
    return out.select(
        F.col("cls").alias(class_col),
        F.col("t").alias("term"),
        "n_tc",
        "lift",
    )
