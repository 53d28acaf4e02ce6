"""Per-group top-k selection without a per-group global sort.

The curation primitive ("keep each host's k best-quality documents")
is usually written as ``row_number() OVER (PARTITION BY host ORDER BY
score DESC)`` — which at web scale funnels a mega-host's entire row
set through ONE window task (the same hazard the inverted-index df
count had; AQE cannot split windows). This operator gets the exact
same answer with aggregations and joins only:

1. quantize nothing — scores are taken as-is but counted per
   (group, score): a map-side-combinable hash-agg whose output is
   bounded by the DISTINCT scores per group, not the row count;
2. one window over THAT aggregated table (<= distinct-score rows per
   group — the hist_quantiles shape, not the inverted-index one)
   finds each group's threshold score t_g = the k-th largest and how
   many slots remain at the boundary;
3. rows with score > t_g pass outright (a broadcast-able join against
   the per-group threshold table); rows AT t_g take the remaining
   slots in (id ASC) order — ranked by a window partitioned by
   (group, t_g) over the boundary rows only.

Exactness: ties at the boundary are broken by smallest id, so the
result is a pure function of the data (the oracle twin is a plain
row_number over (score DESC, id ASC)).

Scale caveat (documented, inherent): a degenerate boundary — one
score value shared by a large fraction of a group — re-creates the
window hotspot at step 3, but only over the tied rows. Integer /
quantized scores with heavy ties should dedup or bucket upstream;
every score family this repo produces (fixed-point LM weights,
rank_units, counts) has enough spread in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Exactly the rows ``row_number() OVER (PARTITION BY group ORDER
    BY score DESC, id ASC) <= k`` would keep, computed without a
    per-group window over the raw rows. Groups smaller than k keep
    everything. Returns the input columns unchanged."""
    if k < 1:
        raise ValueError("k must be >= 1")
    # NULL scores do not rank: they fall out at the class equi-join
    # (same as a WHERE score IS NOT NULL pre-filter)
    s = F.col(score_col)
    counts = df.groupBy(group_col, score_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    # per-group, scores descending: how many rows sit STRICTLY above
    # each score (window over the aggregated table: rows per group =
    # distinct scores, not raw rows)
    w = (
        Window.partitionBy(group_col)
        .orderBy(s.desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = counts.select(
        group_col,
        score_col,
        "_n",
        F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_above"),
    )
    # classify each raw row by joining its (group, score) class stats
    # back on: classes with _above + _n <= k pass whole; the (at most
    # one per group) boundary class with _above < k < _above + _n
    # fills its remaining k - _above slots by id ASC; classes with
    # _above >= k drop. The _above < k prune bounds the class table
    # to <= k rows PER GROUP (AQE broadcasts it when the group count
    # is small; with many groups it stays an AQE-splittable
    # equi-join — never a window over raw rows).
    cls = ranked.where(F.col("_above") < k)
    tagged = df.join(cls, [group_col, score_col])
    whole = tagged.where(F.col("_above") + F.col("_n") <= k)
    boundary = tagged.where(
        (F.col("_above") < k) & (F.col("_above") + F.col("_n") > k)
    )
    wb = Window.partitionBy(group_col, score_col).orderBy(F.col(id_col).asc())
    bkeep = boundary.withColumn("_r", F.row_number().over(wb)).where(
        F.col("_r") <= F.lit(k) - F.col("_above")
    ).drop("_r")
    out = whole.unionByName(bkeep)
    return out.select(*df.columns)


def grouped_topk_dense(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """DENSE-rank top-k: exactly the rows ``dense_rank() OVER
    (PARTITION BY group ORDER BY score DESC) <= k`` keeps — every row
    whose score is among the group's k highest DISTINCT scores, ALL
    ties included (row_number semantics are ``grouped_topk``'s job).
    No per-row tiebreak exists because none is needed: membership is
    a pure function of the score class. Same scale shape — one
    hash-agg to the DISTINCT-score class table, a window over THAT
    (<= distinct scores per group), and an equi-join back; never a
    window over raw rows. ``id_col`` is accepted for signature parity
    and ignored."""
    if k < 1:
        raise ValueError("k must be >= 1")
    del id_col
    classes = df.select(group_col, score_col).where(
        F.col(score_col).isNotNull()
    ).distinct()
    w = Window.partitionBy(group_col).orderBy(F.col(score_col).desc())
    keep = (
        classes.withColumn("_dr", F.row_number().over(w))
        .where(F.col("_dr") <= k)
        .drop("_dr")
    )
    return df.join(keep, [group_col, score_col]).select(*df.columns)
