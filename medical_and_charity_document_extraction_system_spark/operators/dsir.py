"""DSIR: data selection via importance resampling (Xie et al. 2023).

Real pretraining pipelines pick, from a raw crawl, the documents that
look most like a trusted target domain. DSIR's recipe: hash each
document's word unigrams+bigrams into ``m`` buckets, fit two
bag-of-buckets multinomials — p_target over the target corpus,
p_raw over the raw corpus — and score every raw document by its
importance log-weight

    log w(x) = sum_over_features  log p_target[b(f)] - log p_raw[b(f)]

then keep the top-k (the deterministic stand-in for the paper's
Gumbel resampling, which needs RNG).

Float discipline — the PageRank/temperature_mix integer trick, not a
fold: ``log()`` is not correctly rounded and a per-doc sum over an
engine-chosen aggregation order is not reproducible, so each bucket's
log-ratio is computed ONCE driver-side (Python ``math.log``) and
scaled to an int64 at 2^40 fixed point. A document's weight is then
an exact integer SUM (order-free), and the exported double is ONE
division by 2^40 — a power of two, hence exact. The bucket hash is
md5-derived (first 8 hex chars), the simhash idiom, because DuckDB
recomputes the identical value from scratch.

Scale shape: training is two bounded hash-aggs (m rows each — m is
the model size, never corpus size). Scoring is one explode + a pure
projection (the bucket->ratio map is an m-entry array LITERAL, no
join at all) + one map-side-combinable doc-keyed sum. Selection
compares against a precomputed (weight, id) threshold — no global
sort; at 100 TB the threshold comes from a quantile sketch or a
seeded sample instead of an exact top-k, same comparison shape.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens

FP_BITS = 40
FP_SCALE = 1 << FP_BITS
DSIR_BUCKETS = 64


def _features(text: Column) -> Column:
    """array<string>: word unigrams ++ space-joined bigrams (the
    DSIR hashed-n-gram feature set)."""
    toks = tokens(text)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, pairs)


def _bucket(feat: Column, m: int) -> Column:
    """md5-derived bucket in [0, m): first 8 md5 hex chars as a long
    (engine-portable — DuckDB recomputes it with the same md5)."""
    return (
        F.conv(F.substring(F.md5(F.encode(feat, "UTF-8")), 1, 8), 16, 10)
        .cast("long")
        % m
    )


def _bucket_counts(df: DataFrame, text_col: str, m: int) -> dict[int, int]:
    rows = (
        df.select(F.explode(_features(F.col(text_col))).alias("f"))
        .select(_bucket(F.col("f"), m).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    return {int(r.b): int(r.c) for r in rows}


def train_dsir(
    target: DataFrame,
    raw: DataFrame,
    m: int = DSIR_BUCKETS,
    text_col: str = "text",
) -> list[int]:
    """Fixed-point per-bucket log-ratios, index = bucket id.

    Both multinomials are add-one smoothed over the m buckets; each
    ratio is ``round((log p_target[b] - log p_raw[b]) * 2^40)`` —
    every ``log`` runs exactly once, driver-side, and travels to both
    engines as the same int64 literal."""
    ct = _bucket_counts(target, text_col, m)
    cr = _bucket_counts(raw, text_col, m)
    return ratios_from_counts(ct, cr, m)


def ratios_from_counts(
    ct: dict[int, int], cr: dict[int, int], m: int
) -> list[int]:
    """The shared literal arithmetic (also run by the oracle builder
    over duckdb-derived counts, so the int64 literals are identical
    by construction): add-one smoothing, Python math.log, 2^40
    fixed-point rounding."""
    nt = sum(ct.values()) + m
    nr = sum(cr.values()) + m
    out = []
    for b in range(m):
        lt = math.log((ct.get(b, 0) + 1) / nt)
        lr = math.log((cr.get(b, 0) + 1) / nr)
        out.append(int(round((lt - lr) * FP_SCALE)))
    return out


def dsir_log_weights(
    df: DataFrame,
    log_ratios: list[int],
    m: int = DSIR_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_feats, logw_scaled, log_weight) per document.

    ``logw_scaled`` is the exact int64 fixed-point sum (the value the
    oracle gate compares bit-for-bit); ``log_weight`` is the single
    power-of-two descale. Feature-free documents weigh 0 (log 1)."""
    ratio_arr = F.array(*[F.lit(r).cast("long") for r in log_ratios])
    feats = df.select(
        F.col(id_col), F.explode(_features(F.col(text_col))).alias("f")
    )
    per_doc = (
        feats.select(
            F.col(id_col),
            F.element_at(ratio_arr, (_bucket(F.col("f"), m) + 1).cast("int"))
            .alias("lr"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("lr").cast("long").alias("logw_scaled"),
            F.count(F.lit(1)).cast("long").alias("n_feats"),
        )
    )
    base = df.select(F.col(id_col))
    out = base.join(per_doc, id_col, "left")
    logw = F.coalesce(F.col("logw_scaled"), F.lit(0)).cast("long")
    return out.select(
        F.col(id_col),
        F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
        logw.alias("logw_scaled"),
        (logw.cast("double") / F.lit(float(FP_SCALE))).alias("log_weight"),
    )


def dsir_threshold(
    scored: DataFrame, k: int, id_col: str = "doc_id"
) -> tuple[int, int] | None:
    """The k-th (logw_scaled desc, id asc) pair — the selection
    threshold. Driver cost is a bounded TakeOrdered (k rows); at
    corpus scale substitute a quantile-sketch estimate, the
    comparison below is unchanged. None when the corpus has fewer
    than 1 row."""
    rows = scored.orderBy(
        F.col("logw_scaled").desc(), F.col(id_col)
    ).limit(k).collect()
    if not rows:
        return None
    last = rows[-1]
    return int(last["logw_scaled"]), int(last[id_col])


def dsir_select(
    scored: DataFrame,
    threshold: tuple[int, int] | None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Adds the deterministic top-k ``selected`` flag: strictly above
    the threshold weight, or equal weight with id <= threshold id —
    a pure comparison, no global sort in the data path."""
    if threshold is None:
        return scored.withColumn("selected", F.lit(False))
    thr_w, thr_id = threshold
    return scored.withColumn(
        "selected",
        (F.col("logw_scaled") > F.lit(thr_w))
        | (
            (F.col("logw_scaled") == F.lit(thr_w))
            & (F.col(id_col) <= F.lit(thr_id))
        ),
    )
