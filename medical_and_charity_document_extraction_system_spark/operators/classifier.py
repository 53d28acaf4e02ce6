"""Supervised quality classifier: hashed bag-of-words NB log-odds.

The model-based stage of a pretraining pipeline (DCLM's fastText
filter, FineWeb-Edu's scorer, GPT-3's LR-vs-WebText classifier):
train on a labeled positive/negative split, score every document,
keep what the model likes. This implementation is the closed-form
member of that family — multinomial Naive Bayes log-odds over hashed
unigram buckets:

    score(x) = log P(pos)/P(neg) + sum_tokens log p_pos[b(t)]/p_neg[b(t)]

Closed form matters here: training is two bounded hash-aggs (model
size = m buckets, never corpus size) with no SGD loop, so it
distributes exactly like DSIR — and the decision boundary (score > 0)
is the same linear-in-hashed-features shape fastText learns.

Float discipline (the DSIR/PageRank rule): every ``log`` runs ONCE,
driver-side, and travels to both engines as an int64 literal at 2^40
fixed point. A document's score is an exact integer sum of bucket
weights plus the prior bias — order-free — and the exported double is
one power-of-two descale. Hash = md5 first 8 hex (the simhash idiom:
DuckDB recomputes it from scratch).

Scale shape: training aggregates (bucket, label) counts map-side to
<= 2m rows; scoring is one explode + array-literal lookup (no join)
+ one doc-keyed sum. The collected model is m ints — bounded by model
size, not corpus size (the lm_quality vocab argument).

Labels are the caller's: any boolean column works. The catalog query
uses a deterministic stand-in (docs mentioning a marker token) so the
oracle can recompute it; a real deployment feeds curated
positives (wiki/books) against crawl negatives, same code path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens
from .dsir import FP_SCALE, _bucket

NB_BUCKETS = 256


def nb_weights_from_counts(
    cp: dict[int, int],
    cn: dict[int, int],
    n_pos_docs: int,
    n_neg_docs: int,
    m: int,
) -> tuple[list[int], int]:
    """The shared literal arithmetic (the oracle builder reruns it on
    duckdb-derived counts, so both engines hold identical int64
    literals): add-one smoothing over the m buckets, Python math.log,
    2^40 fixed point. Returns (per-bucket weights, prior bias)."""
    tp = sum(cp.values()) + m
    tn = sum(cn.values()) + m
    weights = [
        int(
            round(
                (
                    math.log((cp.get(b, 0) + 1) / tp)
                    - math.log((cn.get(b, 0) + 1) / tn)
                )
                * FP_SCALE
            )
        )
        for b in range(m)
    ]
    bias = int(round(math.log((n_pos_docs + 1) / (n_neg_docs + 1)) * FP_SCALE))
    return weights, bias


def train_nb_classifier(
    train: DataFrame,
    label_col: str,
    m: int = NB_BUCKETS,
    text_col: str = "text",
) -> tuple[list[int], int]:
    """Fit the NB log-odds model on a labeled DataFrame in TWO corpus
    passes total: one (bucket, label) hash-agg over the token stream
    (<= 2m rows collected) and one 2-row label count — not separate
    per-class scans. ``label_col`` is any boolean column already on
    ``train``."""
    lab = F.col(label_col)
    rows = (
        train.select(lab.alias("_pos"), F.explode(tokens(F.col(text_col))).alias("t"))
        .select("_pos", _bucket(F.col("t"), m).alias("b"))
        .groupBy("_pos", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    cp = {int(r.b): int(r.c) for r in rows if r._pos}
    cn = {int(r.b): int(r.c) for r in rows if not r._pos}
    nd = {
        bool(r._pos): int(r.c)
        for r in train.select(lab.alias("_pos"))
        .groupBy("_pos")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    return nb_weights_from_counts(cp, cn, nd.get(True, 0), nd.get(False, 0), m)


def nb_scores(
    df: DataFrame,
    weights: list[int],
    bias: int,
    m: int = NB_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_toks, score_scaled, score, pred) per document.

    ``score_scaled`` = bias + exact integer sum of bucket weights (the
    bit-compared value); ``score`` is the single power-of-two descale;
    ``pred`` is the sign. Token-free documents score the bare prior."""
    warr = F.array(*[F.lit(w).cast("long") for w in weights])
    per_doc = (
        df.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t")
        )
        .select(
            F.col(id_col),
            F.element_at(warr, (_bucket(F.col("t"), m) + 1).cast("int")).alias(
                "w"
            ),
        )
        .groupBy(id_col)
        .agg(
            F.sum("w").cast("long").alias("_ws"),
            F.count(F.lit(1)).cast("long").alias("n_toks"),
        )
    )
    out = df.select(F.col(id_col)).join(per_doc, id_col, "left")
    scaled = (
        F.coalesce(F.col("_ws"), F.lit(0)).cast("long") + F.lit(bias).cast("long")
    )
    return out.select(
        F.col(id_col),
        F.coalesce(F.col("n_toks"), F.lit(0)).cast("long").alias("n_toks"),
        scaled.alias("score_scaled"),
        (scaled.cast("double") / F.lit(float(FP_SCALE))).alias("score"),
        (scaled > 0).alias("pred"),
    )
