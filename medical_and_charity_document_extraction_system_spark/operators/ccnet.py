"""CCNet-style per-language perplexity buckets (Wenzek et al. 2020).

CCNet splits each language's crawl into head/middle/tail by the
per-document LM perplexity terciles and trains preferentially on the
head. The engine-portable analog here scores every document with the
corpus-trained unigram LM (operators/lm.py — log-prob literals,
fixed-order fold, so the score doubles are bit-identical across
engines) and buckets per language against tercile thresholds:

- thresholds come from a DETERMINISTIC bounded sample
  (``doc_id % sample_mod == sample_rem``, empty docs excluded) — the
  CCNet paper likewise derives its cutoffs once from a snapshot and
  applies them as constants; at 100 TB the sample is a fixed-size
  seeded subset or a quantile sketch, and the comparison below is
  unchanged (the dsir_threshold discipline);
- within the sample, s1 = the ceil(n/3)-th largest score and
  s2 = the ceil(2n/3)-th largest, per language, ties broken by
  doc_id — a row_number window that runs ONLY on the bounded sample
  (never a corpus-wide per-language window: one language would be
  one task);
- bucket: score >= s1 -> 'head', score >= s2 -> 'middle', else
  'tail'; empty docs (NULL score) -> 'tail'; a language absent from
  the sample -> 'head' (no evidence against it) — both cases are
  explicit CASE arms so the DuckDB twin cannot diverge on NULL
  semantics.

Scale shape: scoring is a zero-shuffle projection; the threshold
table is |languages| rows, broadcast back onto the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .lm import unigram_lm_scores


def ccnet_buckets(
    df: DataFrame,
    vocab: list[tuple[str, float]],
    logp_oov: float,
    sample_mod: int = 10,
    sample_rem: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """(id, lang, n_tokens, avg_logprob, bucket) for every document."""
    scored = unigram_lm_scores(
        df,
        vocab,
        logp_oov,
        text_col=text_col,
        id_col=id_col,
        keep_cols=(lang_col,),
    )
    sample = scored.where(
        (F.col(id_col) % sample_mod == sample_rem) & (F.col("n_tokens") > 0)
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.col("avg_logprob").desc(), F.col(id_col)
    )
    ranked = sample.select(
        F.col(lang_col),
        F.col("avg_logprob"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(lang_col)).alias("_n"),
    )
    thr = ranked.groupBy(lang_col).agg(
        F.max(
            F.when(F.col("_rn") == F.expr("(_n + 2) DIV 3"), F.col("avg_logprob"))
        ).alias("_s1"),
        F.max(
            F.when(
                F.col("_rn") == F.expr("(2 * _n + 2) DIV 3"), F.col("avg_logprob")
            )
        ).alias("_s2"),
    )
    out = scored.join(F.broadcast(thr), lang_col, "left")
    bucket = (
        F.when(F.col("avg_logprob").isNull(), F.lit("tail"))
        .when(F.col("_s1").isNull(), F.lit("head"))
        .when(F.col("avg_logprob") >= F.col("_s1"), F.lit("head"))
        .when(F.col("avg_logprob") >= F.col("_s2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return out.select(
        F.col(id_col),
        F.col(lang_col),
        F.col("n_tokens"),
        F.col("avg_logprob"),
        bucket.alias("bucket"),
    )
