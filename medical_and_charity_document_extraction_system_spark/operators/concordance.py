"""Keyword-in-context (KWIC) concordance and mirrored-content report
— the search-snippet and crawl-ops staples.

``concordance`` turns every occurrence of a query term into a
(doc_id, position, snippet) row with ±window tokens of context: the
snippet-generation primitive behind search results and annotation
review queues.

``mirror_report`` summarizes exact-content mirroring across hosts:
documents whose text hash appears under >= 2 distinct hosts — the
crawl-dedup triage view ("is this duplication a mirror farm or an
in-site reprint?").

Determinism: pure token arithmetic and md5 hashes, no floats.

Scale shapes:

* ``concordance``: one scan; the token array is materialized ONCE in
  a projection, positions come from ``posexplode_outer`` and the
  term filter runs AFTER the generator — NEVER a plain
  explode-over-computed-array, which lets
  InferFiltersFromGenerate clone the whole tokenizer expression into
  a pushed-down Filter and re-evaluate it per plan site (the
  winnow_fingerprints 118s -> 3.3s lesson, pinned by a plan test
  here too). Output is bounded by occurrences of the query term.
* ``mirror_report``: hash-agg on (md5, host) then on md5 — both
  map-side combinable; the >= 2-host filter prunes before the
  example-url min. No joins, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens


def concordance(
    df: DataFrame,
    term: str,
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Every occurrence of ``term`` (exact whitespace-token match)
    with ±``window`` tokens of context. Returns (doc_id, pos,
    snippet) where pos is the 0-based token position and snippet
    joins the context window with single spaces (loss-free for a
    whitespace tokenizer)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
    )
    # posexplode_outer + post-filter: a plain explode over the
    # computed array would trigger InferFiltersFromGenerate and clone
    # the tokenizer into a size()>0 Filter (re-evaluated per site)
    hits = toks.select(
        "doc_id", "toks", F.posexplode_outer("toks").alias("pos", "tok")
    ).where(F.col("tok") == term)
    # F.slice is 1-based; clamp the left edge at 1
    start = F.greatest(F.col("pos") + 1 - window, F.lit(1))
    length = F.col("pos") + 1 + window - start + 1
    return hits.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.array_join(F.slice("toks", start, length), " ").alias("snippet"),
    )


def mirror_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    host_col: str = "host",
    min_hosts: int = 2,
) -> DataFrame:
    """Exact-content mirroring across hosts: per text md5 appearing
    under >= ``min_hosts`` distinct hosts, the copy count, distinct
    host count, and the smallest (host, id) example of each. Returns
    (text_md5, n_copies, n_hosts, first_host, first_id)."""
    base = df.select(
        F.md5(F.col(text_col)).alias("text_md5"),
        F.col(host_col).alias("host"),
        F.col(id_col).alias("id"),
    )
    return (
        base.groupBy("text_md5")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.countDistinct("host").cast("long").alias("n_hosts"),
            F.min("host").alias("first_host"),
            F.min("id").cast("long").alias("first_id"),
        )
        .where(F.col("n_hosts") >= min_hosts)
    )
