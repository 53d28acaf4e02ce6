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
from medical_and_charity_document_extraction_system_spark.operators.webgraph import (
    pagerank_fixed,
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


def term_cooccurrence(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_support: int = 3,
    max_terms_per_doc: int = 500,
    top_k: int = 50,
) -> DataFrame:
    """Document-level term co-occurrence (the market-basket complement
    to adjacent-only collocation_lift): pairs of DISTINCT terms
    appearing in the same document, ranked by lift over document
    frequencies,

        lift(x, y) = n_xy * N / (df_x * df_y)

    with N the document count — exact int64 cross products, ONE
    division (no log, no literals). Returns (x, y, n_xy, lift), the
    ``top_k`` by (lift DESC, x, y), pairs with support >=
    ``min_support``.

    The analysis universe is documents with 2..``max_terms_per_doc``
    DISTINCT terms — the cap bounds the per-doc pair fan-out at
    O(cap^2) (a 10^5-distinct-term outlier would otherwise emit 10^10
    pairs from one row); document frequencies and N are computed over
    the SAME filtered universe so the statistics stay self-consistent.
    Plan: one scan -> per-doc distinct explode (cached: feeds the
    pair self-join, the df agg, and N) -> doc-keyed self-join ->
    map-side-combinable pair agg -> two df joins -> TakeOrdered."""
    if min_support < 1 or max_terms_per_doc < 2 or top_k < 1:
        raise ValueError("bad parameters")
    dt = F.array_distinct(tokens(F.col(text_col)))
    u = (
        df.select(F.col(id_col).alias("doc"), dt.alias("dt"))
        .where((F.size("dt") >= 2) & (F.size("dt") <= max_terms_per_doc))
        .select("doc", F.explode("dt").alias("w"))
        .cache()
    )
    n_docs = u.select("doc").distinct().count()
    a = u.select("doc", F.col("w").alias("x"))
    b = u.select("doc", F.col("w").alias("y"))
    nxy = (
        a.join(b, "doc")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
        .where(F.col("n_xy") >= min_support)
    )
    dfw = u.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("dfw"))
    return (
        nxy.join(dfw.select(F.col("w").alias("x"), F.col("dfw").alias("df_x")), "x")
        .join(dfw.select(F.col("w").alias("y"), F.col("dfw").alias("df_y")), "y")
        .select(
            "x",
            "y",
            "n_xy",
            (
                (F.col("n_xy") * F.lit(n_docs).cast("long")).cast("double")
                / (F.col("df_x") * F.col("df_y")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "x", "y")
        .limit(top_k)
    )


def textrank_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    iterations: int = 4,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    PageRank over each document's word-adjacency graph (co-occurrence
    window 2, undirected, self-loops dropped), top ``top_k`` words per
    document by rank.

    The per-document graphs are NOT iterated per document: every
    (doc, word) pair becomes one node — ``doc_id <tab> word``, the tab
    can never appear in a whitespace token — of a single corpus-wide
    graph fed to the shared integer fixed-point ``pagerank_fixed``
    (operators/webgraph.py). Disjoint components rank independently
    and the teleport share is a global constant, so within-document
    order equals the per-document computation's. Rank units are exact
    int64 — the unrolled-CTE oracle lands on identical units, and the
    per-doc top-k (grouped_topk, ties word ASC) is deterministic.

    Documents with fewer than 2 distinct adjacent words contribute no
    nodes (a one-word text has no co-occurrence graph — standard
    TextRank behavior; callers wanting a fallback can union in term
    counts). Scale: node degree is bounded by document length, so no
    hot reducer exists by construction; iteration cost is K joins
    co-keyed on the node."""
    toks = tokens(F.col(text_col))
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pair = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("x"), b.alias("y")),
    )
    pairs = (
        df.select(F.col(id_col).alias("doc"), F.explode(pair).alias("p"))
        .select("doc", "p.x", "p.y")
        .where(F.col("x") != F.col("y"))
    )

    def node(w):
        return F.concat_ws("\t", F.col("doc").cast("string"), w)

    fwd = pairs.select(node(F.col("x")).alias("src"), node(F.col("y")).alias("dst"))
    rev = pairs.select(node(F.col("y")).alias("src"), node(F.col("x")).alias("dst"))
    ranks = pagerank_fixed(fwd.union(rev), iterations=iterations)
    parts = F.split(F.col("node"), "\t", 2)
    scored = ranks.select(
        parts.getItem(0).cast("long").alias(id_col),
        parts.getItem(1).alias("word"),
        "rank_units",
    )
    return grouped_topk(scored, id_col, "rank_units", "word", k=top_k)


def vocab_coverage(
    docs: DataFrame, vocab_size: int = 64, text_col: str = "text"
) -> DataFrame:
    """Per-source coverage of a size-``vocab_size`` vocabulary: what
    fraction of all token occurrences are covered by the corpus-wide
    top-V terms (ties at the boundary break by term text — the
    deterministic rule both engines share). The tokenizer-sizing
    question every training pipeline asks before committing a vocab.

    One token explode -> ONE (source, term) shuffle; the global term
    table is a cheap re-aggregation of it; the vocab is TakeOrdered
    (per-partition heaps) and broadcast back. Coverage is ONE integer
    basis-point floor division."""
    from ..functions.textstats import tokens

    by_src = (
        docs.select("source", F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = (
        by_src.groupBy("term")
        .agg(F.sum("cnt").alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(int(vocab_size))
        .select("term", F.lit(1).alias("in_vocab"))
    )
    return (
        by_src.join(F.broadcast(vocab), "term", "left")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNotNull(), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_covered"),
            F.countDistinct("term").cast("long").alias("n_terms"),
        )
        .select(
            "source",
            "n_tokens",
            "n_covered",
            "n_terms",
            F.expr("n_covered * 10000 div greatest(n_tokens, 1)")
            .cast("long")
            .alias("coverage_bp"),
        )
    )
