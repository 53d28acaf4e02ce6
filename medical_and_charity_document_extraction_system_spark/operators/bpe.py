"""Distributed BPE tokenizer training (Sennrich et al. 2016).

A pretraining pipeline doesn't just consume a tokenizer — it TRAINS
one on its own corpus. Classic BPE: start from characters, repeatedly
merge the most frequent adjacent symbol pair. The key to distributing
it is the same observation the original implementation uses: merges
never cross word boundaries, so training operates on the WORD
FREQUENCY TABLE, not the corpus. One pass aggregates (word, count) —
after that, every round runs on a vocabulary-sized table (10^8 rows
at crawl scale, not 10^12 documents):

  round k:  pair counts   = explode adjacent symbol pairs, weighted
                            by word count  -> map-side-combinable agg
            best pair     = 1-row TakeOrdered (count DESC, left,
                            right) — the only driver collect, bounded
            apply merge   = a narrow per-row left fold (greedy
                            leftmost, exactly the reference BPE scan)

``localCheckpoint`` after each round cuts the K-deep HOF lineage (the
PageRank discipline) so round k's plan holds ONE fold, not k nested
ones. Everything is integer counts and string equality — no float
anywhere, so the DuckDB-side oracle re-derives the identical merge
table from the same parquet in plain Python.

The trained table doubles as the SEGMENTER: after K rounds each word
row carries its final symbol array, so per-document subtoken counts
are a plain join on word — no re-running merges over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens

BPE_MERGES = 12


def word_counts(
    corpus: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) — the ONE corpus-wide pass; everything after runs
    at vocabulary size."""
    return (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs."""
    n = F.greatest(F.size(syms) - 1, F.lit(0))
    return F.zip_with(
        F.slice(syms, 1, n),
        F.slice(syms, 2, n),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost merge of (left, right) — the reference BPE
    scan as a left fold: append s unless the accumulator ends in
    ``left`` and s == right, in which case replace the tail with the
    merged symbol. A freshly merged tail equals left+right != left
    (symbols are non-empty), so overlapping occurrences ("aaa" under
    (a,a)) merge exactly like the sequential scan."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    corpus: DataFrame,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Returns (merge table, trained word table).

    The merge table is [(left, right, pair_count)] in merge order —
    ties broken (count DESC, left, right). The word table is
    (word, cnt, syms) with the post-training segmentation, ready for
    :func:`segment_counts`. Stops early if no adjacent pairs remain
    (every word collapsed to one symbol)."""
    wt = word_counts(corpus, text_col).withColumn(
        "syms",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ),
    )
    wt = wt.localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            wt.select(
                F.col("cnt"), F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((left, right, c))
        wt = wt.withColumn(
            "syms", _apply_merge(F.col("syms"), left, right)
        ).localCheckpoint()
    return merges, wt


def merge_table_df(
    spark, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """(rank, left_sym, right_sym, pair_count) as a DataFrame — rank
    is the merge priority (0 = first learned); *_sym because LEFT and
    RIGHT are reserved words on the SQL-twin side."""
    rows = [(i, l, r, c) for i, (l, r, c) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left_sym string, right_sym string, pair_count long"
    )


def segment_counts(
    corpus: DataFrame,
    word_table: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_subtokens) per document under the trained
    segmentation — a join on word against the vocabulary-sized table
    (broadcast-able after frequency pruning at real scale), never a
    re-run of the merge loop over the corpus."""
    seg = word_table.select(
        "word", F.size("syms").cast("long").alias("n_sub")
    )
    doc_words = corpus.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    )
    per_doc = (
        doc_words.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subtokens"),
        )
    )
    return (
        corpus.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_words"), F.lit(0)).cast("long").alias("n_words"),
            F.coalesce(F.col("n_subtokens"), F.lit(0))
            .cast("long")
            .alias("n_subtokens"),
        )
    )


def bpe_train_python(
    word_cnt: dict[str, int], n_merges: int = BPE_MERGES
) -> tuple[list[tuple[str, str, int]], dict[str, list[str]]]:
    """The oracle builder's twin: the identical algorithm over a
    plain dict, used to emit the merge table / segment map as SQL
    literals. Kept next to the Spark form so the two stay one
    algorithm (same tie-break, same greedy scan)."""
    syms = {w: [ch for ch in w] for w in word_cnt}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, ss in syms.items():
            c = word_cnt[w]
            for a, b in zip(ss, ss[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, c))
        for w, ss in syms.items():
            out: list[str] = []
            i = 0
            while i < len(ss):
                if i + 1 < len(ss) and ss[i] == left and ss[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(ss[i])
                    i += 1
            syms[w] = out
    return merges, syms


def fertility_by_group(
    corpus: DataFrame,
    word_table: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer fertility (subtokens per word) rolled up per group —
    the standard tokenizer-fit diagnostic: a source whose fertility
    is far above the corpus mean is being shredded by the vocabulary
    (wrong language, mojibake, code) and inflates its effective
    token cost in training. One join on the vocabulary-sized word
    table + one group agg; the fertility itself is ONE exact integer
    division per group (the oracle-portable float discipline).

    Returns (group, n_words, n_subtokens, fertility)."""
    per_doc = segment_counts(corpus, word_table, text_col, id_col)
    j = corpus.select(F.col(id_col), F.col(group_col)).join(per_doc, id_col)
    g = j.groupBy(group_col).agg(
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_subtokens").cast("long").alias("n_subtokens"),
    )
    return g.select(
        group_col,
        "n_words",
        "n_subtokens",
        F.when(
            F.col("n_words") > 0, F.col("n_subtokens") / F.col("n_words")
        ).alias("fertility"),
    )
