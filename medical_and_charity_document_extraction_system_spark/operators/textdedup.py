"""Sub-document exact deduplication: paragraphs and token spans.

Two corpus-cleanup passes every large LLM-pretraining pipeline runs
between document-level dedup (operators/dedup.py) and chunking:

- ``paragraph_dedup`` — CCNet-style (Wenzek et al. 2020) exact
  paragraph deduplication: a non-blank line that occurs anywhere
  earlier in the corpus (global (doc_id, position) order) is dropped;
  only the corpus-wide FIRST occurrence survives. Catches shared
  quotes, syndicated paragraphs, and templated sentences that
  whole-document dedup misses.

- ``span_dedup`` — exact substring deduplication in the spirit of
  Lee et al. 2022 ("Deduplicating Training Data Makes Language
  Models Better"): every k-token window is hashed; a window whose
  hash appears in >= 2 distinct documents marks its k token
  positions as duplicated in every NON-canonical occurrence (the
  canonical one is the global min (doc_id, window_pos)); duplicated
  positions are removed and the survivors reassembled. The suffix
  -array machinery of the paper doesn't distribute; the hashed
  fixed-k window join is the standard Spark-shaped approximation
  (same candidate-generation idea as MinHash shingles, but exact).

Both are pure JVM column expressions — split / posexplode / hash-agg
/ join / sort_array(collect_list) — no Python in the data path, and
both have exact DuckDB twins (oracles.paragraph_dedup_sql /
span_dedup_sql).

Scale shape (10^12 docs):
- paragraph_dedup shuffles (md5(line), doc_id, pos) rows once for the
  first-occurrence hash-agg (map-side combine on the md5 key), joins
  occurrences back on the 16-byte hash (narrow shuffle rows — the
  line text stays on the occurrence side), and one per-doc rollup.
  Three shuffles total, all on uniform hash keys.
- span_dedup's window explode is the dominant cost: ~n_tokens rows
  per doc. That is the same order as the corpus token count — the
  minimum any exact-substring pass must touch — and the per-window
  row is (doc_id, int, 16-byte hash). The frequency agg combines
  map-side; only hashes seen in >= 2 docs survive to the join, so
  the dup-occurrence join input is proportional to the duplicated
  mass, not the corpus.

Reference parity note: the reference system has no corpus-level
dedup at all (it processes one uploaded file per request); these
operators are part of the training-data-pipeline surface this engine
adds on top (SURVEY.md section 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep only the corpus-global first occurrence of every non-blank
    line. Blank / whitespace-only lines are structure, not content —
    they always survive. Returns (id, clean_text, n_removed); a doc
    whose every line was removed yields clean_text = ''."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    # global first occurrence per exact line text, keyed on the md5 so
    # the build side of the join carries 16-byte keys, not line text
    occ = lines.select(id_col, "pos", "line", F.md5("line").alias("lh"))
    first = (
        occ.where(F.trim("line") != "")
        .groupBy("lh")
        .agg(F.min(F.struct(id_col, "pos")).alias("first_occ"))
    )
    kept = (
        occ.join(first, "lh", "left")
        .where(
            F.col("first_occ").isNull()  # blank lines: never in `first`
            | (
                (F.col("first_occ")[id_col] == F.col(id_col))
                & (F.col("first_occ")["pos"] == F.col("pos"))
            )
        )
        .select(id_col, "pos", "line")
    )
    clean = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n_lines"))
    return (
        totals.join(clean, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.col("_n_lines") - F.coalesce("_n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 12,
) -> DataFrame:
    """Remove every token position covered by a k-token window whose
    exact content also appears in another document, except in the
    canonical (global min (doc_id, window_pos)) occurrence. Returns
    (id, clean_text, n_removed) over the shared parity tokenizer."""
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
    # one row per k-window: (id, wpos, md5 of the window's joined text).
    # wpos is 0-based; slice() is 1-based.
    wins = (
        toked.where(F.size("toks") >= k)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - k),
                    lambda i: F.md5(F.array_join(F.slice("toks", i + 1, F.lit(k)), " ")),
                )
            ).alias("wpos", "whash"),
        )
    )
    freq = wins.groupBy("whash").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.min(F.struct(id_col, "wpos")).alias("first_occ"),
    )
    dup_occ = (
        wins.join(freq, "whash")
        .where(
            (F.col("n_docs") >= 2)
            & ~(
                (F.col("first_occ")[id_col] == F.col(id_col))
                & (F.col("first_occ")["wpos"] == F.col("wpos"))
            )
        )
        .select(id_col, "wpos")
    )
    covered = dup_occ.select(
        id_col, F.explode(F.sequence("wpos", F.col("wpos") + (k - 1))).alias("tp")
    ).distinct()
    toks_pos = toked.select(id_col, F.posexplode("toks").alias("tp", "tok"))
    kept = toks_pos.join(covered, [id_col, "tp"], "left_anti")
    clean = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("tp", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = toked.groupBy(id_col).agg(
        F.sum(F.size("toks")).alias("_n_toks")
    )
    return (
        totals.join(clean, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.col("_n_toks") - F.coalesce("_n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )
