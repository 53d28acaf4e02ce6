"""Event sessionization + BM25 relevance scoring.

Two classic batch analytics operators over the harness tables:

- ``sessionize``: gap-based sessions (a new session starts when a
  user's inter-event gap exceeds ``gap_seconds``) via the standard
  lag -> boundary-flag -> running-sum window pattern. Pure JVM window
  expressions; the gap compares ``unix_micros`` (DuckDB ``epoch_us``)
  so sub-second timestamps never truncate differently across engines.
  This is the batch twin of the stateful streaming shape
  (applyInPandasWithState in streaming/stream.py).

  KEY-SKEW BOUND (r4, documented deliberately): the
  ``Window.partitionBy(user_id)`` serializes one user's FULL history
  into a single task — inherent to any per-key ordered operator
  (Flink keyed streams and DuckDB's PARTITION BY share it). The work
  is linear in history length (lag + running sum, no quadratic term),
  so the bound is one task processing the heaviest user: at 10^12
  events even a pathological bot with 10^8 events is a ~GB-scale
  sort-spill task, not an OOM (pinned by the planted heavy-user test,
  tests/test_textops.py). Histories beyond that should be pre-split
  by (user, coarse time bucket) with boundary-session merge — the
  classic two-phase form — or handled by the watermarked streaming
  twin, which never holds more than the open session per key.

- ``bm25_scores``: Okapi BM25 for a fixed query-term list. The
  corpus statistics (N, avg doc length, per-term document frequency)
  are integers reduced in one tiny aggregate; idf values are computed
  in PYTHON from those integers and injected as double literals into
  the scoring expression — deliberately, because Java's Math.log and
  DuckDB's libm ln() are each allowed 1-ulp error and may disagree,
  which would break the bit-exact oracle gate. With idf as literals,
  both engines evaluate the identical scalar expression tree in the
  identical order. The stats collect is O(len(query_terms)) values —
  bounded, like the checkpoint bucket-id collect.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.textstats import tokens

SESSION_GAP_SECONDS = 1800


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = SESSION_GAP_SECONDS,
) -> DataFrame:
    """(events) -> one row per (user, session): session_seq (1-based
    per user), n_events, formatted start/end, exact decimal value sum."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev = F.lag(ts_col).over(w)
    # parquet timestamps load as TIMESTAMP_NTZ; the session is pinned
    # UTC (session.py) so the cast is the identity instant
    gap_us = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        prev.cast("timestamp")
    )
    brk = F.when(prev.isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0)
    sess = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = df.select(
        F.col(user_col),
        F.col(ts_col),
        F.col("value"),
        sess.cast("int").alias("session_seq"),
    )
    return tagged.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for ``query_terms`` (fixed order = the
    summation order). Returns (id, score) for docs matching >= 1 term."""
    toks = tokens(F.col(text_col))
    dl = F.size(toks)
    base = df.select(F.col(id_col), toks.alias("_toks"), dl.alias("_dl"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_dl").alias("sumdl"),
        *[
            F.sum(
                (F.size(F.filter("_toks", lambda x: x == F.lit(t))) > 0).cast("long")
            ).alias(f"df{i}")
            for i, t in enumerate(query_terms)
        ],
    ).first()
    n = stats.n
    avgdl = stats.sumdl / n  # python float; same literal lands in SQL
    idfs = [
        math.log((n - stats[f"df{i}"] + 0.5) / (stats[f"df{i}"] + 0.5) + 1.0)
        for i in range(len(query_terms))
    ]
    score = None
    for i, t in enumerate(query_terms):
        tf = F.size(F.filter("_toks", lambda x: x == F.lit(t))).cast("double")
        contrib = F.lit(idfs[i]) * (
            tf * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * (F.col("_dl").cast("double") / F.lit(avgdl))))
        )
        score = contrib if score is None else score + contrib
    return (
        base.select(F.col(id_col), score.alias("bm25"))
        .where(F.col("bm25") > 0.0)
    )


def bm25_scores_tfmap(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 via ONE Arrow pass per document instead of one interpreted
    higher-order scan per query term — the long-query scale form of
    ``bm25_scores`` (whose ``F.size(F.filter(...))`` per term is
    interpreted, not codegen'd, and linear in term count; fine at 3
    terms, wrong at 50). A vectorized pandas UDF tokenizes each doc
    once and emits (dl, [tf per term]); the scoring expression is then
    pure JVM arithmetic over integer tf counts, BUILT IN THE SAME
    ORDER with the SAME Python-float idf/avgdl literals as
    ``bm25_scores`` — so both forms (and the DuckDB twin) are
    bit-exact equal. Tokenization inside the UDF replicates the JVM's
    Java-regex ``\\s`` (ASCII-only) so token counts can never drift
    from ``functions.textstats.tokens``."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    terms = list(query_terms)

    def _stats_fn(texts):
        import re

        # Java \s is [ \t\n\x0B\f\r] (ASCII), unlike Python's Unicode \s
        ws = re.compile("[ \t\n\x0b\f\r]+")
        dls, tfs = [], []
        for t in texts:
            toks = [x for x in ws.split(t or "") if x]
            dls.append(len(toks))
            counts = {}
            for x in toks:
                counts[x] = counts.get(x, 0) + 1
            tfs.append([counts.get(q, 0) for q in terms])
        return pd.DataFrame({"dl": dls, "tf": tfs})

    # this module uses lazy (string) annotations, which pandas_udf's
    # signature inference can't resolve — attach real type objects
    _stats_fn.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    _stats = pandas_udf(_stats_fn, "struct<dl:long, tf:array<long>>")

    base = df.select(F.col(id_col), _stats(F.col(text_col)).alias("_s"))
    # corpus stats reduce the SAME Arrow pass's integers (n, sum dl,
    # per-term doc frequency) — no second tokenization of the corpus
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_s.dl").alias("sumdl"),
        *[
            F.sum((F.col("_s.tf").getItem(i) > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    ).first()
    n = stats.n
    avgdl = stats.sumdl / n
    idfs = [
        math.log((n - stats[f"df{i}"] + 0.5) / (stats[f"df{i}"] + 0.5) + 1.0)
        for i in range(len(terms))
    ]
    dl = F.col("_s.dl").cast("double")
    score = None
    for i in range(len(terms)):
        tf = F.col("_s.tf").getItem(i).cast("double")
        contrib = F.lit(idfs[i]) * (
            tf * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * (dl / F.lit(avgdl))))
        )
        score = contrib if score is None else score + contrib
    return (
        base.select(F.col(id_col), score.alias("bm25"))
        .where(F.col("bm25") > 0.0)
    )


def corpus_stats_for_oracle(
    sf_dir: str, query_terms: list[str]
) -> tuple[int, float, list[float]]:
    """The oracle builder's twin of bm25_scores's stats collect: the
    same integers reduced by DuckDB from the same parquet, the same
    Python-math idf — so Spark and SQL share literal-for-literal
    constants."""
    import duckdb

    con = duckdb.connect()
    toks = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
    sels = ["count(*) AS n", f"sum(len({toks})) AS sumdl"] + [
        f"sum(CASE WHEN list_contains({toks}, '{t}') THEN 1 ELSE 0 END) AS df{i}"
        for i, t in enumerate(query_terms)
    ]
    row = con.sql(
        f"SELECT {', '.join(sels)} FROM '{sf_dir}/documents.parquet'"
    ).fetchone()
    con.close()
    n, sumdl = int(row[0]), int(row[1])
    dfs = [int(x) for x in row[2:]]
    avgdl = sumdl / n
    idfs = [math.log((n - d + 0.5) / (d + 0.5) + 1.0) for d in dfs]
    return n, avgdl, idfs
