"""Winnowing document fingerprints (MOSS — Schleimer et al.,
SIGMOD 2003 "Winnowing: Local Algorithms for Document Fingerprinting").

Samples each document's char-k-gram hashes with the winnowing
GUARANTEE: from every window of ``w`` consecutive k-grams at least one
hash is selected, so any shared substring of length >= w + k - 1
between two documents yields at least one shared fingerprint — the
property plain "every i-th hash" sampling lacks. The selected set is a
position-independent ~1/w-size sketch; this is the plagiarism/near-dup
detector used by MOSS and the sampled complement to the EXACT posting
join in operators/sparsesim.py.

Engine-portable selection rule: both engines compute the identical
integer ``combined[j] = h[j] * 2^20 + (2^20 - 1 - j)`` where ``h`` is
the first-10-hex-chars md5 gram hash (40 bits — the md5-not-xxhash64
convention, so DuckDB recomputes it from scratch). ``min(combined)``
over a window is then *min hash, ties broken to the RIGHTMOST
position* (the MOSS robust-winnowing tie rule) in one order-free
integer comparison — no struct ordering semantics to align between
engines. Documents must be < 2^20 chars (guard below); hashes stay
under 2^60, no overflow.

Spark shape: pure JVM array HOFs, STAGED projections (each
interpreted HOF is materialized once — the gopher_quality lesson),
one explode, zero shuffles until the caller aggregates. DuckDB twin:
the same arithmetic via generate_series + a rows-frame window min.

Scale: embarrassingly parallel per document; output is ~n/w rows per
doc. ``winnow_candidates`` then joins the (doc, fp) table on fp —
candidate generation for near-dup at a 1/w fraction of the posting
volume sparsesim pays. On corpora with degenerate gram diversity
(tiny vocab — this repo's synthetic word soup) fingerprints collide
en masse and the pair join approaches all-pairs; that is a property
of the DATA (any sketch of a 20-word vocabulary saturates), so
``winnow_candidates`` takes a ``max_df`` cap like sparsesim's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS_BITS = 20
_POS_MOD = 1 << _POS_BITS  # 1048576


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowed fingerprint table: (doc_id, pos, fp) — ``fp`` the
    40-bit gram hash selected at 1-based gram position ``pos``.
    Documents shorter than ``k`` emit nothing; documents with fewer
    than ``w`` k-grams emit their single minimum (the whole text is
    one window)."""
    if k < 2 or w < 2:
        raise ValueError("need k >= 2 and w >= 2")
    base = (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("s"))
        .where(F.col("s").isNotNull() & (F.length("s") >= k))
    )
    # guard the position encoding: 2^20 chars per doc
    base = base.where(F.length("s") < _POS_MOD - 1)
    # stage 1: materialize the combined (hash<<20 | reversed-pos) array
    combined = base.withColumn(
        "c",
        F.expr(
            f"transform(sequence(1, length(s) - {k} + 1), j ->"
            f" CAST(conv(substring(md5(substring(s, j, {k})), 1, 10), 16, 10)"
            f" AS BIGINT) * {_POS_MOD} + ({_POS_MOD - 1} - j))"
        ),
    ).select("doc_id", "c")
    # stage 2: per-window minima (ends w..num_h), or the single global
    # minimum when there are fewer than w hashes
    sel = combined.withColumn(
        "fps",
        F.when(F.size("c") <= w, F.array(F.array_min("c"))).otherwise(
            F.expr(
                f"array_distinct(transform(sequence({w}, size(c)), p ->"
                f" array_min(slice(c, p - {w} + 1, {w}))))"
            )
        ),
    ).select("doc_id", "fps")
    # explode_outer, NOT explode: plain explode triggers
    # InferFiltersFromGenerate, which clones the whole winnowing
    # expression (with `c` inlined per slice site) into a pushed-down
    # size(fps)>0 filter — measured 118s vs ~2s on 500 docs. fps is
    # never empty here, so the outer form emits no null rows; the
    # scalar isNotNull guard below is belt-and-braces.
    cv = F.col("cv")
    return (
        sel.select("doc_id", F.explode_outer("fps").alias("cv"))
        .where(cv.isNotNull())
        .select(
            "doc_id",
            (F.lit(_POS_MOD - 1) - (cv % _POS_MOD)).cast("long").alias("pos"),
            F.expr(f"cv DIV {_POS_MOD}").alias("fp"),
        )
    )


def winnow_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: documents sharing at least
    ``min_shared`` DISTINCT fingerprints. ``max_df`` drops
    fingerprints held by more than that many documents before the
    self-join (the sparsesim stop-gram cap) — with it set the shared
    counts are lower bounds, so the column is named ``shared_lb``."""
    fps = (
        winnow_fingerprints(df, id_col, text_col, k, w)
        .select("doc_id", "fp")
        .distinct()
    )
    out_col = "n_shared"
    if max_df is not None:
        keep = fps.groupBy("fp").count().where(F.col("count") <= max_df)
        fps = fps.join(keep.select("fp"), "fp")
        out_col = "shared_lb"
    fps = fps.cache()  # feeds both join sides
    a = fps.select(F.col("doc_id").alias("id_a"), "fp")
    b = fps.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias(out_col))
        .where(F.col(out_col) >= min_shared)
    )
